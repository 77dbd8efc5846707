"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on the sf0.001 transcript corpus
(synthesised deterministically per BASELINE.json ``input_hint``).
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 plus the large-scale data ops; ``oracle_sql()`` gives DuckDB
equivalents where SQL can express the op (floating aggregates are emitted
as exact integer cents/micros so value hashes are order-independent).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def _corpus(sf_dir: str) -> str:
    from weak_supervision_for_ner_ray.data import corpus_for_sf_dir
    return corpus_for_sf_dir(sf_dir)


def _workdir(sf_dir: str) -> str:
    import re
    name = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/wsner_work/{name}"


def _turns_ds(sf_dir: str):
    import ray.data as rd
    from weak_supervision_for_ner_ray.stages.util import target_blocks
    return rd.read_parquet(os.path.join(_corpus(sf_dir), "turns.parquet"),
                           override_num_blocks=target_blocks())


def _kg(sf_dir: str):
    from weak_supervision_for_ner_ray.pipelines.kg import build_kg
    return build_kg(_turns_ds(sf_dir), _workdir(sf_dir), n_iter=2,
                    write=True, seed=42)


def entry() -> Any:
    """Flagship: full KG construction on the sf0.001-scale corpus."""
    sf_dir = "/root/testdata/sf0.001"
    out = _kg(sf_dir)
    return out["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    from weak_supervision_for_ner_ray.pipelines import ops
    from weak_supervision_for_ner_ray.pipelines.kg import mentions_table

    def kg_triples(sf_dir):
        return _kg(sf_dir)["triples"]

    def kg_ner(sf_dir):
        out = _kg(sf_dir)
        return out["ner"]

    def kg_nodes(sf_dir):
        return _kg(sf_dir)["nodes"]

    def kg_edges(sf_dir):
        return _kg(sf_dir)["edges"]

    def kg_mentions(sf_dir):
        return mentions_table(_turns_ds(sf_dir))

    def turns_restore_order(sf_dir):
        # per-turn text equality invariant surface: restore stable order
        import ray.data as rd
        ds = _turns_ds(sf_dir)
        return ds.sort(["conv_id", "turn_idx"])

    return {
        # --- relational / streaming over provided tables (SQL oracles) ---
        "pricing_summary": ops.pricing_summary_exact,
        "revenue_by_segment": ops.revenue_by_segment_exact,
        "top_orders": lambda sf: ops.top_orders(sf),
        "events_hourly": ops.events_hourly_exact,
        "sessionize": lambda sf: ops.sessionize(sf),
        "event_type_stats": ops.event_type_stats_exact,
        "lang_count": ops.lang_count,
        # --- text analysis over documents (SQL oracles) ---
        "token_count": ops.token_count,
        "quality_score": ops.quality_score_exact,
        "doc_fingerprint": ops.doc_fingerprint,
        "exact_dedup": ops.exact_dedup,
        # --- similarity / dedup (rows-only or SQL where expressible) ---
        "knn_bruteforce": lambda sf: ops.knn_bruteforce(sf),
        "ann_lsh_buckets": lambda sf: ops.ann_lsh_buckets(sf),
        "dedup_minhash": lambda sf: ops.minhash_candidates(sf),
        "dedup_ngram_jaccard": lambda sf: ops.ngram_jaccard_verify(sf),
        "dedup_simhash": ops.simhash_table,
        "lang_id": ops.lang_id,
        "multimodal_features": ops.multimodal_features,
        # --- the KG-construction engine over transcripts (rows-only:
        #     transcripts are synthesised outside the DuckDB views) ---
        "turns_restore_order": turns_restore_order,
        "kg_majority_vote": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["majority_vote_table"]).majority_vote_table(
                _turns_ds(sf), _workdir(sf)),
        "kg_mentions": kg_mentions,
        "kg_ner": kg_ner,
        "kg_triples": kg_triples,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_base_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT))
                        AS BIGINT) AS sum_disc_price_cents,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_segment": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_revenue_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
            ORDER BY c.c_mktsegment
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_value_mil
            FROM events
            GROUP BY user_id, date_trunc('hour', ts)
            ORDER BY user_id, window_start
        """,
        "sessionize": """
            WITH d AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts, event_id,
                     CAST(sum(new_s) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_id
              FROM d
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM s GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "event_type_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_value_mil,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "lang_count": """
            SELECT lang, count(*) AS n FROM documents
            GROUP BY lang ORDER BY lang
        """,
        "token_count": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+'))
                       AS n_tokens
            FROM documents WHERE length(trim(text)) > 0
        """,
        "quality_score": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_split_to_array(trim(text), '\\s+'))
                       AS n_tokens,
                   CAST(floor(length(regexp_replace(text, '\\s+', '', 'g'))
                              * 1000000.0
                              / len(regexp_split_to_array(trim(text),
                                                          '\\s+')))
                        AS BIGINT) AS mean_token_len_micro,
                   CAST(floor(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                              * 1000000.0 / length(text)) AS BIGINT)
                       AS upper_ratio_micro
            FROM documents WHERE length(trim(text)) > 0
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qe
                       FROM embeddings ORDER BY vec_id LIMIT 8),
            ranked AS (
              SELECT q.qid AS query_id, e.vec_id,
                     CAST(round(list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), q.qe) * 1000000)
                          AS BIGINT) AS sim_micro,
                     row_number() OVER (
                         PARTITION BY q.qid
                         ORDER BY round(list_cosine_similarity(
                             CAST(e.embedding AS DOUBLE[]), q.qe) * 1000000)
                             DESC, e.vec_id) AS rank
              FROM embeddings e CROSS JOIN q)
            SELECT query_id, rank, vec_id, sim_micro
            FROM ranked WHERE rank <= 10
            ORDER BY query_id, rank
        """,
    }
