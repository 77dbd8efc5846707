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


# corpus-unigram-LM scoring CTE chain ending in
# scores(doc_id, n_tokens, lm_score_micro) — shared by the
# unigram_lm_score and ccnet_buckets oracles so the two stay identical
_UNIGRAM_LM_CORE = """toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(tk) AS w FROM toks
            ), cnt AS (
              SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w
            ), n AS (
              SELECT CAST(count(*) AS BIGINT) AS n FROM w
            ), per AS (
              SELECT w.doc_id, ((n.n * 1000000) // c.c) AS ip
              FROM w JOIN cnt c ON w.w = c.w CROSS JOIN n
            ), scores AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(ip) // count(*) AS BIGINT)
                         AS lm_score_micro
              FROM per GROUP BY doc_id
            )"""


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

    def kg_crowd_mentions(sf_dir):
        # reference get_crowd_data counterpart (analysis.py:213-301):
        # load crowd span annotations (deterministic synthetic crowd
        # file in the reference's JSON layout) onto the turns by exact
        # text match + char_span conversion.  Rows-only check: the
        # char->token conversion needs the engine tokeniser, which SQL
        # can't express; the exact round-trip vs gold_spans is pytest
        # (tests/test_crowd.py).
        from weak_supervision_for_ner_ray.sources.crowd import (
            crowd_mentions, synth_crowd_json)
        path = synth_crowd_json(_corpus(sf_dir))
        return crowd_mentions(_turns_ds(sf_dir), path) \
            .sort(["conv_id", "turn_idx", "start", "end"])

    def turns_restore_order(sf_dir):
        # per-turn text equality invariant surface: restore stable order
        import ray.data as rd
        ds = _turns_ds(sf_dir)
        return ds.sort(["conv_id", "turn_idx"])

    return {
        # --- relational / streaming over provided tables (SQL oracles) ---
        "pricing_summary": ops.pricing_summary_exact,
        "revenue_by_segment": ops.revenue_by_segment_exact,
        "revenue_by_segment_join": ops.revenue_by_segment_join,
        "top_orders": lambda sf: ops.top_orders(sf),
        "events_hourly": ops.events_hourly_exact,
        "events_sliding_window": lambda sf: ops.events_sliding_window(sf),
        "sessionize": lambda sf: ops.sessionize(sf),
        "asof_join": lambda sf: ops.asof_join(sf),
        "range_join": lambda sf: ops.range_join(sf),
        "topk_by_group": lambda sf: ops.topk_by_group(sf),
        "percentile_by_group": lambda sf: ops.percentile_by_group(sf),
        "event_type_stats": ops.event_type_stats_exact,
        "lang_count": ops.lang_count,
        # --- text analysis over documents (SQL oracles) ---
        "token_count": ops.token_count,
        "token_count_bpe": ops.token_count_bpe,
        "distinct_token_kmv": lambda sf: ops.distinct_token_kmv(sf),
        "distinct_token_kmv_by_lang":
            lambda sf: ops.distinct_token_kmv_by_lang(sf),
        "quality_score": ops.quality_score_exact,
        "doc_fingerprint": ops.doc_fingerprint,
        "doc_fingerprint_rolling": lambda sf: ops.doc_fingerprint_rolling(sf),
        "sample_hash": lambda sf: ops.sample_hash(sf),
        "train_shards": lambda sf: ops.train_shards(sf),
        "exact_dedup": ops.exact_dedup,
        "dedup_cdc_chunks": lambda sf: ops.dedup_cdc_chunks(sf),
        "ngram_topk": lambda sf: ops.ngram_topk(sf),
        "anti_join": lambda sf: ops.anti_join(sf),
        "rollup_lang_source": lambda sf: ops.rollup_lang_source(sf),
        "stratified_sample": lambda sf: ops.stratified_sample(sf),
        "dataset_mix": lambda sf: ops.dataset_mix(sf),
        "tfidf_topk": lambda sf: ops.tfidf_topk(sf),
        "inverted_index": lambda sf: ops.inverted_index(sf),
        "pivot_doc_langs": lambda sf: ops.pivot_doc_langs(sf),
        "pack_sequences": lambda sf: ops.pack_sequences(sf),
        "decontaminate": lambda sf: ops.decontaminate(sf),
        "gopher_quality": lambda sf: ops.gopher_quality(sf),
        "repetition_ngrams": lambda sf: ops.repetition_ngrams(sf),
        "dup_passages": lambda sf: ops.dup_passages(sf),
        "unigram_lm_score": lambda sf: ops.unigram_lm_score(sf),
        "bm25_topk": lambda sf: ops.bm25_topk(sf),
        # iterative graph analytics over the derived supplier—part graph
        # (integer-micros grid -> exact unrolled-CTE SQL oracle)
        "pagerank": lambda sf: ops.pagerank(sf),
        "degree_distribution": lambda sf: ops.degree_distribution(sf),
        "butterfly_count": lambda sf: ops.butterfly_count(sf),
        "semi_join_bloom": lambda sf: ops.semi_join_bloom(sf),
        "running_total": lambda sf: ops.running_total(sf),
        "chunk_text": lambda sf: ops.chunk_text(sf),
        "bigram_lift": lambda sf: ops.bigram_lift(sf),
        "cooccur_pmi": lambda sf: ops.cooccur_pmi(sf),
        "bpe_pair_counts": lambda sf: ops.bpe_pair_counts(sf),
        # iterative argmax + rewrite: rows-only driver check (no SQL
        # oracle); brute-force reference parity is pinned in pytest
        "bpe_train": lambda sf: ops.bpe_train(sf),
        "bpe_token_count": lambda sf: ops.bpe_token_count(sf),
        "interarrival_stats": lambda sf: ops.interarrival_stats(sf),
        "histogram_numeric": lambda sf: ops.histogram_numeric(sf),
        "skyline": lambda sf: ops.skyline(sf),
        "snapshot_diff": lambda sf: ops.snapshot_diff(sf),
        "customer_ltv": lambda sf: ops.customer_ltv(sf),
        "funnel_stages": lambda sf: ops.funnel_stages(sf),
        "bfs_hops": lambda sf: ops.bfs_hops(sf),
        "part_fuzzy_match": lambda sf: ops.part_fuzzy_match(sf),
        "json_props_extract": lambda sf: ops.json_props_extract(sf),
        "hll_distinct": lambda sf: ops.hll_distinct(sf),
        "countmin_sketch": lambda sf: ops.countmin_sketch(sf),
        "containment_pairs": lambda sf: ops.containment_pairs(sf),
        "quantile_global": lambda sf: ops.quantile_global(sf),
        "ccnet_buckets": lambda sf: ops.ccnet_buckets(sf),
        "corpus_curate": lambda sf: ops.corpus_curate(sf),
        "corpus_stats": lambda sf: ops.corpus_stats(sf),
        "supplier_similarity": lambda sf: ops.supplier_similarity(sf),
        # ordered per-conversation flattening into training documents
        # (the turns oracle path: string_agg ORDER BY turn_idx)
        "conv_flatten": lambda sf: ops.conv_flatten(_turns_ds(sf)),
        # --- similarity / dedup (rows-only or SQL where expressible) ---
        "knn_bruteforce": lambda sf: ops.knn_bruteforce(sf),
        "knn_graph": lambda sf: ops.knn_graph(sf),
        "ann_lsh_buckets": lambda sf: ops.ann_lsh_buckets(sf),
        "dedup_embedding": lambda sf: ops.dedup_embedding_cosine(sf),
        # strategy="ids" exercises the 100 TB candidates-then-verify
        # shuffle in the hash-checked gate (identical pairs to
        # "replicate" by construction; the oracle is all-pairs SQL)
        "dedup_embedding_lsh":
            lambda sf: ops.dedup_embedding_lsh(sf, strategy="ids"),
        "semantic_dedup": lambda sf: ops.semantic_dedup(sf),
        "ann_lsh_query": lambda sf: ops.ann_lsh_query(sf),
        "kmeans_ivf_assign": lambda sf: ops.kmeans_ivf_assign(sf),
        "ivf_query": lambda sf: ops.ivf_query(sf),
        "pq_codes": lambda sf: ops.pq_codes(sf),
        "pq_query": lambda sf: ops.pq_query(sf),
        "ivfpq_query": lambda sf: ops.ivfpq_query(sf),
        "dedup_minhash": lambda sf: ops.minhash_candidates(sf),
        "dedup_clusters": lambda sf: ops.dedup_clusters(sf),
        "dedup_keep_best": lambda sf: ops.dedup_keep_best(sf),
        "dedup_apply": lambda sf: ops.dedup_apply(sf),
        "dedup_ngram_jaccard": lambda sf: ops.ngram_jaccard_verify(sf),
        "dedup_simhash": ops.simhash_table,
        "lang_id": ops.lang_id,
        "multimodal_features": ops.multimodal_features,
        "multimodal_frame_sample": lambda sf: ops.multimodal_frame_sample(sf),
        "multimodal_audio_features":
            lambda sf: ops.multimodal_audio_features(sf),
        "multimodal_video_frames":
            lambda sf: ops.multimodal_video_frames(sf),
        # --- the KG-construction engine over transcripts (rows-only:
        #     transcripts are synthesised outside the DuckDB views) ---
        "turns_restore_order": turns_restore_order,
        "kg_majority_vote": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["majority_vote_table"]).majority_vote_table(
                _turns_ds(sf), _workdir(sf)),
        "kg_snorkel": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["snorkel_table"]).snorkel_table(
                _turns_ds(sf), _workdir(sf)),
        # turn-level detector mentions: the SQL-expressible slice of the
        # LF bank, hash-checked against character-level DuckDB oracles
        # (breaks the kg-side oracle circularity)
        "mentions_date": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["detector_mentions"]).detector_mentions(
                _turns_ds(sf), "date_detector"),
        "mentions_time": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["detector_mentions"]).detector_mentions(
                _turns_ds(sf), "time_detector"),
        "mentions_money": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["detector_mentions"]).detector_mentions(
                _turns_ds(sf), "money_detector"),
        "mentions_number": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["detector_mentions"]).detector_mentions(
                _turns_ds(sf), "number_detector"),
        "mentions_legal": lambda sf: __import__(
            "weak_supervision_for_ner_ray.pipelines.kg",
            fromlist=["detector_mentions"]).detector_mentions(
                _turns_ds(sf), "legal_detector"),
        # numeric-PII scrub over turns (regexp count + replace, md5 of the
        # redacted text hash-checked against DuckDB regexp_replace)
        "pii_redact": lambda sf: ops.pii_redact(_turns_ds(sf)),
        "kg_mentions": kg_mentions,
        "kg_crowd_mentions": kg_crowd_mentions,
        "kg_ner": kg_ner,
        "kg_triples": kg_triples,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
    }


def _d2_expr(xref: str, cref: str) -> str:
    return (f"list_sum(list_transform(range(1, len({xref}) + 1), "
            f"i -> ({xref}[i] - {cref}[i]) * ({xref}[i] - {cref}[i])))")


_EMB_CTE = """e AS (
          SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                     v -> CAST(round(v * 1000000) AS BIGINT)) AS x
          FROM embeddings
        )"""


def _lloyd_ctes(k: int, iters: int, src: str = "e",
                sfx: str = "") -> list[str]:
    """Unrolled Lloyd's k-means CTEs over ``src`` (vec_id, x):
    c0{sfx}..c{iters}{sfx} centroid tables and afinal{sfx} = assignment
    under the trained centroids — exact because the engine lives on the
    integer-micros grid (int sums are order-free; centroid =
    round-half-away(S/n) on exact ints; distances are int64; ties
    argmin to the lowest cluster id)."""
    half_away = ("CAST(floor(abs(sv * 1.0 / n) + 0.5) * "
                 "(CASE WHEN sv < 0 THEN -1 ELSE 1 END) AS BIGINT)")
    d2 = _d2_expr("src.x", "c.c")

    def assign_cte(name: str, csrc: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, x, cid, d2 FROM (
            SELECT src.vec_id, src.x, c.cid, CAST({d2} AS BIGINT) AS d2,
                   row_number() OVER (PARTITION BY src.vec_id
                                      ORDER BY {d2}, c.cid) AS rk
            FROM {src} src CROSS JOIN {csrc} c)
          WHERE rk = 1
        )"""

    parts = [f"""c0{sfx} AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, x AS c
          FROM {src} ORDER BY vec_id LIMIT {k}
        )"""]
    for it in range(1, iters + 1):
        parts.append(assign_cte(f"a{it}{sfx}", f"c{it - 1}{sfx}"))
        parts.append(f"""u{it}{sfx} AS (
          SELECT cid, unnest(range(1, len(x) + 1)) AS dim,
                 unnest(x) AS val
          FROM a{it}{sfx}
        )""")
        parts.append(f"""s{it}{sfx} AS (
          SELECT cid, list({half_away} ORDER BY dim) AS c
          FROM (SELECT cid, dim, sum(val) AS sv, count(*) AS n
                FROM u{it}{sfx} GROUP BY cid, dim)
          GROUP BY cid
        )""")
        parts.append(f"""c{it}{sfx} AS (
          SELECT c{it - 1}{sfx}.cid, COALESCE(s{it}{sfx}.c,
                 c{it - 1}{sfx}.c) AS c
          FROM c{it - 1}{sfx} LEFT JOIN s{it}{sfx} USING (cid)
        )""")
    parts.append(assign_cte(f"afinal{sfx}", f"c{iters}{sfx}"))
    return parts


def _kmeans_ctes(k: int = 8, iters: int = 3) -> list[str]:
    """Shared unrolled Lloyd's k-means CTEs over the full vectors."""
    return [_EMB_CTE] + _lloyd_ctes(k, iters)


def _kmeans_sql(k: int = 8, iters: int = 3) -> str:
    return ("WITH " + ",\n".join(_kmeans_ctes(k, iters))
            + "\nSELECT vec_id, cid AS cluster_id, d2 FROM afinal "
              "ORDER BY vec_id")


def _semantic_dedup_sql(k: int = 8, iters: int = 3,
                        threshold_micro: int = 400_000) -> str:
    """SemDeDup keep rule: the unrolled-Lloyd assignment (afinal) plus a
    within-cell self-join on raw DOUBLE cosine — drop b iff a lower-id
    cell-mate is ≥ threshold (both halves hash-proven separately by
    kmeans_ivf_assign and dedup_embedding)."""
    parts = _kmeans_ctes(k, iters)
    parts.append("""ev AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )""")
    parts.append(f"""dup AS (
          SELECT DISTINCT b.vec_id AS bid
          FROM afinal a JOIN afinal b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN ev va ON va.vec_id = a.vec_id
          JOIN ev vb ON vb.vec_id = b.vec_id
          WHERE CAST(round(list_cosine_similarity(va.v, vb.v) * 1000000)
                     AS BIGINT) >= {threshold_micro}
        )""")
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT f.vec_id, f.cid AS cluster_id, "
              "CAST(CASE WHEN d.bid IS NULL THEN 1 ELSE 0 END AS BIGINT) "
              "AS keep "
              "FROM afinal f LEFT JOIN dup d ON f.vec_id = d.bid "
              "ORDER BY f.vec_id")


_PR_OFF = 1 << 32

# shared derived-graph CTEs: DISTINCT supplier—part pairs from lineitem,
# undirected edges (parts offset by 2^32), per-node degree
_GRAPH_CTES = [
    "pairs AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p "
    "FROM lineitem)",
    f"""und AS (
      SELECT CAST(s AS BIGINT) AS src, CAST(p + {_PR_OFF} AS BIGINT) AS dst
      FROM pairs
      UNION ALL
      SELECT CAST(p + {_PR_OFF} AS BIGINT) AS src, CAST(s AS BIGINT) AS dst
      FROM pairs
    )""",
    "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS dg "
    "FROM und GROUP BY src)",
]


def _degree_sql() -> str:
    joined = ",\n".join(_GRAPH_CTES)
    return f"""WITH {joined}
        SELECT CASE WHEN node >= {_PR_OFF} THEN 'part' ELSE 'supplier' END
                   AS kind,
               dg AS deg, CAST(count(*) AS BIGINT) AS n
        FROM deg GROUP BY kind, dg
        ORDER BY kind, deg"""


def _pagerank_sql(iters: int = 3) -> str:
    """Unrolled integer-micros PageRank over the undirected bipartite
    supplier—part graph (DISTINCT lineitem pairs; parts offset by 2^32).
    Pure int64 arithmetic — ``//`` on positive BIGINTs floor-divides
    identically in DuckDB and numpy — so an ITERATIVE graph algorithm
    hash-matches the engine exactly (the k-means oracle trick)."""
    off = _PR_OFF
    ctes = _GRAPH_CTES + [
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS (
          SELECT u.dst AS node,
                 CAST(150000 + sum((r.r * 850000) // (d.dg * 1000000))
                      AS BIGINT) AS r
          FROM und u
          JOIN r{i - 1} r ON u.src = r.node
          JOIN deg d ON u.src = d.node
          GROUP BY u.dst
        )""")
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
        SELECT CASE WHEN node >= {off} THEN 'part' ELSE 'supplier' END
                   AS kind,
               CAST(CASE WHEN node >= {off} THEN node - {off}
                         ELSE node END AS BIGINT) AS node_key,
               r AS rank_micro
        FROM r{iters}
        ORDER BY kind, node_key"""


def _ivf_query_sql(k: int = 8, iters: int = 3, n_queries: int = 8,
                   nprobe: int = 2, topk: int = 10) -> str:
    """IVF probe on top of the k-means CTEs: nprobe nearest cells per
    query, exact int64 top-k within the probed cells (ties by vec_id)."""
    parts = _kmeans_ctes(k, iters)
    qc_d2 = _d2_expr("q.qx", "c.c")
    r_d2 = _d2_expr("q.qx", "cand.x")
    parts.append(f"""q AS (
          SELECT vec_id AS qid, x AS qx FROM e
          ORDER BY vec_id LIMIT {n_queries}
        )""")
    parts.append(f"""qc AS (
          SELECT qid, cid FROM (
            SELECT q.qid, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                                      ORDER BY {qc_d2}, c.cid) AS rk
            FROM q CROSS JOIN c{iters} c)
          WHERE rk <= {nprobe}
        )""")
    parts.append("""cand AS (
          SELECT qc.qid, a.vec_id, a.x
          FROM qc JOIN afinal a ON a.cid = qc.cid
        )""")
    parts.append(f"""r AS (
          SELECT cand.qid AS query_id, cand.vec_id,
                 CAST({r_d2} AS BIGINT) AS d2,
                 row_number() OVER (PARTITION BY cand.qid
                                    ORDER BY {r_d2}, cand.vec_id) AS rank
          FROM cand JOIN q ON q.qid = cand.qid
        )""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT query_id, rank, vec_id, d2 FROM r "
              f"WHERE rank <= {topk} ORDER BY query_id, rank")


def _pq_ctes(m: int, k: int, iters: int) -> list[str]:
    """Product-quantization CTEs: m independent Lloyd's runs, one per
    subspace slice.  Slice bounds derive from len(x) in SQL, so the
    oracle needs no knowledge of the embedding dimensionality."""
    parts = [_EMB_CTE]
    for j in range(m):
        lo = f"({j} * (len(x) // {m}) + 1)"
        hi = f"(({j + 1}) * (len(x) // {m}))"
        parts.append(f"""es_{j} AS (
          SELECT vec_id, x[{lo}:{hi}] AS x FROM e
        )""")
    for j in range(m):
        parts += _lloyd_ctes(k, iters, src=f"es_{j}", sfx=f"_s{j}")
    return parts


def _pq_codes_sql(m: int = 4, k: int = 8, iters: int = 2) -> str:
    parts = _pq_ctes(m, k, iters)
    sel = ", ".join(f"a_s{j}.cid AS code_{j}" for j in range(m))
    joins = " ".join(f"JOIN afinal_s{j} a_s{j} USING (vec_id)"
                     for j in range(m))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT e.vec_id, {sel} FROM e {joins} ORDER BY vec_id")


def _pq_query_sql(m: int = 4, k: int = 8, iters: int = 2,
                  n_queries: int = 8, topk: int = 10) -> str:
    """ADC search on the PQ codes: the approximate distance is the sum
    over subspaces of d2(query slice, assigned centroid) — identical
    int64 arithmetic to the engine's table lookups."""
    parts = _pq_ctes(m, k, iters)
    parts.append(f"""q AS (
          SELECT vec_id AS qid, x AS qx FROM e
          ORDER BY vec_id LIMIT {n_queries}
        )""")
    d2_terms = []
    for j in range(m):
        lo = f"({j} * (len(q.qx) // {m}) + 1)"
        hi = f"(({j + 1}) * (len(q.qx) // {m}))"
        d2_terms.append(_d2_expr(f"(q.qx[{lo}:{hi}])", f"cc{j}.c"))
    joins = ["FROM q CROSS JOIN afinal_s0 a_s0"]
    for j in range(1, m):
        joins.append(f"JOIN afinal_s{j} a_s{j} "
                     f"ON a_s{j}.vec_id = a_s0.vec_id")
    for j in range(m):
        joins.append(f"JOIN c{iters}_s{j} cc{j} ON cc{j}.cid = a_s{j}.cid")
    parts.append(f"""adc AS (
          SELECT q.qid, a_s0.vec_id,
                 CAST({' + '.join(d2_terms)} AS BIGINT) AS adc_d2
          {' '.join(joins)}
        )""")
    parts.append("""r AS (
          SELECT qid AS query_id, vec_id, adc_d2,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY adc_d2, vec_id) AS rank
          FROM adc
        )""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT query_id, rank, vec_id, adc_d2 FROM r "
              f"WHERE rank <= {topk} ORDER BY query_id, rank")


def _ivfpq_query_sql(k_coarse: int = 8, coarse_iters: int = 3,
                     m: int = 4, k: int = 8, iters: int = 2,
                     n_queries: int = 8, nprobe: int = 2,
                     topk: int = 10) -> str:
    """IVF-PQ oracle: the coarse Lloyd CTEs (cell assignment) composed
    with the per-subspace PQ CTEs; candidates filter to the probed
    cells, rank by the summed subspace ADC distances."""
    parts = [_EMB_CTE] + _lloyd_ctes(k_coarse, coarse_iters)
    for j in range(m):
        lo = f"({j} * (len(x) // {m}) + 1)"
        hi = f"(({j + 1}) * (len(x) // {m}))"
        parts.append(f"""es_{j} AS (
          SELECT vec_id, x[{lo}:{hi}] AS x FROM e
        )""")
    for j in range(m):
        parts += _lloyd_ctes(k, iters, src=f"es_{j}", sfx=f"_s{j}")
    qc_d2 = _d2_expr("q.qx", "c.c")
    parts.append(f"""q AS (
          SELECT vec_id AS qid, x AS qx FROM e
          ORDER BY vec_id LIMIT {n_queries}
        )""")
    parts.append(f"""qc AS (
          SELECT qid, cid FROM (
            SELECT q.qid, c.cid,
                   row_number() OVER (PARTITION BY q.qid
                                      ORDER BY {qc_d2}, c.cid) AS rk
            FROM q CROSS JOIN c{coarse_iters} c)
          WHERE rk <= {nprobe}
        )""")
    d2_terms = []
    for j in range(m):
        lo = f"({j} * (len(q.qx) // {m}) + 1)"
        hi = f"(({j + 1}) * (len(q.qx) // {m}))"
        d2_terms.append(_d2_expr(f"(q.qx[{lo}:{hi}])", f"cc{j}.c"))
    joins = ["FROM q JOIN qc ON qc.qid = q.qid",
             "JOIN afinal a ON a.cid = qc.cid",
             "JOIN afinal_s0 a_s0 ON a_s0.vec_id = a.vec_id"]
    for j in range(1, m):
        joins.append(f"JOIN afinal_s{j} a_s{j} "
                     f"ON a_s{j}.vec_id = a.vec_id")
    for j in range(m):
        joins.append(f"JOIN c{iters}_s{j} cc{j} ON cc{j}.cid = a_s{j}.cid")
    parts.append(f"""adc AS (
          SELECT q.qid, a.vec_id,
                 CAST({' + '.join(d2_terms)} AS BIGINT) AS adc_d2
          {' '.join(joins)}
        )""")
    parts.append("""r AS (
          SELECT qid AS query_id, vec_id, adc_d2,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY adc_d2, vec_id) AS rank
          FROM adc
        )""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT query_id, rank, vec_id, adc_d2 FROM r "
              f"WHERE rank <= {topk} ORDER BY query_id, rank")


def _detector_sqls(turns_path: str) -> dict[str, str]:
    """DuckDB SQL oracles for the turn-level regex detectors
    (mentions_date/time/money/number/legal).

    The engine tokenises (tokenizer.py) then runs token-walk detectors
    (functions/detectors.py); this builds character-level RE2 patterns
    from the SAME constant sets that reproduce mentions exactly on the
    synthetic corpus's character repertoire (single-space tokens, no
    ordinal words, no '1st of May' genitive dates, no '12%%' compact
    percents — the generator emits none of those; the engine handles
    them, the SQL documents the subset it mirrors).  Exclusivity
    (number excludes date/time/money/legal spans, annotations.py:312)
    is expressed by REPLACING excluded spans before extraction — the
    character-level equivalent of the interval anti-join."""
    import re as _re

    from weak_supervision_for_ner_ray.constants import (
        CURRENCY_CODES, CURRENCY_SYMBOLS, DAYS, MAGNITUDES, MONTHS,
        ROMAN_NUMERALS, UNITS)

    def alt(items, word_guard=True):
        """Longest-first RE2 alternation; \\b appended to alternatives
        ending in a word char (so 'm' never eats into 'models')."""
        out = []
        for it in sorted(items, key=len, reverse=True):
            esc = _re.escape(it)
            if word_guard and it[-1].isalnum():
                esc += r"\b"
            out.append(esc)
        return "(?:" + "|".join(out) + ")"

    # token classes (single spaces between tokens in the corpus)
    num_tok = r"\d[A-Za-z0-9]*(?:\.[A-Za-z0-9]+)*"
    anynum_tok = r"[A-Za-z0-9]*\d[A-Za-z0-9]*(?:\.[A-Za-z0-9]+)*"
    dom = r"(?:3[01]|[12][0-9]|[1-9])"
    year = r"(?:19(?:2[1-9]|[3-9][0-9])|20(?:3[0-9]|[0-2][0-9]))"
    month = alt(MONTHS)
    day = (r"(?:" + "|".join(sorted((d for d in DAYS), key=len,
                                    reverse=True)) + r")s?\b")
    mag = alt(MAGNITUDES)
    units_no_mag = alt(UNITS - MAGNITUDES)     # the mag loop wins ties
    pct_words = alt({"percent", "percents", "percentage", "pct", "pc"})

    date_pat = (r"\b(?:"
                + dom + " " + month + " " + year
                + "|" + dom + " " + month
                + "|" + month + " " + dom + " " + year
                + "|" + month + " " + dom
                + "|" + month + " " + year
                + "|" + month
                + "|" + year + r"\b"
                + "|" + day
                + ")")
    ampm = r"(?:a\.m\.|p\.m\.|am\.|pm\.|am\b|pm\b)"
    time_pat = (r"\b(?:" + num_tok + " " + ampm
                + r"|\d{1,2}:\d{1,2})")
    cur = alt(CURRENCY_CODES | CURRENCY_SYMBOLS)
    money_tail = "(?: (?:" + mag + "|" + num_tok + r"))*"
    money_suffix = alt(CURRENCY_CODES | CURRENCY_SYMBOLS
                       | {"euros", "cents", "rubles"})
    money_pat = ("(?:" + cur + " ?" + num_tok + money_tail
                 + "(?: " + money_suffix + ")?"
                 + r"|\b" + num_tok + money_tail + " " + money_suffix
                 + ")")
    roman = alt(ROMAN_NUMERALS)
    legal_head = r"(?:Articles?|Paragraphs?|Sections?|Chapters?|§)"
    legal_ref = (legal_head + " (?:" + num_tok + "|" + roman + ")"
                 + "(?: (?:-|to|and) (?:" + num_tok + "|" + roman
                 + "))?")
    legal_name = (r"(?:[A-Z][A-Za-z0-9&'’.-]* )+"
                  + alt({"Law", "Agreement", "Act", "Bill",
                         "Constitution", "Directive", "Treaty", "Code",
                         "Reform", "Convention", "Resolution",
                         "Regulation", "Amendment", "Customs",
                         "Protocol", "Charter"}) + "s?")
    legal_pat = r"\b(?:" + legal_ref + "|" + legal_name + ")"
    ord_pat = (r"(?:\d{1,2}1st|\d{1,2}2nd|\d{1,3}th"
               r"|fourth|fifth|sixth|seventh)")
    number_pat = (r"\b(?:" + ord_pat + r"\b|" + anynum_tok
                  + "(?: " + mag + ")*"
                  + "(?: ?%| " + units_no_mag + "| " + pct_words + ")?)")
    exclude_pat = ("(?:" + legal_ref + "|" + money_pat + "|" + time_pat
                   + ")")
    # digit-bearing date spans, split by HOW they were built: merged
    # spans (day-month + year fused by merge_contiguous_spans) are
    # re-inserted at the END of the span dict, which breaks the
    # ascending-order assumption of the reference's _binary_search
    # (annotations.py:1318-1328 + 1351-1365) — so a standalone year
    # AFTER a merged date escapes the number exclusion.  The engine
    # replicates that reference quirk bit-for-bit; the SQL models it by
    # replacing lone years only BEFORE the first merged-date marker.
    merged_date = (r"\b(?:" + dom + " " + month + " " + year
                   + "|" + month + " " + dom + " " + year
                   + "|" + month + " " + year + r"\b)")
    lone_digit_date = (r"\b(?:" + dom + " " + month
                       + "|" + month + " " + dom
                       + "|" + year + r"\b)")

    def simple(pat, label):
        pat = pat.replace("'", "''")    # SQL string-literal escaping
        return f"""
        WITH m AS (
          SELECT conv_id, turn_idx,
                 unnest(regexp_extract_all(text, '{pat}')) AS mention
          FROM read_parquet('{turns_path}')
        )
        SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, mention,
               '{label}' AS label
        FROM m ORDER BY conv_id, turn_idx, mention
    """

    number_sql = f"""
        WITH s1 AS (
          SELECT conv_id, turn_idx,
                 regexp_replace(
                   regexp_replace(text, '{exclude_pat}', ' # ', 'g'),
                   '{merged_date}', ' @D@ ', 'g') AS t
          FROM read_parquet('{turns_path}')
        ), c AS (
          SELECT conv_id, turn_idx,
                 CASE WHEN strpos(t, '@D@') = 0
                      THEN regexp_replace(t, '{lone_digit_date}',
                                          ' # ', 'g')
                      ELSE regexp_replace(
                             substr(t, 1, strpos(t, '@D@') - 1),
                             '{lone_digit_date}', ' # ', 'g')
                           || substr(t, strpos(t, '@D@'))
                 END AS ctext
          FROM s1
        ), m AS (
          SELECT conv_id, turn_idx,
                 unnest(regexp_extract_all(ctext, '{number_pat}'))
                     AS mention
          FROM c
        )
        SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, mention,
               CASE
                 WHEN regexp_matches(mention, '^{ord_pat}$')
                   THEN 'ORDINAL'
                 WHEN regexp_matches(mention, '(?: ?%| {pct_words})$')
                   THEN 'PERCENT'
                 WHEN regexp_matches(mention, ' {units_no_mag}$')
                   THEN 'QUANTITY'
                 ELSE 'CARDINAL'
               END AS label
        FROM m ORDER BY conv_id, turn_idx, mention
    """

    return {
        "mentions_date": simple(date_pat, "DATE"),
        "mentions_time": simple(time_pat, "TIME"),
        "mentions_money": simple(money_pat, "MONEY"),
        "mentions_legal": simple(legal_pat, "LAW"),
        "mentions_number": number_sql,
    }


def oracle_sql() -> dict[str, str]:
    from weak_supervision_for_ner_ray.pipelines.ops import _STOPWORDS

    # language-id oracle: same stopword lists as the engine, same
    # first-on-tie argmax (ORDER BY n DESC, lang ASC) and the same
    # float64 floor(n * 1e6 / total) scoring
    lang_votes = "\n              UNION ALL ".join(
        "SELECT doc_id, '{lg}' AS lang, len(list_filter(tk, "
        "x -> list_contains([{words}], x))) AS n FROM toks".format(
            lg=lg, words=", ".join(f"'{w}'" for w in sorted(ws)))
        for lg, ws in sorted(_STOPWORDS.items()))
    lang_id_sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), v AS (
              {lang_votes}
        ), tot AS (
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS total
          FROM v GROUP BY doc_id
        ), best AS (
          SELECT v.doc_id, v.lang, v.n, t.total,
                 row_number() OVER (PARTITION BY v.doc_id
                                    ORDER BY v.n DESC, v.lang ASC) AS rk
          FROM v JOIN tot t ON v.doc_id = t.doc_id
        )
        SELECT doc_id,
               CASE WHEN total > 0 THEN lang ELSE 'und' END AS lang_pred,
               CASE WHEN total > 0
                    THEN CAST(floor(n * 1000000.0 / total) AS BIGINT)
                    ELSE 0 END AS score_micro
        FROM best WHERE rk = 1
    """

    # the transcripts corpus is synthesised deterministically under /tmp
    # (BASELINE.json input_hint).  oracle_sql() returns plain strings
    # with no per-call sf parameter, so the turns oracles read through
    # the /tmp/wsner_corpus/current symlink, which every engine query
    # repoints when it materialises its corpus — the driver runs a query
    # before comparing it, so the oracle always sees the same corpus the
    # query ran on, at ANY sf.  GRAFT_ORACLE_SF_DIR overrides; the
    # sf0.01 fallback only seeds the link when no query ran first.
    oracle_sf = os.environ.get("GRAFT_ORACLE_SF_DIR")
    if oracle_sf:
        corpus_path = _corpus(oracle_sf)
    else:
        link = "/tmp/wsner_corpus/current"
        if not os.path.exists(link):
            _corpus("/root/testdata/sf0.01")      # seeds the symlink
        corpus_path = link
    turns_path = os.path.join(corpus_path, "turns.parquet", "*.parquet")
    turns_sql = f"""
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM read_parquet('{turns_path}')
        ORDER BY conv_id, turn_idx
    """

    # simhash oracle: token hash = md5_number_lower (same md5-low-8-bytes
    # hash the engine uses); bit votes per doc, sign bits packed into a
    # signed int64 (engine reinterprets uint64 -> int64)
    simhash_sql = """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text),
                                                          '\\s+'),
                                    x -> x <> '')) AS w
          FROM documents
        ), h AS (
          SELECT doc_id, md5_number_lower(w) AS hv FROM toks
        ), bits AS (
          SELECT doc_id, b.b AS bit,
                 CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END AS sgn
          FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
        ), sc AS (
          SELECT doc_id, bit, sum(sgn) AS s FROM bits GROUP BY doc_id, bit
        ), v AS (
          SELECT doc_id,
                 sum(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << bit
                     ELSE CAST(0 AS HUGEINT) END) AS u
          FROM sc GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(CASE WHEN COALESCE(v.u, 0) >= 9223372036854775808
                         THEN COALESCE(v.u, 0) - 18446744073709551616
                         ELSE COALESCE(v.u, 0) END AS BIGINT) AS simhash
        FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
        ORDER BY d.doc_id
    """

    # LSH bucket oracle: the seeded hyperplane matrix W is materialised as
    # SQL literals so DuckDB computes the identical sign-bit buckets
    import numpy as np
    dim, n_planes = 64, 12
    W = np.random.default_rng(23).standard_normal((dim, n_planes))
    plane_terms = " + ".join(
        "(CASE WHEN list_dot_product(v, [{w}]) > 0 THEN {p} ELSE 0 END)"
        .format(w=", ".join(repr(float(x)) for x in W[:, j]), p=1 << j)
        for j in range(n_planes))
    ann_sql = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, CAST({plane_terms} AS BIGINT) AS bucket FROM e)
        SELECT bucket, count(*) AS n FROM b
        GROUP BY bucket ORDER BY bucket
    """

    # bucket-probe ANN oracle: same hyperplanes, global probe set =
    # query buckets ∪ their Hamming-1 neighbours, rank candidates by the
    # same rounded-micros similarity
    ann_query_sql = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({plane_terms} AS BIGINT) AS bucket
              FROM e),
        q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb
              FROM b ORDER BY vec_id LIMIT 8),
        probes AS (
          SELECT DISTINCT qb AS pb FROM q
          UNION
          SELECT DISTINCT CAST(xor(qb, 1 << j.j) AS BIGINT) AS pb
          FROM q CROSS JOIN (SELECT unnest(range({n_planes})) AS j) j
        ),
        cand AS (SELECT vec_id, v FROM b
                 WHERE bucket IN (SELECT pb FROM probes)),
        ranked AS (
          SELECT q.qid AS query_id, c.vec_id,
                 CAST(round(list_cosine_similarity(c.v, q.qv) * 1000000)
                      AS BIGINT) AS sim_micro,
                 row_number() OVER (
                     PARTITION BY q.qid
                     ORDER BY round(list_cosine_similarity(c.v, q.qv)
                                    * 1000000) DESC, c.vec_id) AS rank
          FROM cand c CROSS JOIN q)
        SELECT query_id, rank, vec_id, sim_micro
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank
    """

    # ngram-jaccard oracle: brute-force all-pairs true Jaccard over word
    # 3-gram sets (the engine's LSH candidate generation has ~1.0 recall at
    # threshold 0.7 with 128 perms / 32 bands, so verified pairs == all
    # true pairs on the deterministic corpus)
    ngram_sql = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), g AS (
          SELECT doc_id,
                 CASE WHEN len(tk) = 0 THEN []
                      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                      ELSE list_distinct(list_transform(
                          range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                 END AS grams
          FROM toks
        ), p AS (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 len(list_intersect(a.grams, b.grams)) AS li,
                 len(list_distinct(list_concat(a.grams, b.grams))) AS lu
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE len(a.grams) > 0 AND len(b.grams) > 0
        )
        SELECT a, b,
               CAST(floor(li * 1000000.0 / lu) AS BIGINT) AS jaccard_micro
        FROM p WHERE li * 1.0 / lu >= 0.7
        ORDER BY a, b
    """

    # minhash-LSH oracle: exact replica of the engine's signature pipeline
    # in SQL — shingle hash = md5_number_lower of the word 3-gram, permuted
    # hash = ((a*h) mod 2^64 + b) mod 2^64 mod (2^61-1) (UHUGEINT models
    # numpy's uint64 wraparound), per-perm min, 32 bands of 4 rows mixed by
    # the same multiply-add constant, then bucket self-join for pairs.
    # engine draws a then b from the same generator stream (seed 17)
    _rng = np.random.default_rng(17)
    mh_a = _rng.integers(1, (1 << 61) - 1, 128, dtype=np.uint64)
    mh_b = _rng.integers(0, (1 << 61) - 1, 128, dtype=np.uint64)
    W64 = 1 << 64
    MERS = (1 << 61) - 1
    MIXC = 0x9E3779B97F4A7C15
    a_lits = ", ".join(str(int(x)) for x in mh_a)
    b_lits = ", ".join(str(int(x)) for x in mh_b)
    minhash_sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), g AS (
          SELECT doc_id,
                 CASE WHEN len(tk) = 0 THEN [NULL]
                      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                      ELSE list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 END AS grams
          FROM toks
        ), h AS (
          SELECT doc_id, md5_number_lower(unnest(grams)) AS hv FROM g
        ), perms AS (
          SELECT unnest(range(128)) AS p,
                 unnest([{a_lits}]) AS pa, unnest([{b_lits}]) AS pb
        ), sig AS (
          SELECT doc_id, p,
                 COALESCE(min(CAST(
                     ((CAST(pa AS UHUGEINT) * hv) % {W64} + pb)
                     % {W64} % {MERS} AS UBIGINT)),
                     18446744073709551615) AS s
          FROM h CROSS JOIN perms GROUP BY doc_id, p
        ), piv AS (
          SELECT doc_id, CAST(p // 4 AS INTEGER) AS band_id,
                 max(CASE WHEN p % 4 = 0 THEN s END) AS s0,
                 max(CASE WHEN p % 4 = 1 THEN s END) AS s1,
                 max(CASE WHEN p % 4 = 2 THEN s END) AS s2,
                 max(CASE WHEN p % 4 = 3 THEN s END) AS s3
          FROM sig GROUP BY doc_id, p // 4
        ), banded AS (
          SELECT doc_id, band_id,
                 CAST((((((((CAST(s0 AS UHUGEINT) * {MIXC}) % {W64}
                            + s1) % {W64})
                       * {MIXC} % {W64} + s2) % {W64})
                       * {MIXC} % {W64} + s3) % {W64}) >> 1 AS BIGINT)
                     AS band_hash
          FROM piv
        ), ok AS (
          SELECT band_id, band_hash FROM banded
          GROUP BY band_id, band_hash
          HAVING count(DISTINCT doc_id) BETWEEN 2 AND 200
        ), pr AS (
          SELECT x.doc_id AS a, y.doc_id AS b, x.band_id
          FROM banded x
          JOIN banded y ON x.band_id = y.band_id
                       AND x.band_hash = y.band_hash
                       AND x.doc_id < y.doc_id
          JOIN ok o ON o.band_id = x.band_id
                   AND o.band_hash = x.band_hash
        )
        SELECT a, b, count(*) AS n_bands FROM pr
        GROUP BY a, b ORDER BY a, b
    """

    # duplicate clusters = connected components over the minhash pair
    # graph: the engine's distributed min-label propagation fixpoint is
    # exactly min(reachable node id), which a recursive CTE computes
    clusters_sql = f"""
        WITH RECURSIVE pairs AS ({minhash_sql}),
        nodes AS (SELECT a AS v FROM pairs UNION SELECT b FROM pairs),
        edges2 AS (SELECT a, b FROM pairs
                   UNION ALL SELECT b AS a, a AS b FROM pairs),
        reach (v, r) AS (
          SELECT v, v FROM nodes
          UNION
          SELECT rc.v, e.b FROM reach rc JOIN edges2 e ON e.a = rc.r
        )
        SELECT v AS doc_id, min(r) AS cluster_id FROM reach
        GROUP BY v ORDER BY doc_id
    """

    # cluster resolution: same components, then keep the longest doc per
    # cluster (ties -> lowest doc_id) via the engine's packed priority key
    # (n_chars << 33) | (2^33-1 - doc_id): max == longest-then-lowest-id
    keep_best_sql = f"""
        WITH RECURSIVE pairs AS ({minhash_sql}),
        nodes AS (SELECT a AS v FROM pairs UNION SELECT b FROM pairs),
        edges2 AS (SELECT a, b FROM pairs
                   UNION ALL SELECT b AS a, a AS b FROM pairs),
        reach (v, r) AS (
          SELECT v, v FROM nodes
          UNION
          SELECT rc.v, e.b FROM reach rc JOIN edges2 e ON e.a = rc.r
        ),
        cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach
               GROUP BY v)
        SELECT cl.cluster_id,
               arg_max(d.doc_id,
                       d.n_chars * 8589934592 + (8589934591 - d.doc_id))
                   AS keep_doc_id,
               CAST(max(d.n_chars) AS BIGINT) AS kept_n_chars,
               CAST(count(*) AS BIGINT) AS n_members
        FROM cl JOIN documents d USING (doc_id)
        GROUP BY cl.cluster_id ORDER BY cl.cluster_id
    """

    # end-to-end dedup APPLY: the surviving corpus — every document minus
    # non-representative duplicate-cluster members (clusters + keep rule
    # replayed from the same shared CTEs as dedup_clusters/keep_best)
    dedup_apply_sql = f"""
        WITH RECURSIVE pairs AS ({minhash_sql}),
        nodes AS (SELECT a AS v FROM pairs UNION SELECT b FROM pairs),
        edges2 AS (SELECT a, b FROM pairs
                   UNION ALL SELECT b AS a, a AS b FROM pairs),
        reach (v, r) AS (
          SELECT v, v FROM nodes
          UNION
          SELECT rc.v, e.b FROM reach rc JOIN edges2 e ON e.a = rc.r
        ),
        cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach
               GROUP BY v),
        keep AS (SELECT cl.cluster_id,
                        arg_max(d.doc_id,
                                d.n_chars * 8589934592
                                    + (8589934591 - d.doc_id))
                            AS keep_doc_id
                 FROM cl JOIN documents d USING (doc_id)
                 GROUP BY cl.cluster_id),
        dropped AS (SELECT doc_id FROM cl
                    WHERE doc_id NOT IN (SELECT keep_doc_id FROM keep))
        SELECT d.doc_id, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
        ORDER BY d.doc_id
    """

    # embedding-cosine near-dup: same integer-micros rounding as the knn
    # oracle; the >= filter compares the SAME integers on both sides
    emb_dedup_sql = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
        SELECT a.vec_id AS a, b.vec_id AS b,
               CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
                    AS BIGINT) AS sim_micro
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
                   AS BIGINT) >= 400000
        ORDER BY a, b
    """

    # full kNN graph: same DOUBLE cosine + micro rounding as emb_dedup;
    # row_number over (sim DESC, b ASC) replays the engine's composite
    # (micros, id) partition key exactly
    knn_graph_sql = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        s AS (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
                      AS BIGINT) AS sim_micro
          FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ), r AS (
          SELECT a, b, sim_micro,
                 row_number() OVER (PARTITION BY a
                                    ORDER BY sim_micro DESC, b) AS rk
          FROM s
        )
        SELECT a, CAST(rk AS BIGINT) AS rank, b, sim_micro
        FROM r WHERE rk <= 5 ORDER BY a, rank
    """

    detector_sqls = _detector_sqls(turns_path)

    # Gopher-style quality rules: thresholds injected from the engine's own
    # constants so both sides share one source of truth; '\\s' is RE2
    # ASCII whitespace = the engine's _ASCII_WS_RE class
    from weak_supervision_for_ner_ray.pipelines import ops as _ops
    gopher_sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), w AS (
          SELECT doc_id, unnest(tk) AS w FROM toks
        ), c AS (
          SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
        ), s AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                 CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(max(c) AS BIGINT) AS top_cnt
          FROM c GROUP BY doc_id
        ), l AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(tk,
                          x -> CAST(len(x) AS BIGINT))) AS BIGINT)
                     AS total_chars
          FROM toks WHERE len(tk) > 0
        )
        SELECT s.doc_id, s.n_words,
               (l.total_chars * 1000000) // s.n_words
                   AS mean_word_len_micro,
               ((s.n_words - s.n_distinct) * 1000000) // s.n_words
                   AS dup_word_frac_micro,
               (s.top_cnt * 1000000) // s.n_words AS top_word_frac_micro,
               CAST(CASE WHEN s.n_words >= {_ops._GOPHER_MIN_WORDS}
                          AND s.n_words <= {_ops._GOPHER_MAX_WORDS}
                          AND (l.total_chars * 1000000) // s.n_words
                              BETWEEN {_ops._GOPHER_MEAN_LEN_LO}
                                  AND {_ops._GOPHER_MEAN_LEN_HI}
                          AND ((s.n_words - s.n_distinct) * 1000000)
                              // s.n_words <= {_ops._GOPHER_DUP_FRAC_MAX}
                          AND (s.top_cnt * 1000000) // s.n_words
                              <= {_ops._GOPHER_TOP_FRAC_MAX}
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM s JOIN l ON s.doc_id = l.doc_id
        ORDER BY s.doc_id
    """

    # within-doc 3-gram repetition: grams joined on chr(31) (not a
    # whitespace char, so the join is unambiguous for split tokens);
    # DuckDB 1-based inclusive list indexing makes range(1, len-1) the
    # i, i+1, i+2 window starts — n_words - 2 grams, same count as the
    # engine's factorized-codes kernel
    repetition_sql = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(tk) - 1),
                        i -> tk[i] || chr(31) || tk[i + 1]
                             || chr(31) || tk[i + 2])) AS gram
          FROM toks WHERE len(tk) >= 3
        ), c AS (
          SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
        ), s AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                 CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(max(c) AS BIGINT) AS top_cnt
          FROM c GROUP BY doc_id
        )
        SELECT doc_id, n_grams,
               ((n_grams - n_distinct) * 1000000) // n_grams
                   AS dup_gram_frac_micro,
               (top_cnt * 1000000) // n_grams AS top_gram_frac_micro
        FROM s ORDER BY doc_id
    """

    # exact duplicate passages: the oracle evaluates the engine's exact
    # two-level Horner (per-token over codepoints via list_reduce, then
    # the k-token window unrolled below) so window identity — not a
    # proxy — is compared; same integer-ppm grid as the other quality ops
    _dp_k = 8
    _dp_horner = "h[i]"
    for _t in range(1, _dp_k):
        _dp_horner = (f"(({_dp_horner} * {_ops._PASS_Q} + h[i+{_t}]) "
                      f"% {_ops._PASS_P})")
    dup_passages_sql = f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text,
                             '[\\t\\n\\f\\r ]+'), x -> x <> '') AS ts
          FROM documents
        ), th AS (
          SELECT doc_id,
                 list_transform(ts, tok -> list_reduce(
                     list_prepend(0::BIGINT,
                         list_transform(range(1, length(tok) + 1),
                             i -> unicode(substr(tok, i::INT,
                                                 1))::BIGINT)),
                     (a, b) -> (a * {_ops._PASS_B} + b)
                               % {_ops._PASS_P})) AS h,
                 len(ts) AS n
          FROM tk
        ), w AS (
          SELECT doc_id, {_dp_horner} AS wh
          FROM (SELECT doc_id, h,
                       unnest(range(1, n - {_dp_k} + 2)) AS i
                FROM th) u
        ), c AS (
          SELECT wh, count(*) AS cnt FROM w GROUP BY wh
        )
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(coalesce(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0
                                 END), 0) AS BIGINT) AS n_dup_windows,
               CAST((coalesce(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0
                                  END), 0) * 1000000) // count(*)
                    AS BIGINT) AS dup_ppm
        FROM w JOIN c USING (wh)
        GROUP BY w.doc_id ORDER BY w.doc_id
    """

    # numeric-PII scrub: the oracle verifies the REPLACED text via md5,
    # not just the count — the shared pattern is RE2 ∩ Python-re safe
    pii_sql = f"""
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               CAST(len(regexp_extract_all(text,
                        '{_ops._PII_PATTERN}')) AS BIGINT) AS n_redactions,
               md5(regexp_replace(text, '{_ops._PII_PATTERN}',
                                  '{_ops._PII_TOKEN}', 'g'))
                   AS redacted_md5
        FROM read_parquet('{turns_path}')
        WHERE regexp_matches(text, '{_ops._PII_PATTERN}')
        ORDER BY conv_id, turn_idx
    """

    # ordered per-conversation flattening: string_agg ORDER BY turn_idx
    # verifies order, separator and payload via the flat-doc md5
    conv_flatten_sql = f"""
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(length(string_agg(role || ': ' || text, chr(10)
                                      ORDER BY turn_idx)) AS BIGINT)
                   AS n_chars,
               md5(string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx)) AS doc_md5
        FROM read_parquet('{turns_path}')
        GROUP BY conv_id ORDER BY conv_id
    """

    return {
        "lang_id": lang_id_sql,
        "turns_restore_order": turns_sql,
        "conv_flatten": conv_flatten_sql,
        **detector_sqls,
        "pii_redact": pii_sql,
        "gopher_quality": gopher_sql,
        "repetition_ngrams": repetition_sql,
        "dup_passages": dup_passages_sql,
        # corpus-unigram-LM scoring: integer mean inverse probability
        # (see ops.unigram_lm_score — float-log-free so it hash-matches)
        "unigram_lm_score": f"""
            WITH {_UNIGRAM_LM_CORE}
            SELECT doc_id, n_tokens, lm_score_micro
            FROM scores ORDER BY doc_id
        """,
        # CCNet-style tertile bucketing over the same LM scores; the
        # 1/3 and 2/3 literals are Python float reprs, so quantile_disc
        # computes the identical double product the engine's fold uses
        "ccnet_buckets": f"""
            WITH {_UNIGRAM_LM_CORE}, b AS (
              SELECT quantile_disc(lm_score_micro,
                                   0.3333333333333333) AS b1,
                     quantile_disc(lm_score_micro,
                                   0.6666666666666666) AS b2
              FROM scores
            ), tagged AS (
              SELECT s.n_tokens, s.lm_score_micro,
                     CASE WHEN s.lm_score_micro <= b.b1 THEN 'head'
                          WHEN s.lm_score_micro <= b.b2 THEN 'middle'
                          ELSE 'tail' END AS bucket
              FROM scores s CROSS JOIN b
            )
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(min(lm_score_micro) AS BIGINT)
                       AS min_score_micro,
                   CAST(max(lm_score_micro) AS BIGINT)
                       AS max_score_micro
            FROM tagged GROUP BY bucket ORDER BY bucket
        """,
        # quality-family APPLY: Gopher keep ∧ not-CCNet-tail.  The
        # gopher rules are re-derived from the LM core's own toks/w CTEs
        # (identical definitions — one tokenisation source of truth);
        # thresholds injected from the engine constants, tertile
        # boundary = the same quantile_disc literal as ccnet_buckets
        "corpus_curate": f"""
            WITH {_UNIGRAM_LM_CORE}, gc AS (
              SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
            ), gs AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(max(c) AS BIGINT) AS top_cnt
              FROM gc GROUP BY doc_id
            ), gl AS (
              SELECT doc_id,
                     CAST(list_sum(list_transform(tk,
                              x -> CAST(len(x) AS BIGINT))) AS BIGINT)
                         AS total_chars
              FROM toks WHERE len(tk) > 0
            ), gq AS (
              SELECT gs.doc_id, gs.n_words,
                     CAST(CASE WHEN gs.n_words >= {_ops._GOPHER_MIN_WORDS}
                                AND gs.n_words <= {_ops._GOPHER_MAX_WORDS}
                                AND (gl.total_chars * 1000000) // gs.n_words
                                    BETWEEN {_ops._GOPHER_MEAN_LEN_LO}
                                        AND {_ops._GOPHER_MEAN_LEN_HI}
                                AND ((gs.n_words - gs.n_distinct) * 1000000)
                                    // gs.n_words <= {_ops._GOPHER_DUP_FRAC_MAX}
                                AND (gs.top_cnt * 1000000) // gs.n_words
                                    <= {_ops._GOPHER_TOP_FRAC_MAX}
                          THEN 1 ELSE 0 END AS BIGINT) AS keep
              FROM gs JOIN gl ON gs.doc_id = gl.doc_id
            ), b AS (
              SELECT quantile_disc(lm_score_micro,
                                   0.6666666666666666) AS b2
              FROM scores
            )
            SELECT g.doc_id, g.n_words, s.lm_score_micro
            FROM gq g JOIN scores s ON s.doc_id = g.doc_id CROSS JOIN b
            WHERE g.keep = 1 AND s.lm_score_micro <= b.b2
            ORDER BY g.doc_id
        """,
        # one-row fused corpus statistics (token split = the shared
        # ASCII-\\s convention)
        # coalesce(text,'') shares the engine's NULL-is-empty-doc
        # convention (ops.corpus_stats counts a NULL text in n_empty
        # with 0 chars; bare length(NULL) would drop the row instead)
        "corpus_stats": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN length(coalesce(text, '')) = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                   CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                       AS total_chars,
                   CAST(sum(len(list_filter(
                        regexp_split_to_array(coalesce(text, ''), '\\s+'),
                        x -> x <> ''))) AS BIGINT) AS total_tokens,
                   CAST(max(length(coalesce(text, ''))) AS BIGINT)
                       AS max_chars,
                   CAST(min(length(coalesce(text, ''))) AS BIGINT)
                       AS min_chars
            FROM documents
        """,
        # BM25 retrieval on the integer grid (idf_milli = (N*1000)//df,
        # floor-division tf saturation — see ops.bm25_topk); queries =
        # distinct first-6 tokens of the 3 lowest-doc_id docs, top-5
        "bm25_topk": """
            WITH doc AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), q AS (
              SELECT doc_id AS q_id, unnest(list_distinct(tk[1:6])) AS term
              FROM doc
              WHERE doc_id IN (SELECT doc_id FROM documents
                               ORDER BY doc_id LIMIT 3)
            ), w AS (
              SELECT doc_id, unnest(tk) AS w FROM doc
            ), tf AS (
              SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
              FROM w GROUP BY doc_id, w
            ), dl AS (
              SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM doc
              WHERE len(tk) > 0
            ), stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     (CAST(sum(dl) AS BIGINT) * 1000000) // count(*)
                         AS avgdl_micro
              FROM dl
            ), df AS (
              SELECT t.w AS term, CAST(count(*) AS BIGINT) AS df
              FROM tf t WHERE t.w IN (SELECT DISTINCT term FROM q)
              GROUP BY t.w
            ), c AS (
              SELECT q.q_id, tf.doc_id,
                     ((stats.n * 1000) // df.df) *
                     (tf.tf * (1200000 + 1000000)) //
                     (tf.tf * 1000000 +
                      (1200000 * ((1000000 - 750000) +
                        (750000 * ((dl.dl * 1000000000000)
                                   // stats.avgdl_micro)) // 1000000))
                          // 1000000) AS contrib
              FROM q JOIN tf ON tf.w = q.term
                     JOIN dl ON dl.doc_id = tf.doc_id
                     JOIN df ON df.term = q.term
                     CROSS JOIN stats
            ), s AS (
              SELECT q_id, doc_id, CAST(sum(contrib) AS BIGINT)
                         AS score_milli
              FROM c GROUP BY q_id, doc_id
            ), r AS (
              SELECT q_id, doc_id, score_milli,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY score_milli DESC,
                                                 doc_id) AS rnk
              FROM s
            )
            SELECT q_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_milli
            FROM r WHERE rnk <= 5 ORDER BY q_id, rnk
        """,
        "pagerank": _pagerank_sql(),
        "degree_distribution": _degree_sql(),
        # butterfly (4-cycle) counting over the same bipartite graph:
        # distinct-edge self-join on the part key = the wedge pass
        "butterfly_count": """
            WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                       FROM lineitem),
            w AS (
              SELECT a.s AS s1, b.s AS s2,
                     CAST(count(*) AS BIGINT) AS shared_parts
              FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
              GROUP BY a.s, b.s HAVING count(*) >= 2
            )
            SELECT s1, s2, shared_parts,
                   shared_parts * (shared_parts - 1) // 2 AS butterflies
            FROM w ORDER BY s1, s2
        """,
        # ordered per-key window scan in exact integer cents
        "running_total": """
            SELECT o_orderkey, o_custkey,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
                        AS BIGINT) AS run_cents
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        # overlapping char-window chunking: every chunk boundary AND
        # payload verified (md5 of the exact substring; Python slicing
        # and DuckDB substring both count code points)
        "chunk_text": """
            WITH d AS (
              SELECT doc_id, text, length(text) AS n
              FROM documents WHERE length(text) > 0
            ), c AS (
              SELECT doc_id, text,
                     CASE WHEN n <= 512 THEN CAST(1 AS BIGINT)
                          ELSE (n - 512 + 383) // 384 + 1 END AS nc
              FROM d
            )
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   CAST(length(substring(text,
                                         CAST(1 + i * 384 AS BIGINT),
                                         512)) AS BIGINT) AS n_chars,
                   md5(substring(text, CAST(1 + i * 384 AS BIGINT), 512))
                       AS chunk_md5
            FROM c, LATERAL (SELECT unnest(range(nc)) AS i) t
            ORDER BY doc_id, chunk_idx
        """,
        # collocation lift: HUGEINT product // HUGEINT product mirrors
        # the engine's arbitrary-precision Python-int evaluation exactly
        "bigram_lift": """
            WITH toks AS (
              SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), grams AS (
              SELECT unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1])) AS ngram
              FROM toks WHERE len(t) >= 2
            ), cab AS (
              SELECT split_part(ngram, ' ', 1) AS a,
                     split_part(ngram, ' ', 2) AS b,
                     count(*) AS cnt
              FROM grams GROUP BY 1, 2
            ), la AS (SELECT a, sum(cnt) AS ca FROM cab GROUP BY a),
            rb AS (SELECT b, sum(cnt) AS cb FROM cab GROUP BY b),
            tot AS (SELECT sum(cnt) AS n FROM cab)
            SELECT CAST(row_number() OVER (ORDER BY lift_ppm DESC, a, b)
                        AS BIGINT) AS rnk,
                   a, b, CAST(cnt AS BIGINT) AS cnt, lift_ppm
            FROM (
              SELECT cab.a, cab.b, cab.cnt,
                     CAST((CAST(cab.cnt AS HUGEINT) * CAST(n AS HUGEINT)
                           * 1000000)
                          // (CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT))
                          AS BIGINT) AS lift_ppm
              FROM cab JOIN la USING (a) JOIN rb USING (b)
                   CROSS JOIN tot
              WHERE cab.cnt >= 5
            ) ORDER BY lift_ppm DESC, a, b LIMIT 50
        """,
        # windowed co-occurrence PMI: unordered least/greatest pairs at
        # filtered-token distances 1..window-1, unigram marginals,
        # HUGEINT integer grid mirroring the engine's bigint evaluation
        "cooccur_pmi": """
            WITH toks AS (
              SELECT row_number() OVER () AS doc,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), pos AS (
              SELECT doc, i, t[i] AS tok
              FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1))
                                  AS i) r
            ), uni AS (
              SELECT tok, count(*) AS cu FROM pos GROUP BY tok
            ), ntok AS (SELECT count(*) AS n_tok FROM pos),
            pairs AS (
              SELECT least(p.tok, q.tok) AS a,
                     greatest(p.tok, q.tok) AS b, count(*) AS cnt
              FROM pos p JOIN pos q
                ON p.doc = q.doc AND q.i > p.i AND q.i < p.i + 3
              GROUP BY 1, 2
            ), npair AS (SELECT sum(cnt) AS n_pairs FROM pairs)
            SELECT CAST(row_number() OVER (ORDER BY pmi_ppm DESC, a, b)
                        AS BIGINT) AS rnk,
                   a, b, CAST(cnt AS BIGINT) AS cnt, pmi_ppm
            FROM (
              SELECT pairs.a, pairs.b, pairs.cnt,
                     CAST((CAST(pairs.cnt AS HUGEINT)
                           * CAST(n_tok AS HUGEINT)
                           * CAST(n_tok AS HUGEINT) * 1000000)
                          // (CAST(ua.cu AS HUGEINT)
                              * CAST(ub.cu AS HUGEINT)
                              * CAST(n_pairs AS HUGEINT))
                          AS BIGINT) AS pmi_ppm
              FROM pairs JOIN uni ua ON pairs.a = ua.tok
                         JOIN uni ub ON pairs.b = ub.tok
                   CROSS JOIN ntok CROSS JOIN npair
              WHERE pairs.cnt >= 5
            ) ORDER BY pmi_ppm DESC, a, b LIMIT 50
        """,
        # BPE round 1: frequency-weighted adjacent character pairs over
        # the word-dict (overlap-inclusive — the Sennrich get_stats
        # contract), ties (lhs, rhs) ascending
        "bpe_pair_counts": """
            WITH toks AS (
              SELECT unnest(list_filter(
                       regexp_split_to_array(text, '\\s+'),
                       x -> x <> '')) AS word
              FROM documents
            ), w AS (
              SELECT word, count(*) AS cnt FROM toks GROUP BY word
            ), p AS (
              SELECT word[i] AS lhs, word[i + 1] AS rhs, cnt
              FROM w, LATERAL (SELECT unnest(range(1, length(word)))
                               AS i) t
            )
            SELECT CAST(row_number() OVER (ORDER BY cnt DESC, lhs, rhs)
                        AS BIGINT) AS rnk,
                   lhs, rhs, CAST(cnt AS BIGINT) AS cnt
            FROM (SELECT lhs, rhs, sum(cnt) AS cnt FROM p
                  GROUP BY lhs, rhs)
            ORDER BY cnt DESC, lhs, rhs LIMIT 50
        """,
        # per-user ordered lag() gaps in exact integer microseconds
        "interarrival_stats": """
            WITH g AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                         AS prev
              FROM events
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(prev) AS BIGINT) AS n_gaps,
                   CAST(coalesce(sum(ts_us - prev), 0) AS BIGINT)
                       AS sum_gap_us,
                   CAST(coalesce(max(ts_us - prev), 0) AS BIGINT)
                       AS max_gap_us
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        # ordered funnel progression: each stage strictly after the
        # previous stage's first qualifying event in (ts, event_id) order
        "funnel_stages": """
            WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ), u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(rn) AS r1 FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.rn) AS r2 FROM e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.rn > s1.r1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.rn) AS r3 FROM e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.rn > s2.r2
                   GROUP BY e.user_id)
            SELECT u.user_id,
                   CAST(CASE WHEN s3.r3 IS NOT NULL THEN 3
                             WHEN s2.r2 IS NOT NULL THEN 2
                             WHEN s1.r1 IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS n_stages,
                   coalesce(t1.ts_us, -1) AS t1_us,
                   coalesce(t2.ts_us, -1) AS t2_us,
                   coalesce(t3.ts_us, -1) AS t3_us
            FROM u
            LEFT JOIN s1 ON u.user_id = s1.user_id
            LEFT JOIN s2 ON u.user_id = s2.user_id
            LEFT JOIN s3 ON u.user_id = s3.user_id
            LEFT JOIN e t1 ON t1.user_id = u.user_id AND t1.rn = s1.r1
            LEFT JOIN e t2 ON t2.user_id = u.user_id AND t2.rn = s2.r2
            LEFT JOIN e t3 ON t3.user_id = u.user_id AND t3.rn = s3.r3
            ORDER BY u.user_id
        """,
        # shared-RE2 JSON field extraction (same pattern string on both
        # sides; both engines are RE2, so drops match identically)
        "json_props_extract": f"""
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM (SELECT event_type,
                         CAST(regexp_extract(props,
                              '{_ops._PROPS_PATTERN}', 1) AS BIGINT) AS k
                  FROM events
                  WHERE regexp_matches(props, '{_ops._PROPS_PATTERN}'))
            GROUP BY event_type ORDER BY event_type
        """,
        # asymmetric shingle containment with the stop-shingle cap
        # applied identically on both sides (HAVING df <= 50)
        "containment_pairs": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text),
                                                       '\\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), g AS (
              SELECT doc_id,
                     CASE WHEN len(tk) = 0 THEN []
                          WHEN len(tk) < 3
                               THEN [array_to_string(tk, ' ')]
                          ELSE list_distinct(list_transform(
                              range(1, len(tk) - 1),
                              i -> tk[i] || ' ' || tk[i+1] || ' '
                                   || tk[i+2]))
                     END AS grams
              FROM toks
            ), x AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            df AS (SELECT gram FROM x GROUP BY gram
                   HAVING count(*) <= 50),
            y AS (SELECT doc_id, gram FROM x JOIN df USING (gram)),
            sz AS (SELECT doc_id, count(*) AS s FROM y GROUP BY doc_id),
            it AS (SELECT a.doc_id AS a, b.doc_id AS b,
                          count(*) AS inter
                   FROM y a JOIN y b ON a.gram = b.gram
                                    AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
            SELECT it.a, it.b, inter, sa.s AS ca, sb.s AS cb,
                   inter * 1000000 // sa.s AS cont_a_micro,
                   inter * 1000000 // sb.s AS cont_b_micro
            FROM it JOIN sz sa ON it.a = sa.doc_id
                    JOIN sz sb ON it.b = sb.doc_id
            WHERE greatest(inter * 1000000 // sa.s,
                           inter * 1000000 // sb.s) >= 500000
            ORDER BY a, b
        """,
        # exact global quantiles on the integer-cents grid
        # (quantile_disc index rule, the percentile_by_group convention)
        "quantile_global": """
            WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                       AS cents FROM orders)
            SELECT CAST(500000 AS BIGINT) AS p_micro,
                   CAST(quantile_disc(cents, 0.5) AS BIGINT) AS cents
            FROM c
            UNION ALL
            SELECT 950000, CAST(quantile_disc(cents, 0.95) AS BIGINT)
            FROM c
            UNION ALL
            SELECT 990000, CAST(quantile_disc(cents, 0.99) AS BIGINT)
            FROM c
            ORDER BY p_micro
        """,
        # HyperLogLog: registers AND the float-free raw estimate are
        # integer-exact (generated trailing-zero CASE chain + HUGEINT
        # power table + arbitrary-precision numerator literal)
        "hll_distinct": f"""
            WITH toks AS (
              SELECT DISTINCT
                     unnest(list_filter(regexp_split_to_array(text,
                                                              '\\s+'),
                                        x -> x <> '')) AS w
              FROM documents
            ), h AS (SELECT md5_number_lower(w) AS hv FROM toks),
            rr AS (SELECT CAST(hv >> 56 AS BIGINT) AS bucket,
                          hv & CAST(72057594037927935 AS UBIGINT) AS rem
                   FROM h),
            rho AS (SELECT bucket,
                           CASE WHEN rem = 0 THEN 57 {" ".join(
                               f"WHEN rem % {1 << k} = {1 << (k - 1)} "
                               f"THEN {k}" for k in range(1, 57))}
                           END AS rho
                    FROM rr),
            regs AS (SELECT bucket, max(rho) AS reg FROM rho
                     GROUP BY bucket),
            full_regs AS (
              SELECT t.i AS bucket, coalesce(regs.reg, 0) AS reg
              FROM (SELECT unnest(range(256)) AS i) t
              LEFT JOIN regs ON regs.bucket = t.i
            )
            SELECT CAST(256 AS BIGINT) AS m,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_zero,
                   CAST(sum(reg) AS BIGINT) AS reg_sum,
                   CAST(CAST('{_ops._HLL_ALPHA_MICRO * _ops._HLL_M
                              * _ops._HLL_M * (1 << 64)}' AS HUGEINT)
                        // (1000000 * sum(CASE reg {" ".join(
                            f"WHEN {k} THEN CAST('{1 << (64 - k)}' "
                            f"AS HUGEINT)" for k in range(0, 58))} END))
                        AS BIGINT) AS est_raw
            FROM full_regs
        """,
        # Count-Min registers: 4 x 1024 integer counters over token
        # occurrences, row hash = md5_number_lower('r:' || token) % w
        "countmin_sketch": """
            WITH toks AS (
              SELECT unnest(list_filter(regexp_split_to_array(text,
                                                              '\\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), h AS (
              SELECT CAST(t.r AS BIGINT) AS rw,
                     CAST(md5_number_lower(CAST(t.r AS VARCHAR) || ':'
                                           || w) % 1024 AS BIGINT)
                         AS bucket
              FROM toks, LATERAL (SELECT unnest([0, 1, 2, 3]) AS r) t
            )
            SELECT rw, bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM h GROUP BY rw, bucket ORDER BY rw, bucket
        """,
        # single-source BFS hops; UNION (not ALL) dedups (node, d) pairs
        # so the depth-capped recursion stays bounded; min(d) = hop count
        "bfs_hops": """
            WITH RECURSIVE d AS (
              SELECT DISTINCT l_suppkey AS s,
                     l_partkey + 4294967296 AS p
              FROM lineitem
            ), e AS (
              SELECT s AS src, p AS dst FROM d
              UNION ALL SELECT p, s FROM d
            ), bfs(node, dd) AS (
              SELECT (SELECT min(l_suppkey) FROM lineitem), 0
              UNION
              SELECT e.dst, bfs.dd + 1 FROM bfs
              JOIN e ON e.src = bfs.node WHERE bfs.dd < 16
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(min(dd) AS BIGINT) AS hops
            FROM bfs GROUP BY node ORDER BY node
        """,
        # blocked fuzzy match on distinct names; DuckDB levenshtein is
        # the same unit-cost DP the engine implements
        "part_fuzzy_match": """
            WITH n AS (
              SELECT DISTINCT p_name AS nm,
                     split_part(p_name, ' ', 2) AS blk
              FROM part
            )
            SELECT a.nm AS a, b.nm AS b,
                   CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
            FROM n a JOIN n b ON a.blk = b.blk AND a.nm < b.nm
            WHERE levenshtein(a.nm, b.nm) <= 3
            ORDER BY a, b
        """,
        # neighbor-set Jaccard over distinct bipartite edges, floor'd
        # onto the integer-micros grid
        "supplier_similarity": """
            WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                       FROM lineitem),
            deg AS (SELECT s, count(*) AS d FROM e GROUP BY s),
            pairs AS (
              SELECT a.s AS s1, b.s AS s2, count(*) AS w
              FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
              GROUP BY a.s, b.s HAVING count(*) >= 2
            )
            SELECT s1, s2, CAST(w AS BIGINT) AS w,
                   CAST(w * 1000000 // (da.d + db.d - w) AS BIGINT)
                       AS jaccard_micro
            FROM pairs JOIN deg da ON pairs.s1 = da.s
                       JOIN deg db ON pairs.s2 = db.s
            ORDER BY s1, s2
        """,
        # 2-D max-max Pareto frontier on the integer grid; duplicate
        # frontier points survive (equal rows never dominate)
        "skyline": """
            WITH o AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                     epoch_us(o_orderdate) AS ts_us
              FROM orders
            )
            SELECT o_orderkey, cents, ts_us FROM o a
            WHERE NOT EXISTS (
              SELECT 1 FROM o b
              WHERE b.cents >= a.cents AND b.ts_us >= a.ts_us
                AND (b.cents > a.cents OR b.ts_us > a.ts_us)
            )
            ORDER BY o_orderkey
        """,
        # snapshot delta: A drops %11 keys, B drops %7 keys and reprices
        # %5 keys one dollar up; -1 marks the missing side
        "snapshot_diff": """
            WITH base AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ), a AS (
              SELECT * FROM base WHERE o_orderkey % 11 <> 0
            ), b AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 5 = 0 THEN cents + 100
                          ELSE cents END AS cents
              FROM base WHERE o_orderkey % 7 <> 0
            )
            SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   CASE WHEN a.o_orderkey IS NULL THEN 'added'
                        WHEN b.o_orderkey IS NULL THEN 'removed'
                        ELSE 'changed' END AS status,
                   coalesce(a.cents, -1) AS old_cents,
                   coalesce(b.cents, -1) AS new_cents
            FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
            WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
               OR a.cents <> b.cents
            ORDER BY o_orderkey
        """,
        # 3-table enrichment without a join operator; revenue in exact
        # per-lineitem-rounded cents (the pricing_summary convention)
        "customer_ltv": """
            WITH orev AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_extendedprice *
                                         (1 - l_discount) * 100)
                                   AS BIGINT)) AS BIGINT) AS rev
              FROM lineitem GROUP BY l_orderkey
            ), po AS (
              SELECT o.o_custkey, coalesce(orev.rev, 0) AS rev,
                     epoch_us(o.o_orderdate) AS ts
              FROM orders o
              LEFT JOIN orev ON o.o_orderkey = orev.l_orderkey
            )
            SELECT c.c_custkey, c.c_name, c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(rev) AS BIGINT) AS gross_cents,
                   CAST(max(ts) AS BIGINT) AS last_order_ts_us
            FROM po JOIN customer c ON po.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
            ORDER BY c.c_custkey
        """,
        # fixed-width histogram on the exact integer-cents grid
        "histogram_numeric": """
            WITH b AS (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2500000
                     AS bucket
              FROM orders
            )
            SELECT bucket, bucket * 2500000 AS lo_cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        # the bloom is only a prefilter — the verified output is the plain
        # semi-join, so the oracle is the plain semi-join
        "semi_join_bloom": """
            SELECT l.l_orderkey,
                   CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       AS price_cents
            FROM lineitem l
            WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderpriority = '1-URGENT')
            ORDER BY l.l_orderkey, l.l_linenumber
        """,
        "dedup_simhash": simhash_sql,
        "ann_lsh_buckets": ann_sql,
        "dedup_ngram_jaccard": ngram_sql,
        "dedup_minhash": minhash_sql,
        "dedup_clusters": clusters_sql,
        "dedup_keep_best": keep_best_sql,
        "dedup_apply": dedup_apply_sql,
        "dedup_embedding": emb_dedup_sql,
        "knn_graph": knn_graph_sql,
        "kmeans_ivf_assign": _kmeans_sql(),
        "ivf_query": _ivf_query_sql(),
        "pq_codes": _pq_codes_sql(),
        "pq_query": _pq_query_sql(),
        "ivfpq_query": _ivfpq_query_sql(),
        # the LSH-bucketed scale path must emit the IDENTICAL pair set
        # (recall 1.0 at these parameters on this corpus) — same oracle
        "dedup_embedding_lsh": emb_dedup_sql,
        "semantic_dedup": _semantic_dedup_sql(),
        "ann_lsh_query": ann_query_sql,
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
        # identical semantics to revenue_by_segment — the engine-side
        # variant exercises the shuffle hash-join (Dataset.join) instead
        # of the broadcast join, so the oracle is the same SQL
        "revenue_by_segment_join": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_revenue_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
            ORDER BY c.c_mktsegment
        """,
        "events_sliding_window": """
            WITH e AS (
              SELECT event_type,
                     CAST(epoch_us(ts) AS BIGINT) AS us,
                     CAST(round(value * 1000) AS BIGINT) AS v
              FROM events
            )
            SELECT event_type,
                   (e.us // 900000000) * 900000000
                       - k.k * 900000000 AS window_start_us,
                   count(*) AS n_events,
                   CAST(sum(e.v) AS BIGINT) AS sum_value_mil
            FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) k
            GROUP BY event_type, window_start_us
            ORDER BY event_type, window_start_us
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
        "asof_join": """
            WITH u AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                         AS il
              FROM events WHERE event_type IN ('purchase', 'click')
            ), w AS (
              SELECT user_id, ts, event_id, il,
                     last_value(CASE WHEN il = 0 THEN event_id END
                                IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY ts, il, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS right_id,
                     last_value(CASE WHEN il = 0 THEN ts END
                                IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY ts, il, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS right_ts
              FROM u
            )
            SELECT user_id, event_id AS left_id, ts AS left_ts,
                   right_id, right_ts,
                   datediff('microsecond', right_ts, ts) AS lag_us
            FROM w WHERE il = 1 AND right_id IS NOT NULL
            ORDER BY user_id, left_id
        """,
        "range_join": """
            SELECT l.user_id, l.event_id AS left_id,
                   r.event_id AS right_id,
                   datediff('microsecond', r.ts, l.ts) AS delta_us
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND r.ts >= l.ts - INTERVAL 24 HOUR AND r.ts < l.ts
            WHERE l.event_type = 'error'
            ORDER BY l.user_id, left_id, right_id
        """,
        "topk_by_group": """
            SELECT event_type, rank, event_id, value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id)
                         AS rank
              FROM events)
            WHERE rank <= 5 ORDER BY event_type, rank
        """,
        "percentile_by_group": """
            SELECT event_type, count(*) AS n,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
                       AS p50_cents,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.95)
                       AS p95_cents
            FROM events GROUP BY event_type ORDER BY event_type
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
        # non-empty RE2-\s-separated tokens; the engine counts matches
        # of the complement class [^\t\n\f\r ]+ — identical semantics
        # (the old trim()-based form diverged on \t-only docs, DuckDB
        # trim strips only spaces, and Python .split() on \x1c-\x1f)
        "token_count": """
            WITH c AS (
              SELECT doc_id,
                     len(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens FROM c WHERE n_tokens > 0
        """,
        # GPT-2-ish pretokenizer count: the pattern is shared verbatim with
        # the engine (ops._BPE_PATTERN) and restricted to constructs RE2
        # and Python `re` evaluate identically (no lookahead, ASCII classes)
        "token_count_bpe": """
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text, ''), '{pat}'))
                       AS n_bpe_tokens
            FROM documents
        """.format(pat=__import__(
            "weak_supervision_for_ner_ray.pipelines.ops",
            fromlist=["_BPE_PATTERN"])._BPE_PATTERN.replace("'", "''")),
        # KMV distinct-token sketch: k smallest DISTINCT md5 token hashes,
        # estimator (k-1)*2^63/h_(k) in the shifted int64 hash space —
        # deterministic, so even the ESTIMATE is exactly comparable
        "distinct_token_kmv": """
            WITH tok AS (
              SELECT unnest(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS t
              FROM documents
            ), h AS (
              SELECT DISTINCT CAST(md5_number_lower(t) >> 1 AS BIGINT)
                     AS hv
              FROM tok
            ), kk AS (
              SELECT hv FROM h ORDER BY hv LIMIT 256
            ), s AS (
              SELECT count(*) AS m, max(hv) AS kth FROM kk
            )
            SELECT CAST(256 AS BIGINT) AS k, CAST(m AS BIGINT) AS m,
                   kth AS kth_min_h,
                   CASE WHEN m < 256 THEN CAST(m AS BIGINT)
                        ELSE CAST(floor(255 * 9223372036854775808.0 / kth)
                                  AS BIGINT)
                   END AS est_distinct
            FROM s
        """,
        "distinct_token_kmv_by_lang": """
            WITH tok AS (
              SELECT lang, unnest(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS t
              FROM documents
            ), h AS (
              SELECT DISTINCT lang,
                     CAST(md5_number_lower(t) >> 1 AS BIGINT) AS hv
              FROM tok
            ), kk AS (
              SELECT lang, hv FROM (
                SELECT lang, hv,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY hv) AS rk
                FROM h)
              WHERE rk <= 64
            ), s AS (
              SELECT lang, count(*) AS m, max(hv) AS kth
              FROM kk GROUP BY lang
            )
            SELECT lang, CAST(64 AS BIGINT) AS k, CAST(m AS BIGINT) AS m,
                   kth AS kth_min_h,
                   CASE WHEN m < 64 THEN CAST(m AS BIGINT)
                        ELSE CAST(floor(63 * 9223372036854775808.0 / kth)
                                  AS BIGINT)
                   END AS est_distinct
            FROM s ORDER BY lang
        """,
        # non-empty RE2-\s tokens, zero-token docs excluded — the
        # engine's [^\t\n\f\r ]+ match count is the identical semantics
        # (the old trim()-based form diverged on \t-only docs)
        "quality_score": """
            WITH c AS (
              SELECT doc_id, length(text) AS n_chars,
                     len(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS n_tokens,
                     length(regexp_replace(text, '\\s+', '', 'g'))
                         AS n_nospace,
                     length(regexp_replace(text, '[^A-Z]', '', 'g'))
                         AS n_upper
              FROM documents
            )
            SELECT doc_id, n_chars, n_tokens,
                   CAST(floor(n_nospace * 1000000.0 / n_tokens)
                        AS BIGINT) AS mean_token_len_micro,
                   CAST(floor(n_upper * 1000000.0 / n_chars)
                        AS BIGINT) AS upper_ratio_micro
            FROM c WHERE n_tokens > 0
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        # Rabin-Karp polynomial over codepoints mod 2^31-1, char 8-grams,
        # content-defined 1/64 sampling — powers shared with the engine;
        # every product fits BIGINT (codepoint < 2^21 x power < 2^31, x8)
        "doc_fingerprint_rolling": """
            WITH d AS (
              SELECT doc_id,
                     list_transform(range(1, length(text) + 1),
                         i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
                         AS cp
              FROM documents WHERE length(text) >= 8
            ), h AS (
              SELECT doc_id,
                     list_transform(range(1, len(cp) - 6),
                         i -> ({terms}) % 2147483647) AS hs
              FROM d
            ), u AS (
              SELECT DISTINCT doc_id, unnest(hs) AS fp FROM h
            )
            SELECT doc_id, fp FROM u WHERE fp % 64 = 0
            ORDER BY doc_id, fp
        """.format(terms=" + ".join(
            "cp[i+{j}] * {p}".format(j=j, p=p) for j, p in enumerate(
                __import__("weak_supervision_for_ner_ray.pipelines.ops",
                           fromlist=["_roll_powers"])._roll_powers()))),
        # chunk-level near-dup (Lee et al. 2022 substring-dedup family):
        # pairs sharing >= 2 sampled CDC chunk fingerprints; fps present
        # in 2..200 docs only — the >200 boilerplate drop is part of the
        # operator definition, mirrored by the engine
        "dedup_cdc_chunks": """
            WITH d AS (
              SELECT doc_id,
                     list_transform(range(1, length(text) + 1),
                         i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
                         AS cp
              FROM documents WHERE length(text) >= 8
            ), h AS (
              SELECT doc_id,
                     list_transform(range(1, len(cp) - 6),
                         i -> ({terms}) % 2147483647) AS hs
              FROM d
            ), u AS (
              SELECT DISTINCT doc_id, unnest(hs) AS fp FROM h
            ), s AS (
              SELECT doc_id, fp FROM u WHERE fp % 64 = 0
            ), f AS (
              SELECT fp FROM s GROUP BY fp
              HAVING count(*) BETWEEN 2 AND 200
            ), ss AS (
              SELECT s.doc_id, s.fp FROM s JOIN f USING (fp)
            )
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
            FROM ss x JOIN ss y ON x.fp = y.fp AND x.doc_id < y.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY a, b
        """.format(terms=" + ".join(
            "cp[i+{j}] * {p}".format(j=j, p=p) for j, p in enumerate(
                __import__("weak_supervision_for_ner_ray.pipelines.ops",
                           fromlist=["_roll_powers"])._roll_powers()))),
        # corpus heavy hitters: top-50 word bigrams, RE2 ASCII \\s split
        # (same class as the engine's _ws_tokens), ties broken ngram ASC
        "ngram_topk": """
            WITH toks AS (
              SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), grams AS (
              SELECT unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1])) AS ngram
              FROM toks WHERE len(t) >= 2
            ), cnts AS (
              SELECT ngram, count(*) AS cnt FROM grams GROUP BY ngram
            )
            SELECT CAST(row_number() OVER (ORDER BY cnt DESC, ngram ASC)
                        AS BIGINT) AS rnk,
                   ngram, cnt
            FROM cnts ORDER BY cnt DESC, ngram ASC LIMIT 50
        """,
        "anti_join": """
            SELECT c_custkey, c_name, c_mktsegment, c_acctbal
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        "rollup_lang_source": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY GROUPING SETS ((lang, source), (lang), ())
            ORDER BY lang, source
        """,
        # per-stratum uniform sample: n lowest md5 hashes per language
        "stratified_sample": """
            SELECT lang, rnk, doc_id, bucket_ppm FROM (
              SELECT lang, doc_id, bucket_ppm,
                     row_number() OVER (PARTITION BY lang
                         ORDER BY bucket_ppm, doc_id) AS rnk
              FROM (SELECT lang, doc_id,
                           CAST(md5_number_lower('s17:' ||
                                CAST(doc_id AS VARCHAR)) % 1000000
                                AS BIGINT) AS bucket_ppm
                    FROM documents))
            WHERE rnk <= 20 ORDER BY lang, rnk
        """,
        # source-ratio mixing: quotas generated from the shared
        # _MIX_RATIOS_PPM table at the shared default budget of 120
        "dataset_mix": """
            SELECT source, rnk, doc_id, lang, bucket_ppm FROM (
              SELECT source, lang, doc_id, bucket_ppm,
                     row_number() OVER (PARTITION BY source
                         ORDER BY bucket_ppm, doc_id) AS rnk
              FROM (SELECT source, lang, doc_id,
                           CAST(md5_number_lower('s19:' ||
                                CAST(doc_id AS VARCHAR)) % 1000000
                                AS BIGINT) AS bucket_ppm
                    FROM documents
                    WHERE source IN ({srcs})))
            WHERE rnk <= CASE source {cases} END
            ORDER BY source, rnk
        """.format(
            srcs=", ".join(
                "'{}'".format(s) for s in sorted(
                    __import__(
                        "weak_supervision_for_ner_ray.pipelines.ops",
                        fromlist=["_MIX_RATIOS_PPM"])._MIX_RATIOS_PPM)),
            cases=" ".join(
                "WHEN '{}' THEN {}".format(s, (p * 120) // 1_000_000)
                for s, p in sorted(__import__(
                    "weak_supervision_for_ner_ray.pipelines.ops",
                    fromlist=["_MIX_RATIOS_PPM"])._MIX_RATIOS_PPM
                    .items()))),
        # integer tf/df score == tf * 1e6 // df, top-3 per doc,
        # ties (score desc, token asc)
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM toks GROUP BY 1, 2
            ), df AS (
              SELECT token, count(*) AS df FROM tf GROUP BY 1
            )
            SELECT doc_id, rnk, token, score FROM (
              SELECT tf.doc_id, tf.token,
                     CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score,
                     row_number() OVER (PARTITION BY tf.doc_id
                         ORDER BY (tf.tf * 1000000) // df.df DESC,
                                  tf.token ASC) AS rnk
              FROM tf JOIN df USING (token))
            WHERE rnk <= 3 ORDER BY doc_id, rnk
        """,
        # inverted index: md5 of the ASCENDING doc-id posting list per
        # token, df bounds generated from the module consts
        "inverted_index": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(
                         regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS token
              FROM documents
            ), dt AS (
              SELECT DISTINCT doc_id, token FROM toks
            ), idx AS (
              SELECT token, count(*) AS df,
                     md5(string_agg(CAST(doc_id AS VARCHAR), ','
                         ORDER BY doc_id)) AS postings_md5,
                     min(doc_id) AS first_doc,
                     max(doc_id) AS last_doc
              FROM dt GROUP BY 1
            )
            SELECT token, df, postings_md5, first_doc, last_doc
            FROM idx WHERE df BETWEEN {mn} AND {mx}
            ORDER BY token
        """.format(mn=__import__(
            "weak_supervision_for_ner_ray.pipelines.ops",
            fromlist=["_IDX_MIN_DF"])._IDX_MIN_DF,
            mx=__import__(
            "weak_supervision_for_ner_ray.pipelines.ops",
            fromlist=["_IDX_MAX_DF"])._IDX_MAX_DF),
        # benchmark decontamination: corpus docs sharing >= 1 sampled
        # char-8-gram fingerprint (1/16 sampling) with any src0 doc;
        # the polynomial is generated from the shared _roll_powers()
        "decontaminate": """
            WITH d AS (
              SELECT doc_id, source,
                     list_transform(range(1, length(text) + 1),
                         i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
                         AS cp
              FROM documents WHERE length(text) >= 8
            ), h AS (
              SELECT doc_id, source,
                     list_transform(range(1, len(cp) - 6),
                         i -> ({terms}) % 2147483647) AS hs
              FROM d
            ), u AS (
              SELECT DISTINCT doc_id, source, unnest(hs) AS fp FROM h
            ), s AS (
              SELECT doc_id, source, fp FROM u WHERE fp % 16 = 0
            ), bench AS (
              SELECT DISTINCT fp FROM s WHERE source = 'src0'
            )
            SELECT s.doc_id, count(*) AS n_hits
            FROM s JOIN bench USING (fp)
            WHERE s.source <> 'src0'
            GROUP BY s.doc_id ORDER BY s.doc_id
        """.format(terms=" + ".join(
            "cp[i+{j}] * {p}".format(j=j, p=p) for j, p in enumerate(
                __import__("weak_supervision_for_ner_ray.pipelines.ops",
                           fromlist=["_roll_powers"])._roll_powers()))),
        # greedy sequence packing: exclusive prefix sum of whitespace
        # token counts in doc_id order, bins of 4096 tokens
        "pack_sequences": """
            SELECT doc_id, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_tok,
                   CAST((cum - n_tokens) // 4096 AS BIGINT) AS bin_id,
                   CAST((cum - n_tokens) % 4096 AS BIGINT) AS offset_in_bin
            FROM (
              SELECT doc_id, n_tokens,
                     sum(n_tokens) OVER (ORDER BY doc_id) AS cum
              FROM (SELECT doc_id,
                           coalesce(len(list_filter(
                               regexp_split_to_array(text, '\\s+'),
                               x -> x <> '')), 0) AS n_tokens
                    FROM documents))
            ORDER BY doc_id
        """,
        "pivot_doc_langs": """
            SELECT source,
                   count(*) FILTER (WHERE lang = 'de') AS n_de,
                   count(*) FILTER (WHERE lang = 'en') AS n_en,
                   count(*) FILTER (WHERE lang = 'es') AS n_es,
                   count(*) FILTER (WHERE lang = 'fr') AS n_fr,
                   count(*) FILTER (WHERE lang = 'zh') AS n_zh,
                   count(*) AS n_total
            FROM documents GROUP BY source ORDER BY source
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        # deterministic hash sampling: same md5-low-8-bytes hash as the
        # engine's _stable_token_hashes over 'seed:doc_id'
        # deterministic shuffle-into-shards: shard = md5 mod n, pos =
        # rank in unsigned-md5 order within the shard (engine exchanges
        # the order-preserving hv XOR 2^63 int64)
        "train_shards": """
            WITH h AS (
              SELECT doc_id,
                     md5_number_lower('sh17:' || CAST(doc_id AS VARCHAR))
                         AS hv
              FROM documents
            )
            SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard_id,
                   CAST(row_number() OVER (PARTITION BY hv % 8
                                           ORDER BY hv, doc_id) - 1
                        AS BIGINT) AS pos
            FROM h ORDER BY doc_id
        """,
        "sample_hash": """
            SELECT doc_id, text,
                   CAST(md5_number_lower('s13:' || CAST(doc_id AS VARCHAR))
                        % 1000000 AS BIGINT) AS bucket_ppm
            FROM documents
            WHERE md5_number_lower('s13:' || CAST(doc_id AS VARCHAR))
                  % 1000000 < 100000
            ORDER BY doc_id
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
