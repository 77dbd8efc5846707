"""End-to-end knowledge-graph construction pipeline.

read turns → turn-level LF bank (actor pool) → groupby(conv_id) doc-level
stage → annotated parquet (the EM re-read + resume point) → distributed EM
→ fused decode/link/triple stage → grouped canonicalization → sorted
node/edge parquet tables (north_star shape).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..data import builtin_gazetteers, FIRST_NAMES
from ..stages.annotate import annotate_pipeline
from ..stages.util import default_concurrency
from ..stages.kg import DecodeStage, TripleStage
from .train import train_hmm


def default_bank_inputs():
    return builtin_gazetteers(), FIRST_NAMES


def annotate_turns(turns_ds, workdir: str | None = None, *,
                   gazetteers=None, first_names=None, concurrency=None,
                   batch_size: int = 256):
    """Annotation pipeline; if ``workdir`` is given the annotated corpus is
    written to ``<workdir>/annotated`` (resumable: skipped when present)."""
    gaz = gazetteers if gazetteers is not None else builtin_gazetteers()
    fn = first_names if first_names is not None else FIRST_NAMES
    bank_ref = ray.put((gaz, fn))
    annotated = annotate_pipeline(turns_ds, bank_ref,
                                  concurrency=concurrency,
                                  batch_size=batch_size)
    if workdir is None:
        return annotated
    out = os.path.join(workdir, "annotated")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        annotated.write_parquet(out)
        open(marker, "w").close()
    return rd.read_parquet(out)


def mentions_table(turns_ds, **kw):
    """Long-form mentions table (FIXTURES.md §5) — explode the nested
    mention column."""
    annotated = annotate_turns(turns_ds, **kw)

    def explode(batch: pa.Table) -> pa.Table:
        conv, turn, src, start, end, label, conf = [], [], [], [], [], [], []
        cids = batch.column("conv_id").to_pylist()
        tids = batch.column("turn_idx").to_pylist()
        ments = batch.column("mentions").to_pylist()
        for ci, ti, ms in zip(cids, tids, ments):
            for m in ms:
                conv.append(ci)
                turn.append(ti)
                src.append(m["source"])
                start.append(m["start"])
                end.append(m["end"])
                label.append(m["label"])
                conf.append(m["conf"])
        return pa.table({
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "source": pa.array(src, pa.string()),
            "start": pa.array(start, pa.int32()),
            "end": pa.array(end, pa.int32()),
            "label": pa.array(label, pa.string()),
            "conf": pa.array(conf, pa.float32()),
        })

    return annotated.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True)


def build_kg(turns_ds, workdir: str, *, gazetteers=None, first_names=None,
             n_iter: int = 3, concurrency=None, batch_size: int = 256,
             write: bool = True, seed: int = 42):
    """Full pipeline.  Returns dict of Datasets:
    ``annotated``, ``ner``, ``triples``, ``nodes``, ``edges``."""
    gaz = gazetteers if gazetteers is not None else builtin_gazetteers()
    fn = first_names if first_names is not None else FIRST_NAMES

    concurrency = default_concurrency(concurrency)
    annotated = annotate_turns(turns_ds, workdir, gazetteers=gaz,
                               first_names=fn, concurrency=concurrency,
                               batch_size=batch_size)

    params = train_hmm(annotated, workdir, n_iter=n_iter, seed=seed,
                       concurrency=concurrency)
    params_ref = ray.put(params)
    gaz_ref = ray.put(gaz)

    ner = annotated.map_batches(
        DecodeStage, fn_constructor_args=(params_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, concurrency=concurrency)

    triples = annotated.map_batches(
        TripleStage, fn_constructor_args=(params_ref, gaz_ref),
        batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, concurrency=concurrency)

    if write:
        tdir = os.path.join(workdir, "triples")
        if not os.path.exists(os.path.join(tdir, "_SUCCESS")):
            triples.write_parquet(tdir)
            open(os.path.join(tdir, "_SUCCESS"), "w").close()
        triples = rd.read_parquet(tdir)

    nodes, edges = graph_tables(triples)
    if write:
        for name, ds in (("nodes", nodes), ("edges", edges)):
            d = os.path.join(workdir, name)
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                ds.write_parquet(d)
                open(os.path.join(d, "_SUCCESS"), "w").close()
    return {"annotated": annotated, "ner": ner, "triples": triples,
            "nodes": nodes, "edges": edges, "params": params}


def graph_tables(triples_ds):
    """Canonicalization + graph materialization.

    nodes: one row per linked entity id (exact dedup via grouped aggregate —
    hash-partition on the id, SURVEY.md §2.7), counting mentions over both
    triple slots.  edges: weight = triple multiplicity, sorted by
    (src_id, pred) for a deterministic, resumable layout."""

    def endpoint(batch: pa.Table, side: str) -> pa.Table:
        return pa.table({
            "entity_id": batch.column(f"{side}_id"),
            "canonical": batch.column(side),
            "label": batch.column(f"{side}_label"),
        })

    subj = triples_ds.map_batches(lambda b: endpoint(b, "subj"),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
    obj = triples_ds.map_batches(lambda b: endpoint(b, "obj"),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    nodes = (subj.union(obj)
             .groupby(["entity_id", "canonical", "label"])
             .aggregate(Count(alias_name="n_mentions"))
             .sort("entity_id"))

    edges = (triples_ds
             .groupby(["subj_id", "pred", "obj_id"])
             .aggregate(Count(alias_name="weight"))
             .map_batches(lambda b: pa.table({
                 "src_id": b.column("subj_id"),
                 "pred": b.column("pred"),
                 "dst_id": b.column("obj_id"),
                 "weight": b.column("weight").cast(pa.float64()),
             }), batch_format="pyarrow", zero_copy_batch=True)
             .sort(["src_id", "pred"]))
    return nodes, edges
