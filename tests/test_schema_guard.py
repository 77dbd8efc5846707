"""Regression tests for the schema-less empty-block guard.

Grouped aggregates whose hash partitions receive no rows emit EMPTY
blocks carrying no schema (probed in rounds 4-5).  Those blocks

* BYPASS ``map_batches`` UDFs entirely (an identity retype never sees
  them),
* crash ``Dataset.join`` when they land on the build side
  ("no match for FieldRef <key>"), and
* log a schema-mismatch warning when unioned/sorted with real blocks
  (the BENCH_r04 tail warning).

``ops._coalesce_schema_less`` (a split-repartition) is the one
in-repo remedy; this file pins (a) the hazard itself — if a Ray
upgrade fixes it these tests say so explicitly — and (b) that the
guard clears it and makes the join-feed pattern safe.
"""

import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd
from ray.data.aggregate import Count

from weak_supervision_for_ner_ray.pipelines import ops


def _block_column_sets(ds) -> list[set]:
    """Column-name set of every materialised block (pandas or Arrow)."""
    out = []
    for ref in ds.materialize().get_internal_block_refs():
        blk = ray.get(ref)
        if isinstance(blk, pa.Table):
            out.append(set(blk.schema.names))
        else:                          # pandas block
            out.append(set(map(str, blk.columns)))
    return out


def _grouped_with_empties():
    """A Count aggregate with far more partitions than distinct keys —
    the shape that emits schema-less empty blocks."""
    src = rd.from_items([{"k": i % 3, "v": i} for i in range(30)]) \
            .repartition(16)
    return src.groupby("k").aggregate(Count(alias_name="n"))


def test_guard_restores_schema_on_every_block(ray_session):
    agg = _grouped_with_empties()
    cols = _block_column_sets(agg)
    # precondition: the hazard exists (some block carries no columns).
    # If a Ray upgrade ever fixes grouped-aggregate empties, this is the
    # line that will fail — the guard then becomes removable.
    assert any(c == set() for c in cols), \
        "schema-less empty blocks no longer emitted — guard obsolete?"
    guarded = ops._coalesce_schema_less(_grouped_with_empties())
    for c in _block_column_sets(guarded):
        assert c == {"k", "n"}


def test_guarded_aggregate_feeds_join(ray_session):
    """The round-4 crash class: a schema-less block on a join build side
    fails FieldRef resolution.  The guarded feed must join cleanly and
    produce exact results."""
    right = rd.from_items([{"k": i, "tag": f"t{i}"} for i in range(3)])
    guarded = ops._coalesce_schema_less(_grouped_with_empties())
    joined = guarded.join(right, join_type="inner",
                          num_partitions=4, on=("k",))
    df = joined.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == [0, 1, 2]
    assert list(df["n"]) == [10, 10, 10]
    assert list(df["tag"]) == ["t0", "t1", "t2"]


def test_guarded_union_sort_keeps_schema(ray_session):
    """The BENCH_r04 warning path: union/sort of a grouped output with
    real blocks must not lose the schema (row values already pinned by
    the conv_flatten oracle; here we pin block-level schema health)."""
    extra = rd.from_items([{"k": 99, "n": 1}])
    unioned = ops._coalesce_schema_less(_grouped_with_empties()) \
        .union(extra).sort("k")
    cols = [c for c in _block_column_sets(unioned) if c]
    assert cols and all(c == {"k", "n"} for c in cols)
    assert unioned.count() == 4
