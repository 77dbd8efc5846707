"""Relational-op tests on constructed inputs with hand-computed answers:
the shuffle hash-join variant and the sliding-window aggregate (the other
relational ops are covered by the driver's DuckDB oracle at sf0.01)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from weak_supervision_for_ner_ray.pipelines import ops


def to_arrow(ds):
    if isinstance(ds, pa.Table):
        return ds
    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    return pa.concat_tables(tables) if tables else pa.table({})


@pytest.fixture(scope="module")
def rel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rel")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["AUTO", "BUILD", "AUTO"], pa.string()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.005, 20.0, 7.5, 1.004], pa.float64()),
    }), str(d / "orders.parquet"))
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    ts = [base,                                   # window base 12:00
          base + dt.timedelta(minutes=14),        # same slide slot
          base + dt.timedelta(minutes=20),        # next slot
          base + dt.timedelta(hours=3)]           # far away
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
    }), str(d / "events.parquet"))
    return str(d)


def test_revenue_by_segment_join_matches_broadcast(ray_session, rel_dir):
    got = to_arrow(ops.revenue_by_segment_join(rel_dir)).to_pydict()
    assert got["c_mktsegment"] == ["AUTO", "BUILD"]
    # AUTO: round(100.005*100)=10001 + 2000 (cust 1) + round(1.004*100)=100
    assert got["total_revenue_cents"] == [10001 + 2000 + 100, 750]
    assert got["n_orders"] == [3, 1]
    # parity with the broadcast-join variant on the same input
    ref = to_arrow(ops.revenue_by_segment_exact(rel_dir)).to_pydict()
    assert got == ref


@pytest.fixture(scope="module")
def skew_events_dir(tmp_path_factory):
    """One HOT user with 2000 events spanning many 1-hour buckets —
    sessions deliberately cross and span bucket boundaries — plus a few
    normal users, so the two-pass sessionize must stitch correctly."""
    import numpy as np
    d = tmp_path_factory.mktemp("skew")
    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    rows = []
    t = base
    for i in range(2000):
        # mostly sub-gap steps; ~5% of steps exceed the 30-min gap and
        # start a new session (steps up to 3h cross 1-h buckets freely)
        step = dt.timedelta(minutes=(int(rng.integers(1, 25))
                                     if rng.random() > 0.05
                                     else int(rng.integers(31, 180))))
        t = t + step
        rows.append((i, 1, t))
    # a session that spans >2 one-hour buckets without any 30-min gap
    t2 = base + dt.timedelta(days=30)
    for j in range(200):
        rows.append((2000 + j, 2, t2 + dt.timedelta(minutes=29 * j)))
    rows.append((9999, 3, base))               # single-event user
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    }), str(d / "events.parquet"))
    return str(d)


def test_sessionize_bounded_groups_match_single_pass(ray_session,
                                                     skew_events_dir):
    """The skew-safe two-pass sessionize (coarse (user, time-bucket)
    groups + boundary stitch) is row-identical to the obvious
    single-pass per-user reference, even with tiny 1-hour buckets that
    force heavy cross-bucket stitching."""
    import pandas as pd
    got = to_arrow(ops.sessionize(skew_events_dir,
                                  bucket_hours=1)).to_pandas()
    ev = pq.read_table(
        str(skew_events_dir) + "/events.parquet").to_pandas()
    ref_rows = []
    for uid, g in ev.sort_values(["user_id", "ts", "event_id"]) \
                    .groupby("user_id"):
        sid = (g["ts"].diff() > pd.Timedelta(minutes=30)).cumsum() + 1
        agg = g.assign(session_id=sid).groupby("session_id").agg(
            n_events=("event_id", "size"), start_ts=("ts", "min"),
            end_ts=("ts", "max")).reset_index()
        agg.insert(0, "user_id", uid)
        ref_rows.append(agg)
    ref = pd.concat(ref_rows).sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert got["user_id"].nunique() == 3
    assert (got["user_id"] == 2).sum() == 1    # the spanning session holds
    pd.testing.assert_frame_equal(
        got[["user_id", "session_id", "n_events", "start_ts", "end_ts"]],
        ref[["user_id", "session_id", "n_events", "start_ts", "end_ts"]],
        check_dtype=False)


def test_events_sliding_window(ray_session, rel_dir):
    t = to_arrow(ops.events_sliding_window(rel_dir))
    rows = list(zip(t.column("event_type").to_pylist(),
                    t.column("window_start_us").to_pylist(),
                    t.column("n_events").to_pylist(),
                    t.column("sum_value_mil").to_pylist()))
    us = lambda h, m: int(dt.datetime(
        2024, 1, 1, h, m, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    # every event appears in exactly 60/15 = 4 windows
    assert sum(r[2] for r in rows) == 4 * 4
    by_key = {(r[0], r[1]): (r[2], r[3]) for r in rows}
    # window covering 12:00..13:00 starting at 12:00 holds events 1-3
    assert by_key[("a", us(12, 0))] == (3, 7000)
    # window starting 11:15 holds only the 12:00 and 12:14 events
    assert by_key[("a", us(11, 15))] == (2, 3000)
    # window starting 12:15 holds only the 12:20 event
    assert by_key[("a", us(12, 15))] == (1, 4000)
    # the 15:00 event of type b sits alone in its 4 windows
    for k in range(4):
        assert by_key[("b", us(15, 0) - k * 15 * 60 * 1_000_000)] == (1, 8000)
    # windows are sorted by (event_type, window_start_us)
    assert rows == sorted(rows)
