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
