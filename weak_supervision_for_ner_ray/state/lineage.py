"""Per-partition lineage records (north rule: "every partition emits lineage
records plus checkpointed HMM sufficient statistics").

A detached-ish named actor buffers small records sent fire-and-forget from
worker tasks; the driver flushes them to a ``lineage`` Parquet table at the
end of a pipeline run (FIXTURES.md §5 schema).  Overhead is one small remote
call per *block*, not per row.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

SCHEMA = pa.schema([
    ("stage", pa.string()),
    ("partition_key", pa.string()),
    ("input_fingerprint", pa.string()),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
    ("wall_ms", pa.float64()),
    ("attempt", pa.int32()),
])


@ray.remote(num_cpus=0)
class LineageActor:
    def __init__(self):
        self.records: list[tuple] = []

    def append(self, records: list[tuple]) -> None:
        self.records.extend(records)

    def drain(self) -> list[tuple]:
        out, self.records = self.records, []
        return out


_ACTOR_NAME = "wsner_lineage"


def get_lineage_actor():
    """Get or create the session-wide lineage actor."""
    try:
        return ray.get_actor(_ACTOR_NAME)
    except ValueError:
        try:
            return LineageActor.options(name=_ACTOR_NAME,
                                        lifetime="detached").remote()
        except ValueError:
            return ray.get_actor(_ACTOR_NAME)


def record_block(actor, stage: str, partition_key: str, fingerprint: str,
                 rows_in: int, rows_out: int, wall_ms: float,
                 attempt: int = 0) -> None:
    if actor is None:
        return
    actor.append.remote([(stage, partition_key, fingerprint,
                          int(rows_in), int(rows_out), float(wall_ms),
                          int(attempt))])


def flush_lineage(actor, out_dir: str) -> str | None:
    """Drain the actor and append a Parquet part file under ``out_dir``."""
    if actor is None:
        return None
    records = ray.get(actor.drain.remote())
    if not records:
        return None
    os.makedirs(out_dir, exist_ok=True)
    cols = list(zip(*records))
    table = pa.table({f.name: pa.array(list(c), f.type)
                      for f, c in zip(SCHEMA, cols)})
    path = os.path.join(out_dir, "lineage_%d.parquet" % int(time.time() * 1e3))
    pq.write_table(table, path)
    return path


def block_fingerprint(batch: pa.Table) -> str:
    """Cheap deterministic fingerprint of a block's identity."""
    n = batch.num_rows
    if n == 0:
        return "empty"
    try:
        c0 = str(batch.column(0)[0].as_py())
        c1 = str(batch.column(0)[n - 1].as_py())
    except Exception:
        c0 = c1 = "?"
    return f"{n}:{c0}:{c1}"
