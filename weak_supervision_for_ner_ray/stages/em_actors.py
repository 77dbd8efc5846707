"""Persistent shard actors for the EM loop.

Ray Data has no iterate-until-converged primitive (SURVEY.md §7.4): the
dataset-based EM relaunches a full pipeline per iteration, paying execution
barriers + partial collection every pass — measured ~3 s/pass of fixed,
non-scaling overhead.  For the hot loop we drop to raw Ray actors (the one
place the Dataset API genuinely can't express the semantics, per the design
brief): each :class:`EMShard` actor loads its partition of the observation
table ONCE in ``__init__`` and every EM iteration is a single RPC per actor
returning a ~2 MB sufficient-statistic partial.

On a multi-node cluster the shards map to per-node partitions of the obs
parquet directory; resume still works because the driver loop checkpoints
parameters after every iteration exactly like the dataset path.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import ray

from ..state import hmm
from ..state.hmm import BEST_COVERAGE_INDEX, SuffStats
from .encode import ObsRows, obs_argmax_states

_OBS_COLS = ["n_tokens", "o_t", "o_s", "o_state", "o_conf"]


@ray.remote
class EMShard:
    """Holds one shard of the observation table as flat numpy arrays."""

    def __init__(self, files: list[str]):
        import pyarrow as pa
        tables = [pq.read_table(f, columns=_OBS_COLS) for f in files]
        batch = pa.concat_tables(tables) if tables else None
        self.rows = ObsRows(batch) if batch is not None else None

    def n_turns(self) -> int:
        return 0 if self.rows is None else len(self.rows)

    def init_stats(self):
        """Prior-count partials (labelling.py:314-373)."""
        S, K = hmm.N_SOURCES, hmm.N_STATES
        init_counts = np.zeros(K)
        trans_counts = np.zeros((K, K))
        obs_counts = np.zeros((S, K))
        if self.rows is None:
            return init_counts, trans_counts, obs_counts
        for i in range(len(self.rows)):
            obs = self.rows.turnobs(i)
            if obs.n_tokens == 0:
                continue
            states = obs_argmax_states(obs, BEST_COVERAGE_INDEX)
            init_counts[states[0]] += 1
            if obs.n_tokens > 1:
                np.add.at(trans_counts, (states[:-1], states[1:]), 1)
            obs_counts[:, 0] += obs.n_tokens
            for (t, s), dist in obs.fired.items():
                obs_counts[s, 0] -= 1.0
                for state, conf in dist.items():
                    obs_counts[s, state] += conf
        return init_counts, trans_counts, obs_counts

    def estep(self, params) -> dict:
        """One E-step over the shard -> sufficient-statistic partial."""
        stats = SuffStats()
        if self.rows is not None:
            for i in range(len(self.rows)):
                hmm.accumulate(self.rows.turnobs(i), params, stats)
        return stats.to_arrays()


def make_shards(obs_files: list[str], n_shards: int):
    """Row-balanced file assignment -> actor handles.

    Greedy longest-processing-time packing on parquet row counts (from
    footer metadata, no data read) — round-robin by file COUNT leaves
    straggler shards when file sizes vary, and the E-step wall time is the
    max shard, not the mean."""
    import heapq
    n_shards = max(1, min(n_shards, len(obs_files)))
    sized = []
    for f in obs_files:
        try:
            rows = pq.ParquetFile(f).metadata.num_rows
        except Exception:
            rows = 1
        sized.append((rows, f))
    sized.sort(reverse=True)
    heap = [(0, i) for i in range(n_shards)]
    heapq.heapify(heap)
    assignments: list[list[str]] = [[] for _ in range(n_shards)]
    for rows, f in sized:
        load, i = heapq.heappop(heap)
        assignments[i].append(f)
        heapq.heappush(heap, (load + rows, i))
    return [EMShard.remote(files) for files in assignments if files]


def shard_init_counts(shards):
    parts = ray.get([s.init_stats.remote() for s in shards])
    S, K = hmm.N_SOURCES, hmm.N_STATES
    init = np.zeros(K)
    trans = np.zeros((K, K))
    obs = np.zeros((S, K))
    for i, t, o in parts:
        init += i
        trans += t
        obs += o
    return init, trans, obs


def shard_estep(shards, params) -> SuffStats:
    params_ref = ray.put(params)
    parts = ray.get([s.estep.remote(params_ref) for s in shards])
    total = SuffStats()
    for d in parts:
        total.merge(SuffStats.from_arrays(d))
    return total
