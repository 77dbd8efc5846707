"""Distributed Baum-Welch E-step + prior-initialisation passes.

Each ``map_batches`` task folds its whole Arrow block into ONE partial-stat
row (start 77 + trans 77² + obs S·77² floats ≈ 2 MB) — the canonical
partial+final aggregation shape (SURVEY.md §2.5): workers → tiny partial
dataset → driver merge → M-step → broadcast new params next iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state import hmm
from ..state.hmm import BEST_COVERAGE_INDEX, SuffStats, TurnObs
from .encode import (ObsRows, layers_to_obs, mentions_to_layers,
                     obs_argmax_states)


def _obs_from_row(mentions, n_tokens: int, keep_names) -> TurnObs:
    layers = mentions_to_layers(mentions)
    return layers_to_obs(layers, n_tokens, keep_names)


def estep_batch(params, keep_names, batch: pa.Table) -> pa.Table:
    stats = SuffStats()
    if "o_t" in batch.column_names:        # pre-encoded observation batch
        rows = ObsRows(batch)
        for i in range(len(rows)):
            hmm.accumulate(rows.turnobs(i), params, stats)
    else:                                   # raw annotated batch
        mentions = batch.column("mentions").to_pylist()
        n_tokens = batch.column("n_tokens").to_pylist()
        for m, nt in zip(mentions, n_tokens):
            obs = _obs_from_row(m, nt, keep_names)
            hmm.accumulate(obs, params, stats)
    d = stats.to_arrays()
    return pa.table({
        "start": pa.array([d["start"].ravel()]),
        "trans": pa.array([d["trans"].ravel()]),
        "obs": pa.array([d["obs"].ravel()]),
        "logprob": pa.array([float(d["logprob"][0])]),
        "n_seqs": pa.array([int(d["n_seqs"][0])]),
    })


def make_estep_fn(params_ref, keep_names=None):
    """Stateless-task E-step: params are broadcast via ``ray.put`` once per
    EM iteration; each worker deserializes them once (per-worker cache) —
    no actor pool spin-up per iteration."""
    from .util import cached_from_ref

    def estep(batch: pa.Table) -> pa.Table:
        params = cached_from_ref(params_ref)
        return estep_batch(params, keep_names, batch)

    return estep


class EStepStage:
    """Actor-pool variant of the E-step (kept for API parity; the pipeline
    uses :func:`make_estep_fn`)."""

    def __init__(self, params_ref, keep_names=None):
        self.params = ray.get(params_ref) if isinstance(
            params_ref, ray.ObjectRef) else params_ref
        self.keep_names = keep_names

    def __call__(self, batch: pa.Table) -> pa.Table:
        return estep_batch(self.params, self.keep_names, batch)


class InitStatsStage:
    """One pass computing the three prior-count partials
    (labelling.py:314-373): start-state counts and pairwise transition
    counts of the best-coverage source's argmax states, plus per-source
    observation mass.  Stateless — usable directly as a task function via
    ``InitStatsStage(keep)`` instance or the plain closure below."""

    def __init__(self, keep_names=None):
        self.keep_names = keep_names

    def __call__(self, batch: pa.Table) -> pa.Table:
        S, K = hmm.N_SOURCES, hmm.N_STATES
        init_counts = np.zeros(K)
        trans_counts = np.zeros((K, K))
        obs_counts = np.zeros((S, K))
        if "o_t" in batch.column_names:
            rows = ObsRows(batch)
            obs_iter = (rows.turnobs(i) for i in range(len(rows)))
        else:
            mentions = batch.column("mentions").to_pylist()
            n_tokens = batch.column("n_tokens").to_pylist()
            obs_iter = (_obs_from_row(m, nt, self.keep_names)
                        for m, nt in zip(mentions, n_tokens))
        for obs in obs_iter:
            nt = obs.n_tokens
            if nt == 0:
                continue
            states = obs_argmax_states(obs, BEST_COVERAGE_INDEX)
            init_counts[states[0]] += 1
            if nt > 1:
                np.add.at(trans_counts, (states[:-1], states[1:]), 1)
            obs_counts[:, 0] += nt
            for (t, s), dist in obs.fired.items():
                obs_counts[s, 0] -= 1.0
                for state, conf in dist.items():
                    obs_counts[s, state] += conf
        return pa.table({
            "init": pa.array([init_counts.ravel()]),
            "trans": pa.array([trans_counts.ravel()]),
            "obs": pa.array([obs_counts.ravel()]),
        })


def merge_suffstat_partials(batch: pa.Table) -> pa.Table:
    """Tree-reduction stage: fold many ~2 MB partial rows into one, so the
    driver fetches a handful of partials instead of hundreds (the driver
    collect was a serial bottleneck at high parallelism)."""
    S, K = hmm.N_SOURCES, hmm.N_STATES
    return pa.table({
        "start": pa.array([_col_matrix(batch, "start", K)
                           .sum(axis=0).ravel()]),
        "trans": pa.array([_col_matrix(batch, "trans", K * K)
                           .sum(axis=0).ravel()]),
        "obs": pa.array([_col_matrix(batch, "obs", S * K * K)
                         .sum(axis=0).ravel()]),
        "logprob": pa.array([float(np.asarray(
            batch.column("logprob").to_numpy(zero_copy_only=False)).sum())]),
        "n_seqs": pa.array([int(np.asarray(
            batch.column("n_seqs").to_numpy(zero_copy_only=False)).sum())]),
    })


def _col_matrix(partials: pa.Table, name: str, width: int) -> np.ndarray:
    """(n_rows, width) float64 view of a list column — zero-copy from the
    Arrow child buffer, no per-element python conversion."""
    col = partials.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.reshape(-1, width)


def reduce_suffstats(partials: pa.Table) -> SuffStats:
    S, K = hmm.N_SOURCES, hmm.N_STATES
    total = SuffStats()
    if partials.num_rows == 0:
        return total
    total.start = _col_matrix(partials, "start", K).sum(axis=0)
    total.trans = _col_matrix(partials, "trans", K * K).sum(axis=0) \
        .reshape(K, K)
    total.obs = _col_matrix(partials, "obs", S * K * K).sum(axis=0) \
        .reshape(S, K, K)
    total.logprob = float(np.asarray(
        partials.column("logprob").to_numpy(zero_copy_only=False)).sum())
    total.n_seqs = int(np.asarray(
        partials.column("n_seqs").to_numpy(zero_copy_only=False)).sum())
    return total


def reduce_init_counts(partials: pa.Table):
    S, K = hmm.N_SOURCES, hmm.N_STATES
    if partials.num_rows == 0:
        return np.zeros(K), np.zeros((K, K)), np.zeros((S, K))
    init = _col_matrix(partials, "init", K).sum(axis=0)
    trans = _col_matrix(partials, "trans", K * K).sum(axis=0).reshape(K, K)
    obs = _col_matrix(partials, "obs", S * K).sum(axis=0).reshape(S, K)
    return init, trans, obs
