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
from .encode import layers_to_obs, mentions_to_layers, obs_argmax_states


def _obs_from_row(mentions, n_tokens: int, keep_names) -> TurnObs:
    layers = mentions_to_layers(mentions)
    return layers_to_obs(layers, n_tokens, keep_names)


class EStepStage:
    """Actor-pool stage: annotated turns -> one sufficient-stat partial row.

    Params are broadcast via ``ray.put`` once per EM iteration and fetched
    once per actor construction (a new pool per iteration)."""

    def __init__(self, params_ref, keep_names=None):
        self.params = ray.get(params_ref) if isinstance(
            params_ref, ray.ObjectRef) else params_ref
        self.keep_names = keep_names

    def __call__(self, batch: pa.Table) -> pa.Table:
        stats = SuffStats()
        mentions = batch.column("mentions").to_pylist()
        n_tokens = batch.column("n_tokens").to_pylist()
        for m, nt in zip(mentions, n_tokens):
            obs = _obs_from_row(m, nt, self.keep_names)
            hmm.accumulate(obs, self.params, stats)
        d = stats.to_arrays()
        return pa.table({
            "start": pa.array([d["start"].ravel()]),
            "trans": pa.array([d["trans"].ravel()]),
            "obs": pa.array([d["obs"].ravel()]),
            "logprob": pa.array([float(d["logprob"][0])]),
            "n_seqs": pa.array([int(d["n_seqs"][0])]),
        })


class InitStatsStage:
    """One pass computing the three prior-count partials
    (labelling.py:314-373): start-state counts and pairwise transition
    counts of the best-coverage source's argmax states, plus per-source
    observation mass."""

    def __init__(self, keep_names=None):
        self.keep_names = keep_names

    def __call__(self, batch: pa.Table) -> pa.Table:
        S, K = hmm.N_SOURCES, hmm.N_STATES
        init_counts = np.zeros(K)
        trans_counts = np.zeros((K, K))
        obs_counts = np.zeros((S, K))
        mentions = batch.column("mentions").to_pylist()
        n_tokens = batch.column("n_tokens").to_pylist()
        for m, nt in zip(mentions, n_tokens):
            if nt == 0:
                continue
            obs = _obs_from_row(m, nt, self.keep_names)
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


def reduce_suffstats(partials: pa.Table) -> SuffStats:
    total = SuffStats()
    for i in range(partials.num_rows):
        row = {c: partials.column(c)[i].as_py() for c in
               ("start", "trans", "obs", "logprob", "n_seqs")}
        total.merge(SuffStats.from_arrays(
            {"start": np.array(row["start"]),
             "trans": np.array(row["trans"]),
             "obs": np.array(row["obs"]),
             "logprob": np.array([row["logprob"]]),
             "n_seqs": np.array([row["n_seqs"]])}))
    return total


def reduce_init_counts(partials: pa.Table):
    S, K = hmm.N_SOURCES, hmm.N_STATES
    init = np.zeros(K)
    trans = np.zeros((K, K))
    obs = np.zeros((S, K))
    for i in range(partials.num_rows):
        init += np.array(partials.column("init")[i].as_py()).reshape(K)
        trans += np.array(partials.column("trans")[i].as_py()).reshape(K, K)
        obs += np.array(partials.column("obs")[i].as_py()).reshape(S, K)
    return init, trans, obs
