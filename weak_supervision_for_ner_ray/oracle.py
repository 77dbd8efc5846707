"""Single-process reference-semantics oracle.

A small, sequential, row-by-row implementation of the same LF + HMM + KG
semantics (SURVEY.md §5): conversations processed one by one in plain Python
loops, mirroring the reference's generator pipeline.  The Ray pipeline's
distributed output must match this oracle (exactly for deterministic LFs;
seeded for EM) — this is what the P/R ≥ 0.95 gate tests against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .data import DETECTOR_FIRST_NAMES, builtin_gazetteers
from .sources.registry import LFBank
from .stages.encode import layers_to_obs
from .stages.kg import AliasIndex, extract_triples_for_turn
from .state import hmm
from .state.hmm import SuffStats, decode_turn, init_params_from_counts, m_step
from .stages.encode import obs_argmax_states
from .tokenizer import make_doc


def group_turns(turns: pa.Table):
    """{conv_id: [(turn_idx, text), ...] sorted by turn_idx}."""
    convs: dict[str, list[tuple[int, str]]] = {}
    for ci, ti, text in zip(turns.column("conv_id").to_pylist(),
                            turns.column("turn_idx").to_pylist(),
                            turns.column("text").to_pylist()):
        convs.setdefault(ci, []).append((ti, text))
    for v in convs.values():
        v.sort()
    return dict(sorted(convs.items()))


class Oracle:
    def __init__(self, gazetteers=None, first_names=None):
        self.gaz = gazetteers if gazetteers is not None \
            else builtin_gazetteers()
        self.first_names = first_names if first_names is not None \
            else DETECTOR_FIRST_NAMES
        self.bank = LFBank(self.gaz, self.first_names)
        self.index = AliasIndex(self.gaz)

    def annotate(self, turns: pa.Table):
        """{(conv_id, turn_idx): (doc, layers)} with doc-level sources."""
        out = {}
        for conv_id, items in group_turns(turns).items():
            turn_idxs = [ti for ti, _ in items]
            texts = [tx for _, tx in items]
            docs, layers_list = self.bank.annotate_conversation(turn_idxs,
                                                               texts)
            for ti, d, ly in zip(turn_idxs, docs, layers_list):
                out[(conv_id, ti)] = (d, ly)
        return out

    def observations(self, annotated):
        return {key: layers_to_obs(layers, len(doc))
                for key, (doc, layers) in annotated.items()}

    def train(self, observations, n_iter: int = 3, seed: int = 42,
              tol: float = 1e-2):
        """Sequential Baum-Welch with the same priors/seeds as the Ray
        pipeline (labelling.py:243-289 control flow)."""
        K, S = hmm.N_STATES, hmm.N_SOURCES
        init_c = np.zeros(K)
        trans_c = np.zeros((K, K))
        obs_c = np.zeros((S, K))
        for obs in observations.values():
            if obs.n_tokens == 0:
                continue
            states = obs_argmax_states(obs, hmm.BEST_COVERAGE_INDEX)
            init_c[states[0]] += 1
            if obs.n_tokens > 1:
                np.add.at(trans_c, (states[:-1], states[1:]), 1)
            obs_c[:, 0] += obs.n_tokens
            for (t, s), dist in obs.fired.items():
                obs_c[s, 0] -= 1.0
                for state, conf in dist.items():
                    obs_c[s, state] += conf
        params = init_params_from_counts(init_c, trans_c, obs_c, seed=seed)
        history = []
        for _ in range(n_iter):
            stats = SuffStats()
            for obs in observations.values():
                hmm.accumulate(obs, params, stats)
            params = m_step(params, stats)
            history.append(stats.logprob)
            if len(history) >= 2 and abs(history[-1] - history[-2]) < tol:
                break
        return params

    def decode(self, annotated, params):
        """{(conv_id, turn_idx): [(start, end, label, conf)]}."""
        out = {}
        for key, (doc, layers) in annotated.items():
            obs = layers_to_obs(layers, len(doc))
            out[key] = decode_turn(obs, params)
        return out

    def triples(self, turns: pa.Table, n_iter: int = 3, seed: int = 42):
        annotated = self.annotate(turns)
        observations = self.observations(
            {k: (d, _copy_layers(ly)) for k, (d, ly) in annotated.items()})
        params = self.train(observations, n_iter=n_iter, seed=seed)
        rows = []
        for (conv_id, ti), (doc, layers) in annotated.items():
            obs = layers_to_obs(layers, len(doc))
            spans = decode_turn(obs, params)
            for tr in extract_triples_for_turn(doc, spans, self.index):
                rows.append((conv_id, ti) + tr)
        return rows, params


def _copy_layers(layers):
    from .functions.spans import Layers
    c = Layers()
    c.by_source = {s: dict(spans) for s, spans in layers.by_source.items()}
    return c
