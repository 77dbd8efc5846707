"""Arrow <-> annotation-layer encoding + observation extraction.

The ``mentions`` intermediate is a nested Arrow column
``list<struct<source, start, end, label, conf>>`` per turn (SURVEY.md §1.3),
kept in ``batch_format="pyarrow"`` end-to-end.  This module provides the
zero-ish-copy builders and the sequence-extraction semantics
(``specialise_annotations``, labelling.py:175-213) that turn a turn's layers
into the sparse HMM observation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.spans import Layers, get_overlaps
from ..sources.registry import SOURCE_INDICES, SOURCE_NAMES, SOURCE_PRIORS
from ..state.hmm import TurnObs

MENTION_TYPE = pa.struct([
    ("source", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("label", pa.string()),
    ("conf", pa.float32()),
])

# sources excluded from the specialisation vote (labelling.py:183-188)
_SPECIALISE_VOTERS = [
    s for s in SOURCE_NAMES
    if "proper" not in s and "nnp_" not in s and "compound" not in s
]


class MentionsBuilder:
    """Accumulates per-turn mention lists into a ListArray of structs."""

    def __init__(self):
        self.source: list[str] = []
        self.start: list[int] = []
        self.end: list[int] = []
        self.label: list[str] = []
        self.conf: list[float] = []
        self.offsets: list[int] = [0]

    def add_layers(self, layers: Layers) -> None:
        for source in sorted(layers.by_source):
            spans = layers.by_source[source]
            for (s, e) in sorted(spans):
                for lab, c in spans[(s, e)]:
                    self.source.append(source)
                    self.start.append(s)
                    self.end.append(e)
                    self.label.append(lab)
                    self.conf.append(c)
        self.offsets.append(len(self.source))

    def finish(self) -> pa.ListArray:
        struct = pa.StructArray.from_arrays(
            [pa.array(self.source, pa.string()),
             pa.array(self.start, pa.int32()),
             pa.array(self.end, pa.int32()),
             pa.array(self.label, pa.string()),
             pa.array(self.conf, pa.float32())],
            fields=list(MENTION_TYPE))
        return pa.ListArray.from_arrays(pa.array(self.offsets, pa.int32()),
                                        struct)


def mentions_to_layers(mention_list) -> Layers:
    """Rebuild a :class:`Layers` from one row's nested mention list.

    Span dicts are rebuilt in ascending (start, end) order so the
    binary-search exclusivity/overlap helpers keep their contract.
    """
    layers = Layers()
    by_source = layers.by_source
    for m in mention_list:
        src = by_source.setdefault(m["source"], {})
        key = (m["start"], m["end"])
        if key in src:
            src[key] = (*src[key], (m["label"], m["conf"]))
        else:
            src[key] = ((m["label"], m["conf"]),)
    # mentions were emitted sorted per source; dict preserves order
    return layers


def specialise_annotations(layers: Layers, keep_names=None) -> None:
    """Replace generic ENT/MISC labels by a confidence-weighted vote of
    overlapping non-generic sources (labelling.py:175-213).  In place."""
    keep = keep_names if keep_names is not None else set(SOURCE_NAMES)
    voters = [s for s in _SPECIALISE_VOTERS
              if s in layers.by_source and s in keep]
    to_set = []
    for source, spans in layers.by_source.items():
        for (start, end), vals in spans.items():
            for label, conf in vals:
                if label not in ("ENT", "MISC"):
                    continue
                label_counts: dict[str, float] = {}
                for other in voters:
                    if other == source:
                        continue
                    for s2, e2, vals2 in get_overlaps(start, end, layers,
                                                      [other]):
                        for l2, c2 in vals2:
                            if l2 in ("ENT", "MISC"):
                                continue
                            w = c2 if (s2 == start and e2 == end) else 0.3 * c2
                            w *= SOURCE_PRIORS.get(other, {}).get(
                                l2, (0.5, 0.5))[0]
                            label_counts[l2] = label_counts.get(l2, 0.0) \
                                + conf * w
                total = sum(label_counts.values())
                src_priors = SOURCE_PRIORS.get(source, {})
                new_vals = tuple(
                    (l, src_priors.get(l, (0.5, 0.5))[0] * c / total)
                    for l, c in label_counts.items())
                to_set.append((source, start, end, new_vals))
    for source, start, end, vals in to_set:
        layers.by_source[source][(start, end)] = vals


def layers_to_obs(layers: Layers, n_tokens: int,
                  keep_names=None) -> TurnObs:
    """``extract_sequence`` equivalent (labelling.py:144-172): specialise,
    then spread span confidences over BILU cells of the sparse observation."""
    specialise_annotations(layers, keep_names)
    obs = TurnObs(n_tokens)
    keep = keep_names if keep_names is not None else None
    for source, spans in layers.by_source.items():
        s_idx = SOURCE_INDICES.get(source)
        if s_idx is None:
            continue
        if keep is not None and source not in keep:
            continue
        for (start, end), vals in spans.items():
            for label, conf in vals:
                obs.add_span(s_idx, start, end, label, conf)
    return obs


def obs_argmax_states(obs: TurnObs, source_idx: int) -> np.ndarray:
    """Per-token argmax state of one source's observation row
    (labelling.py:325/345: ``X[k, source_index].argmax()``)."""
    states = np.zeros(obs.n_tokens, np.int64)
    for (t, s), dist in obs.fired.items():
        if s != source_idx:
            continue
        best_state, best_conf = 0, 0.0
        for state, conf in dist.items():
            if conf > best_conf or (conf == best_conf
                                    and state < best_state):
                best_state, best_conf = state, conf
        states[t] = best_state
    return states
