"""Evaluation: token/entity precision-recall-F1 vs gold spans.

Reimplements the core of the reference's ``analysis.get_results``
(analysis.py:40-161): best-confidence label per span, confidence threshold
0.5, optional label remapping (e.g. the CoNLL 4-label scheme PERSON→PER,
COMPANY→ORG, GPE→LOC, misc→MISC, analysis.py:6-8), TP/FP/FN per label at
entity (exact span) and token granularity, micro/macro P/R/F1.

Distributed shape: predictions are grouped per (conv_id, turn_idx) —
globally-exact set-semantics dedup — and each turn emits a confusion
partial against a broadcast gold index; the tiny partials are summed on
the driver (SURVEY.md §2.5 'analysis.get_results').
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

import ray

CONLL_MAPPINGS = {"PERSON": "PER", "COMPANY": "ORG", "GPE": "LOC",
                  "ORG": "ORG", "LOC": "LOC", "PER": "PER",
                  "EVENT": "MISC", "FAC": "MISC", "LANGUAGE": "MISC",
                  "LAW": "MISC", "NORP": "MISC", "PRODUCT": "MISC",
                  "WORK_OF_ART": "MISC"}


def _gold_index(gold_table: pa.Table, mappings, to_retain):
    """(conv_id, turn_idx) -> {(start, end): label} plus token sets."""
    ent = {}
    tok = {}
    for r in gold_table.to_pylist():
        lab = (mappings or {}).get(r["label"], r["label"]) if mappings \
            else r["label"]
        if to_retain is not None and lab not in to_retain:
            continue
        key = (r["conv_id"], r["turn_idx"])
        ent.setdefault(key, {})[(r["start"], r["end"])] = lab
        tk = tok.setdefault(key, {})
        for t in range(r["start"], r["end"]):
            tk[t] = lab
    return ent, tok


def evaluate_ner(pred_ds, gold_table: pa.Table, *, mappings=None,
                 to_retain=None, conf_threshold: float = 0.5) -> dict:
    """Returns {"entity": {label: {tp, fp, fn, p, r, f1}, ..., "micro": ...},
    "token": ...}."""
    gold_ref = ray.put(_gold_index(gold_table, mappings, to_retain))
    mp = dict(mappings) if mappings else None

    def turn_partial(group) -> pa.Table:
        import pandas as pd  # noqa: F401 (group is a pandas DataFrame)
        ent_gold, tok_gold = ray.get(gold_ref)
        e_tp = defaultdict(int)
        e_fp = defaultdict(int)
        t_tp = defaultdict(int)
        t_fp = defaultdict(int)
        # set semantics, as in the reference where doc.ents is a span set
        # (analysis.py:60-99): an identical predicted span counts once, and
        # a token covered twice by same-label spans counts once.  The
        # groupby co-locates ALL of a turn's predictions, so the dedup is
        # globally exact — identical spans emitted into different blocks
        # (e.g. by a multi-producer prediction table) still count once.
        seen_ent: set = set()
        seen_tok: set = set()
        key = (group["conv_id"].iloc[0], int(group["turn_idx"].iloc[0]))
        for s, e, label, conf in zip(group["start"], group["end"],
                                     group["label"], group["conf"]):
            if conf < conf_threshold:
                continue
            lab = mp.get(label, label) if mp else label
            if to_retain is not None and lab not in to_retain:
                continue
            s, e = int(s), int(e)
            ekey = (s, e, lab)
            if ekey in seen_ent:
                continue
            seen_ent.add(ekey)
            g = ent_gold.get(key, {})
            if g.get((s, e)) == lab:
                e_tp[lab] += 1
            else:
                e_fp[lab] += 1
            tg = tok_gold.get(key, {})
            for t in range(s, e):
                tkey = (t, lab)
                if tkey in seen_tok:
                    continue
                seen_tok.add(tkey)
                if tg.get(t) == lab:
                    t_tp[lab] += 1
                else:
                    t_fp[lab] += 1
        labels = sorted(set(e_tp) | set(e_fp) | set(t_tp) | set(t_fp))
        return pa.table({
            "label": pa.array(labels, pa.string()),
            "e_tp": pa.array([e_tp[l] for l in labels], pa.int64()),
            "e_fp": pa.array([e_fp[l] for l in labels], pa.int64()),
            "t_tp": pa.array([t_tp[l] for l in labels], pa.int64()),
            "t_fp": pa.array([t_fp[l] for l in labels], pa.int64()),
        })

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for batch in pred_ds.groupby(["conv_id", "turn_idx"]) \
            .map_groups(turn_partial, batch_format="pandas") \
            .iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            a = agg[r["label"]]
            a[0] += r["e_tp"]
            a[1] += r["e_fp"]
            a[2] += r["t_tp"]
            a[3] += r["t_fp"]

    ent_gold, tok_gold = _gold_index(gold_table, mappings, to_retain)
    gold_ent_counts = defaultdict(int)
    for spans in ent_gold.values():
        for lab in spans.values():
            gold_ent_counts[lab] += 1
    gold_tok_counts = defaultdict(int)
    for toks in tok_gold.values():
        for lab in toks.values():
            gold_tok_counts[lab] += 1

    def metrics(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return {"tp": tp, "fp": fp, "fn": fn, "p": round(p, 4),
                "r": round(r, 4), "f1": round(f1, 4)}

    out = {"entity": {}, "token": {}}
    # snapshot gold-supported labels BEFORE the metrics loop: gold_counts is
    # a defaultdict and the fn lookup below inserts 0-count entries for
    # pred-only labels, which must not enter macro/weighted support
    ent_support = dict(gold_ent_counts)
    tok_support = dict(gold_tok_counts)
    for kind, tp_i, fp_i, gold_counts in (("entity", 0, 1, gold_ent_counts),
                                          ("token", 2, 3, gold_tok_counts)):
        tot_tp = tot_fp = tot_fn = 0
        for lab in sorted(set(agg) | set(gold_counts)):
            tp = agg[lab][tp_i]
            fp = agg[lab][fp_i]
            fn = gold_counts[lab] - tp
            out[kind][lab] = metrics(tp, fp, max(fn, 0))
            tot_tp += tp
            tot_fp += fp
            tot_fn += max(fn, 0)
        out[kind]["micro"] = metrics(tot_tp, tot_fp, tot_fn)
        # macro = unweighted mean over gold-supported labels; weighted =
        # gold-entity-support weighting (reference analysis.py:123-139)
        support = ent_support if kind == "entity" else tok_support
        labs = sorted(support)
        if labs:
            tot = sum(support.values())
            for name, wts in (("macro", {l: 1.0 / len(labs) for l in labs}),
                              ("weighted",
                               {l: support[l] / tot for l in labs})):
                p = sum(out[kind][l]["p"] * wts[l] for l in labs)
                r = sum(out[kind][l]["r"] * wts[l] for l in labs)
                f1 = 2 * p * r / (p + r) if p + r else 0.0
                out[kind][name] = {"p": round(p, 4), "r": round(r, 4),
                                   "f1": round(f1, 4)}
    return out


def token_cross_entropy(pred_ds, gold_table: pa.Table, total_tokens: int, *,
                        mappings=None) -> float:
    """Mean token-level cross-entropy of the predicted span confidences vs
    the BILU-expanded gold labels (reference ``compute_logloss``,
    analysis.py:165-210: per-doc label space = gold labels; predicted
    labels outside it are skipped; O prob = 1 - sum of fired confs; rows
    are eps-clipped and renormalised as in sklearn ``log_loss``).

    Tokens with no gold span and no prediction contribute ~0 loss, so only
    turns carrying spans are visited; ``total_tokens`` (corpus token count)
    normalises the summed loss exactly as ``tok_logloss / tok_nb``.

    Distributed shape: per-turn span groups stream through
    ``groupby(conv_id, turn_idx).map_groups`` emitting one scalar partial
    per turn; the tiny partial column is summed on the driver.
    """
    import numpy as np
    import pandas as pd

    mp = dict(mappings) if mappings else {}
    gold_by_key: dict = {}
    for r in gold_table.to_pylist():
        key = (r["conv_id"], r["turn_idx"])
        gold_by_key.setdefault(key, []).append(
            (r["start"], r["end"], r["label"]))
    gold_ref = ray.put(gold_by_key)
    EPS = 1e-15

    def bilu_cells(start, end, label):
        if end == start + 1:
            yield start, "U-" + label
        else:
            yield start, "B-" + label
            for i in range(start + 1, end - 1):
                yield i, "I-" + label
            yield end - 1, "L-" + label

    def turn_loss(group: pd.DataFrame) -> pd.DataFrame:
        gold = ray.get(gold_ref)
        key = (group["conv_id"].iloc[0], int(group["turn_idx"].iloc[0]))
        gold_spans = gold.get(key, [])
        all_labels = sorted({lab for _, _, lab in gold_spans})
        pos = {"O": 0}
        for lab in all_labels:
            for b in "BILU":
                pos[f"{b}-{lab}"] = len(pos)
        dim = len(pos)
        # tokens that carry any mass (gold or pred); others are ~0 loss
        tok_gold: dict[int, int] = {}
        for s, e, lab in gold_spans:
            for t, cell in bilu_cells(s, e, lab):
                tok_gold[t] = pos[cell]
        tok_pred: dict[int, np.ndarray] = {}
        for s, e, lab, conf in zip(group["start"], group["end"],
                                   group["label"], group["conf"]):
            lab = mp.get(lab, lab)
            if lab not in all_labels:
                continue
            for t, cell in bilu_cells(int(s), int(e), lab):
                v = tok_pred.setdefault(t, np.zeros(dim))
                v[pos[cell]] = float(conf)
        loss = 0.0
        for t in set(tok_gold) | set(tok_pred):
            pred = tok_pred.get(t)
            if pred is None:
                pred = np.zeros(dim)
            pred = pred.copy()
            pred[0] = max(1.0 - pred[1:].sum(), 0.0)
            pred = np.clip(pred, EPS, 1 - EPS)
            pred /= pred.sum()
            gidx = tok_gold.get(t, 0)
            loss += -float(np.log(pred[gidx]))
        return pd.DataFrame({"loss": [loss]})

    parts = pred_ds.groupby(["conv_id", "turn_idx"]).map_groups(
        turn_loss, batch_format="pandas")
    total = sum(float(b["loss"].sum())
                for b in parts.iter_batches(batch_format="pandas"))
    return total / max(total_tokens, 1)
