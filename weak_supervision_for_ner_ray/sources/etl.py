"""Gazetteer ETL operators (offline pipelines that build the broadcast
gazetteers).

Reimplements the reference's compile_* family as Ray Data pipelines over a
relational names table instead of ad-hoc file loops:

 * ``compile_gazetteer``   — generic: filter, clean, dedup-merge by name
   (compile_wikidata semantics: class remap, frequency filter, latin-1
   filter, <=10-token filter, duplicate-name merge; annotations.py:1418-1495)
 * ``compile_geo``         — population threshold filter
   (compile_geographical_data, annotations.py:1546-1575)
 * ``expand_company_aliases`` — fixpoint alias expansion
   (get_alternative_company_names, annotations.py:1498-1542), shared with
   the entity-linking alias index.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..constants import GENERIC_TOKENS, LEGAL_SUFFIXES
from ..tokenizer import tokenise

# PER/LOC remapping used when ingesting wikidata-style classes
# (annotations.py:1437-1449)
CLASS_REMAP = {"PER": "PERSON", "ORG": "ORG", "LOC": "GPE"}


def _clean_name(name: str) -> str:
    """Strip parentheticals and appositions (annotations.py:691)."""
    return name.split("(")[0].split(",")[0].rstrip()


def compile_gazetteer(names_ds, *, name_col: str = "name",
                      label_col: str = "label",
                      freq_col: str | None = None,
                      max_freq: float = 10000.0,
                      max_tokens: int = 10,
                      remap: dict[str, str] | None = None):
    """names table -> cleaned gazetteer table (name, labels list).

    Filters: corpus frequency > ``max_freq`` dropped (annotations.py:1467),
    names longer than ``max_tokens`` dropped, non-latin-1 names dropped;
    duplicate names across classes merged into multi-label rows
    (annotations.py:1453-1458 / 695-698)."""

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        out_name, out_label = [], []
        freqs = batch[freq_col] if freq_col else None
        for i, (name, label) in enumerate(zip(batch[name_col],
                                              batch[label_col])):
            if freqs is not None and freqs.iloc[i] > max_freq:
                continue
            name = _clean_name(str(name))
            if not name:
                continue
            try:
                name.encode("latin-1")
            except UnicodeEncodeError:
                continue
            if len(tokenise(name)) > max_tokens:
                continue
            if remap:
                label = remap.get(label, label)
            out_name.append(name)
            out_label.append(label)
        return pd.DataFrame({"name": out_name, "label": out_label})

    cleaned = names_ds.map_batches(clean, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        labels = sorted(set(group["label"]))
        return pd.DataFrame({"name": [group["name"].iloc[0]],
                             "labels": [",".join(labels)],
                             "nb_entities": [len(group)]})

    return cleaned.groupby("name").map_groups(merge, batch_format="pandas")


def compile_geo(names_ds, *, population_threshold: int = 100000):
    """Geonames-style table (name, population) -> GPE gazetteer
    (annotations.py:1546-1575)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["population"] >= population_threshold]
        return pd.DataFrame({"name": keep["name"].map(_clean_name),
                             "label": ["GPE"] * len(keep)})

    return names_ds.map_batches(f, batch_format="pandas")


def expand_company_aliases(name: str) -> set[str]:
    """Fixpoint expansion of informal company-name variants
    (annotations.py:1498-1542): drop legal suffix, leading 'the', trailing
    generic token; +/- trailing periods."""
    toks = tuple(t for t, _ in tokenise(name))
    out = {toks}
    frontier = {toks}
    while frontier:
        nxt = set()
        for alt in frontier:
            if len(alt) > 1 and alt[-1].lower().rstrip(".") in LEGAL_SUFFIXES:
                nxt.add(alt[:-1])
            if len(alt) > 1 and alt[0].lower() == "the":
                nxt.add(alt[1:])
            if len(alt) > 1 and alt[-1] in GENERIC_TOKENS:
                nxt.add(alt[:-1])
            stripped = tuple(t.rstrip(".") for t in alt)
            if stripped != alt:
                nxt.add(stripped)
        frontier = nxt - out
        out |= nxt
    return {" ".join(a) for a in out if a}


def gazetteer_table_to_dict(table: pa.Table) -> dict[str, list[str]]:
    """Collected gazetteer table -> {label: [names]} broadcast shape."""
    out: dict[str, list[str]] = {}
    for row in table.to_pylist():
        labels = row.get("labels") or row.get("label")
        for label in str(labels).split(","):
            out.setdefault(label, []).append(row["name"])
    return out


def export_ner_json(ner_ds, out_dir: str):
    """Export the decoded ner table as JSON (convert_to_json equivalent,
    annotations.py:416-443 — modern layout: one JSON file per block)."""
    ner_ds.write_json(out_dir)
    return out_dir


def split_by_conv_hash(ds, dev_fraction: float = 0.1, key: str = "conv_id"):
    """Deterministic train/dev split by key hash (replaces the reference's
    positional cutoff/nb_to_skip split, annotations.py:401-410 — positional
    identity does not survive distribution)."""
    import hashlib

    buckets = 1000
    cut = int(dev_fraction * buckets)

    def bucket_of(v: str) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % buckets

    def split(batch: pd.DataFrame, want_dev: bool) -> pd.DataFrame:
        b = batch[key].map(bucket_of)
        return batch[(b < cut) if want_dev else (b >= cut)]

    train = ds.map_batches(lambda b: split(b, False), batch_format="pandas")
    dev = ds.map_batches(lambda b: split(b, True), batch_format="pandas")
    return train, dev
