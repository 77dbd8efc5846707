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


def expand_person_variants(first_name: str, last_name: str) -> set[str]:
    """Crunchbase person-name variants (annotations.py:1608-1617):
    "First Last", "F. Last"; for two-part first names also
    "First1 Last", "First1 F2. Last" and "F1. F2. Last".  Variants
    shorter than 3 chars or equal to a legal suffix are dropped
    (annotations.py:1620-1621)."""
    out = set()
    if first_name and last_name:
        out.add(f"{first_name} {last_name}")
        out.add(f"{first_name[0]}. {last_name}")
        if " " in first_name:
            f1, f2 = first_name.split(" ", 1)
            if f1 and f2:
                out.add(f"{f1} {last_name}")
                out.add(f"{f1} {f2[0]}. {last_name}")
                out.add(f"{f1[0]}. {f2[0]}. {last_name}")
    return {alt for alt in out
            if len(alt) > 2 and alt.lower().rstrip(".") not in LEGAL_SUFFIXES}


def compile_crunchbase(org_ds, people_ds):
    """Crunchbase-style (organisations, people) tables -> gazetteer table
    with the reference's variant expansion (compile_crunchbase_data,
    annotations.py:1578-1625): company alias fixpoint for org rows tagged
    company/investor (else ORG), first-initial person variants for people.

    ``org_ds`` columns: name, role ('company'/'investor'/other);
    ``people_ds`` columns: first_name, last_name."""

    def orgs(batch: pd.DataFrame) -> pd.DataFrame:
        names, labels = [], []
        for name, role in zip(batch["name"], batch["role"]):
            label = "COMPANY" if str(role) in {"company", "investor"} \
                else "ORG"
            for alt in expand_company_aliases(str(name)):
                names.append(alt)
                labels.append(label)
        return pd.DataFrame({"name": names, "label": labels})

    def people(batch: pd.DataFrame) -> pd.DataFrame:
        names = []
        for fn, ln in zip(batch["first_name"], batch["last_name"]):
            names.extend(expand_person_variants(str(fn), str(ln)))
        return pd.DataFrame({"name": names,
                             "label": ["PERSON"] * len(names)})

    both = org_ds.map_batches(orgs, batch_format="pandas").union(
        people_ds.map_batches(people, batch_format="pandas"))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        labels = sorted(set(group["label"]))
        return pd.DataFrame({"name": [group["name"].iloc[0]],
                             "labels": [",".join(labels)],
                             "nb_entities": [len(group)]})

    return both.groupby("name").map_groups(merge, batch_format="pandas")


def expand_product_variants(name: str) -> set[str]:
    """Product-name variants (compile_product_data /
    compile_wiki_product_data, annotations.py:1627-1683): skip
    parenthesised titles; add the iPad-style lowercase-first variant for
    I/E + Upper + lower titles; add plural ('es' after s) for names of at
    most two words."""
    if "(" in name or len(name) <= 2:
        return set()
    out = {name}
    if name[0] in {"I", "E"} and name[1].isupper() and name[2].islower():
        out.add(name[0].lower() + name[1:])
    for n in list(out):
        if len(n.split()) <= 2:
            out.add(n + ("es" if name.endswith("s") else "s"))
    return out


def compile_products(names_ds, *, name_col: str = "name"):
    """Product-name table -> PRODUCT gazetteer with plural/lowercase
    variant expansion (annotations.py:1627-1683)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        names = []
        for name in batch[name_col]:
            names.extend(expand_product_variants(str(name)))
        return pd.DataFrame({"name": names,
                             "label": ["PRODUCT"] * len(names)})

    cleaned = names_ds.map_batches(f, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"name": [group["name"].iloc[0]],
                             "labels": ["PRODUCT"],
                             "nb_entities": [len(group)]})

    return cleaned.groupby("name").map_groups(merge, batch_format="pandas")


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


def build_form_frequencies(turns_ds, *, text_col: str = "text",
                           min_count: int = 2) -> dict[str, dict[str, float]]:
    """Corpus-derived case-form frequency table for truecasing
    (stands in for the reference's prebuilt FORM_FREQUENCIES blob,
    spacy_wrapper.py:199-205).

    Distributed shape: per-batch partial (lower, form, n) counts ->
    ``groupby(lower, form).Sum`` -> vocabulary-sized result collected to a
    broadcastable dict.  Sentence-start tokens are excluded so sentence
    capitalisation does not bias the counts."""
    import ray
    from ray.data.aggregate import Sum

    from ..tokenizer import make_doc

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for text in batch[text_col]:
            d = make_doc(str(text))
            for i, tok in enumerate(d.tokens):
                if d.is_alpha[i] and not d.sent_start[i]:
                    key = (d.lowers[i], tok)
                    counts[key] = counts.get(key, 0) + 1
        if not counts:
            return pd.DataFrame({"lower": [], "form": [], "n": []})
        lowers, forms = zip(*counts)
        return pd.DataFrame({"lower": lowers, "form": forms,
                             "n": list(counts.values())})

    agg = (turns_ds.map_batches(partial, batch_format="pandas")
           .groupby(["lower", "form"]).aggregate(Sum("n", alias_name="n")))
    table: dict[str, dict[str, float]] = {}
    for b in agg.iter_batches(batch_format="pandas"):
        for lower, form, n in zip(b["lower"], b["form"], b["n"]):
            if n >= min_count:
                table.setdefault(lower, {})[form] = float(n)
    # normalise to relative frequencies
    for lower, forms in table.items():
        total = sum(forms.values())
        for form in forms:
            forms[form] /= total
    return table
