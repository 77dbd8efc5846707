"""Gazetteer ETL operators (compile_* family) and split helpers."""

import pyarrow as pa

import ray
import ray.data as rd

from weak_supervision_for_ner_ray.sources.etl import (compile_gazetteer,
                                                      compile_geo,
                                                      expand_company_aliases,
                                                      gazetteer_table_to_dict,
                                                      split_by_conv_hash)


def to_arrow(ds):
    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    return pa.concat_tables(tables) if tables else pa.table({})


def test_compile_gazetteer_filters_and_merges(ray_session):
    names = rd.from_arrow(pa.table({
        "name": ["Acme Corp (company)", "Acme Corp", "Παράδειγμα",
                 "Very Long Name " * 5, "Paris", "Paris", "Common Word"],
        "label": ["ORG", "COMPANY", "ORG", "ORG", "LOC", "PER", "ORG"],
        "freq": [10.0, 10.0, 1.0, 1.0, 5.0, 5.0, 99999.0],
    }))
    out = to_arrow(compile_gazetteer(names, freq_col="freq",
                                     remap={"PER": "PERSON",
                                            "LOC": "GPE"}))
    rows = {r["name"]: r for r in out.to_pylist()}
    # parenthetical stripped -> merged with the plain form, two labels
    assert rows["Acme Corp"]["nb_entities"] == 2
    assert set(rows["Acme Corp"]["labels"].split(",")) == {"COMPANY", "ORG"}
    # class remap applied; duplicate name across classes merged
    assert set(rows["Paris"]["labels"].split(",")) == {"GPE", "PERSON"}
    # non-latin-1, too-long, and high-frequency names dropped
    assert "Παράδειγμα" not in rows
    assert all("Very Long" not in n for n in rows)
    assert "Common Word" not in rows


def test_compile_geo_population_threshold(ray_session):
    geo = rd.from_arrow(pa.table({
        "name": ["Smallville", "Metropolis"],
        "population": [5000, 2000000],
    }))
    out = to_arrow(compile_geo(geo))
    assert out.to_pydict()["name"] == ["Metropolis"]


def test_expand_company_aliases():
    aliases = expand_company_aliases("The Nordea Bank AB")
    assert "nordea" in {a.lower() for a in aliases}
    assert "the nordea bank ab" in {a.lower() for a in aliases}
    # suffix-only / generic-only reductions present
    lows = {a.lower() for a in aliases}
    assert "nordea bank" in lows


def test_gazetteer_table_roundtrip(ray_session):
    names = rd.from_arrow(pa.table({
        "name": ["Acme Corp", "Oslo"],
        "label": ["COMPANY", "GPE"],
    }))
    d = gazetteer_table_to_dict(to_arrow(compile_gazetteer(names)))
    assert "Acme Corp" in d["COMPANY"]
    assert "Oslo" in d["GPE"]


def test_split_by_conv_hash(ray_session, small_corpus):
    turns, _, _ = small_corpus
    ds = rd.from_arrow(turns)
    train, dev = split_by_conv_hash(ds, dev_fraction=0.2)
    t = to_arrow(train)
    d = to_arrow(dev)
    assert t.num_rows + d.num_rows == turns.num_rows
    # conversations never straddle the split
    tset = set(t["conv_id"].to_pylist())
    dset = set(d["conv_id"].to_pylist())
    assert not (tset & dset)
    assert len(dset) > 0


def test_expand_person_variants():
    from weak_supervision_for_ner_ray.sources.etl import \
        expand_person_variants

    v = expand_person_variants("Mary Jane", "Watson")
    assert "Mary Jane Watson" in v
    assert "M. Watson" in v
    assert "Mary Watson" in v
    assert "Mary J. Watson" in v
    assert "M. J. Watson" in v
    # too-short and legal-suffix variants dropped
    assert all(len(x) > 2 for x in v)


def test_compile_crunchbase(ray_session):
    from weak_supervision_for_ner_ray.sources.etl import compile_crunchbase

    orgs = rd.from_arrow(pa.table({
        "name": ["The Nordea Bank AB", "Open Data Group"],
        "role": ["company", "nonprofit"],
    }))
    people = rd.from_arrow(pa.table({
        "first_name": ["Ada"], "last_name": ["Lovelace"],
    }))
    d = gazetteer_table_to_dict(to_arrow(compile_crunchbase(orgs, people)))
    assert any("Nordea" in n for n in d["COMPANY"])
    assert any("Open Data" in n for n in d.get("ORG", []))
    assert "Ada Lovelace" in d["PERSON"]
    assert "A. Lovelace" in d["PERSON"]


def test_compile_products_variants(ray_session):
    from weak_supervision_for_ner_ray.sources.etl import compile_products

    names = rd.from_arrow(pa.table({
        "name": ["IPad", "Road Bike", "Widget (toy)"],
    }))
    d = gazetteer_table_to_dict(to_arrow(compile_products(names)))
    prods = set(d["PRODUCT"])
    assert "iPad" in prods            # lowercase-first variant
    assert "IPads" in prods           # plural
    assert "Road Bikes" in prods
    assert not any("Widget" in p for p in prods)   # parenthesised dropped


def test_export_ner_json_roundtrip(ray_session, tmp_path):
    """convert_to_json equivalent (annotations.py:416-443): the exported
    span JSON round-trips byte-for-value against the source ner table."""
    import json
    import os

    from weak_supervision_for_ner_ray.sources.etl import export_ner_json

    ner = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "start": pa.array([1, 0, 2], pa.int32()),
        "end": pa.array([3, 1, 4], pa.int32()),
        "label": pa.array(["PERSON", "GPE", "ORG"], pa.string()),
        "conf": pa.array([0.9, 0.5, 0.75], pa.float32()),
    })
    out = str(tmp_path / "ner_json")
    export_ner_json(rd.from_arrow(ner), out)
    rows = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            for line in fh:
                if line.strip():
                    rows.append(json.loads(line))
    got = sorted((r["conv_id"], r["turn_idx"], r["start"], r["end"],
                  r["label"], round(float(r["conf"]), 4)) for r in rows)
    exp = sorted(zip(ner["conv_id"].to_pylist(), ner["turn_idx"].to_pylist(),
                     ner["start"].to_pylist(), ner["end"].to_pylist(),
                     ner["label"].to_pylist(),
                     [round(c, 4) for c in ner["conf"].to_pylist()]))
    assert got == exp
