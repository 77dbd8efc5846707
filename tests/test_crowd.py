"""Crowd-annotation loader tests (reference get_crowd_data semantics,
analysis.py:213-301): exact-text match, char->token span conversion with
"strange span" drops, DATETIME->DATE remap, and the reference's
drop-previous-extend-current overlap rule."""

import json

import pyarrow as pa
import pytest

import ray.data as rd

from weak_supervision_for_ner_ray.sources import crowd


TEXT1 = "Acme Corp bought Widget Inc in March 1998"
TEXT2 = "Acme Corp bought shares early"


@pytest.fixture(scope="module")
def crowd_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("crowd")
    path = str(d / "crowd.json")
    json.dump({
        "0": {"source": "Reuters", "source_doc": "0",
              "original_text": "  " + TEXT1 + " ",
              # ends are INCLUSIVE char offsets, like the reference JSON
              "annotated_text": "0-8/org 31-40/datetime 2-8/org"},
        "1": {"source": "Bloomberg", "source_doc": "1",
              "original_text": TEXT2,
              # overlapping spans: [0,9)="Acme Corp" then [5,16)
              "annotated_text": "0-8/org 5-15/per"},
        "2": {"source": "Reuters", "source_doc": "2",
              "original_text": "no matching turn here",
              "annotated_text": "0-1/org"},
    }, open(path, "w"))
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": pa.array([TEXT1, "unannotated filler", TEXT2],
                         pa.string()),
    }))
    return turns, path


def test_parse_crowd_json_remaps_and_inclusive_end(crowd_setup):
    _, path = crowd_setup
    idx = crowd.parse_crowd_json(path)
    assert idx[TEXT1] == [(0, 9, "ORG"), (31, 41, "DATE"), (2, 9, "ORG")]


def test_crowd_mentions_end_to_end(ray_session, crowd_setup):
    turns, path = crowd_setup
    out = crowd.crowd_mentions(turns, path)
    rows = sorted(zip(*[out.to_pandas()[c] for c in
                        ["conv_id", "turn_idx", "start", "end", "label"]]))
    # TEXT1: "Acme Corp"=tokens [0,2) ORG; "March 1998"=[6,8) DATE;
    # the 2-8/org span starts mid-token -> dropped ("strange span").
    # TEXT2: 0-8/org and 5-15/per overlap -> previous dropped, current
    # start extended: single [0,3) PER (reference analysis.py:288-295).
    assert rows == [("c1", 0, 0, 2, "ORG"),
                    ("c1", 0, 6, 8, "DATE"),
                    ("c2", 0, 0, 3, "PER")]
    t = out.schema()
    assert dict(zip(t.names, [str(x) for x in t.types]))["conf"] == "float"


def test_crowd_roundtrip_against_gold(ray_session):
    """synth_crowd_json re-expresses a hash-selected slice of the corpus
    gold spans in crowd-JSON layout; loading it back must recover those
    token spans EXACTLY (char->token conversion is lossless on the same
    tokeniser)."""
    import os

    import pyarrow.parquet as pq

    from weak_supervision_for_ner_ray.data import corpus_for_sf_dir
    corpus = corpus_for_sf_dir("/root/testdata/sf0.001")
    path = crowd.synth_crowd_json(corpus)
    idx = crowd.parse_crowd_json(path)
    assert idx                                       # non-empty selection
    turns = rd.read_parquet(os.path.join(corpus, "turns.parquet"))
    got = crowd.crowd_mentions(turns, path).to_pandas()
    gold = pq.read_table(os.path.join(corpus, "gold_spans.parquet")) \
        .to_pandas()
    gold["label"] = gold["label"].str.upper()
    sel_text = set(idx.keys())
    texts = pq.read_table(os.path.join(corpus, "turns.parquet"),
                          columns=["conv_id", "turn_idx", "text"]) \
        .to_pandas()
    gold = gold.merge(texts, on=["conv_id", "turn_idx"])
    gold = gold[gold["text"].str.strip().isin(sel_text)]
    key = ["conv_id", "turn_idx", "start", "end", "label"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    gold_set = set(map(tuple, gold[key].itertuples(index=False)))
    # gold is filtered to ALL turns sharing a selected text (the loader
    # matches by exact text, like the reference's sentence matching), so
    # the recovered mention set must equal it exactly — no strange-span
    # drops are possible when generator and loader share the tokeniser
    assert gold_set == got_set


def test_crowd_mentions_feed_eval(ray_session):
    """The reference's purpose for get_crowd_data is scoring sources
    against crowd labels (analysis.py evaluate path).  The loaded crowd
    mentions plug straight into evaluate_ner: using them as predictions
    against the gold spans of the crowd-covered turns scores a perfect
    micro F1 (they ARE re-expressed gold spans)."""
    import os

    import pyarrow.parquet as pq

    from weak_supervision_for_ner_ray.data import corpus_for_sf_dir
    from weak_supervision_for_ner_ray.pipelines.eval import evaluate_ner
    corpus = corpus_for_sf_dir("/root/testdata/sf0.001")
    path = crowd.synth_crowd_json(corpus)
    turns = rd.read_parquet(os.path.join(corpus, "turns.parquet"))
    pred = crowd.crowd_mentions(turns, path)
    covered = set(map(tuple, pred.to_pandas()[
        ["conv_id", "turn_idx"]].itertuples(index=False)))
    gold = pq.read_table(os.path.join(corpus, "gold_spans.parquet")) \
        .to_pandas()
    gold["label"] = gold["label"].str.upper()
    gold = gold[[tuple(r) in covered for r in
                 gold[["conv_id", "turn_idx"]].itertuples(index=False)]]
    res = evaluate_ner(pred, pa.Table.from_pandas(gold,
                                                  preserve_index=False))
    assert res["entity"]["micro"]["f1"] == 1.0
    assert res["token"]["micro"]["f1"] == 1.0


def test_crowd_mentions_schema_matches_mentions_table(ray_session,
                                                      crowd_setup):
    """Crowd mentions must be unionable with the LF mentions table so
    eval can score sources against crowd labels."""
    turns, path = crowd_setup
    out = crowd.crowd_mentions(turns, path)
    assert out.schema().names == ["conv_id", "turn_idx", "source",
                                  "start", "end", "label", "conf"]
    assert set(out.to_pandas()["source"]) == {"crowd"}
