"""Hypothesis property tests over the pure kernels (no Ray session):
randomized breadth on the invariants the example-based suites pin at
single points — SURVEY.md §5's property-test bullet."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from weak_supervision_for_ner_ray.functions.spans import (Layers, get_spans,
                                                          merge_contiguous_spans)
from weak_supervision_for_ner_ray.pipelines import ops
from weak_supervision_for_ner_ray.tokenizer import make_doc, tokenise

SETTINGS = settings(max_examples=80, deadline=None)


@SETTINGS
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64))
def test_mod_mersenne_matches_modulo(xs):
    x = np.array(xs, np.uint64)
    want = np.array([v % ((1 << 61) - 1) for v in xs], np.uint64)
    assert np.array_equal(ops._mod_mersenne(x.copy()), want)


_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("L", "N", "P", "S", "Z")),
    min_size=0, max_size=120)


@SETTINGS
@given(_text)
def test_tokenise_offsets_reproduce_surface(text):
    for tok, start in tokenise(text):
        assert text[start:start + len(tok)] == tok


@SETTINGS
@given(_text)
def test_minhash_signature_is_min_over_gram_signatures(text):
    """sig(doc) must equal the elementwise min of each shingle's own
    signature — the defining MinHash property; catches any drift between
    the batched kernel and the scalar path."""
    mh = ops.MinHasher(num_perm=16, shingle=3)
    grams = mh.gram_strings(text)
    sig = mh.signature(text)
    if not grams:
        assert (sig == np.iinfo(np.uint64).max).all()
        return
    per_gram = [mh.signature(g) for g in grams]
    assert np.array_equal(sig, np.minimum.reduce(per_gram))
    batched = mh.signatures_batch([text, text, ""])
    assert np.array_equal(batched[0], sig)
    assert np.array_equal(batched[1], sig)


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(1, 6),
                          st.sampled_from(["PERSON", "ORG", "GPE"]),
                          st.floats(0.05, 1.0)),
                min_size=1, max_size=30))
def test_layers_add_confidence_cap(adds):
    """Repeated adds on the same span renormalise so each span's total
    confidence stays ≤ 1 (+fp eps) — annotations.py:159-176 semantics."""
    layers = Layers()
    for start, length, label, conf in adds:
        layers.add(start, start + length, label, "src", conf)
    for span, labelled in layers.by_source["src"].items():
        assert sum(c for _, c in labelled) <= 1.0 + 1e-9
        labels = [lab for lab, _ in labelled]
        assert len(labels) == len(set(labels))      # no duplicate labels


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(1, 5)),
                min_size=0, max_size=12))
def test_get_spans_output_never_overlaps(raw):
    layers = Layers()
    layers.clear_source("a")
    for start, length in raw:
        layers.add(start, start + length, "X", "a")
    out = sorted(get_spans(layers, ["a"]))
    for (s1, e1), (s2, e2) in zip(out[:-1], out[1:]):
        assert s2 >= e1                              # disjoint, ordered


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(1, 3)),
                min_size=0, max_size=8))
def test_merge_contiguous_idempotent(raw):
    doc = make_doc("tok " * 40)
    spans = {}
    for start, length in raw:
        spans.setdefault((start, start + length), "X")
    # keep-longest first so the merge input is overlap-free (its contract)
    layers = Layers()
    layers.clear_source("a")
    for s, e in spans:
        layers.add(s, e, "X", "a")
    clean = {sp: "X" for sp in get_spans(layers, ["a"])}
    once = dict(merge_contiguous_spans(dict(clean), doc))
    twice = dict(merge_contiguous_spans(dict(once), doc))
    assert once == twice                             # fixpoint
    ordered = sorted(once)
    for (s1, e1), (s2, e2) in zip(ordered[:-1], ordered[1:]):
        assert s2 > e1                               # merged => gaps only


@SETTINGS
@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4),
                min_size=0, max_size=40))
def test_stable_token_hashes_match_per_token_md5(tokens):
    import hashlib
    got = ops._stable_token_hashes(tokens)
    want = np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
         for t in tokens], np.uint64)
    assert np.array_equal(got, want if tokens else np.empty(0, np.uint64))


@SETTINGS
@given(st.text(alphabet=st.characters(codec="utf-8",
                                      categories=("L", "N", "Z")),
               min_size=0, max_size=60))
def test_rolling_fingerprint_kernel_matches_bruteforce(text):
    """The vectorised Rabin-Karp kernel in doc_fingerprint_rolling must
    equal the positionwise polynomial definition."""
    k = ops._ROLL_K
    pw = ops._roll_powers()
    M = int(ops._ROLL_MOD)
    if len(text) < k:
        return
    cp = np.frombuffer(text.encode("utf-32-le"), np.uint32) \
        .astype(np.uint64)
    n_pos = len(cp) - k + 1
    h = np.zeros(n_pos, np.uint64)
    for j in range(k):
        h += cp[j:j + n_pos] * np.uint64(pw[j])
    h %= ops._ROLL_MOD
    want = [sum(ord(text[i + j]) * pw[j] for j in range(k)) % M
            for i in range(n_pos)]
    assert h.tolist() == want


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3),
                          st.integers(0, 30)),
                min_size=0, max_size=120))
def test_segment_pairs_matches_triu(rows):
    """The vectorised segment-triu expansion in _lsh_candidate_pairs
    equals np.triu_indices over the unique ids of every bucket."""
    t = np.array([r[0] for r in rows], np.int64)
    b = np.array([r[1] for r in rows], np.int64)
    v = np.array([r[2] for r in rows], np.int64)
    order = np.lexsort((v, b, t))
    t, b, v = t[order], b[order], v[order]
    keep = np.ones(len(v), bool)
    keep[1:] = (t[1:] != t[:-1]) | (b[1:] != b[:-1]) | (v[1:] != v[:-1])
    t, b, v = t[keep], b[keep], v[keep]
    seg = np.zeros(len(v), np.int64)
    if len(v):
        seg[1:] = np.cumsum((t[1:] != t[:-1]) | (b[1:] != b[:-1]))
    a, bb = ops._segment_pairs(v, seg)
    got = set(zip(a.tolist(), bb.tolist()))
    want = set()
    for key in set(zip(t.tolist(), b.tolist())):
        ids = np.unique(v[(t == key[0]) & (b == key[1])])
        ai, bi = np.triu_indices(len(ids), k=1)
        want |= set(zip(ids[ai].tolist(), ids[bi].tolist()))
    assert got == want
    assert np.all(a < bb) if len(a) else True


@given(st.lists(st.lists(st.sampled_from("ab cd ee fg hi".split()),
                         min_size=3, max_size=40),
                min_size=1, max_size=12),
       st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_repetition_stats_match_counter(tok_lists, n):
    """The composite-factorization n-gram repetition kernel equals a
    Counter brute force for every doc and every n in 2..4."""
    from collections import Counter
    tok_lists = [t for t in tok_lists if len(t) >= n]   # caller's mask
    ng, dup, top = ops._repetition_stats(tok_lists, n)
    assert len(ng) == len(tok_lists)
    for i, toks in enumerate(tok_lists):
        grams = Counter(tuple(toks[j:j + n]) for j in range(len(toks) - n + 1))
        g = len(toks) - n + 1
        assert ng[i] == g
        assert dup[i] == ((g - len(grams)) * 1_000_000) // g
        assert top[i] == (max(grams.values()) * 1_000_000) // g
