import random

from weak_supervision_for_ner_ray.state.trie import TokenTrie


def brute_force_longest(entries, tokens, start, case_sensitive, max_len=10):
    best = (0, None)
    for key, value in entries.items():
        L = len(key)
        if L == 0 or L > max_len or start + L > len(tokens):
            continue
        window = tuple(tokens[start:start + L])
        if case_sensitive:
            ok = window == key
        else:
            # mirror the trie's per-token title/lower/upper probing
            ok = all(w == k or k in {w.title(), w.lower(), w.upper()}
                     for w, k in zip(window, key))
        if ok and L > best[0]:
            best = (L, value)
    return best


def test_exact_and_prefix():
    t = TokenTrie()
    t.add(("New", "York"), "NY")
    t.add(("New", "York", "City"), "NYC")
    t.add(("New",), "N")
    toks = ["New", "York", "City", "Hall"]
    assert t.longest_prefix(toks, True, 0, 10) == (3, "NYC")
    assert t.longest_prefix(toks, True, 1, 10) == (0, None)
    assert t.get(("New", "York")) == "NY"
    assert len(t) == 3


def test_uncased_probe():
    t = TokenTrie()
    t.add(("Acme", "Corp"), "A")
    assert t.longest_prefix(["acme", "corp"], False, 0, 10) == (2, "A")
    assert t.longest_prefix(["ACME", "CORP"], False, 0, 10) == (2, "A")
    assert t.longest_prefix(["acme", "corp"], True, 0, 10) == (0, None)


def test_longest_prefix_matches_brute_force():
    rng = random.Random(7)
    # keys use one canonical casing per word so the trie's greedy
    # first-alternative descent (utils.py:31-41 semantics) has a unique path
    key_vocab = ["Acme", "Corp", "New", "York", "Bank", "West", "City"]
    vocab = key_vocab + ["acme", "CORP", "new", "york", "of", "the"]
    entries = {}
    t = TokenTrie()
    for i in range(60):
        key = tuple(rng.choice(key_vocab) for _ in range(rng.randint(1, 4)))
        if key not in entries:
            entries[key] = i
            t.add(key, i)
    for trial in range(300):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        for start in range(len(tokens)):
            for cs in (True, False):
                got = t.longest_prefix(tokens, cs, start, 10)
                exp_len, _ = brute_force_longest(entries, tokens, start, cs)
                assert got[0] == exp_len, (tokens, start, cs, got, exp_len)
