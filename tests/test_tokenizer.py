from weak_supervision_for_ner_ray.tokenizer import (in_compound, make_doc,
                                                    tokenise)


def toks(text):
    return [t for t, _ in tokenise(text)]


def test_basic_tokenisation():
    assert toks("Best Buy Co said.") == ["Best", "Buy", "Co", "said", "."]


def test_offsets_reproduce_surface():
    text = 'He said: "pay $3,400 to Jean-Pierre\'s firm (Acme Ltd.) now!"'
    for tok, start in tokenise(text):
        assert text[start:start + len(tok)] == tok


def test_genitive_split():
    assert toks("Moore's firm") == ["Moore", "'s", "firm"]


def test_hyphen_split():
    assert toks("Jean-Pierre came") == ["Jean", "-", "Pierre", "came"]


def test_currency_code_prefix():
    assert toks("USD3,400 paid") == ["USD", "3,400", "paid"]


def test_magnitude_suffix():
    assert toks("worth 3bn today") == ["worth", "3", "bn", "today"]


def test_currency_symbol_split():
    assert toks("$149 million") == ["$", "149", "million"]


def test_percent_split():
    assert toks("up 5% today") == ["up", "5", "%", "today"]


def test_abbreviations_keep_dot():
    assert toks("on Oct. 21 Mr. Smith left") == \
        ["on", "Oct.", "21", "Mr.", "Smith", "left"]


def test_interior_period_kept():
    assert toks("the U.S. economy") == ["the", "U.S.", "economy"]


def test_legal_suffix_dot_split():
    # company suffix periods split so sentence boundaries are detectable
    assert toks("Acme Corp. Wayne Inc won.") == \
        ["Acme", "Corp", ".", "Wayne", "Inc", "won", "."]


def test_sentence_starts():
    d = make_doc("Acme won. Wayne lost!")
    starts = [d.tokens[i] for i in range(len(d)) if d.sent_start[i]]
    assert starts == ["Acme", "Wayne"]


def test_likely_proper():
    d = make_doc("The bank said Acme Corp hired Scott Moore in May.")
    proper = {d.tokens[i] for i in range(len(d)) if d.likely_proper[i]}
    assert {"Acme", "Corp", "Scott", "Moore"} <= proper
    assert "The" not in proper and "bank" not in proper
    # "May" is a frequent word (month) -> only proper if non-initial titled
    assert "May" in proper


def test_ipad_casing_is_proper():
    d = make_doc("the iPad sold well")
    assert d.likely_proper[d.tokens.index("iPad")]


def test_upper_currency_not_proper():
    d = make_doc("paid USD 100 to IBM")
    assert not d.likely_proper[d.tokens.index("USD")]
    assert d.likely_proper[d.tokens.index("IBM")]


def test_modal_tag():
    d = make_doc("they may pay in May")
    assert d.tag[d.tokens.index("may")] == "MD"
    assert d.tag[d.tokens.index("May")] != "MD"


def test_compound_heuristic():
    d = make_doc("He met Scott Moore yesterday")
    i = d.tokens.index("Scott")
    assert d.compound[i]
    assert in_compound(d, i + 1)
    assert not in_compound(d, d.tokens.index("yesterday"))


def test_empty_text():
    assert len(make_doc("")) == 0


def test_truecase_text():
    from weak_supervision_for_ner_ray.tokenizer import truecase_text

    freqs = {"apple": {"apple": 0.9, "Apple": 0.1},
             "paris": {"Paris": 0.95, "paris": 0.05}}
    # mid-sentence mis-cased common word is lowered
    assert truecase_text("I Ate An Apple Today", freqs) == \
        "I Ate An apple Today"
    # frequent form (>= min_prob) untouched
    assert truecase_text("He visited Paris today", freqs) == \
        "He visited Paris today"
    # sentence-start tokens never touched
    assert truecase_text("Apple pie is nice", freqs) == "Apple pie is nice"
    # long docs returned unchanged
    long = "The Apple " + "word " * 30
    assert truecase_text(long, freqs) == long


def test_build_form_frequencies(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from weak_supervision_for_ner_ray.sources.etl import \
        build_form_frequencies

    texts = ["we ate an apple .", "he had an apple too .",
             "the Apple on the table .", "an apple a day ."]
    ds = rd.from_arrow(pa.table({"text": texts}))
    t = build_form_frequencies(ds, min_count=1)
    assert abs(t["apple"]["apple"] - 0.75) < 1e-9
    assert abs(t["apple"]["Apple"] - 0.25) < 1e-9


def test_correct_parsing_overrides():
    """_correct_parsing semantics (spacy_wrapper.py:242-265): currency
    codes tag NNP, magnitude abbreviations tag CD, and 'won' after a
    numeric magnitude is the Korean currency (NNP), while the verb 'won'
    stays untagged as a proper noun."""
    d = make_doc("paid 5 mln USD")
    assert d.tag[d.tokens.index("mln")] == "CD"
    assert d.tag[d.tokens.index("USD")] == "NNP"
    d2 = make_doc("sold for 500 billion won today")
    assert d2.tag[d2.tokens.index("won")] == "NNP"
    d3 = make_doc("the team won the game")
    assert d3.tag[d3.tokens.index("won")] != "NNP"
