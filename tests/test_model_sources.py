"""Model-source stand-ins: registry parity with the reference's 48-source
space (labelling.py:14-23) and distinct per-model output profiles."""

import numpy as np

from weak_supervision_for_ner_ray.data import FIRST_NAMES, builtin_gazetteers
from weak_supervision_for_ner_ray.sources.registry import (LFBank,
                                                           SOURCE_NAMES,
                                                           SOURCE_PRIORS)
from weak_supervision_for_ner_ray.tokenizer import make_doc

# the reference's SOURCE_NAMES, labelling.py:14-23 (sorted, ASCII order)
REFERENCE_SOURCE_NAMES = sorted([
    'BTC', 'BTC+c', 'SEC', 'SEC+c', 'company_type_detector',
    'compound_detector', 'conll2003', 'conll2003+c', 'core_web_md',
    'core_web_md+c', 'crunchbase_cased', 'crunchbase_uncased',
    'date_detector', 'doc_history', 'doc_majority_cased',
    'doc_majority_uncased', 'full_name_detector', 'geo_cased', 'geo_uncased',
    'infrequent_compound_detector', 'infrequent_nnp_detector',
    'infrequent_proper2_detector', 'infrequent_proper_detector',
    'legal_detector', 'misc_detector', 'money_detector',
    'multitoken_crunchbase_cased', 'multitoken_crunchbase_uncased',
    'multitoken_geo_cased', 'multitoken_geo_uncased',
    'multitoken_product_cased', 'multitoken_product_uncased',
    'multitoken_wiki_cased', 'multitoken_wiki_small_cased',
    'multitoken_wiki_small_uncased', 'multitoken_wiki_uncased',
    'nnp_detector', 'number_detector', 'product_cased', 'product_uncased',
    'proper2_detector', 'proper_detector', 'snips', 'time_detector',
    'wiki_cased', 'wiki_small_cased', 'wiki_small_uncased', 'wiki_uncased',
])


def test_source_registry_matches_reference():
    assert len(SOURCE_NAMES) == 48
    assert SOURCE_NAMES == REFERENCE_SOURCE_NAMES
    # every source has priors; model sources carry the NUMBER_NERS update
    assert all(s in SOURCE_PRIORS for s in SOURCE_NAMES)
    from weak_supervision_for_ner_ray.constants import NUMBER_NERS
    for src in ["BTC", "BTC+c", "SEC", "SEC+c", "conll2003", "conll2003+c"]:
        for l in NUMBER_NERS:
            assert SOURCE_PRIORS[src][l] == (0.8, 0.01), (src, l)
    # reference prior values spot-check (labelling.py:30-37)
    assert SOURCE_PRIORS["BTC"]["PERSON"] == (0.4, 0.4)
    assert SOURCE_PRIORS["SEC"]["ORG"] == (0.1, 0.1)
    assert SOURCE_PRIORS["conll2003"]["COMPANY"] == (0.7, 0.7)


def _bank():
    return LFBank(builtin_gazetteers(), FIRST_NAMES)


def test_model_standins_have_distinct_profiles():
    bank = _bank()
    doc = make_doc("Maria Jensen joined Acme Holdings Inc in Oslo "
                   "on March 3 , 2021 paying $ 5 million .")

    core = bank.models["core_web_md"].predict(doc)
    conll = bank.models["conll2003"].predict(doc)
    btc = bank.models["BTC"].predict(doc)
    sec = bank.models["SEC"].predict(doc)

    core_labels = {lab for _, _, lab in core}
    # the base model emits numeric/date/money entities ...
    assert core_labels & {"DATE", "MONEY", "CARDINAL"}
    # ... the newswire stand-in never does (CoNLL label scheme)
    assert all(lab in {"PERSON", "ORG", "COMPANY", "GPE", "LOC"}
               for _, _, lab in conll), conll
    # BTC keeps only short mentions
    assert all(e - s <= 3 for s, e, _ in btc)
    # SEC is the sparsest source
    assert len(sec) <= len(core)
    assert len(sec) <= len(conll)
    # each raw model layer also has a +c layer in the turn output
    _, layers = bank.annotate_turn("Maria Jensen joined Acme Holdings Inc .")
    for m in ("core_web_md", "conll2003", "BTC", "SEC"):
        assert m in layers.by_source or not bank.models[m].predict(
            make_doc("Maria Jensen joined Acme Holdings Inc ."))


def test_sec_standin_requires_financial_shape():
    bank = _bank()
    # no legal suffix, no known full name, no country -> SEC silent
    doc = make_doc("the committee discussed several topics yesterday .")
    assert bank.models["SEC"].predict(doc) == []
    # OOV legal-suffix org (proper-span path keeps the suffix) -> SEC ORG
    doc2 = make_doc("Quuxbar Systems Ltd reported earnings .")
    out = bank.models["SEC"].predict(doc2)
    assert any(lab == "ORG" for _, _, lab in out), out
