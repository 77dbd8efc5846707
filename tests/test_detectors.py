"""Golden-span tests per labeling function (FIXTURES.md §6), mirroring the
reference detector behaviour on hand-written sentences."""

from weak_supervision_for_ner_ray.functions import detectors as det
from weak_supervision_for_ner_ray.functions.spans import Layers
from weak_supervision_for_ner_ray.sources.registry import LFBank
from weak_supervision_for_ner_ray.tokenizer import make_doc


def spans_of(fn, text, layers=None):
    doc = make_doc(text)
    layers = layers if layers is not None else Layers()
    return sorted((s, e, lab) for s, e, lab in fn(doc, layers)), doc


def test_date_day_and_full_date():
    spans, d = spans_of(det.date_detector,
                        "He left on Tuesday and came back 21 October 1998.")
    texts = {d.span_text(s, e): lab for s, e, lab in spans}
    assert texts == {"Tuesday": "DATE", "21 October 1998": "DATE"}


def test_date_first_of_may_pattern():
    spans, d = spans_of(det.date_detector, "Due on the 1st of May 2021.")
    texts = {d.span_text(s, e) for s, e, _ in spans}
    assert "1st of May 2021" in texts


def test_date_modal_may_skipped():
    spans, d = spans_of(det.date_detector, "They may pay later.")
    assert spans == []


def test_time_patterns():
    spans, d = spans_of(det.time_detector, "at 3 pm or 14:30 today")
    texts = {d.span_text(s, e) for s, e, _ in spans}
    assert texts == {"3 pm", "14:30"}


def test_money_symbol_prefix_and_magnitude():
    spans, d = spans_of(det.money_detector, "pay $149 million now")
    texts = {d.span_text(s, e): lab for s, e, lab in spans}
    assert texts == {"$149 million": "MONEY"}


def test_money_code_suffix():
    spans, d = spans_of(det.money_detector, "cost 25 USD flat")
    texts = {d.span_text(s, e) for s, e, _ in spans}
    assert texts == {"25 USD"}


def test_number_percent_quantity_ordinal_cardinal():
    spans, d = spans_of(det.number_detector,
                        "12 percent of 500 tons vs the 21st of 42 firms")
    got = {d.span_text(s, e): lab for s, e, lab in spans}
    assert got["12 percent"] == "PERCENT"
    assert got["500 tons"] == "QUANTITY"
    # reference quirk: ORDINALS covers "21st"-style forms, not "3rd"
    # (annotations.py:30-31)
    assert got["21st"] == "ORDINAL"
    assert got["42"] == "CARDINAL"


def test_legal_article_refs():
    doc = make_doc("See Article 5 - 6 of the code")
    layers = Layers()
    layers.by_source["proper2_detector"] = {}
    layers.by_source["nnp_detector"] = {}
    spans = sorted(det.legal_detector(doc, layers))
    texts = {doc.span_text(s, e): lab for s, e, lab in spans}
    assert texts == {"Article 5 - 6": "LAW"}


def test_misc_country_norp_language():
    doc = make_doc("He is German and spoke fluent Spanish in Norway")
    layers = Layers()
    layers.by_source["proper_detector"] = {}
    spans = sorted(det.misc_detector(doc, layers))
    got = {(doc.span_text(s, e), lab) for s, e, lab in spans}
    assert ("Norway", "GPE") in got
    assert ("German", "NORP") in got
    assert ("Spanish", "LANGUAGE") in got


def test_company_type_detector():
    cd = det.CompanyTypeDetector()
    spans, d = spans_of(cd, "Shares of Acme Corp fell while Nordea Bank AB rose")
    texts = {d.span_text(s, e): lab for s, e, lab in spans}
    assert texts.get("Acme Corp") == "COMPANY"
    assert texts.get("Nordea Bank AB") == "COMPANY"


def test_full_name_detector():
    fd = det.FullNameDetector({"Scott", "Anna"})
    spans, d = spans_of(fd, "Yesterday Scott Moore met Anna von Berg briefly")
    texts = {d.span_text(s, e): lab for s, e, lab in spans}
    assert texts.get("Scott Moore") == "PERSON"
    assert texts.get("Anna von Berg") == "PERSON"


def test_snips_detector_labels():
    spans, d = spans_of(det.snips_detector,
                        "On Tuesday they paid $5 million, about 12 percent.")
    got = {(d.span_text(s, e), lab) for s, e, lab in spans}
    assert ("Tuesday", "DATE") in got
    assert any(lab == "MONEY" for _, lab in got)
    assert ("12 percent", "PERCENT") in got


def test_exclusivity_anti_join():
    """number_detector must not fire inside date spans (annotations.py:310)."""
    bank_gaz = {n: {} for n in ["wiki", "wiki_small", "geo", "crunchbase",
                                "product"]}
    bank = LFBank(bank_gaz, [])
    doc, layers = bank.annotate_turn("Due 21 October 1998 with 42 firms.")
    number_spans = {doc.span_text(s, e)
                    for (s, e) in layers.by_source["number_detector"]}
    assert "42" in number_spans
    assert all("1998" not in t and "21" != t for t in number_spans)


def test_confidence_renormalisation():
    layers = Layers()
    layers.clear_source("x")
    layers.add(0, 2, "ORG", "x", 0.8)
    layers.add(0, 2, "GPE", "x", 0.8)
    vals = layers.by_source["x"][(0, 2)]
    assert sum(c for _, c in vals) <= 1.0 + 1e-9
    labels = [lab for lab, _ in vals]
    assert labels == ["ORG", "GPE"]
