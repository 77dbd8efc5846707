"""Deterministic synthetic transcript corpus + gazetteer fixtures.

Generates the ``input_hint`` table — multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` — with news-style sentences
embedding known entities from built-in gazetteers, date/time/money/number
patterns matching the reference detectors, and *gold* span + triple tables
known by construction (FIXTURES.md §1/§4).  Conversation lengths are skewed
(long-tail conversations exercise the salting path) and rows are written in
a deterministically shuffled order so pipelines must restore
``(conv_id, turn_idx)`` order (north rule).

No external data; everything is seeded and reproducible.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from .tokenizer import make_doc

FIRST_NAMES = [
    "Scott", "Pierre", "John", "Maria", "Anna", "James", "Robert", "Linda",
    "Michael", "Elena", "David", "Sarah", "Thomas", "Laura", "Daniel",
    "Sophie", "Andrew", "Julia", "Peter", "Emma", "Richard", "Olga",
    "George", "Nina", "Henry", "Clara", "Paul", "Ingrid", "Mark", "Astrid",
    "Simon", "Greta", "Victor", "Irene", "Oscar", "Helen", "Martin", "Eva",
    "Stefan", "Lena",
]
# the name list the FullName detector consults (stand-in for the
# reference's data/first_names.json, annotations.py:17,869-875).  A
# superset of FIRST_NAMES: the corpus generator above stays fixed while
# the detector also knows common given names that appear in real text
# (e.g. the notebook's golden paragraph: Karen Jacobs, Andre Grenon).
DETECTOR_FIRST_NAMES = FIRST_NAMES + [
    "Karen", "Andre", "Alice", "Albert", "Alan", "Amy", "Barbara", "Brian",
    "Carl", "Carol", "Charles", "Chris", "Christine", "Claire", "Colin",
    "Diana", "Donald", "Dorothy", "Edward", "Eric", "Frances", "Frank",
    "Gary", "Grace", "Harold", "Helena", "Ian", "Isabel", "Jack", "Jane",
    "Jason", "Jean", "Jennifer", "Jessica", "Joan", "Joseph", "Joyce",
    "Juan", "Judith", "Kevin", "Kurt", "Larry", "Lisa", "Louis", "Lucy",
    "Marc", "Margaret", "Marie", "Martha", "Matthew", "Michelle", "Nancy",
    "Neil", "Nicholas", "Nicole", "Patricia", "Patrick", "Philip",
    "Rachel", "Raymond", "Rebecca", "Roger", "Ronald", "Rose", "Ruth",
    "Samuel", "Sandra", "Stephen", "Steven", "Susan", "Tony", "Victoria",
    "Walter", "William",
]

LAST_NAMES = [
    "Moore", "Lison", "Smith", "Johnson", "Berg", "Larsen", "Hansen",
    "Olsen", "Novak", "Kovacs", "Weber", "Fischer", "Keller", "Lund",
    "Dahl", "Nilsen", "Strand", "Holm", "Becker", "Wagner", "Schmidt",
    "Meyer", "Koch", "Richter", "Wolf", "Krause", "Vogel", "Frank",
    "Berger", "Winter", "Sommer", "Brandt", "Haas", "Pedersen", "Jensen",
    "Andersen", "Nielsen", "Eriksen", "Solberg", "Bakke",
]
COMPANY_BASES = [
    "Acme", "Globex", "Initech", "Vandelay", "Umbrella", "Stark", "Wayne",
    "Cyberdyne", "Tyrell", "Weyland", "Nordea", "Statoil", "Telenor",
    "Siemens", "Vestas", "Nokia", "Ericsson", "Orsted", "Maersk", "Bosch",
    "Altura", "Borealis", "Cascade", "Delphi", "Equinox", "Fjord",
    "Granite", "Horizon", "Ironwood", "Juniper", "Kestrel", "Lumen",
    "Meridian", "Northwind", "Obsidian", "Pinnacle", "Quartz", "Redwood",
    "Summit", "Tundra",
]
COMPANY_SUFFIXES = ["Corp", "Inc", "Ltd", "AG", "ASA", "Group", "Holdings",
                    "Bank"]
CITIES = [
    "Atlanta", "Oslo", "Paris", "Berlin", "Madrid", "Rome", "Vienna",
    "Lisbon", "Dublin", "Prague", "Helsinki", "Stockholm", "Copenhagen",
    "Amsterdam", "Brussels", "Warsaw", "Budapest", "Zurich", "Geneva",
    "Munich", "Hamburg", "Toronto", "Boston", "Chicago", "Seattle",
    "Denver", "Austin", "Portland", "Nairobi", "Lagos", "Mumbai", "Osaka",
    "Seoul", "Santiago", "Lima", "Bogota",
]
COUNTRIES_USED = ["Norway", "France", "Germany", "Spain", "Italy", "Japan",
                  "Canada", "Brazil", "India", "Kenya", "Sweden", "Denmark",
                  "Finland", "Poland", "Austria", "Portugal"]
PRODUCT_NAMES = [
    "iPhone 7", "ThinkPad X1", "Galaxy S9", "PlayStation 5", "Model S",
    "Surface Pro", "Pixel 4", "Kindle Oasis", "Roomba 960", "GoPro Hero",
    "Walkman Pro", "AeroBlade 3", "HyperDrive X", "NovaPad Mini",
    "QuantumCell 2",
]
MONTH_NAMES = ["January", "February", "March", "April", "June", "July",
               "August", "September", "October", "November", "December"]
DAY_NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday"]
TOOLS = ["search", "calculator", "database", "browser", "code"]

FILLER_USER = [
    "Can you summarise the latest filings for me?",
    "What did the report say about revenue?",
    "Please check the numbers again.",
    "Who were the parties involved in the deal?",
    "Any updates on the lawsuit?",
    "Thanks, that helps a lot.",
    "What happened next?",
    "Give me the short version please.",
]
FILLER_TOOL = [
    "query returned 42 rows in 0.13 s",
    "fetched 3 articles from the archive",
    "computation finished: result = 1024",
    "no further records found",
    "cache hit for request id 7f3a",
]


def builtin_gazetteers() -> dict[str, dict[str, list[str]]]:
    """Fixture gazetteers mirroring the reference's five sources
    (wiki / wiki_small / geo / crunchbase / product; annotations.py:336-362).
    Some names are deliberately ambiguous across labels to exercise the
    1/n-classes confidence split (annotations.py:668-669)."""
    persons = [f"{f} {l}" for f, l in zip(FIRST_NAMES * 3,
                                          LAST_NAMES + LAST_NAMES[::-1]
                                          + LAST_NAMES[5:] + LAST_NAMES[:5])]
    companies = [f"{b} {s}" for b in COMPANY_BASES
                 for s in COMPANY_SUFFIXES[:3]]
    wiki = {
        "PERSON": persons[:80],
        "COMPANY": companies[:60] + COMPANY_BASES[:20],
        "GPE": CITIES + COUNTRIES_USED,
        "PRODUCT": PRODUCT_NAMES[:8],
        # ambiguous: city names also as ORG (e.g. football clubs)
        "ORG": CITIES[:6] + ["Equinox", "Meridian"],
    }
    wiki_small = {
        "PERSON": persons[:40],
        "COMPANY": companies[:30],
        "GPE": CITIES[:20],
    }
    geo = {"GPE": CITIES + COUNTRIES_USED,
           "LOC": ["North Sea", "Lake Geneva", "Mount Elbrus",
                   "Rhine Valley"]}
    crunchbase = {
        "COMPANY": COMPANY_BASES + companies[:40],
        "PERSON": persons[40:100],
        "ORG": ["European Commission", "World Bank", "United Nations"],
    }
    product = {"PRODUCT": PRODUCT_NAMES}
    return {"wiki": wiki, "wiki_small": wiki_small, "geo": geo,
            "crunchbase": crunchbase, "product": product}


class _Gold:
    __slots__ = ("spans", "triples")

    def __init__(self):
        self.spans = []     # (char_start, char_end, label, surface)
        self.triples = []   # (subj, subj_label, pred, obj, obj_label)


def _sentence(rng: random.Random, people: list[str], companies: list[str]
              ) -> tuple[str, _Gold]:
    """One news-style sentence with known entities; returns text + gold."""
    g = _Gold()
    parts: list[str] = []
    pos = 0

    def lit(s: str):
        nonlocal pos
        parts.append(s)
        pos += len(s)

    def ent(surface: str, label: str):
        nonlocal pos
        g.spans.append((pos, pos + len(surface), label, surface))
        parts.append(surface)
        pos += len(surface)

    p1 = rng.choice(people)
    p2 = rng.choice(people)
    c1 = rng.choice(companies)
    c2 = rng.choice(companies)
    city = rng.choice(CITIES)
    country = rng.choice(COUNTRIES_USED)
    prod = rng.choice(PRODUCT_NAMES)
    day = rng.choice(DAY_NAMES)
    month = rng.choice(MONTH_NAMES)
    dom = rng.randint(1, 28)
    year = rng.randint(1995, 2025)
    amount = rng.choice([5, 12, 25, 40, 75, 110, 149, 220, 370, 500])
    pct = rng.choice([2, 3, 5, 8, 12, 15, 21])
    hour = rng.randint(1, 11)
    ampm = rng.choice(["am", "pm"])

    t = rng.randrange(10)
    if t == 0:
        c3 = rng.choice(companies)
        ent(p1, "PERSON"); lit(", chief executive of "); ent(c1, "COMPANY")
        lit(", said on "); ent(day, "DATE"); lit(" that ")
        ent(c2, "COMPANY"); lit(" will pay ")
        ent(f"${amount} million", "MONEY")
        lit(" to "); ent(c3, "COMPANY"); lit(".")
        g.triples += [(p1, "PERSON", "works_for", c1, "COMPANY"),
                      (c2, "COMPANY", "pays", c3, "COMPANY")]
    elif t == 1:
        ent(c1, "COMPANY"); lit(" acquired "); ent(c2, "COMPANY")
        lit(" for "); ent(f"${amount} million", "MONEY"); lit(" on ")
        ent(f"{dom} {month} {year}", "DATE"); lit(".")
        g.triples += [(c1, "COMPANY", "acquired", c2, "COMPANY")]
    elif t == 2:
        ent(p1, "PERSON"); lit(" visited "); ent(city, "GPE")
        lit(" last "); ent(day, "DATE"); lit(".")
        g.triples += [(p1, "PERSON", "visited", city, "GPE")]
    elif t == 3:
        ent(c1, "COMPANY"); lit(" launched the "); ent(prod, "PRODUCT")
        lit(" in "); ent(city, "GPE"); lit(" at ")
        ent(f"{hour} {ampm}", "TIME"); lit(".")
        g.triples += [(c1, "COMPANY", "launched", prod, "PRODUCT")]
    elif t == 4:
        ent(p1, "PERSON"); lit(" works for "); ent(c1, "COMPANY")
        lit(" in "); ent(city, "GPE"); lit(".")
        g.triples += [(p1, "PERSON", "works_for", c1, "COMPANY"),
                      (c1, "COMPANY", "located_in", city, "GPE")]
    elif t == 5:
        ent(p1, "PERSON"); lit(" met "); ent(p2, "PERSON")
        lit(" in "); ent(country, "GPE"); lit(" on ")
        ent(f"{dom} {month} {year}", "DATE"); lit(".")
        g.triples += [(p1, "PERSON", "met", p2, "PERSON")]
    elif t == 6:
        ent(c1, "COMPANY"); lit(" is based in "); ent(city, "GPE")
        lit(" and employs ")
        ent(f"{rng.choice([120, 450, 1300, 2700, 8100])}", "CARDINAL")
        lit(" people.")
        g.triples += [(c1, "COMPANY", "located_in", city, "GPE")]
    elif t == 7:
        lit("Revenue rose "); ent(f"{pct} percent", "PERCENT")
        lit(" to "); ent(f"${amount} million", "MONEY")
        lit(" in "); ent(str(year), "DATE"); lit(".")
    elif t == 8:
        ent(p1, "PERSON"); lit(" sued "); ent(c1, "COMPANY")
        lit(" under "); ent(f"Article {rng.randint(2, 29)}", "LAW")
        lit(" of the Securities Act.")
        g.triples += [(p1, "PERSON", "sued", c1, "COMPANY")]
    else:
        ent(c1, "COMPANY"); lit(" announced that "); ent(p1, "PERSON")
        lit(" will join "); ent(c2, "COMPANY"); lit(" in ")
        ent(month, "DATE"); lit(".")
        g.triples += [(p1, "PERSON", "works_for", c2, "COMPANY")]
    return "".join(parts), g


def _conv_turn_count(rng: random.Random) -> int:
    """Skewed conversation lengths (FIXTURES.md §1)."""
    r = rng.random()
    if r < 0.80:
        return rng.randint(2, 12)
    if r < 0.95:
        return rng.randint(13, 40)
    return rng.randint(100, 400)


def generate_corpus(n_convs: int, seed: int = 13):
    """Returns (turns, gold_spans, gold_triples) as pyarrow Tables.

    gold span offsets are *token* offsets computed with the engine tokeniser
    (FIXTURES.md §4).
    """
    rng = random.Random(seed)
    gaz = builtin_gazetteers()
    people = gaz["wiki"]["PERSON"]
    companies = [c for c in gaz["wiki"]["COMPANY"] if " " in c]

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    gs_conv, gs_turn, gs_start, gs_end, gs_label = [], [], [], [], []
    gt_conv, gt_turn, gt = [], [], {"subj": [], "subj_label": [], "pred": [],
                                    "obj": [], "obj_label": []}
    base_ts = datetime(2024, 1, 1)

    for ci in range(n_convs):
        conv_id = f"conv{ci:07d}"
        n_turns = _conv_turn_count(rng)
        ts = base_ts + timedelta(minutes=ci % 50000)
        for ti in range(n_turns):
            role = ("user", "assistant")[ti % 2]
            tool = ""
            if role == "assistant" and rng.random() < 0.12:
                role, tool = "tool", rng.choice(TOOLS)
            if role == "user":
                text = rng.choice(FILLER_USER)
                gold = None
            elif role == "tool":
                text = rng.choice(FILLER_TOOL)
                gold = None
            else:
                n_sent = 1 if rng.random() < 0.7 else 2
                segs, gold = [], _Gold()
                off = 0
                for k in range(n_sent):
                    s, g1 = _sentence(rng, people, companies)
                    for cs, ce, lab, surf in g1.spans:
                        gold.spans.append((off + cs, off + ce, lab, surf))
                    gold.triples += g1.triples
                    segs.append(s)
                    off += len(s) + 1
                text = " ".join(segs)

            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(ts)
            ts += timedelta(seconds=rng.randint(5, 120))

            if gold is not None:
                if gold.spans:
                    d = make_doc(text)
                    # char span -> token span
                    start_of = {s: i for i, s in enumerate(d.starts)}
                    end_of = {d.starts[i] + len(d.tokens[i]): i + 1
                              for i in range(len(d))}
                    for cs, ce, lab, surf in gold.spans:
                        ts_tok = start_of.get(cs)
                        te_tok = end_of.get(ce)
                        if ts_tok is None or te_tok is None:
                            continue
                        gs_conv.append(conv_id)
                        gs_turn.append(ti)
                        gs_start.append(ts_tok)
                        gs_end.append(te_tok)
                        gs_label.append(lab)
                for s, sl, p, o, ol in gold.triples:
                    gt_conv.append(conv_id)
                    gt_turn.append(ti)
                    gt["subj"].append(s)
                    gt["subj_label"].append(sl)
                    gt["pred"].append(p)
                    gt["obj"].append(o)
                    gt["obj_label"].append(ol)

    turns = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    # deterministic shuffle so consumers must restore (conv_id, turn_idx)
    perm = list(range(turns.num_rows))
    random.Random(seed + 1).shuffle(perm)
    turns = turns.take(pa.array(perm, pa.int64()))

    gold_spans = pa.table({
        "conv_id": pa.array(gs_conv, pa.string()),
        "turn_idx": pa.array(gs_turn, pa.int32()),
        "start": pa.array(gs_start, pa.int32()),
        "end": pa.array(gs_end, pa.int32()),
        "label": pa.array(gs_label, pa.string()),
    })
    gold_triples = pa.table({
        "conv_id": pa.array(gt_conv, pa.string()),
        "turn_idx": pa.array(gt_turn, pa.int32()),
        "subj": pa.array(gt["subj"], pa.string()),
        "subj_label": pa.array(gt["subj_label"], pa.string()),
        "pred": pa.array(gt["pred"], pa.string()),
        "obj": pa.array(gt["obj"], pa.string()),
        "obj_label": pa.array(gt["obj_label"], pa.string()),
    })
    return turns, gold_spans, gold_triples


def write_corpus(out_dir: str, n_convs: int, seed: int = 13,
                 n_files: int = 32) -> str:
    """Write turns/gold tables to ``out_dir`` (idempotent via a DONE marker).

    ``turns.parquet`` is a *directory* of part files so distributed reads
    parallelise (a single file caps read parallelism at its row groups)."""
    marker = os.path.join(out_dir, f".done2_{n_convs}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    turns, gold_spans, gold_triples = generate_corpus(n_convs, seed)
    tdir = os.path.join(out_dir, "turns.parquet")
    import shutil
    if os.path.isfile(tdir):
        os.remove(tdir)
    os.makedirs(tdir, exist_ok=True)
    n = turns.num_rows
    parts = min(n_files, max(1, n // 1000))
    step = (n + parts - 1) // parts
    for i in range(parts):
        pq.write_table(turns.slice(i * step, step),
                       os.path.join(tdir, f"part-{i:04d}.parquet"))
    pq.write_table(gold_spans, os.path.join(out_dir, "gold_spans.parquet"))
    pq.write_table(gold_triples,
                   os.path.join(out_dir, "gold_triples.parquet"))
    with open(marker, "w") as fd:
        fd.write("ok")
    return out_dir


# scale presets: sf -> number of conversations (~22 turns/conv on average)
# sf0.3 / sf1 have no testdata dir — they exist for the scaling-trend
# bench (point GRAFT_SF_DIR at any directory named sf0.3 / sf1; only the
# transcript corpus, synthesised under /tmp, is read at those scales)
SF_CONVS = {"sf0.001": 90, "sf0.01": 900, "sf0.1": 9000, "sf0.3": 27000,
            "sf1": 90000}


def _point_current(cache_root: str, target: str) -> None:
    """Atomically repoint ``<cache_root>/current`` at ``target``.

    oracle_sql() returns static SQL strings with no per-call sf
    parameter, so its turns oracles read through this symlink; the
    engine queries repoint it whenever they materialise a corpus, which
    happens before the driver compares — the oracle always sees the
    corpus the query actually ran on (round-4 item 8)."""
    link = os.path.join(cache_root, "current")
    tmp = link + ".tmp"
    try:
        if os.path.islink(tmp) or os.path.exists(tmp):
            os.remove(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)
    except OSError:
        pass                      # read-only cache_root: env override only


def corpus_for_sf_dir(sf_dir: str, cache_root: str = "/tmp/wsner_corpus"
                      ) -> str:
    """Deterministic transcript corpus sized to match a testdata sf dir."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n = SF_CONVS.get(name, 900)
    out = os.path.join(cache_root, name)
    path = write_corpus(out, n)
    _point_current(cache_root, path)
    return path
