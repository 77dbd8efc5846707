"""Deterministic rule tokeniser + lightweight tagger.

Produces the per-token attributes every labeling function needs (shape flags,
heuristic POS tag, compound-dependency flag, frequency rank, sentence starts)
without any model dependency.  The tokenisation mirrors the corrections the
reference applies on top of spaCy (spacy_wrapper.py:133-183 — currency-code
splits, magnitude splits; utils.py:110-147 — hyphen and genitive splits),
so gazetteer keys and turn texts tokenise identically.

Token offsets are character offsets into the original text, so
``text[tok_start:tok_end]`` always reproduces the surface form — this is the
per-turn text-equality invariant required by the north rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .constants import (CURRENCY_CODES, CURRENCY_SYMBOLS, MODALS,
                        NOT_NAMED_ENTITIES)
from .wordlists import OOV_RANK, WORD_RANKS

# single-character currency symbols are split off from adjacent digits
_SYMBOL_CHARS = {c for c in CURRENCY_SYMBOLS if len(c) == 1}

_OPEN_PUNCT = set("([{<\"'“‘«")
_CLOSE_PUNCT = set(")]}>\"'”’»,;:!?%")
_QUOTES = {"'", '"', "‘", "“", "”", "’"}

# abbreviations that keep their trailing period as part of the token
_KEEP_DOT = {
    "Jan.", "Feb.", "Mar.", "Apr.", "Jun.", "Jul.", "Aug.", "Sep.",
    "Sept.", "Oct.", "Nov.", "Dec.", "Mon.", "Tu.", "Tue.", "Tues.", "Wed.",
    "Th.", "Thu.", "Thur.", "Thurs.", "Fri.", "Sat.", "Sun.",
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.", "Jr.", "Sr.", "vs.", "etc.",
    "a.m.", "p.m.", "am.", "pm.",
}
# NOTE: company legal suffixes ("Corp.", "Inc.", ...) deliberately split
# their period so sentence boundaries after "... Acme Corp." are detected —
# gazetteer keys tokenise without the dot, improving trie hits too.

_CURRENCY_PREFIX_RE = re.compile(
    r"^(%s)([\d.,]+.*)$" % "|".join(sorted(CURRENCY_CODES)))
_MAGNITUDE_SUFFIX_RE = re.compile(
    r"^([\d.,]+)(bl?n?\.?|ml?n?\.?|k\.+)$", re.IGNORECASE)
_DIGIT_RE = re.compile(r"\d")
_NUM_RE = re.compile(r"^[\d.,]+$")
# abbreviated magnitude units, spacy_wrapper.py:254
_MAGNITUDE_ABBREV_RE = re.compile(r"(?:bl?n?\.?|ml?n?\.?|k\.+)$", re.I)
# spaCy's digit-unit suffix split (spacy.lang.char_classes UNITS +
# punctuation.py suffix rule "(?<=[0-9])(?:UNITS)"): "3G" -> "3", "G";
# "10km" -> "10", "km".  Longest alternatives first.
_UNIT_SUFFIX_RE = re.compile(
    r"^(.*\d)(km²|km³|km/h|kmh|m/s|µm|µg|m²|m³|dm²|dm³|dm|cm²|cm³|cm|mm²"
    r"|mm³|mm|hPa|Pa|mbar|mb|MB|kb|KB|gb|GB|tb|TB|km|kg|mg|nm|yd|in|ft"
    r"|lb|oz|ha|m|g|t|T|G|M|K)$")
# magnitude words preceding the Korean "won", spacy_wrapper.py:258-260
_MAGNITUDE_WORDS = {"million", "billion", "mln", "bln", "bn", "thousand",
                    "m", "k", "b", "m.", "k.", "b.", "mln.", "bln.", "bn."}

_SENT_END = {".", "!", "?"}

# closed-class words that spaCy's tagger never tags NNP even when
# capitalised before a proper noun ("The iPhone" vs "New iPhone")
_CLOSED_CLASS = {
    "the", "a", "an", "this", "that", "these", "those", "some", "any",
    "no", "every", "each", "all", "both", "either", "neither", "he",
    "she", "it", "they", "we", "you", "i", "his", "her", "its", "their",
    "our", "your", "my", "who", "whom", "whose", "what", "which", "when",
    "where", "why", "how", "and", "but", "or", "nor", "so", "yet", "if",
    "as", "at", "by", "for", "in", "of", "on", "to", "up", "with",
    "from", "into", "onto", "over", "under", "after", "before", "while",
    "not", "now", "then", "there", "here", "is", "are", "was", "were",
    "be", "been", "being", "do", "does", "did", "can", "could", "may",
    "might", "must", "shall", "should", "will", "would", "have", "has",
    "had", "one", "two", "three",
    # adverbs/connectives that precede names without being part of them
    "yesterday", "today", "tomorrow", "tonight", "currently", "recently",
    "lately", "soon", "later", "earlier", "meanwhile", "however",
    "therefore", "moreover", "instead", "finally", "briefly", "also",
    "still", "just", "even", "only", "perhaps", "maybe", "last", "next",
    "first", "second", "third",
}


def _split_chunk(chunk: str, offset: int, out: list[tuple[str, int]]) -> None:
    """Recursively split one whitespace-delimited chunk into tokens.

    Appends (text, start_char) pairs to ``out``.
    """
    if not chunk:
        return
    # leading opening punctuation / currency symbols
    c0 = chunk[0]
    if len(chunk) > 1 and (c0 in _OPEN_PUNCT or c0 in _SYMBOL_CHARS):
        out.append((c0, offset))
        _split_chunk(chunk[1:], offset + 1, out)
        return
    if chunk in _KEEP_DOT:
        out.append((chunk, offset))
        return
    # trailing closing punctuation
    cl = chunk[-1]
    if len(chunk) > 1 and cl in _CLOSE_PUNCT:
        _split_chunk(chunk[:-1], offset, out)
        out.append((cl, offset + len(chunk) - 1))
        return
    # trailing period: split unless the chunk is a known abbreviation,
    # a single letter, or contains an interior period (e.g. "U.S.")
    if (len(chunk) > 1 and cl == "." and "." not in chunk[:-1]
            and not len(chunk) == 2
            and not _MAGNITUDE_SUFFIX_RE.match(chunk)):
        _split_chunk(chunk[:-1], offset, out)
        out.append((".", offset + len(chunk) - 1))
        return
    # genitive: Moore's -> Moore + 's   (utils.py:139-142)
    for gen in ("'s", "’s"):
        if chunk.endswith(gen) and len(chunk) > 2:
            _split_chunk(chunk[:-2], offset, out)
            out.append((chunk[-2:], offset + len(chunk) - 2))
            return
    # currency code fused with a number: USD3,400 (spacy_wrapper.py:155-161)
    m = _CURRENCY_PREFIX_RE.match(chunk)
    if m:
        out.append((m.group(1), offset))
        _split_chunk(m.group(2), offset + len(m.group(1)), out)
        return
    # number fused with a magnitude abbreviation: 3bn (spacy_wrapper.py:164-169)
    m = _MAGNITUDE_SUFFIX_RE.match(chunk)
    if m:
        out.append((m.group(1), offset))
        out.append((m.group(2), offset + len(m.group(1))))
        return
    # digit followed by a measurement unit: 3G -> 3, G (spaCy suffix rule)
    m = _UNIT_SUFFIX_RE.match(chunk)
    if m:
        _split_chunk(m.group(1), offset, out)
        out.append((m.group(2), offset + len(m.group(1))))
        return
    # hyphenated names: Jean-Pierre -> Jean, -, Pierre (utils.py:117-123).
    # Like spaCy's infix rule, the hyphen splits only BETWEEN alphabetic
    # characters: "16-gigabyte" stays one token (and is a plain CARDINAL),
    # "Wal-Mart" splits.
    for i in range(1, len(chunk) - 1):
        if (chunk[i] == "-" and chunk[i - 1].isalpha()
                and chunk[i + 1].isalpha()):
            _split_chunk(chunk[:i], offset, out)
            out.append(("-", offset + i))
            _split_chunk(chunk[i + 1:], offset + i + 1, out)
            return
    out.append((chunk, offset))


def tokenise(text: str) -> list[tuple[str, int]]:
    """Tokenise ``text`` into (surface, start_char) pairs."""
    out: list[tuple[str, int]] = []
    for m in re.finditer(r"\S+", text):
        _split_chunk(m.group(0), m.start(), out)
    return out


@dataclass
class Doc:
    """A tokenised text with the per-token attributes the LFs consume.

    Plays the role of the reference's ``spacy.tokens.Doc`` (SURVEY.md §1.1).
    All attribute containers are parallel lists indexed by token position.
    """

    text: str
    tokens: list[str] = field(default_factory=list)
    starts: list[int] = field(default_factory=list)        # char offsets
    lowers: list[str] = field(default_factory=list)
    sent_start: list[bool] = field(default_factory=list)
    is_punct: list[bool] = field(default_factory=list)
    is_alpha: list[bool] = field(default_factory=list)
    is_title: list[bool] = field(default_factory=list)
    is_upper: list[bool] = field(default_factory=list)
    likely_proper: list[bool] = field(default_factory=list)
    tag: list[str] = field(default_factory=list)
    compound: list[bool] = field(default_factory=list)     # dep_ == "compound"
    rank: list[int] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.tokens)

    def span_text(self, start: int, end: int) -> str:
        """Surface text of tokens[start:end] from the original string."""
        if start >= end:
            return ""
        last = self.starts[end - 1] + len(self.tokens[end - 1])
        return self.text[self.starts[start]:last]


def _is_punct(tok: str) -> bool:
    return all(not ch.isalnum() for ch in tok)


def make_doc(text: str) -> Doc:
    """Tokenise + tag one text."""
    pairs = tokenise(text)
    d = Doc(text=text)
    n = len(pairs)
    if n == 0:
        return d
    d.tokens = [p[0] for p in pairs]
    d.starts = [p[1] for p in pairs]
    d.lowers = [t.lower() for t in d.tokens]
    d.is_punct = [_is_punct(t) for t in d.tokens]
    d.is_alpha = [t.isalpha() for t in d.tokens]
    d.is_title = [t.istitle() for t in d.tokens]
    d.is_upper = [t.isupper() and any(c.isalpha() for c in t)
                  for t in d.tokens]
    d.rank = [WORD_RANKS.get(lw, OOV_RANK) for lw in d.lowers]

    # --- sentence starts (sentencizer + quote-aware fixes,
    # spacy_wrapper.py:225-237) -----------------------------------------
    ss = [False] * n
    ss[0] = True
    for i in range(1, n):
        prev = d.tokens[i - 1]
        if prev in _SENT_END:
            ss[i] = True
        elif prev in {"”", "’"} and i >= 2 and d.tokens[i - 2] in _SENT_END:
            ss[i] = True
    # token following an opening quote never starts a sentence
    for i in range(1, n):
        if d.tokens[i - 1] in {"‘", "“"}:
            ss[i] = False
    d.sent_start = ss

    # --- likely_proper (annotations.py:1250-1271) -----------------------
    # Stand-ins for the reference's two parse-dependent checks, tuned
    # against the notebook's golden Reuters paragraph:
    #   * "lemma is titled" = the word (or its depluralised form) is not a
    #     frequent dictionary word, OR it is a known word that spaCy's
    #     tagger would call NNP from context (followed by another
    #     proper-shaped token, e.g. sentence-initial "New" in "New
    #     iPhone") and is not a closed-class word;
    #   * tokens containing digits ("3Gs") are never title-proper — spaCy
    #     tags them CD, whose lemma is lowercased.
    lp = [False] * n

    def _form_proper(j: int) -> bool:
        t = d.tokens[j]
        if len(t) < 2:
            return False
        if d.is_title[j] and not _DIGIT_RE.search(t):
            return True
        if len(t) > 2 and t[0].islower() and t[1].isupper() \
                and t[2:].islower():
            return True
        return (d.is_upper[j] and t not in CURRENCY_CODES
                and t not in NOT_NAMED_ENTITIES)

    for i, tok in enumerate(d.tokens):
        if len(tok) < 2:
            continue
        low = d.lowers[i]
        has_digit = bool(_DIGIT_RE.search(tok))
        known = (low in WORD_RANKS
                 or (low.endswith("s") and low[:-1] in WORD_RANKS)
                 or (low.endswith("es") and low[:-2] in WORD_RANKS))
        if d.is_title[i] and not has_digit and not known:
            lp[i] = True
        elif len(tok) > 2 and tok[0].islower() and tok[1].isupper() \
                and tok[2:].islower():
            lp[i] = True          # iPad-style casing
        elif d.is_upper[i] and tok not in CURRENCY_CODES \
                and tok not in NOT_NAMED_ENTITIES:
            lp[i] = True
        elif (d.is_title[i] and not has_digit and i > 0 and not ss[i]
              and d.tokens[i - 1] not in _QUOTES
              and not d.tokens[i - 1].endswith(".")):
            lp[i] = True
        elif (d.is_title[i] and not has_digit and low not in _CLOSED_CLASS
              and i + 1 < n and _form_proper(i + 1)):
            lp[i] = True          # context-NNP: "New" in "New iPhone"
    d.likely_proper = lp

    # --- heuristic POS tag ----------------------------------------------
    # includes the reference's _correct_parsing overrides
    # (spacy_wrapper.py:242-265): currency codes -> NNP, abbreviated
    # magnitude units (mln/bln/k.) -> CD, and "won" after a numeric
    # magnitude (the Korean currency in financial text) -> NNP
    tags = []
    for i, tok in enumerate(d.tokens):
        low = d.lowers[i]
        if tok in CURRENCY_CODES:
            tags.append("NNP")
        elif _MAGNITUDE_ABBREV_RE.match(tok):
            tags.append("CD")
        elif (tok == "won" and i > 1
              and (d.tokens[i - 1][:1].isdigit()
                   or d.lowers[i - 1] in _MAGNITUDE_WORDS)):
            tags.append("NNP")
        elif low in MODALS and tok.islower():
            tags.append("MD")
        elif _DIGIT_RE.search(tok) and _NUM_RE.match(tok):
            tags.append("CD")
        elif lp[i]:
            tags.append("NNP")
        elif d.is_punct[i]:
            tags.append("PUNCT")
        else:
            tags.append("NN")
    d.tag = tags

    # --- compound dependency heuristic ----------------------------------
    # spaCy marks non-final tokens of multi-word proper compounds with
    # dep_ == "compound"; approximate: a likely-proper token directly
    # followed by another likely-proper token (optionally across a name
    # prefix such as "von", a hyphen, or a genitive) in the same sentence.
    # NOTE: the genitive ("'s") is deliberately NOT a compound link — in
    # UD parses a possessive breaks the compound chain ("Apple Inc's
    # iPhone": 'iPhone' is not compound), which is what lets the
    # reference's CompanyTypeGenerator emit 'Apple Inc' (golden notebook
    # cell 47) rather than swallowing the following noun.
    prefix_set = {"-", "von", "van", "de", "di", "le", "la",
                  "het", "dem", "der", "den", "d'", "ter"}
    comp = [False] * n
    for i in range(n - 1):
        if lp[i] and lp[i + 1] and not ss[i + 1]:
            comp[i] = True
        elif (lp[i] and i + 2 < n and d.tokens[i + 1] in prefix_set
              and lp[i + 2] and not ss[i + 1] and not ss[i + 2]):
            comp[i] = True
        elif (d.tokens[i] in prefix_set and 0 < i and lp[i - 1]
              and lp[i + 1] and not ss[i] and not ss[i + 1]):
            comp[i] = True
    d.compound = comp
    return d


def in_compound(d: Doc, i: int) -> bool:
    """annotations.py:1279-1285."""
    if d.compound[i]:
        return True
    return i > 0 and d.compound[i - 1]


def truecase_text(text: str, form_frequencies: dict[str, dict[str, float]],
                  min_prob: float = 0.25,
                  skip_doc_longer_than: int = 25) -> str:
    """Truecasing of short texts (spacy_wrapper.py:186-221 semantics).

    Tokens that (1) are alphabetic with an uppercase first letter, (2) do
    not start a sentence, and (3) whose observed form has relative
    frequency below ``min_prob`` in ``form_frequencies`` (lowercase ->
    {form: rel_freq}) are replaced by their most likely case form.  Texts
    longer than ``skip_doc_longer_than`` tokens are returned unchanged
    (mis-casings concentrate in titles, not paragraphs).  The reference
    loads its frequency table from a prebuilt blob; here the table is
    derived from the corpus (see ``sources.etl.build_form_frequencies``).
    """
    d = make_doc(text)
    if len(d) > skip_doc_longer_than:
        return text
    replacements = []
    for i, tok in enumerate(d.tokens):
        if d.is_alpha[i] and not d.sent_start[i] and tok[0].isupper():
            freqs = form_frequencies.get(d.lowers[i])
            if freqs and freqs.get(tok, 0.0) < min_prob:
                # exact reference tie-break: last of the freq-sorted keys
                alt = sorted(freqs.keys(), key=lambda x: freqs[x])[-1]
                if alt != tok and len(alt) == len(tok):
                    replacements.append((d.starts[i], tok, alt))
    if not replacements:
        return text
    chars = list(text)
    for start, tok, alt in replacements:
        chars[start:start + len(tok)] = alt
    return "".join(chars)
