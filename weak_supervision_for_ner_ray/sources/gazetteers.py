"""Gazetteer-based distant supervision.

A gazetteer is logically a ``{label: [surface form, ...]}`` map compiled into
a token-level :class:`TokenTrie` (annotations.py:678-699).  On a cluster the
name lists are broadcast once with ``ray.put`` and each actor builds (or
receives) its trie in ``__init__`` — never per batch (SURVEY.md §2.3).

Matching semantics follow ``GazetteerAnnotator.get_hits``
(annotations.py:629-675): longest-prefix scan with a 10-token lookahead,
cased and uncased probes, ≥1 likely-proper token required, legal-suffix
extension for ORG/COMPANY hits, compound-boundary skips, and confidence
``1/n`` for names with n possible classes.
"""

from __future__ import annotations

from ..constants import LEGAL_SUFFIXES
from ..state.trie import TokenTrie
from ..tokenizer import Doc, tokenise

LOOKAHEAD = 10  # annotations.py:629


def build_trie(gazetteer: dict[str, list[str]]) -> TokenTrie:
    """Compile ``{label: [names]}`` into a token trie whose values are tuples
    of possible classes (annotations.py:678-699)."""
    trie = TokenTrie()
    for label, names in gazetteer.items():
        for name in names:
            # strip parentheticals and appositions
            name = name.split("(")[0].split(",")[0].rstrip()
            key = tuple(t for t, _ in tokenise(name))
            if not key:
                continue
            current = trie.get(key)
            if current is not None:
                if label not in current:
                    trie.add(key, (*current, label))
            else:
                trie.add(key, (label,))
    return trie


class GazetteerMatcher:
    """Yields (start, end, label, conf) hits for one trie over one doc."""

    def __init__(self, trie: TokenTrie):
        self.trie = trie
        # first-token prefilter: a position can only start a match if its
        # token is a stored first token (cased probe) or lower()-equal to
        # one (safe over-approximation of the title/lower/upper variants
        # the uncased probe tries) — skips the trie walk + per-variant
        # string allocations at the ~95% of positions that cannot match
        self._first = trie.first_tokens()
        self._first_lower = {t.lower() for t in self._first}

    def get_hits(self, doc: Doc, case_sensitive: bool = True,
                 full_compound: bool = True):
        tokens = doc.tokens
        n = len(tokens)
        first = self._first if case_sensitive else None
        first_lower = self._first_lower
        i = 0
        while i < n:
            tok = tokens[i]
            if (tok not in first if first is not None
                    else tok.lower() not in first_lower):
                i += 1
                continue
            if doc.is_punct[i]:
                i += 1
                continue
            # skip if we are inside a compound phrase
            if full_compound and i > 0 and doc.likely_proper[i - 1] \
                    and doc.compound[i - 1]:
                i += 1
                continue
            length, value = self.trie.longest_prefix(
                tokens, case_sensitive, start=i, max_len=LOOKAHEAD)
            if length:
                # require at least one likely-proper token
                if not any(doc.likely_proper[k] for k in range(i, i + length)):
                    i += 1
                    continue
                # legal-suffix extension for company hits
                if (i + length < n
                        and {"ORG", "COMPANY"}.intersection(value)
                        and doc.lowers[i + length].rstrip(".")
                        in LEGAL_SUFFIXES):
                    length += 1
                # if the hit continues into a compound phrase, skip
                if (full_compound and i + length < n
                        and doc.compound[i + length - 1]
                        and tokens[i + length] not in {"'s", "’s"}):
                    i += 1
                    continue
                for label in value:
                    yield i, i + length, label, 1.0 / len(value)
                i += length + 1
            else:
                i += 1
