"""Token-level trie for gazetteer matching.

Broadcast-once, read-everywhere state: the driver builds the trie (or the
name list), ``ray.put``s it, and each actor of a gazetteer stage obtains it in
``__init__``.  Semantics follow the reference trie (utils.py:7-98): keys are
token tuples, ``longest_prefix`` returns the number of covered tokens plus the
stored value, and the case-insensitive probe tries title/lower/upper variants
of each token (utils.py:31-41).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator


class TokenTrie:
    __slots__ = ("_root", "_n")

    def __init__(self) -> None:
        self._root: dict = {}
        self._n = 0

    def __len__(self) -> int:
        return self._n

    def add(self, key: Iterable[str], value: Any) -> None:
        node = self._root
        for tok in key:
            node = node.setdefault(tok, {})
        if 0 not in node:
            self._n += 1
        node[0] = value         # key 0 = terminal value slot

    def get(self, key: Iterable[str]) -> Any:
        node = self._root
        for tok in key:
            node = node.get(tok)
            if node is None:
                return None
        return node.get(0)

    def __contains__(self, key) -> bool:
        return self.get(tuple(key)) is not None

    def longest_prefix(self, tokens, case_sensitive: bool = True,
                       start: int = 0, max_len: int | None = None
                       ) -> tuple[int, Any]:
        """Longest prefix of ``tokens[start:start+max_len]`` stored in the trie.

        Returns (number of covered tokens, value) — (0, None) if no match.
        """
        node = self._root
        value = None
        length = 0
        end = len(tokens) if max_len is None else min(len(tokens),
                                                      start + max_len)
        for i in range(start, end):
            c = tokens[i]
            nxt = node.get(c)
            if nxt is None and not case_sensitive:
                for alt in (c.title(), c.lower(), c.upper()):
                    if alt != c:
                        nxt = node.get(alt)
                        if nxt is not None:
                            break
            if nxt is None:
                break
            node = nxt
            if 0 in node:
                value = node[0]
                length = i - start + 1
        return length, value

    def first_tokens(self) -> set:
        """Set of first tokens of all stored keys — a cheap prefilter for
        scan loops: a position can only start a match if its token (or a
        case variant, for case-insensitive probes) is in this set."""
        return {k for k in self._root if k != 0}

    def items(self) -> Iterator[tuple[tuple[str, ...], Any]]:
        stack = [((), self._root)]
        while stack:
            prefix, node = stack.pop()
            for k, v in node.items():
                if k == 0:
                    yield prefix, v
                else:
                    stack.append(((*prefix, k), v))
