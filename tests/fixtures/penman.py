"""Minimal offline stand-in for goodmami's third-party ``penman``
package (https://github.com/goodmami/penman), vendored as a TEST
FIXTURE ONLY so ``goodmami_parse_edges`` (sources/penman.py) has
differential coverage in this container, where the real library is
absent (reference contract: data_helpers.py:255-275).

Implements the slice of the public ``penman.decode`` contract the
wrapper depends on, reconstructed from the library's published README
and documentation examples (recorded as goldens in
tests/test_parser.py::GOODMAMI_GOLDENS):

* ``decode(s)`` returns a ``Graph`` whose ``triples`` are (source,
  role, target) tuples in depth-first encounter order;
* a node's ``:instance`` triple is emitted when the node header is
  read; an edge triple is emitted at the position its role appears,
  BEFORE the child node's own triples;
* inverted roles (``:<role>-of``) are normalized to the canonical
  direction in ``triples`` (layout info lives in epidata, which this
  stand-in does not model);
* string literals keep their quotes (``'"Fido"'``); numeric and
  symbol constants are plain strings.

Deliberately NOT modeled: the handful of non-invertible ``-of`` roles
the real library special-cases via its Model (e.g. ``:consist-of``) —
the goldens avoid them — plus epidata, metadata, and encode.
"""

from __future__ import annotations


class Graph:
    def __init__(self, triples, top=None):
        self.triples = triples
        self.top = top


def _tokenize(s: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "()/":
            toks.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            while j < n and s[j] != '"':
                j += 1 if s[j] != "\\" else 2
            toks.append(s[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in "()/":
                j += 1
            toks.append(s[i:j])
            i = j
    return toks


def decode(s: str) -> Graph:
    toks = _tokenize(s)
    triples: list[tuple] = []
    pos = 0

    def _emit_edge(src: str, role: str, tgt: str) -> None:
        if role.endswith("-of") and role != ":-of":
            triples.append((tgt, role[: -len("-of")], src))
        else:
            triples.append((src, role, tgt))

    def _parse_node() -> str:
        nonlocal pos
        assert toks[pos] == "(", f"expected '(' at {pos}"
        pos += 1
        if toks[pos] == ")":  # degenerate '()'
            pos += 1
            return ""
        var = toks[pos]
        pos += 1
        if pos < len(toks) and toks[pos] == "/":
            pos += 1
            triples.append((var, ":instance", toks[pos]))
            pos += 1
        while toks[pos] != ")":
            role = toks[pos]
            pos += 1
            if toks[pos] == "(":
                child_var = toks[pos + 1] if toks[pos + 1] != ")" else ""
                _emit_edge(var, role, child_var)
                _parse_node()
            else:
                _emit_edge(var, role, toks[pos])
                pos += 1
        pos += 1
        return var

    top = _parse_node() if toks else None
    return Graph(triples, top=top or None)
