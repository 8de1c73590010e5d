"""Golden-corpus helpers: N-Quads normalization + P/R scoring.

Golden files (`/root/reference/resources/csv-testcases/*/output.nq`) have
irregular whitespace and comment lines; normalize both sides into
canonical term tuples before set comparison.
"""

from __future__ import annotations

import re

_TERM_RE = re.compile(
    r"""
      (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)
    | (?P<bnode>_:[^\s]+)
    """,
    re.VERBOSE,
)


def parse_nquads(text: str) -> set[tuple[str, ...]]:
    out: set[tuple[str, ...]] = set()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        terms = [m.group(0) for m in _TERM_RE.finditer(line)]
        if len(terms) not in (3, 4):
            raise ValueError(f"bad N-Quads line: {raw!r} → {terms}")
        out.add(tuple(terms))
    return out


def precision_recall(actual: set, expected: set) -> tuple[float, float]:
    if not actual and not expected:
        return 1.0, 1.0
    tp = len(actual & expected)
    precision = tp / len(actual) if actual else 1.0
    recall = tp / len(expected) if expected else 1.0
    return precision, recall
