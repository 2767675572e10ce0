"""Shared capped edit-distance-1 primitive for the fuzzy/suggestion
family — the same semantics as ``stages/fuzzy.py:_edit1`` (standard
Levenshtein capped at 2; transpositions count 2, matching SQL's
``levenshtein``), exposed as a public function so query compositions
don't import a private stage helper."""

from __future__ import annotations


def edit1_distance(a: str, b: str) -> int:
    """Levenshtein distance capped at 2: returns 0, 1, or 2
    (2 = 'more than 1').  Callers prefilter to |len(a)−len(b)| ≤ 1."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return 2
    if la == lb:
        return 1 if sum(x != y for x, y in zip(a, b)) == 1 else 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2
