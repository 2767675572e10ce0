"""Fuzzy edit-distance-1 similarity join (stages/fuzzy.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_search_engine_ray.stages.fuzzy import (
    _edit1,
    deletion_variants,
    fuzzy_pairs_edit1,
)


def _lev_capped(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 1:
        return 2
    return _edit1(a, b)


def _brute(names):
    out = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = _lev_capped(names[i], names[j])
            if d <= 1:
                out[(i, j)] = d
    return out


def _run(names, blocks=3):
    import ray.data as rd

    t = pa.table({"id": pa.array(range(len(names)), pa.int64()),
                  "name": pa.array(names, pa.string())})
    rows = fuzzy_pairs_edit1(rd.from_arrow(t).repartition(blocks),
                             name_col="name", id_col="id").take_all()
    return {(r["a"], r["b"]): r["dist"] for r in rows}


def test_matches_brute_force_random(ray_session):
    rng = np.random.default_rng(31)
    alpha = "abc"
    names = ["".join(rng.choice(list(alpha),
                                size=rng.integers(2, 6)))
             for _ in range(80)]
    assert _run(names) == _brute(names)


def test_edit_kinds(ray_session):
    names = ["kitten", "sitten", "kitte", "kittens", "xyz", "kitten"]
    got = _run(names, blocks=2)
    exp = _brute(names)
    assert got == exp
    assert got[(0, 1)] == 1          # substitution
    assert got[(0, 2)] == 1          # deletion
    assert got[(0, 3)] == 1          # insertion
    assert got[(0, 5)] == 0          # identical
    assert (0, 4) not in got


def test_deletion_variants_shape():
    par, var = deletion_variants(pa.array(["ab", "xyz"]))
    got = sorted(zip(par.tolist(), var.to_pylist()))
    assert got == sorted([(0, "ab"), (0, "b"), (0, "a"),
                          (1, "xyz"), (1, "yz"), (1, "xz"),
                          (1, "xy")])
