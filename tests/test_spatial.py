"""Grid-bucketed radius join (stages/spatial.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.spatial import radius_join


def _run(ids, x, y, r, blocks=6):
    import ray.data as rd

    t = pa.table({"id": pa.array(np.asarray(ids, np.int64)),
                  "x": pa.array(np.asarray(x, np.float64)),
                  "y": pa.array(np.asarray(y, np.float64))})
    rows = radius_join(rd.from_arrow(t).repartition(blocks),
                       r=r).take_all()
    return {(r_["a"], r_["b"]): r_["dist"] for r_ in rows}


def _brute(ids, x, y, r):
    x, y = np.asarray(x), np.asarray(y)
    n = len(x)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            if d2[i, j] <= r * r:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = np.sqrt(d2[i, j])
    return out


def test_brute_force_parity_uniform():
    rng = np.random.default_rng(5)
    n = 2000
    x = rng.uniform(-50, 50, n)
    y = rng.uniform(-50, 50, n)
    ids = list(range(n))
    got = _run(ids, x, y, 1.2)
    exp = _brute(ids, x, y, 1.2)
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_adjacent_cell_and_boundary_semantics():
    # pair straddling a cell boundary, pair at EXACTLY distance r
    # (inclusive), pair just over r (excluded), negative coordinates
    ids = [0, 1, 2, 3, 4, 5]
    x = [0.99, 1.01, 5.0, 5.0, -3.0, -3.0]
    y = [0.0, 0.0, 0.0, 1.0, -2.0, -3.01]
    got = _run(ids, x, y, 1.0, blocks=2)
    assert set(got) == {(0, 1), (2, 3)}
    assert abs(got[(2, 3)] - 1.0) < 1e-15  # exactly r kept


def test_dense_cluster_all_pairs():
    # every point within r of every other -> C(n,2) pairs
    n = 30
    x = np.linspace(0, 0.01, n)
    y = np.zeros(n)
    got = _run(list(range(n)), x, y, 1.0, blocks=3)
    assert len(got) == n * (n - 1) // 2


def test_validation():
    import ray.data as rd

    t = pa.table({"id": pa.array([1], pa.int64()),
                  "x": pa.array([0.0]), "y": pa.array([0.0])})
    with pytest.raises(ValueError):
        radius_join(rd.from_arrow(t), r=0)
    bad = pa.table({"id": pa.array([1], pa.int64()),
                    "x": pa.array([float("nan")]), "y": pa.array([0.0])})
    with pytest.raises(Exception):
        radius_join(rd.from_arrow(bad), r=1.0).take_all()
    far = pa.table({"id": pa.array([1], pa.int64()),
                    "x": pa.array([2.0e9]), "y": pa.array([0.0])})
    with pytest.raises(Exception):
        radius_join(rd.from_arrow(far), r=1.0).take_all()
