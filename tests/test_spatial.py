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


class TestDBSCAN:
    @staticmethod
    def _mk(seed=1):
        rng = np.random.default_rng(seed)
        b1 = rng.normal([0, 0], 0.3, (80, 2))
        b2 = rng.normal([10, 10], 0.3, (70, 2))
        noise = rng.uniform(-5, 15, (25, 2))
        pts = np.vstack([b1, b2, noise])
        t = pa.table({"id": pa.array(np.arange(len(pts), dtype=np.int64)),
                      "x": pa.array(pts[:, 0]),
                      "y": pa.array(pts[:, 1])})
        return t, pts

    @staticmethod
    def _ref(pts, r, mp):
        n = len(pts)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(2)
        nbr = d2 <= r * r
        core = nbr.sum(1) >= mp           # includes self
        lbl = np.arange(n)
        for _ in range(60):
            new = lbl.copy()
            for i in range(n):
                if core[i]:
                    for j in range(n):
                        if core[j] and nbr[i, j] and lbl[j] < new[i]:
                            new[i] = lbl[j]
            if (new == lbl).all():
                break
            lbl = new
        out = {}
        for i in range(n):
            if core[i]:
                out[i] = (int(lbl[i]), "core")
            else:
                cn = [int(lbl[j]) for j in range(n)
                      if core[j] and nbr[i, j] and j != i]
                out[i] = (min(cn), "border") if cn else (-1, "noise")
        return out

    def _run(self, t, r, mp, **kw):
        import ray.data as rd

        from mini_search_engine_ray.stages.spatial import dbscan_labels

        rows = dbscan_labels(rd.from_arrow(t).repartition(5), r=r,
                             min_pts=mp, **kw).take_all()
        return {x["id"]: (x["label"], x["role"]) for x in rows}

    def test_both_dispatch_paths_match_reference(self):
        t, pts = self._mk()
        exp = self._ref(pts, 0.8, 5)
        small = self._run(t, 0.8, 5)                    # driver path
        dist = self._run(t, 0.8, 5, small_threshold=0)  # distributed
        assert small == exp and dist == exp

    def test_border_semantics_star(self):
        # hub + 5 leaves at 0.5: hub deg 5 -> core (min_pts 6); each
        # leaf deg <= 3 -> border via the hub; far point -> noise
        ang = np.arange(5) * 2 * np.pi / 5
        xs = np.r_[0.0, 0.5 * np.cos(ang), 50.0]
        ys = np.r_[0.0, 0.5 * np.sin(ang), 50.0]
        t = pa.table({"id": pa.array(np.arange(7, dtype=np.int64)),
                      "x": pa.array(xs), "y": pa.array(ys)})
        exp = {0: (0, "core"), 6: (-1, "noise")}
        exp.update({i: (0, "border") for i in range(1, 6)})
        assert self._run(t, 0.6, 6) == exp
        assert self._run(t, 0.6, 6, small_threshold=0) == exp

    def test_min_pts_one_isolated_singletons(self):
        t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                      "x": pa.array([0.0, 100.0, 100.1]),
                      "y": pa.array([0.0, 0.0, 0.0])})
        got = self._run(t, 1.0, 1)
        # isolated point 0 is its own core singleton; 1,2 cluster
        assert got == {0: (0, "core"), 1: (1, "core"), 2: (1, "core")}
        got_d = self._run(t, 1.0, 1, small_threshold=0)
        assert got_d == got

    def test_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.spatial import dbscan_labels

        t = pa.table({"id": pa.array([1], pa.int64()),
                      "x": pa.array([0.0]), "y": pa.array([0.0])})
        with pytest.raises(ValueError):
            dbscan_labels(rd.from_arrow(t), r=1.0, min_pts=0)
