"""PageRank golden tests (FIXTURES.md F5) + fusion semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.pipelines.pagerank import (
    fuse_scores,
    pagerank_dataset,
    pagerank_dataset_join,
    pagerank_numpy,
)


def _seeded_graph(n=50, seed=9):
    rng = np.random.default_rng(seed)
    src, dst = [], []
    for u in range(n - 2):  # node n-1: no out-edges (dangling)
        for v in rng.choice(n, size=rng.integers(1, 6), replace=False):
            if v != u:
                src.append(u)
                dst.append(int(v))
    # hubs: everyone points at node 0 and 1
    for u in range(2, n, 3):
        src.append(u)
        dst.append(0)
    return np.asarray(src), np.asarray(dst), n


def _reference_loop(src, dst, n, iters=100, d=0.85):
    """Straight-line scalar transcription of the reference recurrence —
    the independent golden oracle."""
    out_adj = {}
    in_adj = {}
    for s, t in zip(src.tolist(), dst.tolist()):
        out_adj.setdefault(s, []).append(t)
        in_adj.setdefault(t, []).append(s)
    prev = {i: 1.0 for i in range(n)}
    for _ in range(iters):
        cur = {}
        for v in range(n):
            total = 0.0
            for u in in_adj.get(v, []):
                total += prev[u] / len(out_adj[u])
            cur[v] = (1 - d) + d * total
        prev = cur
    return np.asarray([prev[i] for i in range(n)])


def test_numpy_matches_reference_loop():
    src, dst, n = _seeded_graph()
    got = pagerank_numpy(src, dst, n)
    exp = _reference_loop(src, dst, n)
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_unnormalized_properties():
    src, dst, n = _seeded_graph()
    sc = pagerank_numpy(src, dst, n)
    # node with no in-edges converges to exactly (1-d)
    no_in = set(range(n)) - set(dst.tolist())
    for v in no_in:
        assert sc[v] == pytest.approx(0.15)
    assert sc[0] == sc.max()  # the hub


def test_dataset_matches_numpy(ray_session):
    import ray.data as rd

    src, dst, n = _seeded_graph(30, seed=3)
    edges = rd.from_items([{"src": int(s), "dst": int(t)} for s, t in zip(src, dst)])
    t = pagerank_dataset(edges, n, iterations=10)
    got = np.empty(n)
    got[t["node"].to_numpy()] = t["score"].to_numpy()
    exp = pagerank_numpy(src, dst, n, iterations=10)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_dataset_join_matches_numpy(ray_session):
    """Scores-join-edges variant (no dense vector anywhere) equals the
    numpy oracle on a graph with a dangling node and hubs."""
    import pyarrow as pa
    import ray.data as rd

    src, dst, n = _seeded_graph(30, seed=3)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    t = pagerank_dataset_join(edges, n, iterations=8).to_pandas()
    assert len(t) == n
    got = np.empty(n)
    got[t["node"].to_numpy()] = t["score"].to_numpy()
    exp = pagerank_numpy(src, dst, n, iterations=8)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_dataset_join_matches_numpy_synthetic_200k(ray_session):
    """Equality at 200k nodes / 400k edges (the VERDICT done-bar),
    few iterations to keep the per-iteration shuffles test-sized."""
    import pyarrow as pa
    import ray.data as rd

    n = 200_000
    i = np.arange(n, dtype=np.int64)
    src = np.r_[i, i]
    dst = np.r_[(7 * i + 3) % n, (13 * i + 5) % n]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    t = pagerank_dataset_join(edges, n, iterations=3).to_pandas()
    assert len(t) == n
    got = np.empty(n)
    got[t["node"].to_numpy()] = t["score"].to_numpy()
    exp = pagerank_numpy(src, dst, n, iterations=3)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_fusion_weight_zero_degrades_to_base():
    doc_ids = np.asarray([3, 1, 4, 2])
    base = np.asarray([0.9, 0.8, 0.7, 0.6])
    pr = np.linspace(10, 14, 5)
    ids0, sc0 = fuse_scores(doc_ids, base, pr, weight=0.0, top_k=None)
    assert ids0.tolist() == [3, 1, 4, 2]
    np.testing.assert_allclose(sc0, base)
    ids1, _ = fuse_scores(doc_ids, base, pr, weight=100.0, top_k=2)
    assert ids1.tolist() == [4, 3]  # pagerank dominates


class TestPersonalizedPageRank:
    @staticmethod
    def _graph(n=60, seed=5):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, 200)
        dst = rng.integers(0, n, 200)
        keep = src != dst
        return src[keep], dst[keep], n

    def test_uniform_personalization_equals_default(self):
        from mini_search_engine_ray.pipelines.pagerank import pagerank_numpy

        src, dst, n = self._graph()
        a = pagerank_numpy(src, dst, n, iterations=20)
        b = pagerank_numpy(src, dst, n, iterations=20,
                           personalization=np.ones(n))
        np.testing.assert_array_equal(a, b)

    def test_dataset_matches_numpy_personalized(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from mini_search_engine_ray.pipelines.pagerank import (
            pagerank_dataset,
            pagerank_numpy,
        )

        src, dst, n = self._graph()
        personal = (np.arange(n) % 7 == 0).astype(np.float64)
        exp = pagerank_numpy(src, dst, n, iterations=12,
                             personalization=personal)
        edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                        "dst": pa.array(dst)})) \
            .repartition(3)
        got = pagerank_dataset(edges, n, iterations=12,
                               personalization=personal)
        np.testing.assert_allclose(
            got["score"].to_numpy(), exp, rtol=1e-12)

    def test_unreachable_nonseed_scores_zero(self):
        from mini_search_engine_ray.pipelines.pagerank import pagerank_numpy

        # 0 (seed) -> 1 -> 2; node 3 isolated non-seed
        personal = np.array([1.0, 0.0, 0.0, 0.0])
        s = pagerank_numpy(np.array([0, 1]), np.array([1, 2]), 4,
                           iterations=30, personalization=personal)
        assert s[0] > 0 and s[1] > 0 and s[2] > 0
        assert s[3] == 0.0

    def test_shape_validation(self):
        import pytest

        from mini_search_engine_ray.pipelines.pagerank import pagerank_numpy

        with pytest.raises(ValueError):
            pagerank_numpy(np.array([0]), np.array([1]), 3,
                           personalization=np.ones(2))


class TestHits:
    @staticmethod
    def _brute(pairs, n, iters, scale=100_000):
        auth = [0] * n
        hub = [scale] * n
        for _ in range(iters):
            raw = [0] * n
            for s, d in pairs:
                raw[d] += hub[s]
            m = max(raw) if raw else 0
            auth = [(r * scale) // m for r in raw] if m else raw
            raw = [0] * n
            for s, d in pairs:
                raw[s] += auth[d]
            m = max(raw) if raw else 0
            hub = [(r * scale) // m for r in raw] if m else raw
        return auth, hub

    def test_numpy_vs_brute_force(self):
        from mini_search_engine_ray.pipelines.pagerank import hits_numpy

        rng = np.random.default_rng(31)
        n, m = 60, 400
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        ea, eh = self._brute(list(zip(src.tolist(), dst.tolist())), n, 7)
        a, h = hits_numpy(src, dst, n, iterations=7)
        assert a.tolist() == ea and h.tolist() == eh

    def test_star_graph_roles(self):
        # directed star center->leaves: center is the pure hub,
        # leaves are the (equal) pure authorities
        from mini_search_engine_ray.pipelines.pagerank import (
            HITS_SCALE, hits_numpy)

        src = np.zeros(5, dtype=np.int64)
        dst = np.arange(1, 6, dtype=np.int64)
        a, h = hits_numpy(src, dst, 6, iterations=4)
        assert h[0] == HITS_SCALE and np.all(h[1:] == 0)
        assert a[0] == 0 and np.all(a[1:] == HITS_SCALE)

    def test_dataset_bit_identical_to_numpy(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.pipelines.pagerank import (
            hits_dataset, hits_numpy)

        rng = np.random.default_rng(32)
        n, m = 200, 3000
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        a, h = hits_numpy(src, dst, n, iterations=5)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        t = hits_dataset(ds.repartition(6), n, iterations=5)
        got = t.to_pandas().sort_values("node")
        # integer arithmetic: exact equality, not allclose
        assert got["auth_fx"].to_numpy().tolist() == a.tolist()
        assert got["hub_fx"].to_numpy().tolist() == h.tolist()

    def test_zero_iterations_and_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.pipelines.pagerank import (
            HITS_SCALE, hits_dataset, hits_numpy)

        src = np.array([0], dtype=np.int64)
        dst = np.array([1], dtype=np.int64)
        a, h = hits_numpy(src, dst, 2, iterations=0)
        assert a.tolist() == [0, 0] and h.tolist() == [HITS_SCALE] * 2
        ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                     "dst": pa.array(dst)}))
        t = hits_dataset(ds, 2, iterations=0).to_pandas()
        assert t["auth_fx"].tolist() == [0, 0]
        assert t["hub_fx"].tolist() == [HITS_SCALE] * 2
        with pytest.raises(ValueError):
            hits_numpy(src, dst, 2, iterations=-1)
        with pytest.raises(ValueError):
            hits_numpy(src, dst, 2, scale=0)


class TestWeightedPageRank:
    def test_numpy_vs_reference_loop(self):
        rng = np.random.default_rng(71)
        n, m = 40, 200
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.integers(1, 6, m).astype(np.float64)
        out_w = np.zeros(n)
        for s, ww in zip(src, w):
            out_w[s] += ww
        scores = np.ones(n)
        for _ in range(20):
            new = np.full(n, 0.15)
            for s, d, ww in zip(src, dst, w):
                new[d] += 0.85 * (scores[s] * (ww / out_w[s]))
            scores = new
        got = pagerank_numpy(src, dst, n, iterations=20, weights=w)
        np.testing.assert_allclose(got, scores, rtol=1e-12)

    def test_uniform_weights_equal_unweighted(self):
        rng = np.random.default_rng(72)
        n, m = 30, 150
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        base = pagerank_numpy(src, dst, n, iterations=30)
        w = np.full(m, 3.0)
        got = pagerank_numpy(src, dst, n, iterations=30, weights=w)
        # w/out_w == 1/outdeg up to IEEE rounding of the division pair
        np.testing.assert_allclose(got, base, rtol=1e-12)

    def test_dataset_matches_numpy(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(73)
        n, m = 120, 900
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.integers(1, 9, m).astype(np.float64)
        exp = pagerank_numpy(src, dst, n, iterations=12, weights=w)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64()),
                                     "w": pa.array(w)}))
        got = pagerank_dataset(ds.repartition(5), n, iterations=12,
                               weight_col="w").to_pandas()
        np.testing.assert_allclose(
            got.sort_values("node")["score"].to_numpy(), exp, rtol=1e-12)

    def test_weight_validation(self):
        src = np.array([0, 1])
        dst = np.array([1, 0])
        with pytest.raises(ValueError):
            pagerank_numpy(src, dst, 2, weights=np.array([1.0]))
        with pytest.raises(ValueError):
            pagerank_numpy(src, dst, 2, weights=np.array([1.0, -2.0]))
