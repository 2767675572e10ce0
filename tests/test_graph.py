"""Degree-oriented exact triangle counting."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.graph import (
    local_clustering,
    triangle_counts,
    undirected_edges,
)


def _brute_triangles(pairs):
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for u, v in {(min(a, b), max(a, b)) for a, b in pairs if a != b}:
        common = adj[u] & adj[v]
        for w in common:
            for n_ in (u, v, w):
                counts[n_] = counts.get(n_, 0) + 1
    # each triangle was found 3x (once per edge) and credited each
    # corner once per find
    return {k: c // 3 for k, c in counts.items()}


class TestTriangleCounts:
    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        m = 4000
        src = rng.integers(0, 120, m)
        dst = rng.integers(0, 120, m)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        exp = _brute_triangles(list(zip(src.tolist(), dst.tolist())))
        got = triangle_counts(ds.repartition(7), partitions=5).to_pandas()
        assert dict(zip(got["node"], got["triangles"])) == exp
        assert int(got["triangles"].sum()) % 3 == 0

    def test_k4_and_noise(self, ray_session):
        import ray.data as rd

        # K4 on {0,1,2,3}: 4 triangles, each node in 3; plus a
        # triangle-free tail 10-11-12, duplicate + reversed + self
        # edges that must all collapse
        k4 = list(itertools.combinations(range(4), 2))
        pairs = k4 + [(v, u) for u, v in k4] + [(0, 1), (5, 5),
                                                (10, 11), (11, 12)]
        t = pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                      "dst": pa.array([p[1] for p in pairs], pa.int64())})
        ds = rd.from_arrow(t)
        und = undirected_edges(ds).to_pandas()
        assert len(und) == 8                     # 6 K4 edges + 2 tail
        got = triangle_counts(ds).to_pandas().sort_values("node")
        assert got["node"].tolist() == [0, 1, 2, 3]
        assert got["triangles"].tolist() == [3, 3, 3, 3]

    def test_hub_star_is_triangle_free(self, ray_session):
        import ray.data as rd

        # a pure star has sum(deg^2) ~ n^2 naive wedges but zero
        # triangles; the oriented plan emits no closing match
        n = 500
        t = pa.table({"src": pa.array(np.zeros(n, np.int64)),
                      "dst": pa.array(np.arange(1, n + 1, dtype=np.int64))})
        got = triangle_counts(rd.from_arrow(t).repartition(4)).to_pandas()
        assert len(got) == 0

    def test_null_endpoints_drop(self, ray_session):
        import ray.data as rd

        t = pa.table({"src": pa.array([0, 1, 2, None], pa.int64()),
                      "dst": pa.array([1, 2, 0, 5], pa.int64())})
        got = triangle_counts(rd.from_arrow(t)).to_pandas()
        assert got["triangles"].tolist() == [1, 1, 1]

class TestLocalClustering:
    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        m = 3000
        src = rng.integers(0, 90, m)
        dst = rng.integers(0, 90, m)
        pairs = {(min(a, b), max(a, b))
                 for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        tri = _brute_triangles(list(pairs))
        exp = {n_: (d, tri.get(n_, 0), 2.0 * tri.get(n_, 0) / (d * (d - 1)))
               for n_, d in deg.items() if d >= 2}
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        got = local_clustering(ds.repartition(6), partitions=5).to_pandas()
        assert {r.node: (r.deg, r.triangles, r.lcc)
                for r in got.itertuples()} == exp

    def test_triangle_with_pendant(self, ray_session):
        import ray.data as rd

        # 0-1-2 triangle; 3 pendant off 0 (deg 1 -> excluded); node 0
        # has deg 3 so lcc = 2*1/(3*2) = 1/3 exactly in float64
        t = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                      "dst": pa.array([1, 2, 0, 3], pa.int64())})
        got = local_clustering(rd.from_arrow(t)).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert got["node"].tolist() == [0, 1, 2]
        assert got["deg"].tolist() == [3, 2, 2]
        assert got["triangles"].tolist() == [1, 1, 1]
        assert got["lcc"].tolist() == [2.0 / 6.0, 1.0, 1.0]

class TestBfsHops:
    def test_vs_brute_force_random(self, ray_session):
        import collections

        import ray.data as rd

        from mini_search_engine_ray.stages.graph import bfs_hops

        rng = np.random.default_rng(5)
        m = 2000
        src = rng.integers(0, 300, m)
        dst = rng.integers(0, 300, m)
        seeds = [0, 7, 250]
        adj = collections.defaultdict(set)
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        exp = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, 4):
            frontier = {b for a in frontier for b in adj[a]} - exp.keys()
            exp.update({n_: h for n_ in frontier})
            if not frontier:
                break
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        got = bfs_hops(ds.repartition(5), seeds, max_hops=3,
                       partitions=4).to_pandas()
        assert dict(zip(got["node"], got["hop"])) == exp
        # broadcast_nodes=0 forces the semi/anti sort-join fallback on
        # every round — must agree exactly with the broadcast path
        got2 = bfs_hops(ds.repartition(5), seeds, max_hops=3,
                        partitions=4, broadcast_nodes=0).to_pandas()
        assert dict(zip(got2["node"], got2["hop"])) == exp

    def test_path_caps_and_isolated_seed(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import bfs_hops

        # path 0-1-2-3-4; seed 0 + isolated seed 99
        t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 3, 4], pa.int64())})
        got = bfs_hops(rd.from_arrow(t), [0, 99], max_hops=2).to_pandas()
        assert dict(zip(got["node"], got["hop"])) == \
            {0: 0, 99: 0, 1: 1, 2: 2}
        got0 = bfs_hops(rd.from_arrow(t), [3], max_hops=0).to_pandas()
        assert dict(zip(got0["node"], got0["hop"])) == {3: 0}
        with pytest.raises(ValueError):
            bfs_hops(rd.from_arrow(t), [], max_hops=1)
        with pytest.raises(ValueError):
            bfs_hops(rd.from_arrow(t), [0], max_hops=-1)

class TestCommonNeighborPairs:
    @staticmethod
    def _brute(pairs, *, min_common=2, cap=None):
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = {}
        nodes = sorted(adj)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                if y in adj[x]:
                    continue
                zs = adj[x] & adj[y]
                if cap is not None:
                    zs = {z for z in zs if len(adj[z]) <= cap}
                c = len(zs)
                if c >= min_common:
                    out[(x, y)] = (c, len(adj[x]), len(adj[y]),
                                   c / (len(adj[x]) + len(adj[y]) - c))
        return out

    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            common_neighbor_pairs,
        )

        rng = np.random.default_rng(13)
        m = 1500
        src = rng.integers(0, 100, m)
        dst = rng.integers(0, 100, m)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        exp = self._brute(list(zip(src.tolist(), dst.tolist())),
                          min_common=3)
        got = common_neighbor_pairs(ds.repartition(5), min_common=3,
                                    partitions=4).to_pandas()
        assert {(r.x, r.y): (r.common, r.deg_x, r.deg_y, r.jaccard)
                for r in got.itertuples()} == exp

    def test_degree_cap_and_true_degrees(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            common_neighbor_pairs,
        )

        # hub 0 adjacent to everyone; 1 and 2 also share z=3, z=4;
        # capping at 4 removes the hub as a CENTER but true degrees
        # still include hub edges
        pairs = [(0, i) for i in range(1, 8)] \
            + [(1, 3), (2, 3), (1, 4), (2, 4)]
        ds = rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64())}))
        exp = self._brute(pairs, min_common=2, cap=4)
        got = common_neighbor_pairs(ds, min_common=2,
                                    max_degree=4).to_pandas()
        assert {(r.x, r.y): (r.common, r.deg_x, r.deg_y, r.jaccard)
                for r in got.itertuples()} == exp
        assert (1, 2) in exp and exp[(1, 2)][0] == 2  # hub not counted
        with pytest.raises(ValueError):
            common_neighbor_pairs(ds, min_common=0)
        with pytest.raises(ValueError):
            common_neighbor_pairs(ds, max_degree=0)

class TestDegreeAssortativity:
    def test_vs_numpy_random(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            degree_assortativity,
        )

        rng = np.random.default_rng(17)
        m = 2500
        src = rng.integers(0, 200, m)
        dst = rng.integers(0, 200, m)
        pairs = {(min(a, b), max(a, b))
                 for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs = np.array([deg[u] for u, v in pairs]
                      + [deg[v] for u, v in pairs], dtype=np.float64)
        ys = np.array([deg[v] for u, v in pairs]
                      + [deg[u] for u, v in pairs], dtype=np.float64)
        exp = np.corrcoef(xs, ys)[0, 1]
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        got = degree_assortativity(ds.repartition(6), partitions=4)
        assert got["n_edges"][0].as_py() == len(pairs)
        assert abs(got["assortativity"][0].as_py() - exp) < 1e-9

    def test_star_is_disassortative(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            degree_assortativity,
        )

        # star + one pendant chain: hub (high deg) only touches deg-1
        # leaves -> strongly negative
        t = pa.table({"src": pa.array([0, 0, 0, 0, 4], pa.int64()),
                      "dst": pa.array([1, 2, 3, 4, 5], pa.int64())})
        got = degree_assortativity(rd.from_arrow(t))
        assert got["assortativity"][0].as_py() < -0.5

class TestAdamicAdar:
    def test_vs_brute_force_random(self, ray_session):
        import math

        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            common_neighbor_pairs,
        )

        rng = np.random.default_rng(23)
        m = 1200
        src = rng.integers(0, 80, m)
        dst = rng.integers(0, 80, m)
        adj = {}
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        exp = {}
        nodes = sorted(adj)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                if y in adj[x]:
                    continue
                zs = adj[x] & adj[y]
                if len(zs) >= 2:
                    fx = sum(int(math.floor(1e8 / math.log(len(adj[z]))
                                            + 0.5)) for z in zs)
                    exp[(x, y)] = (len(zs), fx, fx / 1e8)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        got = common_neighbor_pairs(ds.repartition(5), min_common=2,
                                    adamic_adar=True,
                                    partitions=4).to_pandas()
        assert {(r.x, r.y): (r.common, r.aa_fx, r.aa)
                for r in got.itertuples()} == exp

    def test_default_output_unchanged(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (
            common_neighbor_pairs,
        )

        t = pa.table({"src": pa.array([0, 0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3, 3], pa.int64())})
        plain = common_neighbor_pairs(rd.from_arrow(t),
                                      min_common=1).to_pandas()
        assert list(plain.columns) == ["x", "y", "common", "deg_x",
                                       "deg_y", "jaccard"]
        aa = common_neighbor_pairs(rd.from_arrow(t), min_common=1,
                                   adamic_adar=True).to_pandas()
        assert list(aa.columns) == ["x", "y", "common", "deg_x",
                                    "deg_y", "jaccard", "aa_fx", "aa"]
        # the shared columns agree row-for-row
        k = ["x", "y"]
        assert plain.sort_values(k).reset_index(drop=True).equals(
            aa[plain.columns].sort_values(k).reset_index(drop=True))

class TestKCore:
    @staticmethod
    def _brute_kcore(pairs, k):
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            drop = {n_ for n_ in alive
                    if len(adj[n_] & alive) < k}
            if not drop:
                break
            alive -= drop
        return {n_: len(adj[n_] & alive) for n_ in alive}

    def test_fixpoint_vs_brute_force(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import k_core

        rng = np.random.default_rng(29)
        m = 2500
        src = rng.integers(0, 150, m)
        dst = rng.integers(0, 150, m)
        exp = self._brute_kcore(list(zip(src.tolist(), dst.tolist())), 5)
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        got = k_core(ds.repartition(5), 5, partitions=4).to_pandas()
        assert dict(zip(got["node"], got["deg"])) == exp
        # the sort-join fallback path must agree exactly
        got2 = k_core(ds.repartition(5), 5, partitions=4,
                      broadcast_nodes=0).to_pandas()
        assert dict(zip(got2["node"], got2["deg"])) == exp

    def test_bounded_rounds_and_cascade(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import k_core

        # a domino chain (path + chords, dissolves under k=3 peeling
        # one layer per round) attached to a K5 on {100..104} that
        # survives as the exact 3-core
        k5 = list(itertools.combinations(range(100, 105), 2))
        pairs = [(i, i + 1) for i in range(9)] + \
                [(i, i + 2) for i in range(8)] + [(9, 100)] + k5
        t = pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                      "dst": pa.array([p[1] for p in pairs], pa.int64())})
        ds = rd.from_arrow(t)
        exp = self._brute_kcore(pairs, 3)
        fix = k_core(ds, 3).to_pandas()
        assert dict(zip(fix["node"], fix["deg"])) == exp
        # rounds=0 is one degree filter on the ORIGINAL graph
        r0 = k_core(ds, 3, rounds=0).to_pandas()
        deg0 = {}
        for a, b in pairs:
            deg0[a] = deg0.get(a, 0) + 1
            deg0[b] = deg0.get(b, 0) + 1
        assert set(r0["node"]) == {n_ for n_, d in deg0.items() if d >= 3}
        # a large-enough bounded run equals the fixpoint
        rbig = k_core(ds, 3, rounds=20).to_pandas()
        assert dict(zip(rbig["node"], rbig["deg"])) == exp
        # a fully-dissolving core returns a TYPED empty (checked on the
        # Dataset — Ray's to_pandas drops columns on any empty Dataset)
        gone = k_core(ds, 5)
        assert gone.count() == 0
        assert gone.schema().names == ["node", "deg"]
        with pytest.raises(ValueError):
            k_core(ds, 0)
        with pytest.raises(ValueError):
            k_core(ds, 3, rounds=-1)

class TestFeaturePropagation:
    @staticmethod
    def _mk(n, d, seed):
        rng = np.random.default_rng(seed)
        feats = rng.standard_normal((n, d)).astype(np.float32)
        return feats

    @staticmethod
    def _brute(feats, pairs, rounds):
        cur = {i: feats[i].astype(np.float64) for i in range(len(feats))}
        for _ in range(rounds):
            nxt = {}
            for v in set(d for _, d in pairs):
                vs = [cur[s] for s, d in pairs if d == v and s in cur]
                if vs:
                    nxt[v] = np.mean(vs, axis=0)
            cur = nxt
        return cur

    def test_vs_brute_force_two_rounds(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import feature_propagation

        rng = np.random.default_rng(41)
        n, d, m = 40, 5, 160
        feats = self._mk(n, d, 42)
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        pairs = list(zip(src.tolist(), dst.tolist()))
        fds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(feats)),
        })).repartition(4)
        eds = rd.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(3)
        for rounds in (1, 2):
            exp = self._brute(feats, pairs, rounds)
            got = feature_propagation(fds, eds, rounds=rounds).to_pandas()
            assert set(got["node"]) == set(exp)
            for _, row in got.iterrows():
                np.testing.assert_allclose(
                    np.asarray(row["embedding"]), exp[row["node"]],
                    rtol=1e-12, atol=1e-12)

    def test_inner_semantics_and_multigraph(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import feature_propagation

        # node 2 has no feature row; node 3 receives ONLY from 2 ->
        # drops out; duplicate edge (0,1) double-weights x0 in node
        # 1's mean; node 0 receives nothing -> absent
        feats = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 3.0], [5.0, 7.0]]),
        })
        edges = pa.table({
            "src": pa.array([0, 0, 1, 2], pa.int64()),
            "dst": pa.array([1, 1, 1, 3], pa.int64()),
        })
        got = feature_propagation(rd.from_arrow(feats),
                                  rd.from_arrow(edges)).to_pandas()
        assert set(got["node"]) == {1}
        np.testing.assert_allclose(
            np.asarray(got["embedding"].iloc[0]),
            [(1.0 + 1.0 + 5.0) / 3, (3.0 + 3.0 + 7.0) / 3])
        with pytest.raises(ValueError):
            feature_propagation(rd.from_arrow(feats),
                                rd.from_arrow(edges), rounds=0)

    def test_int32_ids_cast(self, ray_session):
        # non-int64 id / edge columns must work: the union of the
        # feature rows and edge rows requires one common key type
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import feature_propagation

        feats = pa.table({
            "vec_id": pa.array([0, 1], pa.int32()),
            "embedding": pa.array([[1.0, 3.0], [5.0, 7.0]]),
        })
        edges = pa.table({
            "src": pa.array([0, 1], pa.int32()),
            "dst": pa.array([1, 0], pa.int32()),
        })
        got = feature_propagation(rd.from_arrow(feats),
                                  rd.from_arrow(edges)).to_pandas()
        by = {int(r["node"]): np.asarray(r["embedding"])
              for _, r in got.iterrows()}
        assert set(by) == {0, 1}
        np.testing.assert_allclose(by[1], [1.0, 3.0])
        np.testing.assert_allclose(by[0], [5.0, 7.0])


class TestLabelPropagation:
    @staticmethod
    def _brute(pairs, rounds):
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        lbl = {n_: n_ for n_ in adj}
        for _ in range(rounds):
            nxt = {}
            for n_ in adj:
                cnt = {}
                for nb in adj[n_]:
                    cnt[lbl[nb]] = cnt.get(lbl[nb], 0) + 1
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[n_] = best[0]
            lbl = nxt
        return lbl

    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import label_propagation

        rng = np.random.default_rng(61)
        m = 1500
        src = rng.integers(0, 120, m)
        dst = rng.integers(0, 120, m)
        pairs = {(min(a, b), max(a, b))
                 for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64())}))
        for rounds in (0, 1, 3):
            exp = self._brute(list(pairs), rounds)
            got = label_propagation(ds.repartition(5), rounds=rounds,
                                    partitions=4).to_pandas()
            assert dict(zip(got["node"], got["label"])) == exp

    def test_two_cliques_converge(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import label_propagation

        # two K5s bridged by one edge: after 3 rounds each clique
        # carries its min id; the bridge can't flip a clique majority
        c1 = list(itertools.combinations(range(5), 2))
        c2 = list(itertools.combinations(range(10, 15), 2))
        pairs = c1 + c2 + [(4, 10)]
        t = pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                      "dst": pa.array([p[1] for p in pairs], pa.int64())})
        got = label_propagation(rd.from_arrow(t), rounds=3).to_pandas()
        lbl = dict(zip(got["node"], got["label"]))
        assert all(lbl[n_] == 0 for n_ in range(5))
        assert all(lbl[n_] == 10 for n_ in range(10, 15))
        with pytest.raises(ValueError):
            label_propagation(rd.from_arrow(t), rounds=-1)

class TestShortestPaths:
    @staticmethod
    def _brute(edges, seeds, rounds):
        dist = {s: 0 for s in seeds}
        for _ in range(rounds):
            nxt = dict(dist)
            for s, d, w in edges:
                if s in dist:
                    c = dist[s] + w
                    if c < nxt.get(d, c + 1):
                        nxt[d] = c
            dist = nxt
        return dist

    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import shortest_paths

        rng = np.random.default_rng(81)
        m = 1200
        src = rng.integers(0, 200, m)
        dst = rng.integers(0, 200, m)
        w = rng.integers(0, 10, m)
        trips = list(zip(src.tolist(), dst.tolist(), w.tolist()))
        ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                     "dst": pa.array(dst, pa.int64()),
                                     "w": pa.array(w, pa.int64())}))
        for rounds in (0, 1, 4):
            exp = self._brute(trips, [0, 50, 150], rounds)
            got = shortest_paths(ds.repartition(5), [0, 50, 150],
                                 rounds=rounds, weight_col="w",
                                 partitions=4).to_pandas()
            assert dict(zip(got["node"], got["d"])) == exp

    def test_unweighted_equals_bfs_hops(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import (bfs_hops,
                                                         shortest_paths)

        rng = np.random.default_rng(82)
        m = 800
        src = rng.integers(0, 150, m)
        dst = rng.integers(0, 150, m)
        # bfs_hops is undirected: symmetrize for shortest_paths
        t = pa.table({"src": pa.array(np.r_[src, dst]),
                      "dst": pa.array(np.r_[dst, src])})
        ds = rd.from_arrow(t)
        hops = bfs_hops(ds, [3, 99], max_hops=3).to_pandas()
        sp = shortest_paths(ds, [3, 99], rounds=3).to_pandas()
        assert dict(zip(sp["node"], sp["d"])) == \
            dict(zip(hops["node"], hops["hop"]))

    def test_weighted_detour_beats_direct(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import shortest_paths

        # direct 0->2 costs 10; detour 0->1->2 costs 3 — needs 2 rounds
        t = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                      "dst": pa.array([2, 1, 2], pa.int64()),
                      "w": pa.array([10, 1, 2], pa.int64())})
        ds = rd.from_arrow(t)
        r1 = shortest_paths(ds, [0], rounds=1, weight_col="w").to_pandas()
        assert dict(zip(r1["node"], r1["d"])) == {0: 0, 1: 1, 2: 10}
        r2 = shortest_paths(ds, [0], rounds=2, weight_col="w").to_pandas()
        assert dict(zip(r2["node"], r2["d"])) == {0: 0, 1: 1, 2: 3}
        with pytest.raises(ValueError):
            shortest_paths(ds, [], rounds=1)
        with pytest.raises(ValueError):
            shortest_paths(ds, [0], rounds=-1)


class TestNegativeEdges:
    @staticmethod
    def _run(src, dst, n, m, salt, blocks=4):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import negative_edges

        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        rows = negative_edges(rd.from_arrow(t).repartition(blocks),
                              num_nodes=n, per_node=m,
                              salt=salt).take_all()
        return {(r["src"], r["dst"], r["slot"]) for r in rows}

    @staticmethod
    def _brute(src, dst, n, m, salt):
        from mini_search_engine_ray.functions.hashing import md5_low64_str

        eset = set(zip(src, dst))
        out = set()
        for s in sorted(set(src)):
            for j in range(m):
                d = int(md5_low64_str(f"{s},{j},{salt}") % n)
                if d != s and (s, d) not in eset:
                    out.add((s, d, j))
        return out

    def test_brute_force_parity_and_salt(self):
        n = 50
        i = np.arange(n)
        src = np.r_[i, i].tolist()
        dst = np.r_[(i + 1) % n, (5 * i + 2) % n].tolist()
        for salt in (0, 9):
            assert self._run(src, dst, n, 3, salt) == \
                self._brute(src, dst, n, 3, salt)
        # different salts draw different samples
        assert self._run(src, dst, n, 3, 0) != self._run(src, dst, n, 3, 9)

    def test_complete_graph_leaves_nothing(self):
        n = 6
        src, dst = [], []
        for a in range(n):
            for b in range(n):
                if a != b:
                    src.append(a)
                    dst.append(b)
        assert self._run(src, dst, n, 4, 1, blocks=2) == set()

    def test_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import negative_edges

        t = pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64())})
        ds = rd.from_arrow(t)
        with pytest.raises(ValueError):
            negative_edges(ds, num_nodes=0)
        with pytest.raises(ValueError):
            negative_edges(ds, num_nodes=5, per_node=0)


class TestModularity:
    @staticmethod
    def _run(src, dst, nodes, labels, blocks=3):
        import ray.data as rd

        from mini_search_engine_ray.stages.graph import modularity

        e = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        lab = pa.table({"node": pa.array(nodes, pa.int64()),
                        "label": pa.array(labels, pa.int64())})
        return modularity(rd.from_arrow(e).repartition(blocks),
                          rd.from_arrow(lab)).take_all()

    @staticmethod
    def _ref_q(und, lab):
        """Textbook Q over distinct undirected edges."""
        m = len(und)
        deg = {}
        e_in = {}
        for u, v in und:
            deg[lab[u]] = deg.get(lab[u], 0) + 1
            deg[lab[v]] = deg.get(lab[v], 0) + 1
            if lab[u] == lab[v]:
                e_in[lab[u]] = e_in.get(lab[u], 0) + 1
        return sum(e_in.get(c, 0) / m - (d / (2 * m)) ** 2
                   for c, d in deg.items())

    def test_two_triangles_exact(self):
        out = self._run([0, 1, 2, 3, 4, 5], [1, 2, 0, 4, 5, 3],
                        list(range(6)), [0, 0, 0, 3, 3, 3])
        assert [(r["label"], r["e_in"], r["deg"]) for r in out] == \
            [(0, 3, 6), (3, 3, 6)]
        assert abs(sum(r["q_term"] for r in out) - 0.5) < 1e-15

    def test_reference_parity_random(self):
        rng = np.random.default_rng(9)
        n = 200
        src = rng.integers(0, n, 800)
        dst = rng.integers(0, n, 800)
        lab = {i: int(i % 7) for i in range(n)}
        und = sorted({(min(s, d), max(s, d))
                      for s, d in zip(src.tolist(), dst.tolist())
                      if s != d})
        out = self._run(src, dst, list(range(n)),
                        [lab[i] for i in range(n)])
        # duplicate/reversed/self edges collapse before scoring
        assert sum(r["e_in"] for r in out) == \
            sum(1 for u, v in und if lab[u] == lab[v])
        assert sum(r["deg"] for r in out) == 2 * len(und)
        q = sum(r["q_term"] for r in out)
        assert abs(q - self._ref_q(und, lab)) < 1e-12

    def test_single_community_zero(self):
        out = self._run([0, 1, 2], [1, 2, 0], [0, 1, 2], [0, 0, 0])
        assert abs(sum(r["q_term"] for r in out)) < 1e-15

    def test_empty_graph_raises(self):
        with pytest.raises(Exception):
            self._run([0], [0], [0], [0])  # only a self-loop -> empty
