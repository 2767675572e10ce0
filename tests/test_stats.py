"""grouped_linear_stats + group_token_entropy vs brute force."""
import collections
import math

import numpy as np
import pyarrow as pa
import pytest


class TestGroupedLinearStats:
    def test_vs_polyfit_int_x(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import grouped_linear_stats

        rng = np.random.default_rng(7)
        n = 5000
        key = rng.integers(0, 40, n)
        x = rng.integers(0, 86400, n)
        y = 3.5 * x / 1e4 + rng.standard_normal(n) * 5 + key
        ds = rd.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y)})).repartition(7)
        got = grouped_linear_stats(
            ds, key_col="k", x_col="x", y_col="y").to_pandas() \
            .set_index("k").sort_index()
        assert len(got) == 40
        for k in range(40):
            m = key == k
            sl, ic = np.polyfit(x[m].astype(float), y[m], 1)
            r = np.corrcoef(x[m].astype(float), y[m])[0, 1]
            row = got.loc[k]
            assert row["n"] == m.sum()
            assert abs(row["slope"] - sl) < 1e-9
            assert abs(row["intercept"] - ic) < 1e-8
            assert abs(row["corr"] - r) < 1e-9

    def test_degenerate_groups_and_string_key(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import grouped_linear_stats

        # "a": constant x -> dropped; "b": n=1 -> dropped;
        # "c": constant y -> kept, corr NULL; "d": perfect line
        t = pa.table({
            "k": pa.array(["a", "a", "a", "b", "c", "c", "d", "d"]),
            "x": pa.array([5, 5, 5, 1, 1, 2, 1, 3], pa.int64()),
            "y": pa.array([1., 2., 3., 9., 7., 7., 1., 5.]),
        })
        got = grouped_linear_stats(
            rd.from_arrow(t).repartition(2),
            key_col="k", x_col="x", y_col="y").to_pandas().set_index("k")
        assert set(got.index) == {"c", "d"}
        assert got.loc["c"].isna()["corr"]
        assert abs(got.loc["c", "slope"]) < 1e-12
        np.testing.assert_allclose(
            [got.loc["d", "slope"], got.loc["d", "intercept"],
             got.loc["d", "corr"]], [2.0, -1.0, 1.0], atol=1e-12)

    def test_float_x_path_and_reshard_stability(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import grouped_linear_stats

        rng = np.random.default_rng(11)
        n = 1200
        t = pa.table({
            "k": pa.array(rng.integers(0, 5, n), pa.int64()),
            "x": pa.array(rng.standard_normal(n)),
            "y": pa.array(rng.standard_normal(n)),
        })
        outs = []
        for parts in (1, 6):
            outs.append(grouped_linear_stats(
                rd.from_arrow(t).repartition(parts),
                key_col="k", x_col="x", y_col="y").to_pandas()
                .set_index("k").sort_index())
        for c in ("slope", "intercept", "corr"):
            np.testing.assert_allclose(outs[0][c], outs[1][c],
                                       rtol=1e-9, atol=1e-12)

    def test_null_inputs_raise(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import grouped_linear_stats

        t = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "x": pa.array([1, None], pa.int64()),
                      "y": pa.array([1.0, 2.0])})
        with pytest.raises(Exception, match="NULL"):
            grouped_linear_stats(rd.from_arrow(t), key_col="k",
                                 x_col="x", y_col="y").to_pandas()


class TestGroupTokenEntropy:
    def test_vs_counter(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.textstats import (
            group_token_entropy,
        )

        docs = pa.table({
            "source": pa.array(["a", "a", "b", "b", "b"]),
            "text": pa.array(["The cat sat", "the dog", "x x X",
                              "x y", "z"]),
        })
        got = group_token_entropy(
            rd.from_arrow(docs).repartition(3)).to_pandas() \
            .set_index("source")
        for s, toks in (("a", "the cat sat the dog".split()),
                        ("b", "x x x x y z".split())):
            c = collections.Counter(toks)
            n = sum(c.values())
            h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
            assert got.loc[s, "n_tokens"] == n
            assert got.loc[s, "vocab"] == len(c)
            assert abs(got.loc[s, "entropy"] - h) < 1e-12

    def test_extremes(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.textstats import (
            group_token_entropy,
        )

        # uniform distribution -> ln(vocab); single repeated type -> 0
        docs = pa.table({
            "source": pa.array(["u", "m"]),
            "text": pa.array(["a b c d", "w w w w w"]),
        })
        got = group_token_entropy(rd.from_arrow(docs)).to_pandas() \
            .set_index("source")
        assert abs(got.loc["u", "entropy"] - math.log(4)) < 1e-12
        assert abs(got.loc["m", "entropy"]) < 1e-12


class TestAssociationStats:
    @staticmethod
    def _run(a, b, blocks=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import association_stats

        t = pa.table({"a": pa.array(list(a), pa.string()),
                      "b": pa.array(list(b), pa.string())})
        return association_stats(rd.from_arrow(t).repartition(blocks),
                                 a_col="a", b_col="b").take_all()[0]

    @staticmethod
    def _ref(a, b):
        import math

        a, b = np.asarray(a), np.asarray(b)
        ca, cb = sorted(set(a)), sorted(set(b))
        o = np.array([[np.sum((a == x) & (b == y)) for y in cb]
                      for x in ca], float)
        ra = o.sum(1, keepdims=True)
        cc = o.sum(0, keepdims=True)
        n = o.sum()
        e = ra * cc / n
        chi2 = float(np.sum((o - e) ** 2 / e))
        m = o > 0
        mi = float(np.sum((o[m] / n) * np.log(
            o[m] * n / ((ra @ np.ones((1, len(cb))))[m]
                        * (np.ones((len(ca), 1)) @ cc)[m]))))
        v = math.sqrt(chi2 / (n * (min(len(ca), len(cb)) - 1)))
        return chi2, mi, v, (len(ca) - 1) * (len(cb) - 1)

    def test_reference_parity_with_zero_cells(self):
        rng = np.random.default_rng(6)
        n = 5000
        a = rng.choice(["x", "y", "z"], n, p=[0.5, 0.3, 0.2])
        # x never produces r -> a real zero cell exercises the n - Σe
        # correction
        b = np.where(a == "x", rng.choice(["p", "q"], n, p=[0.8, 0.2]),
                     rng.choice(["p", "q", "r"], n))
        got = self._run(a, b)
        chi2, mi, v, dof = self._ref(a, b)
        assert abs(got["chi2"] - chi2) < 1e-8 * chi2
        assert abs(got["mi"] - mi) < 1e-10
        assert abs(got["cramers_v"] - v) < 1e-12
        assert got["dof"] == dof and got["n"] == n

    def test_exact_independence_and_perfect_association(self):
        # product counts -> chi2 == 0, mi == 0 exactly (o == e cellwise)
        a, b = [], []
        for x, fx in (("u", 2), ("v", 3)):
            for y, gy in (("p", 4), ("q", 1)):
                a += [x] * (fx * gy)
                b += [y] * (fx * gy)
        got = self._run(a, b, blocks=3)
        assert got["chi2"] == 0.0 and got["mi"] == 0.0
        assert got["cramers_v"] == 0.0
        # identical columns -> Cramér's V exactly 1
        c = ["p", "q", "r", "p", "q", "r", "p"]
        got2 = self._run(c, c, blocks=2)
        assert abs(got2["cramers_v"] - 1.0) < 1e-12

    def test_degenerate_single_category(self):
        got = self._run(["only"] * 10, ["p", "q"] * 5, blocks=2)
        assert got["dof"] == 0 and got["chi2"] == 0.0
        assert got["cramers_v"] is None

    def test_null_category_raises(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import association_stats

        t = pa.table({"a": pa.array(["x", None], pa.string()),
                      "b": pa.array(["p", "q"], pa.string())})
        with pytest.raises(Exception):
            association_stats(rd.from_arrow(t), a_col="a",
                              b_col="b").take_all()


class TestCohensKappa:
    @staticmethod
    def _run(a, b, blocks=4):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import cohens_kappa

        t = pa.table({"a": pa.array(list(a), pa.string()),
                      "b": pa.array(list(b), pa.string())})
        return cohens_kappa(rd.from_arrow(t).repartition(blocks),
                            a_col="a", b_col="b").take_all()[0]

    def test_reference_parity(self):
        rng = np.random.default_rng(12)
        n = 2000
        a = rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15])
        flip = rng.random(n) < 0.2
        b = np.where(flip, rng.choice(["en", "de", "fr"], n), a)
        got = self._run(a, b)
        # reference
        labels = sorted(set(a) | set(b))
        po = float(np.mean(a == b))
        pe = sum(np.sum(a == l) * np.sum(b == l) for l in labels) / n**2
        kappa = (po - pe) / (1 - pe)
        assert got["n"] == n and got["agree"] == int(np.sum(a == b))
        assert got["po"] == po                      # one exact division
        assert abs(got["pe"] - pe) < 1e-15
        assert abs(got["kappa"] - kappa) < 1e-12

    def test_perfect_and_degenerate(self):
        a = ["x", "y", "z", "x"]
        assert self._run(a, a, blocks=2)["kappa"] == 1.0
        # single identical label on both sides: pe = 1 -> NULL
        got = self._run(["u"] * 6, ["u"] * 6, blocks=2)
        assert got["kappa"] is None and got["po"] == 1.0
        # disjoint label spaces: agreement 0, chance 0 -> kappa = 0/1
        got2 = self._run(["p"] * 4, ["q"] * 4, blocks=2)
        assert got2["agree"] == 0 and got2["kappa"] == 0.0


class TestKeySkewStats:
    @staticmethod
    def _run(keys, blocks=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import key_skew_stats

        t = pa.table({"k": pa.array(list(keys), pa.int64())})
        return key_skew_stats(rd.from_arrow(t).repartition(blocks),
                              key_col="k").take_all()[0]

    @staticmethod
    def _ref_gini(counts):
        c = np.sort(np.asarray(counts, np.int64))
        n = len(c)
        i = np.arange(1, n + 1)
        return float((2 * (i * c).sum() - (n + 1) * c.sum())
                     / (n * c.sum()))

    def test_reference_parity(self):
        rng = np.random.default_rng(3)
        keys = rng.zipf(1.7, 4000) % 97
        got = self._run(keys)
        import collections

        cnt = collections.Counter(keys.tolist())
        assert got["n_keys"] == len(cnt)
        assert got["n_rows"] == 4000
        assert got["max_cnt"] == max(cnt.values())
        assert got["max_share"] == max(cnt.values()) / 4000
        assert abs(got["gini"] - self._ref_gini(list(cnt.values()))) \
            < 1e-15

    def test_uniform_and_degenerate(self):
        # perfectly uniform counts -> gini 0
        got = self._run(list(range(10)) * 7)
        assert got["gini"] == 0.0 and got["max_share"] == 0.1
        # one key owns everything -> single key, gini 0 by the formula
        got2 = self._run([5] * 20, blocks=2)
        assert got2["n_keys"] == 1 and got2["max_share"] == 1.0

    def test_null_key_raises(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import key_skew_stats

        t = pa.table({"k": pa.array([1, None], pa.int64())})
        with pytest.raises(Exception):
            key_skew_stats(rd.from_arrow(t), key_col="k").take_all()


class TestDriftStats:
    @staticmethod
    def _run(values, ts_us, split, lo, hi, bins, blocks=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import drift_stats

        t = pa.table({
            "value": pa.array(np.asarray(values, np.float64)),
            "ts": pa.array(np.asarray(ts_us, np.int64)).cast(
                pa.timestamp("us"))})
        return drift_stats(rd.from_arrow(t).repartition(blocks),
                           value_col="value", ts_col="ts",
                           split_us=split, lo_cents=lo, hi_cents=hi,
                           bins=bins).take_all()[0]

    @staticmethod
    def _ref(values, ts_us, split, lo, hi, bins):
        cents = np.floor(np.asarray(values) * 100).astype(np.int64)
        b = np.clip((cents - lo) * bins // (hi - lo), 0, bins - 1)
        per = np.asarray(ts_us) >= split
        na = np.bincount(b[~per], minlength=bins)
        nb = np.bincount(b[per], minlength=bins)
        n_a, n_b = na.sum(), nb.sum()
        p = (na + 1) / (n_a + bins)
        q = (nb + 1) / (n_b + bins)
        psi = float(np.sum((p - q) * np.log(p / q)))
        gap = np.abs(np.cumsum(na) * n_b - np.cumsum(nb) * n_a)
        k = int(np.argmax(gap))
        return psi, float(gap[k]) / (float(n_a) * float(n_b)), k

    def test_reference_parity_with_real_drift(self):
        rng = np.random.default_rng(7)
        n = 4000
        # period B shifted upward: genuine drift
        v = np.r_[rng.uniform(1, 200, n // 2),
                  rng.uniform(100, 400, n // 2)]
        ts = np.r_[np.zeros(n // 2), np.full(n // 2, 10**9)]
        got = self._run(v, ts, 5 * 10**8, 0, 40_000, 16)
        psi, ks, k = self._ref(v, ts, 5 * 10**8, 0, 40_000, 16)
        assert abs(got["psi"] - psi) < 1e-12
        assert abs(got["ks"] - ks) < 1e-15
        assert got["ks_bucket"] == k
        assert got["psi"] > 0.5 and got["ks"] > 0.3  # real drift

    def test_identical_distributions_near_zero(self):
        rng = np.random.default_rng(8)
        v = rng.uniform(0, 100, 3000)
        ts = np.arange(3000)  # interleave halves by index parity
        got = self._run(v, ts % 2 * 10**9, 5 * 10**8, 0, 10_000, 8)
        assert got["psi"] < 0.02 and got["ks"] < 0.05

    def test_empty_period_raises(self):
        with pytest.raises(Exception):
            self._run([1.0, 2.0], [0, 1], 10**9, 0, 1000, 4)

    def test_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import drift_stats

        t = pa.table({"value": pa.array([1.0]),
                      "ts": pa.array([0], pa.int64()).cast(
                          pa.timestamp("us"))})
        ds = rd.from_arrow(t)
        with pytest.raises(ValueError):
            drift_stats(ds, value_col="value", ts_col="ts", split_us=0,
                        lo_cents=0, hi_cents=100, bins=1)
        with pytest.raises(ValueError):
            drift_stats(ds, value_col="value", ts_col="ts", split_us=0,
                        lo_cents=100, hi_cents=100, bins=4)


class TestRocAuc:
    @staticmethod
    def _run(scores, labels, blocks=6):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import roc_auc

        t = pa.table({"s": pa.array(np.asarray(scores, np.int64)),
                      "y": pa.array(np.asarray(labels, np.int64))})
        return roc_auc(rd.from_arrow(t).repartition(blocks),
                       score_col="s", label_col="y").take_all()[0]

    @staticmethod
    def _ref(scores, labels):
        """Brute-force pairwise AUC: mean over (pos, neg) pairs of
        1/0.5/0 for win/tie/loss."""
        s = np.asarray(scores)
        y = np.asarray(labels)
        p, n = s[y == 1], s[y == 0]
        wins = (p[:, None] > n[None, :]).sum()
        ties = (p[:, None] == n[None, :]).sum()
        return (wins + 0.5 * ties) / (len(p) * len(n))

    def test_reference_parity_with_ties(self):
        rng = np.random.default_rng(11)
        n = 3000
        y = (rng.random(n) < 0.3).astype(np.int64)
        # discriminative integer scores with heavy ties (only 40 levels)
        s = (rng.integers(0, 40, n) + y * rng.integers(0, 12, n))
        got = self._run(s, y)
        assert got["n_pos"] == int(y.sum())
        assert got["n_neg"] == int((1 - y).sum())
        assert abs(got["auc"] - self._ref(s, y)) < 1e-12

    def test_block_count_invariance(self):
        rng = np.random.default_rng(3)
        s = rng.integers(0, 1000, 2000)
        y = (rng.random(2000) < 0.5).astype(np.int64)
        a1 = self._run(s, y, blocks=1)
        a9 = self._run(s, y, blocks=9)
        assert a1 == a9

    def test_perfect_and_inverted_and_random(self):
        # perfectly separated -> 1.0; inverted -> 0.0; all-tied -> 0.5
        assert self._run([1, 2, 3, 10, 11, 12],
                         [0, 0, 0, 1, 1, 1])["auc"] == 1.0
        assert self._run([10, 11, 12, 1, 2, 3],
                         [0, 0, 0, 1, 1, 1])["auc"] == 0.0
        assert self._run([5, 5, 5, 5], [0, 1, 0, 1])["auc"] == 0.5

    def test_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import roc_auc

        with pytest.raises(Exception):  # one-class input
            self._run([1, 2, 3], [1, 1, 1])
        t = pa.table({"s": pa.array([1.5, 2.5], pa.float64()),
                      "y": pa.array([0, 1], pa.int64())})
        with pytest.raises(Exception):  # float score rejected
            roc_auc(rd.from_arrow(t), score_col="s",
                    label_col="y").take_all()


class TestKlByGroup:
    @staticmethod
    def _run(groups, cats, blocks=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import kl_by_group

        t = pa.table({"g": pa.array(list(groups)),
                      "c": pa.array(list(cats))})
        out = kl_by_group(rd.from_arrow(t).repartition(blocks),
                          group_col="g", cat_col="c").take_all()
        return {r["group"]: (r["n"], r["kl"]) for r in out}

    @staticmethod
    def _ref(groups, cats):
        import collections
        gset = sorted(set(groups))
        cset = sorted(set(cats))
        n = len(groups)
        joint = collections.Counter(zip(groups, cats))
        glob = collections.Counter(cats)
        out = {}
        for g in gset:
            n_g = sum(v for (gg, _), v in joint.items() if gg == g)
            kl = 0.0
            for c in cset:
                pg = (joint[(g, c)] + 1) / (n_g + len(cset))
                p = (glob[c] + 1) / (n + len(cset))
                kl += pg * math.log(pg / p)
            out[g] = (n_g, kl)
        return out

    def test_reference_parity(self):
        rng = np.random.default_rng(5)
        gs = [f"s{i}" for i in rng.integers(0, 8, 4000)]
        # group s0 heavily skewed to one category: genuine divergence
        cs = [("zz" if g == "s0" and r < 0.8 else f"c{k}")
              for g, r, k in zip(gs, rng.random(4000),
                                 rng.integers(0, 5, 4000))]
        got = self._run(gs, cs)
        ref = self._ref(gs, cs)
        assert set(got) == set(ref)
        for g in ref:
            assert got[g][0] == ref[g][0]
            assert abs(got[g][1] - ref[g][1]) < 1e-12
        assert got["s0"][1] == max(v[1] for v in got.values())

    def test_identical_mix_near_zero(self):
        gs = ["a", "b"] * 500
        cs = (["x"] * 250 + ["y"] * 250) * 2
        got = self._run(sorted(gs), cs)
        for _, kl in got.values():
            assert kl < 1e-6

    def test_null_and_empty_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import kl_by_group

        t = pa.table({"g": pa.array(["a", None]),
                      "c": pa.array(["x", "y"])})
        with pytest.raises(Exception):
            kl_by_group(rd.from_arrow(t), group_col="g",
                        cat_col="c").take_all()
        t0 = pa.table({"g": pa.array([], pa.string()),
                       "c": pa.array([], pa.string())})
        with pytest.raises(Exception):
            kl_by_group(rd.from_arrow(t0), group_col="g",
                        cat_col="c").take_all()


class TestDriftStatsByGroup:
    @staticmethod
    def _run(groups, values, ts_us, split, lo, hi, bins, blocks=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.stats import (
            drift_stats, drift_stats_by_group)

        t = pa.table({
            "g": pa.array(list(groups)),
            "value": pa.array(np.asarray(values, np.float64)),
            "ts": pa.array(np.asarray(ts_us, np.int64)).cast(
                pa.timestamp("us"))})
        out = drift_stats_by_group(
            rd.from_arrow(t).repartition(blocks), group_col="g",
            value_col="value", ts_col="ts", split_us=split,
            lo_cents=lo, hi_cents=hi, bins=bins).take_all()
        return {r["group"]: r for r in out}

    def test_matches_global_operator_per_group(self):
        from mini_search_engine_ray.stages.stats import drift_stats
        import ray.data as rd

        rng = np.random.default_rng(13)
        n = 6000
        gs = np.array([f"t{i}" for i in rng.integers(0, 3, n)])
        v = np.where(gs == "t0",
                     rng.uniform(1, 100, n),      # t0 drifts below
                     rng.uniform(1, 300, n))
        ts = rng.integers(0, 2 * 10**9, n)
        v = np.where((gs == "t0") & (ts >= 10**9), v + 150, v)
        got = self._run(gs, v, ts, 10**9, 0, 40_000, 16)
        for g in ("t0", "t1", "t2"):
            sel = gs == g
            t = pa.table({
                "value": pa.array(v[sel]),
                "ts": pa.array(ts[sel].astype(np.int64)).cast(
                    pa.timestamp("us"))})
            ref = drift_stats(rd.from_arrow(t), value_col="value",
                              ts_col="ts", split_us=10**9, lo_cents=0,
                              hi_cents=40_000, bins=16).take_all()[0]
            assert got[g]["n_a"] == ref["n_a"]
            assert got[g]["n_b"] == ref["n_b"]
            assert abs(got[g]["psi"] - ref["psi"]) < 1e-12
            assert abs(got[g]["ks"] - ref["ks"]) < 1e-12
            assert got[g]["ks_bucket"] == ref["ks_bucket"]
        assert got["t0"]["psi"] == max(r["psi"] for r in got.values())

    def test_empty_period_group_is_null(self):
        # group "b" exists only in period A -> NULL psi/ks/ks_bucket
        gs = ["a"] * 100 + ["b"] * 20
        v = list(np.linspace(1, 100, 100)) + [50.0] * 20
        ts = [0, 2 * 10**9] * 50 + [0] * 20
        got = self._run(gs, v, ts, 10**9, 0, 20_000, 8)
        assert got["b"]["psi"] is None
        assert got["b"]["ks"] is None
        assert got["b"]["ks_bucket"] is None
        assert got["b"]["n_a"] == 20 and got["b"]["n_b"] == 0
        assert got["a"]["psi"] is not None

    def test_validation(self):
        with pytest.raises(Exception):   # null group
            self._run(["a", None], [1.0, 2.0], [0, 2 * 10**9],
                      10**9, 0, 1000, 4)
        with pytest.raises(Exception):   # bins < 2
            self._run(["a"], [1.0], [0], 10**9, 0, 1000, 1)
