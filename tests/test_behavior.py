"""cohort_retention + funnel_counts vs brute force."""
import collections
import itertools

import numpy as np
import pyarrow as pa
import pytest

BUCKET = 7 * 86400


def _mk_events(seed, n=4000, users=60, days=40, types=4):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, users, n)
    ts_us = rng.integers(0, days * 86400, n) * 1_000_000 \
        + rng.integers(0, 1_000_000, n)
    names = np.array(["view", "click", "purchase", "error"])[:types]
    tps = names[rng.integers(0, types, n)]
    t = pa.table({"user_id": pa.array(user, pa.int64()),
                  "ts": pa.array(ts_us, pa.int64()).cast(
                      pa.timestamp("us")),
                  "event_type": pa.array(tps)})
    return t, user, ts_us, tps


class TestCohortRetention:
    def test_vs_brute_force(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import cohort_retention

        t, user, ts_us, _ = _mk_events(3)
        got = cohort_retention(
            rd.from_arrow(t).repartition(6),
            bucket_s=BUCKET).to_pandas()
        uw = set(zip(user.tolist(),
                     (ts_us // (BUCKET * 1_000_000)).tolist()))
        by_u = collections.defaultdict(set)
        for u, w in uw:
            by_u[u].add(w)
        cs = collections.Counter(w for _, w in uw)
        ret = collections.Counter()
        for ws in by_u.values():
            for a, b in itertools.combinations(sorted(ws), 2):
                ret[(a, b - a)] += 1
        assert len(got) == len(ret)
        for _, r in got.iterrows():
            k = (r["week"], r["delta"])
            assert ret[k] == r["retained"]
            assert cs[r["week"]] == r["cohort"]
            assert abs(r["rate"] - ret[k] / cs[r["week"]]) < 1e-12

    def test_semantics_and_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import cohort_retention

        # user 1 active weeks {0,1,2}; user 2 weeks {0,2}; user 3 {1}
        wk = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 2), (3, 1), (1, 0)]
        t = pa.table({
            "user_id": pa.array([u for u, _ in wk], pa.int64()),
            "ts": pa.array([w * BUCKET * 1_000_000 + 5 for _, w in wk],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        got = cohort_retention(rd.from_arrow(t), bucket_s=BUCKET) \
            .to_pandas().set_index(["week", "delta"]).sort_index()
        # cohorts: w0={1,2} (2), w1={1,3} (2), w2={1,2} (2)
        # pairs: u1 -> (0,1)(0,2)(1,1); u2 -> (0,2)
        exp = {(0, 1): (1, 2), (0, 2): (2, 2), (1, 1): (1, 2)}
        assert set(got.index) == set(exp)
        for k, (ret, co) in exp.items():
            assert got.loc[k, "retained"] == ret
            assert got.loc[k, "cohort"] == co
            assert abs(got.loc[k, "rate"] - ret / co) < 1e-12
        with pytest.raises(ValueError):
            cohort_retention(rd.from_arrow(t), bucket_s=0)


class TestFunnelCounts:
    def test_vs_brute_force_with_dropoff(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import funnel_counts

        # sparse: 300 events / 80 users -> real drop-off at each step
        t, user, ts_us, tps = _mk_events(9, n=300, users=80, days=10)
        got = funnel_counts(rd.from_arrow(t).repartition(5),
                            ["view", "click", "purchase"]).to_pandas()
        cnt = [0, 0, 0]
        for u in set(user.tolist()):
            m = user == u
            evs = sorted(zip(ts_us[m].tolist(), tps[m].tolist()))
            prev = None
            for i, want in enumerate(["view", "click", "purchase"]):
                nxt = min((ts for ts, ty in evs if ty == want
                           and (prev is None or ts > prev)),
                          default=None)
                if nxt is None:
                    break
                cnt[i] += 1
                prev = nxt
        assert got["users"].tolist() == cnt
        assert cnt[0] > cnt[1] > cnt[2] > 0  # the scenario discriminates
        assert got["step"].tolist() == [1, 2, 3]
        assert got["event_type"].tolist() == ["view", "click", "purchase"]

    def test_strict_order_and_ties(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import funnel_counts

        # u1: view@10 click@20 -> converts; u2: click@10 view@20 -> no;
        # u3: view@10 click@10 (tie, NOT strictly after) -> no
        t = pa.table({
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array([10, 20, 10, 20, 10, 10], pa.int64()).cast(
                pa.timestamp("us")),
            "event_type": pa.array(["view", "click", "click", "view",
                                    "view", "click"]),
        })
        got = funnel_counts(rd.from_arrow(t),
                            ["view", "click"]).to_pandas()
        assert got["users"].tolist() == [3, 1]
        with pytest.raises(ValueError):
            funnel_counts(rd.from_arrow(t), [])


class TestEventPairSupport:
    @staticmethod
    def _run(t, blocks=6):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import \
            event_pair_support

        rows = event_pair_support(
            rd.from_arrow(t).repartition(blocks)).take_all()
        return {(r["type_a"], r["type_b"]): r["users"] for r in rows}

    @staticmethod
    def _brute(user, ts_us, tps):
        sup = collections.Counter()
        for u in np.unique(user):
            m = user == u
            per = {ty: ts_us[m & (tps == ty)] for ty in np.unique(tps[m])}
            for a, b in itertools.permutations(per, 2):
                if per[a].min() < per[b].max():
                    sup[(a, b)] += 1
        return dict(sup)

    def test_brute_force_parity(self):
        t, user, ts_us, tps = _mk_events(17, n=2500, users=40, days=10)
        assert self._run(t) == self._brute(user, ts_us, tps)

    def test_strictness_and_tie_semantics(self):
        # user 1: a@10 then b@20 -> (a,b) only; user 2: a@30 == b@30
        # tie -> NEITHER direction; user 3: b@5 then a@9 -> (b,a)
        t = pa.table({
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array([10, 20, 30, 30, 5, 9], pa.int64()).cast(
                pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "a", "b", "b", "a"]),
        })
        assert self._run(t, blocks=3) == {("a", "b"): 1, ("b", "a"): 1}

    def test_single_type_users_contribute_nothing(self):
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([1, 2, 3, 4], pa.int64()).cast(
                pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a", "b"]),
        })
        assert self._run(t, blocks=2) == {}

    def test_null_keys_raise(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.behavior import \
            event_pair_support

        t = pa.table({
            "user_id": pa.array([1, None], pa.int64()),
            "ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["a", "b"]),
        })
        with pytest.raises(Exception):
            event_pair_support(rd.from_arrow(t)).take_all()
