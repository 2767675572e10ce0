"""Temporal operators: tumbling/sliding windows, sessionization,
as-of attribution join — vs brute-force Python oracles, including
forced multi-block sorts so the block-edge repair paths run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.windows import (
    asof_join_latest,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)

US = 1_000_000


def _events(ts_us, users, types, values):
    return pa.table({
        "event_id": pa.array(np.arange(len(ts_us), dtype=np.int64)),
        "ts": pa.array(np.asarray(ts_us, dtype=np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.asarray(users, dtype=np.int64)),
        "event_type": pa.array(list(types), pa.large_string()),
        "value": pa.array(np.asarray(values, dtype=np.float64)),
    })


def _rand_events(n, n_users=7, seed=0, span_s=3600):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, span_s * US, size=n))
    users = rng.integers(0, n_users, size=n)
    types = rng.choice(["click", "view", "error"], size=n)
    values = np.round(rng.uniform(0, 100, size=n), 2)
    return _events(ts, users, types, values)


def _many_blocks(t, parts=8):
    import ray.data as rd

    # feed as many input blocks; sort output block count tracks input
    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


class TestTumbling:
    def test_counts_and_sums(self, ray_session):
        import ray.data as rd

        t = _events([0, 10 * US, 70 * US, 70 * US, 130 * US],
                    [1, 1, 2, 2, 1], ["a", "a", "a", "b", "a"],
                    [1.0, 2.0, 3.0, 4.0, 5.0])
        out = tumbling_window_agg(rd.from_arrow(t), width_s=60).to_pandas()
        got = {(r.window_start_us, r.event_type): (r.n_events, r.sum_value)
               for r in out.itertuples()}
        assert got == {(0, "a"): (2, 3.0), (60 * US, "a"): (1, 3.0),
                       (60 * US, "b"): (1, 4.0), (120 * US, "a"): (1, 5.0)}

    def test_total_mass_conserved(self, ray_session):
        t = _rand_events(500)
        out = tumbling_window_agg(_many_blocks(t), width_s=60).to_pandas()
        assert out.n_events.sum() == 500
        assert abs(out.sum_value.sum() - t["value"].to_numpy().sum()) < 1e-6


class TestSliding:
    def test_each_event_in_m_windows(self, ray_session):
        t = _rand_events(300)
        m = 4
        out = sliding_window_agg(_many_blocks(t), width_s=60, hop_s=15).to_pandas()
        assert out.n_events.sum() == 300 * m

    def test_window_membership_exact(self, ray_session):
        import ray.data as rd

        # one event at t=100s -> windows starting at 45,60,75,90
        t = _events([100 * US], [1], ["a"], [2.5])
        out = sliding_window_agg(rd.from_arrow(t), width_s=60, hop_s=15).to_pandas()
        assert sorted(out.window_start_us // US) == [45, 60, 75, 90]
        assert (out.n_events == 1).all() and (out.sum_value == 2.5).all()

    def test_width_not_multiple_raises(self, ray_session):
        import ray.data as rd

        with pytest.raises(ValueError):
            sliding_window_agg(rd.from_arrow(_rand_events(5)), width_s=60, hop_s=7)


def _brute_sessions(t, gap_us):
    import pandas as pd

    df = t.to_pandas()
    df["tu"] = df.ts.astype("int64")
    out = []
    for u, g in df.sort_values(["user_id", "tu"]).groupby("user_id"):
        start = None
        for _, r in g.iterrows():
            if start is None or r.tu - prev > gap_us:
                if start is not None:
                    out.append((u, start, prev, n, s))
                start, n, s = r.tu, 0, 0.0
            prev, n, s = r.tu, n + 1, s + r.value
        out.append((u, start, prev, n, s))
    return sorted(out)


class TestSessionize:
    def test_vs_brute_force_multiblock(self, ray_session):
        gap = 120
        t = _rand_events(400, n_users=5, span_s=7200)
        out = sessionize(_many_blocks(t), gap_s=gap).to_pandas()
        got = sorted(zip(out.user_id, out.session_start_us, out.session_end_us,
                         out.n_events, out.sum_value))
        exp = _brute_sessions(t, gap * US)
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert g[:4] == e[:4]
            assert abs(g[4] - e[4]) < 1e-6

    def test_single_user_spans_blocks(self, ray_session):
        # ONE user, events 10s apart, gap 60s -> exactly one session
        # even though the sorted data spans many blocks (chain repair)
        n = 200
        ts = np.arange(n, dtype=np.int64) * 10 * US
        t = _events(ts, np.ones(n), ["a"] * n, np.ones(n))
        out = sessionize(_many_blocks(t, parts=10), gap_s=60).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
                r.sum_value) == (1, 0, (n - 1) * 10 * US, n, float(n))

    def test_gap_boundary_inclusive(self, ray_session):
        import ray.data as rd

        # gap EXACTLY equal to threshold stays one session; +1us splits
        t = _events([0, 60 * US, 120 * US + 1], [1, 1, 1], ["a"] * 3, [1.0] * 3)
        out = sessionize(rd.from_arrow(t), gap_s=60).to_pandas()
        assert sorted(out.n_events) == [1, 2]


def _brute_asof(t):
    df = t.to_pandas()
    df["tu"] = df.ts.astype("int64")
    exp = {}
    for r in df[df.event_type == "click"].itertuples():
        views = df[(df.event_type == "view") & (df.user_id == r.user_id)
                   & (df.tu <= r.tu)]
        exp[r.event_id] = int(views.tu.max()) if len(views) else -1
    return exp


class TestAsofJoin:
    def test_vs_brute_force_multiblock(self, ray_session):
        t = _rand_events(400, n_users=5)
        out = asof_join_latest(_many_blocks(t)).to_pandas()
        got = dict(zip(out.event_id, out.view_ts_us))
        exp = _brute_asof(t)
        assert got == exp

    def test_inclusive_same_timestamp(self, ray_session):
        import ray.data as rd

        # view and click at the SAME ts: inclusive (ASOF l.ts >= r.ts)
        t = _events([50 * US, 50 * US], [3, 3], ["click", "view"], [0.0, 0.0])
        out = asof_join_latest(rd.from_arrow(t)).to_pandas()
        assert list(out.view_ts_us) == [50 * US]

    def test_user_spans_blocks_carry(self, ray_session):
        # one view at t=0, then a long run of clicks by the same user
        # across many blocks: every click must resolve to that view
        n = 150
        ts = np.arange(n, dtype=np.int64) * US
        types = ["view"] + ["click"] * (n - 1)
        t = _events(ts, np.full(n, 9), types, np.zeros(n))
        out = asof_join_latest(_many_blocks(t, parts=10)).to_pandas()
        assert len(out) == n - 1
        assert (out.view_ts_us == 0).all()

    def test_no_prior_view(self, ray_session):
        import ray.data as rd

        t = _events([10 * US, 20 * US], [1, 1], ["click", "view"], [0.0, 0.0])
        out = asof_join_latest(rd.from_arrow(t)).to_pandas()
        assert list(out.view_ts_us) == [-1]


class TestFunnelDepths:
    """funnel_depths: greedy-earliest ordered funnel."""

    @staticmethod
    def _run(rows, steps, blocks=3):
        import pyarrow as pa
        import ray.data as rd

        from mini_search_engine_ray.stages.windows import funnel_depths

        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        })
        out = funnel_depths(rd.from_arrow(t).repartition(blocks), steps)
        return {r["user_id"]: (r["depth"], r["last_ts_us"])
                for r in out.take_all()}

    @staticmethod
    def _brute(rows, steps):
        out = {}
        users = {r[0] for r in rows}
        for u in users:
            ev = sorted((r[1], r[2]) for r in rows if r[0] == u)
            t_prev, depth, last = None, 0, None
            for s in steps:
                cands = [ts for ts, ty in ev if ty == s
                         and (t_prev is None or ts > t_prev)]
                if not cands:
                    break
                t_prev = min(cands)
                depth += 1
                last = t_prev
            if depth:
                out[u] = (depth, last)
        return out

    def test_matches_brute_force(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(21)
        types = ["view", "click", "purchase", "other"]
        rows = [(int(rng.integers(0, 25)), int(rng.integers(0, 500)),
                 types[rng.integers(0, 4)]) for _ in range(400)]
        steps = ["view", "click", "purchase"]
        assert self._run(rows, steps) == self._brute(rows, steps)

    def test_strictly_after_and_partial(self, ray_session):
        rows = [
            (1, 10, "view"), (1, 10, "click"),   # same ts: click does
            (1, 20, "click"), (1, 5, "purchase"),  # early purchase ignored
            (2, 10, "click"),                    # no view -> omitted
            (3, 1, "view"),                      # depth 1
        ]
        got = self._run(rows, ["view", "click", "purchase"], blocks=2)
        assert got == {1: (2, 20), 3: (1, 1)}

    def test_validation(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from mini_search_engine_ray.stages.windows import funnel_depths

        t = pa.table({"user_id": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.timestamp("us")),
                      "event_type": pa.array([], pa.string())})
        with __import__("pytest").raises(ValueError):
            funnel_depths(rd.from_arrow(t), [])
        assert funnel_depths(rd.from_arrow(t), ["a"]).take_all() == []


class TestGapfillCounts:
    @staticmethod
    def _run(t, bucket_s, blocks=6):
        import ray.data as rd

        from mini_search_engine_ray.stages.windows import gapfill_counts

        rows = gapfill_counts(rd.from_arrow(t).repartition(blocks),
                              bucket_s=bucket_s).take_all()
        return {(r["user_id"], r["bucket"]): r["cnt"] for r in rows}

    def test_brute_force_parity_with_zero_fill(self):
        import collections

        rng = np.random.default_rng(4)
        n, users, b = 3000, 25, 3600
        user = rng.integers(0, users, n)
        ts = rng.integers(0, 40 * b, n) * 1_000_000
        t = pa.table({"user_id": pa.array(user, pa.int64()),
                      "ts": pa.array(ts, pa.int64()).cast(
                          pa.timestamp("us"))})
        got = self._run(t, b)
        cnt = collections.Counter(
            zip(user.tolist(), (ts // (b * 1_000_000)).tolist()))
        exp = {}
        for u in set(user.tolist()):
            ws = [w for (uu, w) in cnt if uu == u]
            for w in range(min(ws), max(ws) + 1):
                exp[(u, w)] = cnt.get((u, w), 0)
        assert got == exp
        assert any(v == 0 for v in got.values())  # gaps were filled

    def test_single_bucket_key_and_gap_shape(self):
        # user 1 active in buckets 0 and 3 only -> grid 0..3 with two
        # zero rows; user 2 active once -> a single row, no padding
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([0, 1, 3_000_000 * 3, 9_000_000],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        got = self._run(t, 3, blocks=2)
        assert got == {(1, 0): 2, (1, 1): 0, (1, 2): 0, (1, 3): 1,
                       (2, 3): 1}

    def test_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.windows import gapfill_counts

        t = pa.table({"user_id": pa.array([1], pa.int64()),
                      "ts": pa.array([0], pa.int64()).cast(
                          pa.timestamp("us"))})
        with pytest.raises(ValueError):
            gapfill_counts(rd.from_arrow(t), bucket_s=0)
        bad = pa.table({"user_id": pa.array([None], pa.int64()),
                        "ts": pa.array([0], pa.int64()).cast(
                            pa.timestamp("us"))})
        with pytest.raises(Exception):
            gapfill_counts(rd.from_arrow(bad), bucket_s=1).take_all()
