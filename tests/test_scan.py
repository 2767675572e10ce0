"""Distributed prefix scan (running_sum/running_agg) + token-budget
sharding."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.scan import (
    row_number,
    running_agg,
    running_sum,
    token_budget_shards,
)


def _brute(df, value, order, key=None):
    df = df.sort_values(([key] if key else []) + order).copy()
    if key is None:
        df["running_sum"] = df[value].cumsum()
    else:
        df["running_sum"] = df.groupby(key)[value].cumsum()
    return df


def _canon(df, cols):
    return df.sort_values(cols).reset_index(drop=True).astype("int64")


class TestRunningSum:
    def test_keyed_multiblock_vs_brute(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(1)
        n = 3000
        t = pa.table({"k": rng.integers(0, 5, n),
                      "o": rng.permutation(n),
                      "v": rng.integers(-10, 100, n)})
        ds = rd.from_arrow(t).repartition(11)
        got = running_sum(ds, value_col="v", order_by="o",
                          key_col="k").to_pandas()
        exp = _brute(t.to_pandas(), "v", ["o"], "k")
        pd.testing.assert_frame_equal(_canon(got, ["k", "o"]),
                                      _canon(exp, ["k", "o"]))

    def test_global_and_single_key_span_all_blocks(self, ray_session):
        import ray.data as rd

        t = pa.table({"o": np.arange(500), "v": np.full(500, 3)})
        ds = rd.from_arrow(t).repartition(9)
        got = running_sum(ds, value_col="v", order_by="o").to_pandas()
        got = got.sort_values("o").reset_index(drop=True)
        assert got["running_sum"].tolist() == [3 * (i + 1) for i in range(500)]

    def test_float_values(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        t = pa.table({"o": np.arange(64), "v": rng.normal(size=64)})
        got = running_sum(rd.from_arrow(t).repartition(4), value_col="v",
                          order_by="o").to_pandas().sort_values("o")
        exp = np.cumsum(t["v"].to_numpy())
        np.testing.assert_allclose(got["running_sum"].to_numpy(), exp,
                                   rtol=1e-12)

    def test_multi_column_order(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": [1, 1, 1, 1], "a": [2, 2, 1, 1],
                      "b": [1, 0, 1, 0], "v": [10, 20, 30, 40]})
        got = running_sum(rd.from_arrow(t), value_col="v",
                          order_by=["a", "b"], key_col="k").to_pandas()
        got = got.sort_values(["a", "b"])
        # order: (1,0)=40, (1,1)=30, (2,0)=20, (2,1)=10
        assert got["running_sum"].tolist() == [40, 70, 90, 100]

    def test_duplicate_sort_tuple_in_block_raises(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": [1, 1], "o": [7, 7], "v": [1, 2]})
        with pytest.raises(Exception, match="unique"):
            running_sum(rd.from_arrow(t), value_col="v", order_by="o",
                        key_col="k").materialize()

    def test_duplicate_across_blocks_raises(self, ray_session):
        import ray.data as rd

        # many equal tuples guarantee a straddle at some block boundary
        t = pa.table({"o": np.full(200, 5), "v": np.ones(200, np.int64)})
        with pytest.raises(Exception, match="unique"):
            running_sum(rd.from_arrow(t).repartition(8), value_col="v",
                        order_by="o").materialize()

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"o": [1], "v": [1]}))
        with pytest.raises(ValueError):
            running_sum(ds, value_col="v", order_by=[])

    def test_string_keys(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": ["b", "a", "b", "a"], "o": [1, 2, 3, 4],
                      "v": [1, 2, 3, 4]})
        got = running_sum(rd.from_arrow(t).repartition(2), value_col="v",
                          order_by="o", key_col="k").to_pandas()
        m = got.set_index("o")["running_sum"].to_dict()
        assert m == {1: 1, 2: 2, 3: 4, 4: 6}


class TestRunningAgg:
    """count/min/max through the same one-sort carry-thread plan."""

    def _corpus(self, seed=3, n=4000, nkeys=7):
        rng = np.random.default_rng(seed)
        return pa.table({"k": rng.integers(0, nkeys, n),
                         "o": rng.permutation(n),
                         "v": rng.integers(-50, 50, n)})

    def test_row_number_vs_brute(self, ray_session):
        import ray.data as rd

        t = self._corpus()
        got = row_number(rd.from_arrow(t).repartition(13), order_by="o",
                         key_col="k").to_pandas()
        exp = t.to_pandas().sort_values(["k", "o"])
        exp["row_number"] = exp.groupby("k").cumcount() + 1
        pd.testing.assert_frame_equal(_canon(got, ["k", "o"]),
                                      _canon(exp, ["k", "o"]))

    def test_running_min_max_vs_brute(self, ray_session):
        import ray.data as rd

        t = self._corpus(seed=4)
        for op, pdop in (("min", "cummin"), ("max", "cummax")):
            got = running_agg(rd.from_arrow(t).repartition(11),
                              order_by="o", op=op, value_col="v",
                              key_col="k").to_pandas()
            exp = t.to_pandas().sort_values(["k", "o"])
            exp[f"running_{op}"] = getattr(exp.groupby("k")["v"], pdop)()
            pd.testing.assert_frame_equal(_canon(got, ["k", "o"]),
                                          _canon(exp, ["k", "o"]))

    def test_min_carry_single_key_spans_blocks(self, ray_session):
        import ray.data as rd

        # strictly decreasing values, one key, 9 blocks: every block's
        # running_min depends on the carry from ALL earlier blocks
        t = pa.table({"o": np.arange(450), "v": 1000 - np.arange(450)})
        got = running_agg(rd.from_arrow(t).repartition(9), order_by="o",
                          op="min", value_col="v").to_pandas()
        got = got.sort_values("o").reset_index(drop=True)
        assert got["running_min"].tolist() == (1000 - np.arange(450)).tolist()
        # and with increasing values the carry must WIN in later blocks
        t2 = pa.table({"o": np.arange(450), "v": np.arange(450) + 7})
        got2 = running_agg(rd.from_arrow(t2).repartition(9), order_by="o",
                           op="min", value_col="v").to_pandas()
        assert set(got2["running_min"]) == {7}

    def test_float_min_and_global_row_number(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        t = pa.table({"o": np.arange(128), "v": rng.normal(size=128)})
        ds = rd.from_arrow(t).repartition(5)
        gmin = running_agg(ds, order_by="o", op="min",
                           value_col="v").to_pandas().sort_values("o")
        np.testing.assert_allclose(
            gmin["running_min"].to_numpy(),
            np.minimum.accumulate(t["v"].to_numpy()))
        rn = row_number(ds, order_by="o").to_pandas().sort_values("o")
        assert rn["row_number"].tolist() == list(range(1, 129))

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"o": [1], "v": [1]}))
        with pytest.raises(ValueError, match="op must be"):
            running_agg(ds, order_by="o", op="median", value_col="v")
        with pytest.raises(ValueError, match="requires value_col"):
            running_agg(ds, order_by="o", op="min")

    def test_null_partition_key_raises(self, ray_session):
        """A NULL partition key would silently restart the ==-based
        carry at every row (NaN != NaN) instead of forming SQL's
        single NULL partition — the contract is to fail loudly."""
        import ray
        import ray.data as rd

        t = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                      "o": [1, 2, 3], "v": [1, 1, 1]})
        ds = rd.from_arrow(t)
        with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                           match="NULL"):
            running_agg(ds, order_by="o", value_col="v",
                        key_col="k").materialize()


class TestTokenBudgetShards:
    def test_vs_brute(self, ray_session):
        import ray.data as rd

        texts = ["a b c", "", "d e f g h", "i", "j k l m n o p q"]
        t = pa.table({"doc_id": list(range(5)), "text": texts})
        got = token_budget_shards(rd.from_arrow(t).repartition(3),
                                  budget=4).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        ntok = [3, 0, 5, 1, 8]
        cum = np.cumsum(ntok)
        shard = [(c - n) // 4 for c, n in zip(cum, ntok)]
        assert got["n_tokens"].tolist() == ntok
        assert got["shard_id"].tolist() == shard

    def test_budget_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError):
            token_budget_shards(ds, budget=0)


class TestRangeRollingAgg:
    @staticmethod
    def _brute(t, win_us):
        import collections
        g = collections.defaultdict(lambda: collections.defaultdict(
            lambda: [0.0, 0]))
        for u, ts, v in zip(t["user_id"].to_pylist(),
                            t["ts"].to_pylist(), t["value"].to_pylist()):
            g[u][ts][0] += v
            g[u][ts][1] += 1
        rows = {}
        for u, per_ts in g.items():
            tss = sorted(per_ts)
            for ts in tss:
                s = sum(per_ts[t2][0] for t2 in tss
                        if ts - win_us <= t2 <= ts)
                c = sum(per_ts[t2][1] for t2 in tss
                        if ts - win_us <= t2 <= ts)
                rows[(u, ts)] = (s, c)
        return rows

    def test_vs_brute_force_multiblock(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import range_rolling_agg

        rng = np.random.default_rng(11)
        n = 3000
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 200_000, n), pa.int64()),
            "value": pa.array(rng.normal(5, 3, n)),
        })
        exp = self._brute(t, 30_000)
        for blocks in (1, 11):
            got = range_rolling_agg(
                rd.from_arrow(t).repartition(blocks), key_col="user_id",
                ts_col="ts", value_col="value",
                window_s=0.03).to_pandas()
            assert len(got) == len(exp)
            for r in got.itertuples():
                s, c = exp[(r.user_id, r.ts_us)]
                assert r.win_cnt == c
                assert abs(r.win_sum - s) < 1e-9

    def test_boundary_inclusive(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import range_rolling_agg

        # rows at exactly ts - window are IN the frame; ts - window - 1
        # is out (RANGE lower bound is inclusive)
        t = pa.table({
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([0, 1, 1_000_001], pa.int64()),
            "value": pa.array([10.0, 20.0, 1.0]),
        })
        got = range_rolling_agg(
            rd.from_arrow(t), key_col="user_id", ts_col="ts",
            value_col="value", window_s=1.0).to_pandas() \
            .sort_values("ts_us").reset_index(drop=True)
        # frame of ts=1_000_001 covers [1, 1_000_001]: the ts=1 row is
        # exactly at the bound (in), ts=0 is one us out
        assert got.loc[2, "win_sum"] == 21.0 and got.loc[2, "win_cnt"] == 2
        assert got.loc[1, "win_sum"] == 30.0  # [−999999, 1] holds both

    def test_peers_collapse_and_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import range_rolling_agg

        # equal (user, ts) rows share one output row summing both
        t = pa.table({
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([5, 5], pa.int64()),
            "value": pa.array([2.0, 3.0]),
        })
        got = range_rolling_agg(
            rd.from_arrow(t), key_col="user_id", ts_col="ts",
            value_col="value", window_s=1.0).to_pandas()
        assert len(got) == 1
        assert got.loc[0, "win_sum"] == 5.0 and got.loc[0, "win_cnt"] == 2
        with pytest.raises(ValueError):
            range_rolling_agg(rd.from_arrow(t), key_col="user_id",
                              ts_col="ts", value_col="value", window_s=0)


class TestEwmaColumn:
    @staticmethod
    def _brute(df, alpha, key=None):
        order = ["o"] if "o" in df else ["ts"]
        df = df.sort_values(([key] if key else []) + order) \
            .reset_index(drop=True)
        if key is None:
            y = df["v"].ewm(alpha=alpha, adjust=False).mean()
        else:
            y = df.groupby(key)["v"].transform(
                lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        df["ewma"] = y
        return df

    def test_keyed_multiblock_vs_brute(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import ewma_column

        rng = np.random.default_rng(7)
        n = 3000
        df = pd.DataFrame({"k": rng.integers(0, 7, n),
                           "o": rng.permutation(n),
                           "v": rng.normal(5, 3, n)})
        exp = self._brute(df, 0.25, key="k")
        for blocks in (1, 13):
            got = ewma_column(
                rd.from_pandas(df).repartition(blocks), value_col="v",
                order_by="o", key_col="k", alpha=0.25).to_pandas() \
                .sort_values(["k", "o"]).reset_index(drop=True)
            # multi-block carry is mathematically exact; float path
            # differs from the sequential recurrence by O(eps) only
            np.testing.assert_allclose(got["ewma"], exp["ewma"],
                                       rtol=1e-12, atol=1e-12)
        # single-block IS the sequential recurrence -> bit-identical
        got1 = ewma_column(rd.from_pandas(df).repartition(1),
                           value_col="v", order_by="o", key_col="k",
                           alpha=0.25).to_pandas() \
            .sort_values(["k", "o"]).reset_index(drop=True)
        assert np.array_equal(got1["ewma"].to_numpy(),
                              exp["ewma"].to_numpy())

    def test_global_no_key(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import ewma_column

        rng = np.random.default_rng(8)
        df = pd.DataFrame({"o": np.arange(500), "v": rng.normal(0, 1, 500)})
        exp = self._brute(df, 0.5)
        got = ewma_column(rd.from_pandas(df).repartition(9),
                          value_col="v", order_by="o",
                          alpha=0.5).to_pandas() \
            .sort_values("o").reset_index(drop=True)
        np.testing.assert_allclose(got["ewma"], exp["ewma"],
                                   rtol=1e-12, atol=1e-12)

    def test_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import ewma_column

        t = pa.table({"k": [1, 1], "o": [5, 5], "v": [1.0, 2.0]})
        ds = rd.from_arrow(t)
        with pytest.raises(ValueError):
            ewma_column(ds, value_col="v", order_by="o", key_col="k",
                        alpha=0.0)
        with pytest.raises(ValueError):
            ewma_column(ds, value_col="v", order_by="o", key_col="k",
                        alpha=1.0)
        with pytest.raises(ValueError):
            ewma_column(ds, value_col="v", order_by=[], key_col="k",
                        alpha=0.5)
        # duplicate (k, o) tuple across rows -> order-dependent scan
        # must refuse (in-block dup lands in one block at blocks=1)
        with pytest.raises(ValueError):
            ewma_column(ds.repartition(1), value_col="v", order_by="o",
                        key_col="k", alpha=0.5).materialize()


class TestLocfFill:
    @staticmethod
    def _run(keys, order, vals, blocks=4, key_col="k"):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import locf_fill

        t = pa.table({"k": pa.array(keys, pa.int64()),
                      "o": pa.array(order, pa.int64()),
                      "v": pa.array(vals, pa.float64())})
        out = locf_fill(rd.from_arrow(t).repartition(blocks),
                        value_col="v", order_by="o",
                        key_col=key_col).take_all()
        out.sort(key=lambda r: (r["k"], r["o"]))
        return [r["locf_v"] for r in out]

    @staticmethod
    def _ref(keys, order, vals):
        rows = sorted(zip(keys, order, vals))
        out, last = [], {}
        for k, _, v in rows:
            if v is not None:
                last[k] = v
            out.append(last.get(k))
        return out

    def test_reference_parity_random(self):
        rng = np.random.default_rng(21)
        n = 3000
        keys = rng.integers(0, 7, n).tolist()
        order = rng.permutation(n).tolist()
        vals = [None if r < 0.6 else float(i)
                for i, r in enumerate(rng.random(n))]
        assert self._run(keys, order, vals) == \
            self._ref(keys, order, vals)

    def test_block_count_invariance_and_leading_nulls(self):
        keys = [1] * 10 + [2] * 10
        order = list(range(10)) * 2
        vals = [None, None, 5.0, None, None, 6.0, None, None, None,
                7.0] + [None] * 9 + [9.0]
        a = self._run(keys, order, vals, blocks=1)
        b = self._run(keys, order, vals, blocks=7)
        assert a == b
        assert a[:3] == [None, None, 5.0]       # leading nulls stay
        assert a[10:19] == [None] * 9           # key 2 restarts
        assert a[19] == 9.0

    def test_carry_across_many_blocks_single_key(self):
        # one key, one early value, then a long null tail spanning
        # several sorted blocks: the carry must thread through blocks
        # that observe nothing
        n = 400
        keys = [3] * n
        order = list(range(n))
        vals = [None] * 5 + [42.0] + [None] * (n - 6)
        got = self._run(keys, order, vals, blocks=8)
        assert got[:5] == [None] * 5
        assert got[5:] == [42.0] * (n - 5)

    def test_type_generic_strings(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import locf_fill

        t = pa.table({"o": pa.array([0, 1, 2, 3], pa.int64()),
                      "v": pa.array([None, "a", None, "b"])})
        out = locf_fill(rd.from_arrow(t).repartition(2),
                        value_col="v", order_by="o").take_all()
        out.sort(key=lambda r: r["o"])
        assert [r["locf_v"] for r in out] == [None, "a", "a", "b"]

    def test_duplicate_sort_tuple_raises(self):
        with pytest.raises(Exception):
            self._run([1, 1], [5, 5], [1.0, 2.0], blocks=2)


class TestNocbFill:
    def test_backward_fill_reference(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import locf_fill

        keys = [1] * 6 + [2] * 4
        order = list(range(6)) + list(range(4))
        vals = [None, 3.0, None, None, 8.0, None,
                None, None, 4.0, None]
        t = pa.table({"k": pa.array(keys, pa.int64()),
                      "o": pa.array(order, pa.int64()),
                      "v": pa.array(vals, pa.float64())})
        out = locf_fill(rd.from_arrow(t).repartition(4),
                        value_col="v", order_by="o", key_col="k",
                        direction="backward").take_all()
        out.sort(key=lambda r: (r["k"], r["o"]))
        got = [r["nocb_v"] for r in out]
        # key 1: next non-null at-or-after each row; trailing stays null
        assert got[:6] == [3.0, 3.0, 8.0, 8.0, 8.0, None]
        # key 2 restarts
        assert got[6:] == [4.0, 4.0, 4.0, None]

    def test_direction_validation(self):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import locf_fill

        t = pa.table({"o": pa.array([0], pa.int64()),
                      "v": pa.array([1.0], pa.float64())})
        with pytest.raises(Exception):
            locf_fill(rd.from_arrow(t), value_col="v", order_by="o",
                      direction="sideways")
