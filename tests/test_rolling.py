"""Bounded-frame windows: rolling_agg, lag_column/lead_column."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.scan import (
    lag_column,
    lead_column,
    rolling_agg,
)


def _corpus(n=3000, keys=7, seed=3, float_vals=False):
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal(n) if float_vals else \
        rng.integers(-50, 500, n)
    return pa.table({"k": rng.integers(0, keys, n),
                     "o": rng.permutation(n),
                     "v": vals})


def _brute_rolling(t: pa.Table, op, window, key=True):
    df = t.to_pandas().sort_values((["k"] if key else []) + ["o"])
    g = df.groupby("k")["v"] if key else df["v"]
    r = g.rolling(window, min_periods=1)
    out = getattr(r, "mean" if op == "avg" else op)()
    df["w"] = out.reset_index(level=0, drop=True) if key else out
    return df


class TestRollingAgg:
    @pytest.mark.parametrize("op", ["sum", "count", "min", "max", "avg"])
    def test_keyed_multiblock_vs_pandas(self, ray_session, op):
        import ray.data as rd

        t = _corpus()
        ds = rd.from_arrow(t).repartition(11)
        got = rolling_agg(ds, order_by="o", window=5, op=op,
                          value_col=None if op == "count" else "v",
                          key_col="k").to_pandas().sort_values(["k", "o"])
        exp = _brute_rolling(t, op, 5)
        if op in ("sum", "count", "min", "max"):
            # integer input -> int64-exact output
            assert got["rolling_%s" % op].dtype == np.int64
        np.testing.assert_allclose(
            got["rolling_%s" % op].to_numpy(),
            exp["w"].to_numpy(), rtol=1e-12)

    def test_global_no_key(self, ray_session):
        import ray.data as rd

        t = _corpus(800, seed=5)
        ds = rd.from_arrow(t).repartition(9)
        got = rolling_agg(ds, order_by="o", window=4, op="sum",
                          value_col="v").to_pandas().sort_values("o")
        exp = _brute_rolling(t, "sum", 4, key=False)
        np.testing.assert_array_equal(got["rolling_sum"].to_numpy(),
                                      exp["w"].to_numpy())

    def test_one_key_spans_all_blocks(self, ray_session):
        import ray.data as rd

        n = 400
        t = pa.table({"k": np.zeros(n, np.int64), "o": np.arange(n),
                      "v": np.arange(n, dtype=np.int64)})
        ds = rd.from_arrow(t).repartition(13)
        got = rolling_agg(ds, order_by="o", window=7, op="min",
                          value_col="v", key_col="k") \
            .to_pandas().sort_values("o")
        exp = pd.Series(np.arange(n)).rolling(7, min_periods=1).min()
        np.testing.assert_array_equal(got["rolling_min"].to_numpy(),
                                      exp.to_numpy())
        # max over a descending run: the carried rows must win
        t2 = pa.table({"k": np.zeros(n, np.int64), "o": np.arange(n),
                       "v": np.arange(n, 0, -1).astype(np.int64)})
        got2 = rolling_agg(rd.from_arrow(t2).repartition(13),
                           order_by="o", window=7, op="max",
                           value_col="v", key_col="k") \
            .to_pandas().sort_values("o")
        exp2 = pd.Series(np.arange(n, 0, -1)).rolling(7, min_periods=1) \
            .max()
        np.testing.assert_array_equal(got2["rolling_max"].to_numpy(),
                                      exp2.to_numpy())

    def test_window_one_and_window_over_run(self, ray_session):
        import ray.data as rd

        t = _corpus(300, keys=40, seed=9)
        ds = rd.from_arrow(t).repartition(5)
        got1 = rolling_agg(ds, order_by="o", window=1, op="sum",
                           value_col="v", key_col="k") \
            .to_pandas().sort_values(["k", "o"])
        exp1 = t.to_pandas().sort_values(["k", "o"])
        np.testing.assert_array_equal(got1["rolling_sum"].to_numpy(),
                                      exp1["v"].to_numpy())
        # window far beyond any run length == running sum
        got2 = rolling_agg(ds, order_by="o", window=10_000, op="sum",
                           value_col="v", key_col="k") \
            .to_pandas().sort_values(["k", "o"])
        exp2 = _brute_rolling(t, "sum", 10_000)
        np.testing.assert_array_equal(got2["rolling_sum"].to_numpy(),
                                      exp2["w"].to_numpy())

    def test_float_values(self, ray_session):
        import ray.data as rd

        t = _corpus(900, seed=13, float_vals=True)
        ds = rd.from_arrow(t).repartition(7)
        got = rolling_agg(ds, order_by="o", window=6, op="avg",
                          value_col="v", key_col="k") \
            .to_pandas().sort_values(["k", "o"])
        exp = _brute_rolling(t, "avg", 6)
        np.testing.assert_allclose(got["rolling_avg"].to_numpy(),
                                   exp["w"].to_numpy(), rtol=1e-9)

    def test_duplicate_sort_tuple_raises(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": [1, 1, 1], "o": [5, 5, 6], "v": [1, 2, 3]})
        ds = rd.from_arrow(t)
        with pytest.raises(Exception, match="unique"):
            rolling_agg(ds, order_by="o", window=2, op="sum",
                        value_col="v", key_col="k").materialize()

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"o": [1], "v": [1]}))
        with pytest.raises(ValueError, match="op"):
            rolling_agg(ds, order_by="o", window=2, op="median",
                        value_col="v")
        with pytest.raises(ValueError, match="value_col"):
            rolling_agg(ds, order_by="o", window=2, op="sum")
        with pytest.raises(ValueError, match="window"):
            rolling_agg(ds, order_by="o", window=0, op="count")


def _brute_shift(t: pa.Table, offset, key=True):
    df = t.to_pandas().sort_values((["k"] if key else []) + ["o"])
    if key:
        df["s"] = df.groupby("k")["v"].shift(offset)
    else:
        df["s"] = df["v"].shift(offset)
    return df


class TestLagLead:
    @pytest.mark.parametrize("offset", [1, 2, 5])
    def test_lag_keyed_multiblock(self, ray_session, offset):
        import ray.data as rd

        t = _corpus(1200, keys=6, seed=21)
        ds = rd.from_arrow(t).repartition(9)
        got = lag_column(ds, value_col="v", order_by="o", key_col="k",
                         offset=offset).to_pandas() \
            .sort_values(["k", "o"])
        exp = _brute_shift(t, offset)
        pd.testing.assert_series_equal(
            got["lag_v"].reset_index(drop=True),
            exp["s"].reset_index(drop=True),
            check_names=False, check_dtype=False)

    @pytest.mark.parametrize("offset", [1, 3])
    def test_lead_keyed_multiblock(self, ray_session, offset):
        import ray.data as rd

        t = _corpus(1200, keys=6, seed=22)
        ds = rd.from_arrow(t).repartition(9)
        got = lead_column(ds, value_col="v", order_by="o", key_col="k",
                          offset=offset).to_pandas() \
            .sort_values(["k", "o"])
        exp = _brute_shift(t, -offset)
        pd.testing.assert_series_equal(
            got["lead_v"].reset_index(drop=True),
            exp["s"].reset_index(drop=True),
            check_names=False, check_dtype=False)

    def test_global_and_string_values(self, ray_session):
        import ray.data as rd

        n = 500
        t = pa.table({"o": np.arange(n),
                      "v": [f"s{i}" for i in range(n)]})
        ds = rd.from_arrow(t).repartition(7)
        got = lag_column(ds, value_col="v", order_by="o") \
            .to_pandas().sort_values("o").reset_index(drop=True)
        assert got["lag_v"][0] is None
        assert got["lag_v"].tolist()[1:] == [f"s{i}" for i in range(n - 1)]
        # lead across the boundary of the LAST block is null
        got2 = lead_column(ds, value_col="v", order_by="o", offset=2) \
            .to_pandas().sort_values("o").reset_index(drop=True)
        assert got2["lead_v"].tolist()[:-2] == [f"s{i}" for i in
                                                range(2, n)]
        assert got2["lead_v"][n - 1] is None and got2["lead_v"][n - 2] is None

    def test_run_shorter_than_offset_is_all_null(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": [1, 1, 2], "o": [1, 2, 3], "v": [10, 20, 30]})
        got = lag_column(rd.from_arrow(t).repartition(3), value_col="v",
                         order_by="o", key_col="k", offset=2) \
            .to_pandas().sort_values("o")
        assert got["lag_v"].isna().all()

    def test_duplicate_tuple_raises_and_validation(self, ray_session):
        import ray.data as rd

        t = pa.table({"o": [1, 1], "v": [1, 2]})
        with pytest.raises(Exception, match="unique"):
            lag_column(rd.from_arrow(t), value_col="v",
                       order_by="o").materialize()
        with pytest.raises(ValueError, match="offset"):
            lag_column(rd.from_arrow(t), value_col="v", order_by="o",
                       offset=0)


class TestAddRanks:
    @pytest.mark.parametrize("vals,parts", [
        (np.array([5, 5, 5, 5, 5]), 3),           # one giant tie run
        (np.arange(100), 7),                       # all distinct
        (None, 9),                                 # random heavy ties
    ])
    def test_vs_duckdb(self, ray_session, vals, parts):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import add_ranks

        if vals is None:
            vals = np.random.default_rng(61).integers(0, 12, 2000)
        t = pa.table({"i": np.arange(len(vals), dtype=np.int64),
                      "v": vals.astype(np.int64)})
        got = add_ranks(rd.from_arrow(t).repartition(parts),
                        order_by="v").to_pandas().sort_values("i")
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql(
            "SELECT i, rank() OVER (ORDER BY v) r, "
            "dense_rank() OVER (ORDER BY v) d, "
            "percent_rank() OVER (ORDER BY v) p FROM tt ORDER BY i").df()
        np.testing.assert_array_equal(got["rank"].to_numpy(),
                                      exp["r"].to_numpy())
        np.testing.assert_array_equal(got["dense_rank"].to_numpy(),
                                      exp["d"].to_numpy())
        np.testing.assert_allclose(got["percent_rank"].to_numpy(),
                                   exp["p"].to_numpy(), rtol=1e-12)

    def test_multi_column_order_and_single_row(self, ray_session):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import add_ranks

        rng = np.random.default_rng(67)
        t = pa.table({"i": np.arange(500, dtype=np.int64),
                      "a": rng.integers(0, 4, 500),
                      "b": rng.integers(0, 3, 500)})
        got = add_ranks(rd.from_arrow(t).repartition(6),
                        order_by=["a", "b"]).to_pandas().sort_values("i")
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql("SELECT i, rank() OVER (ORDER BY a, b) r FROM tt "
                      "ORDER BY i").df()
        np.testing.assert_array_equal(got["rank"].to_numpy(),
                                      exp["r"].to_numpy())
        one = add_ranks(rd.from_arrow(pa.table({"v": [9]})), order_by="v") \
            .to_pandas()
        assert one["rank"][0] == 1 and one["percent_rank"][0] == 0.0


class TestAddRanksDescending:
    def test_desc_vs_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import add_ranks

        rng = np.random.default_rng(73)
        t = pa.table({"i": np.arange(1500, dtype=np.int64),
                      "v": rng.integers(0, 9, 1500)})
        got = add_ranks(rd.from_arrow(t).repartition(8), order_by="v",
                        descending=True).to_pandas().sort_values("i")
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql("SELECT i, rank() OVER (ORDER BY v DESC) r, "
                      "dense_rank() OVER (ORDER BY v DESC) d, "
                      "percent_rank() OVER (ORDER BY v DESC) p "
                      "FROM tt ORDER BY i").df()
        np.testing.assert_array_equal(got["rank"].to_numpy(),
                                      exp["r"].to_numpy())
        np.testing.assert_array_equal(got["dense_rank"].to_numpy(),
                                      exp["d"].to_numpy())
        np.testing.assert_allclose(got["percent_rank"].to_numpy(),
                                   exp["p"].to_numpy(), rtol=1e-12)

    def test_mixed_direction_and_validation(self, ray_session):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import add_ranks

        rng = np.random.default_rng(79)
        t = pa.table({"i": np.arange(600, dtype=np.int64),
                      "a": rng.integers(0, 4, 600),
                      "b": rng.integers(0, 5, 600)})
        got = add_ranks(rd.from_arrow(t).repartition(5),
                        order_by=["a", "b"],
                        descending=[False, True]) \
            .to_pandas().sort_values("i")
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql("SELECT i, rank() OVER (ORDER BY a ASC, b DESC) r "
                      "FROM tt ORDER BY i").df()
        np.testing.assert_array_equal(got["rank"].to_numpy(),
                                      exp["r"].to_numpy())
        with pytest.raises(ValueError, match="descending"):
            add_ranks(rd.from_arrow(t), order_by=["a", "b"],
                      descending=[True])


class TestScanFamilyDescending:
    def test_running_sum_desc_vs_sql_frame(self, ray_session):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import running_sum

        rng = np.random.default_rng(83)
        t = pa.table({"k": rng.integers(0, 5, 900),
                      "o": rng.permutation(900),
                      "v": rng.integers(-5, 50, 900)})
        got = running_sum(rd.from_arrow(t).repartition(7), value_col="v",
                          order_by="o", key_col="k", descending=True) \
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql(
            "SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o DESC "
            "ROWS UNBOUNDED PRECEDING) AS s FROM tt ORDER BY k, o").df()
        np.testing.assert_array_equal(got["running_sum"].to_numpy(),
                                      exp["s"].to_numpy())

    def test_rolling_and_lag_desc(self, ray_session):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import (
            lag_column,
            rolling_agg,
        )

        rng = np.random.default_rng(89)
        t = pa.table({"k": rng.integers(0, 4, 700),
                      "o": rng.permutation(700),
                      "v": rng.integers(0, 99, 700)})
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        ds = rd.from_arrow(t).repartition(6)
        got = rolling_agg(ds, order_by="o", window=3, op="sum",
                          value_col="v", key_col="k", descending=True) \
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
        exp = con.sql(
            "SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o DESC "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM tt "
            "ORDER BY k, o").df()
        np.testing.assert_array_equal(got["rolling_sum"].to_numpy(),
                                      exp["s"].to_numpy())
        got2 = lag_column(ds, value_col="v", order_by="o", key_col="k",
                          descending=True).to_pandas() \
            .sort_values(["k", "o"]).reset_index(drop=True)
        exp2 = con.sql(
            "SELECT k, o, lag(v) OVER (PARTITION BY k ORDER BY o DESC) "
            "AS s FROM tt ORDER BY k, o").df()
        pd.testing.assert_series_equal(
            got2["lag_v"].astype("float64"), exp2["s"].astype("float64"),
            check_names=False)

    def test_descending_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import running_sum

        t = pa.table({"o": [1], "p": [1], "v": [1]})
        with pytest.raises(ValueError, match="descending"):
            running_sum(rd.from_arrow(t), value_col="v",
                        order_by=["o", "p"], descending=[True])
