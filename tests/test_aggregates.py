"""sorted_groupby_agg: vectorized sorted reduction vs pandas oracle,
across key types, multi-key, many blocks, and empties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.aggregates import sorted_groupby_agg


def _ds(t, parts=6):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


class TestSortedGroupbyAgg:
    def test_all_ops_vs_pandas(self, ray_session):
        rng = np.random.default_rng(0)
        n = 5000
        t = pa.table({
            "k": pa.array(rng.integers(0, 700, n)),
            "v": pa.array(rng.uniform(-10, 10, n)),
        })
        out = sorted_groupby_agg(_ds(t), ["k"], [
            ("v", "min", "vmin"), ("v", "max", "vmax"),
            ("v", "sum", "vsum"), ("v", "count", "n"),
        ]).to_pandas().sort_values("k").reset_index(drop=True)
        exp = (t.to_pandas().groupby("k")["v"]
               .agg(vmin="min", vmax="max", vsum="sum", n="count")
               .reset_index())
        assert len(out) == len(exp)
        assert (out.k.values == exp.k.values).all()
        assert np.allclose(out.vmin, exp.vmin) and np.allclose(out.vmax, exp.vmax)
        assert np.allclose(out.vsum, exp.vsum) and (out.n.values == exp.n.values).all()

    def test_string_keys(self, ray_session):
        rng = np.random.default_rng(1)
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
        n = 2000
        t = pa.table({
            "w": pa.array(words[rng.integers(0, 5, n)].tolist(), pa.large_string()),
            "x": pa.array(rng.integers(0, 1000, n)),
        })
        out = sorted_groupby_agg(_ds(t), ["w"], [("x", "min", "xmin"),
                                                 ("x", "count", "n")]).to_pandas()
        exp = t.to_pandas().groupby("w")["x"].agg(xmin="min", n="count").reset_index()
        out = out.sort_values("w").reset_index(drop=True)
        assert (out.w.values == exp.w.values).all()
        assert (out.xmin.values == exp.xmin.values).all()
        assert (out.n.values == exp.n.values).all()

    def test_multi_key(self, ray_session):
        rng = np.random.default_rng(2)
        n = 3000
        t = pa.table({
            "a": pa.array(rng.integers(0, 20, n)),
            "b": pa.array(rng.integers(0, 20, n)),
            "v": pa.array(rng.uniform(0, 1, n)),
        })
        out = sorted_groupby_agg(_ds(t), ["a", "b"], [("v", "sum", "s")]).to_pandas()
        exp = t.to_pandas().groupby(["a", "b"])["v"].sum().reset_index(name="s")
        got = {(r.a, r.b): r.s for r in out.itertuples()}
        assert len(got) == len(exp)
        for r in exp.itertuples():
            assert abs(got[(r.a, r.b)] - r.s) < 1e-9

    def test_empty_input_schema_stable(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
        out = sorted_groupby_agg(rd.from_arrow(t), ["k"], [("v", "sum", "s")])
        assert out.count() == 0

    def test_bad_op_raises(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": pa.array([1]), "v": pa.array([1.0])})
        with pytest.raises(ValueError):
            sorted_groupby_agg(rd.from_arrow(t), ["k"], [("v", "median", "m")])
