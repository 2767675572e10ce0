"""Table profiler (stages/profile.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.profile import profile_table


def _run(t, columns=None, blocks=4):
    import ray.data as rd

    rows = profile_table(rd.from_arrow(t).repartition(blocks),
                         columns=columns).take_all()
    return {r["column"]: r for r in rows}


def _mk():
    n = 500
    rng = np.random.default_rng(5)
    ints = rng.integers(-50, 50, n)
    ints_nulls = pa.array(
        [None if i % 7 == 0 else int(v) for i, v in enumerate(ints)],
        pa.int64())
    strs = pa.array([None if i % 11 == 0 else f"s{i % 13}"
                     for i in range(n)], pa.string())
    floats = pa.array(rng.normal(size=n))
    all_null = pa.array([None] * n, pa.int64())
    ts = pa.array(rng.integers(0, 10**9, n), pa.int64()).cast(
        pa.timestamp("us"))
    return pa.table({"i": ints_nulls, "s": strs, "f": floats,
                     "z": all_null, "t": ts})


def test_counts_nulls_distinct_minmax():
    t = _mk()
    got = _run(t)
    i = t["i"].to_pylist()
    iv = [v for v in i if v is not None]
    assert got["i"]["n"] == 500
    assert got["i"]["nulls"] == i.count(None)
    assert got["i"]["n_distinct"] == len(set(iv))
    assert got["i"]["min_v"] == float(min(iv))
    assert got["i"]["max_v"] == float(max(iv))
    s = t["s"].to_pylist()
    assert got["s"]["nulls"] == s.count(None)
    assert got["s"]["n_distinct"] == len({v for v in s if v is not None})
    assert got["s"]["min_v"] is None and got["s"]["max_v"] is None
    f = t["f"].to_pylist()
    assert got["f"]["n_distinct"] is None  # floats: not replayable
    assert got["f"]["min_v"] == min(f) and got["f"]["max_v"] == max(f)
    ep = t["t"].cast(pa.int64()).to_pylist()
    assert got["t"]["min_v"] == float(min(ep))
    assert got["t"]["max_v"] == float(max(ep))


def test_all_null_column():
    got = _run(_mk())
    z = got["z"]
    assert z["n"] == 500 and z["nulls"] == 500
    assert z["n_distinct"] == 0
    assert z["min_v"] is None and z["max_v"] is None


def test_column_subset_and_reshard_stability():
    t = _mk()
    a = _run(t, columns=["i", "s"], blocks=2)
    b = _run(t, columns=["i", "s"], blocks=9)
    assert a == b and set(a) == {"i", "s"}


def test_validation():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        profile_table(ds, columns=["nope"])
    with pytest.raises(ValueError):
        profile_table(ds, columns=[])
    bad = rd.from_arrow(pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))}))
    with pytest.raises(ValueError):
        profile_table(bad)
