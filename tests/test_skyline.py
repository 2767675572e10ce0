"""2-D skyline / Pareto frontier (stages/skyline.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.skyline import pareto_frontier


def _run(t, blocks=5):
    import ray.data as rd

    rows = pareto_frontier(rd.from_arrow(t).repartition(blocks),
                           max_col="x", min_col="y").take_all()
    return sorted((r["id"], r["x"], r["y"]) for r in rows)


def _brute(ids, x, y):
    out = []
    for i in range(len(ids)):
        dom = ((x >= x[i]) & (y <= y[i])
               & ((x > x[i]) | (y < y[i]))).any()
        if not dom:
            out.append((ids[i], x[i], y[i]))
    return sorted(out)


def _tbl(ids, x, y, float_xy=False):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "x": pa.array(x) if float_xy else pa.array(x, pa.int64()),
        "y": pa.array(y) if float_xy else pa.array(y, pa.int64())})


def test_brute_force_parity_int():
    rng = np.random.default_rng(2)
    n = 400
    x = rng.integers(0, 60, n)
    y = rng.integers(0, 60, n)
    ids = np.arange(n)
    assert _run(_tbl(ids, x, y)) == _brute(ids, x, y)


def test_brute_force_parity_float():
    rng = np.random.default_rng(9)
    n = 300
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    ids = np.arange(n)
    assert _run(_tbl(ids, x, y, float_xy=True), blocks=7) == \
        _brute(ids, x, y)


def test_duplicates_and_tie_semantics():
    # duplicate frontier points both survive (mutual non-domination);
    # equal-x larger-y is dominated; equal-y smaller-x is dominated
    ids = [0, 1, 2, 3, 4]
    x = [10, 10, 10, 5, 12]
    y = [1, 1, 4, 1, 9]
    # (12,9) survives (largest x, nothing beats it), (10,1) twice
    # survive, (10,4) dominated by (10,1), (5,1) dominated by (10,1)
    assert _run(_tbl(ids, x, y), blocks=2) == \
        [(0, 10, 1), (1, 10, 1), (4, 12, 9)]


def test_single_row_and_validation():
    t = _tbl([7], [3], [4])
    assert _run(t, blocks=1) == [(7, 3, 4)]
    import ray.data as rd

    with pytest.raises(ValueError):
        pareto_frontier(rd.from_arrow(t), max_col="nope", min_col="y")
    bad = pa.table({"id": pa.array([1], pa.int64()),
                    "x": pa.array([None], pa.int64()),
                    "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception):
        pareto_frontier(rd.from_arrow(bad), max_col="x",
                        min_col="y").take_all()
