"""CDC merge / upsert-apply (stages/upsert.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.upsert import apply_changes


def _run(base, changes, blocks=3, **kw):
    import ray.data as rd

    out = apply_changes(rd.from_arrow(base).repartition(blocks),
                        rd.from_arrow(changes).repartition(2),
                        **kw).take_all()
    return {r["k"]: (r["val"], r["v"]) for r in out}


def _base():
    return pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "val": pa.array(["a", "b", "c", "d", "e"]),
        "v": pa.array([10] * 5, pa.int64()),
    })


def test_update_delete_stale_insert():
    changes = pa.table({
        "k": pa.array([2, 3, 3, 5, 6], pa.int64()),
        "val": pa.array(["B2", "C-old", "C2", "E-del", "F-new"]),
        "v": pa.array([20, 5, 30, 40, 15], pa.int64()),
        "del": pa.array([False, False, False, True, False]),
    })
    got = _run(_base(), changes, key_cols=["k"], version_col="v",
               delete_col="del")
    # 2 updated, 3 takes the NEWER change (stale one loses), 5
    # deleted, 6 inserted, 1/4 untouched
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("C2", 30),
                   4: ("d", 10), 6: ("F-new", 15)}


def test_equal_version_change_beats_base_and_resurrect():
    changes = pa.table({
        "k": pa.array([1, 5, 5], pa.int64()),
        "val": pa.array(["A-same-v", "E-del", "E-back"]),
        "v": pa.array([10, 20, 30], pa.int64()),
        "del": pa.array([False, True, False]),
    })
    got = _run(_base(), changes, key_cols=["k"], version_col="v",
               delete_col="del")
    assert got[1] == ("A-same-v", 10)        # tie -> change wins
    assert got[5] == ("E-back", 30)          # delete then resurrect


def test_brute_force_parity_random_stream():
    rng = np.random.default_rng(8)
    n_keys, n_changes = 60, 400
    base = pa.table({
        "k": pa.array(np.arange(n_keys), pa.int64()),
        "val": pa.array([f"base{i}" for i in range(n_keys)]),
        "v": pa.array(np.zeros(n_keys, np.int64)),
    })
    ks = rng.integers(0, n_keys + 20, n_changes)
    # unique (key, version) by construction: version = permutation idx
    vs = rng.permutation(n_changes) + 1
    dels = rng.random(n_changes) < 0.2
    changes = pa.table({
        "k": pa.array(ks.astype(np.int64)),
        "val": pa.array([f"chg{i}" for i in range(n_changes)]),
        "v": pa.array(vs.astype(np.int64)),
        "del": pa.array(dels),
    })
    got = _run(base, changes, blocks=5, key_cols=["k"],
               version_col="v", delete_col="del")
    # brute force
    state = {int(k): (f"base{k}", 0, False) for k in range(n_keys)}
    rowset = sorted(zip(ks, vs, dels, range(n_changes)),
                    key=lambda r: (r[1],))
    for k, v, dl, i in rowset:
        cur = state.get(int(k))
        if cur is None or v >= cur[1]:
            state[int(k)] = (f"chg{i}", int(v), bool(dl))
    exp = {k: (val, v) for k, (val, v, dl) in state.items() if not dl}
    assert got == exp


def test_without_delete_col_and_timestamp_version():
    base = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "val": pa.array(["a", "b"]),
        "v": pa.array([100, 100], pa.int64()).cast(pa.timestamp("us")),
    })
    changes = pa.table({
        "k": pa.array([2], pa.int64()),
        "val": pa.array(["B"]),
        "v": pa.array([200], pa.int64()).cast(pa.timestamp("us")),
    })
    import ray.data as rd

    out = apply_changes(rd.from_arrow(base), rd.from_arrow(changes),
                        key_cols=["k"], version_col="v").take_all()
    assert {r["k"]: r["val"] for r in out} == {1: "a", 2: "B"}


def test_contract_violation_raises():
    changes = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "val": pa.array(["x", "y"]),
        "v": pa.array([99, 99], pa.int64()),
        "del": pa.array([False, False]),
    })
    with pytest.raises(Exception, match="CDC contract"):
        _run(_base(), changes, key_cols=["k"], version_col="v",
             delete_col="del")


def test_validation():
    import ray.data as rd

    with pytest.raises(ValueError):
        apply_changes(rd.from_arrow(_base()), rd.from_arrow(_base()),
                      key_cols=["nope"], version_col="v")
