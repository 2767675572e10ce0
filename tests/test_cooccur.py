"""Item co-occurrence pairs (item-item CF signal)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.cooccur import cooccurrence_pairs


def _brute(pairs, *, min_count=1, cap=None):
    by_user = {}
    for u, it in pairs:
        by_user.setdefault(u, set()).add(it)
    if cap is not None:
        by_user = {u: s for u, s in by_user.items() if len(s) <= cap}
    marg = {}
    for s in by_user.values():
        for it in s:
            marg[it] = marg.get(it, 0) + 1
    sup = {}
    for s in by_user.values():
        for a, b in itertools.combinations(sorted(s), 2):
            sup[(a, b)] = sup.get((a, b), 0) + 1
    out = {}
    for (a, b), c in sup.items():
        if c < min_count:
            continue
        out[(a, b)] = (c, marg[a], marg[b],
                       c / math.sqrt(marg[a] * marg[b]),
                       c / (marg[a] + marg[b] - c))
    return out


def _got_dict(df):
    return {(r.item_a, r.item_b): (r.n_pair, r.n_a, r.n_b, r.cosine,
                                   r.jaccard)
            for r in df.itertuples()}


class TestCooccurrence:
    def test_vs_brute_force_random(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        m = 5000
        users = rng.integers(0, 80, m)
        items = rng.integers(0, 25, m)
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array(users, pa.int64()),
            "item": pa.array(items, pa.int64())})).repartition(6)
        exp = _brute(list(zip(users.tolist(), items.tolist())))
        got = _got_dict(cooccurrence_pairs(ds, partitions=5).to_pandas())
        assert got == exp

    def test_min_count_and_cap(self, ray_session):
        import ray.data as rd

        # user 0 touches everything (power user), users 1-4 share
        # {10, 11}; user 5 has {10, 12}
        rows = ([(0, i) for i in range(10, 16)]
                + [(u, 10) for u in (1, 2, 3, 4)]
                + [(u, 11) for u in (1, 2, 3, 4)] + [(5, 10), (5, 12)])
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "item": pa.array([r[1] for r in rows], pa.int64())}))
        exp = _brute(rows, min_count=2, cap=4)
        got = _got_dict(cooccurrence_pairs(
            ds, min_count=2, max_user_items=4).to_pandas())
        assert got == exp
        # the power user is gone from marginals too: item 10 counted
        # over surviving users only (1,2,3,4,5 -> 5)
        assert got[(10, 11)][1] == 5

    def test_duplicates_nulls_validation(self, ray_session):
        import ray.data as rd

        t = pa.table({"user_id": pa.array([1, 1, 1, None, 2], pa.int64()),
                      "item": pa.array([3, 3, 4, 5, None], pa.int64())})
        got = cooccurrence_pairs(rd.from_arrow(t)).to_pandas()
        # repeat (1,3) collapses; null user / null item rows drop
        assert _got_dict(got) == {(3, 4): (1, 1, 1, 1.0, 1.0)}
        with pytest.raises(ValueError):
            cooccurrence_pairs(rd.from_arrow(t), min_count=0)
        with pytest.raises(ValueError):
            cooccurrence_pairs(rd.from_arrow(t), max_user_items=1)
