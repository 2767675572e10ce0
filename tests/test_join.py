"""sort_merge_join / broadcast_join vs pandas merge oracles: random
multi-match keys (full cross products per key), left join with
unmatched rows, string keys, multi-block inputs, empties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.join import broadcast_join, sort_merge_join


def _ds(t: pa.Table, parts: int = 5):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _expect(ldf, rdf, lk, rk, how):
    exp = ldf.merge(rdf, left_on=lk, right_on=rk, how=how,
                    suffixes=("", "_r"))
    for c in (rk if isinstance(rk, list) else [rk]):
        keep = c in ldf.columns and c in (lk if isinstance(lk, list) else [lk])
        if c in exp.columns and not keep:
            exp = exp.drop(columns=[c])
    return exp


class TestSortMergeJoin:
    def test_inner_multi_match_vs_pandas(self, ray_session):
        rng = np.random.default_rng(5)
        nl, nr = 800, 600
        lt = pa.table({"k": pa.array(rng.integers(0, 120, nl)),
                       "lv": pa.array(rng.integers(0, 1000, nl))})
        rt = pa.table({"k": pa.array(rng.integers(0, 120, nr)),
                       "rv": pa.array(rng.uniform(size=nr))})
        out = sort_merge_join(_ds(lt), _ds(rt, parts=3), "k").to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="inner")
        a, b = _canon(out), _canon(exp)
        assert len(a) == len(b)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_left_join_unmatched_nulls(self, ray_session):
        lt = pa.table({"k": pa.array([1, 2, 3, 4, 4]),
                       "lv": pa.array([10, 20, 30, 40, 41])})
        rt = pa.table({"k": pa.array([2, 4, 4]),
                       "rv": pa.array(["a", "b", "c"])})
        out = sort_merge_join(_ds(lt, parts=2), _ds(rt, parts=1), "k",
                              how="left").to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="left")
        pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                      check_dtype=False)
        assert out.loc[out.k == 1, "rv"].isna().all()
        assert len(out.loc[out.k == 4]) == 4  # 2 left x 2 right

    def test_different_key_names_and_collision_suffix(self, ray_session):
        lt = pa.table({"ok": pa.array([1, 2, 3]), "v": pa.array([1, 2, 3])})
        rt = pa.table({"rk": pa.array([1, 1, 3]), "v": pa.array([9, 8, 7])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1),
                              "ok", "rk").to_pandas()
        assert sorted(out.columns) == ["ok", "v", "v_r"]
        exp = lt.to_pandas().merge(rt.to_pandas(), left_on="ok",
                                   right_on="rk", how="inner",
                                   suffixes=("", "_r")).drop(columns=["rk"])
        pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                      check_dtype=False)

    def test_string_keys(self, ray_session):
        rng = np.random.default_rng(9)
        words = np.array([f"w{i}" for i in range(40)])
        lt = pa.table({"k": pa.array(words[rng.integers(0, 40, 300)].tolist()),
                       "lv": pa.array(np.arange(300))})
        rt = pa.table({"k": pa.array(words[rng.integers(0, 40, 200)].tolist()),
                       "rv": pa.array(np.arange(200) * 2)})
        out = sort_merge_join(_ds(lt), _ds(rt, parts=2), "k").to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="inner")
        pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                      check_dtype=False)

    def test_no_matches_inner_empty(self, ray_session):
        lt = pa.table({"k": pa.array([1, 2]), "lv": pa.array([1, 2])})
        rt = pa.table({"k": pa.array([5, 6]), "rv": pa.array([5, 6])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k")
        # blocks stay schema-stable even when every block is empty
        assert sorted(out.schema().names) == ["k", "lv", "rv"]
        assert out.count() == 0

    def test_bad_how_raises(self, ray_session):
        lt = pa.table({"k": pa.array([1])})
        with pytest.raises(ValueError):
            sort_merge_join(_ds(lt, parts=1), _ds(lt, parts=1), "k", how="outer")


class TestBroadcastJoin:
    def test_inner_and_left_vs_pandas(self, ray_session):
        rng = np.random.default_rng(2)
        big = pa.table({"k": pa.array(rng.integers(0, 30, 500)),
                        "v": pa.array(rng.uniform(size=500))})
        small = pa.table({"k": pa.array(np.arange(0, 25)),
                          "name": pa.array([f"n{i}" for i in range(25)])})
        for how in ("inner", "left"):
            out = broadcast_join(_ds(big), small, "k", how=how).to_pandas()
            exp = big.to_pandas().merge(small.to_pandas(), on="k", how=how)
            pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                          check_dtype=False)

    def test_right_key_rename(self, ray_session):
        big = pa.table({"ck": pa.array([1, 2, 2]), "v": pa.array([1, 2, 3])})
        small = pa.table({"sk": pa.array([2]), "name": pa.array(["x"])})
        out = broadcast_join(_ds(big, parts=1), small, "ck",
                             right_on="sk").to_pandas()
        assert len(out) == 2 and set(out.columns) == {"ck", "v", "name"}


class TestNullJoinKeys:
    """SQL semantics: a NULL join key matches nothing — inner drops
    those rows, left emits them unmatched."""

    def test_inner_drops_null_keys(self, ray_session):
        lt = pa.table({"k": pa.array(["x", None, "y"]),
                       "lv": pa.array([1, 2, 3])})
        rt = pa.table({"k": pa.array(["x", None, None]),
                       "rv": pa.array([10, 20, 30])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k").to_pandas()
        assert len(out) == 1
        assert out.iloc[0].tolist() == ["x", 1, 10]

    def test_left_keeps_null_key_rows_unmatched(self, ray_session):
        lt = pa.table({"k": pa.array(["x", None, None]),
                       "lv": pa.array([1, 2, 3])})
        rt = pa.table({"k": pa.array(["x", None]),
                       "rv": pa.array([10, 20])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k",
                              how="left").to_pandas()
        assert len(out) == 3
        nulls = out[out.k.isna()]
        assert len(nulls) == 2 and nulls.rv.isna().all()
        assert out[out.k == "x"].rv.tolist() == [10]


class TestSemiAntiJoin:
    def test_semi_vs_pandas(self, ray_session):
        rng = np.random.default_rng(17)
        lt = pa.table({"k": pa.array(rng.integers(0, 50, 300)),
                       "lv": pa.array(np.arange(300))})
        rt = pa.table({"k": pa.array(rng.integers(0, 25, 200)),
                       "rv": pa.array(np.arange(200))})
        out = sort_merge_join(_ds(lt), _ds(rt, parts=3), "k",
                              how="semi").to_pandas()
        keys_r = set(rt["k"].to_pylist())
        exp = lt.to_pandas()[lt.to_pandas().k.isin(keys_r)]
        assert sorted(out.columns) == ["k", "lv"]  # left cols only
        assert set(map(tuple, out.values)) == set(map(tuple, exp.values))
        assert len(out) == len(exp)  # each left row exactly once

    def test_anti_vs_pandas_with_null_keys(self, ray_session):
        lt = pa.table({"k": pa.array([1, 2, None, 3], type=pa.int64()),
                       "lv": pa.array([10, 20, 30, 40])})
        rt = pa.table({"k": pa.array([2, 2, 9]), "rv": pa.array([0, 1, 2])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k",
                              how="anti").to_pandas()
        # NOT EXISTS keeps null-key rows; matched key 2 dropped
        assert sorted(out.lv.tolist()) == [10, 30, 40]
        assert sorted(out.columns) == ["k", "lv"]

    def test_semi_excludes_null_keys(self, ray_session):
        lt = pa.table({"k": pa.array([1, None], type=pa.int64()),
                       "lv": pa.array([1, 2])})
        rt = pa.table({"k": pa.array([1]), "rv": pa.array([9])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k",
                              how="semi").to_pandas()
        assert out.lv.tolist() == [1]


class TestRightFullJoin:
    """right/full outer joins with SQL USING key semantics: one key
    column (left name) coalesced across sides — what pandas merge
    on a shared column name produces too."""

    def test_right_multi_match_vs_pandas(self, ray_session):
        rng = np.random.default_rng(31)
        lt = pa.table({"k": pa.array(rng.integers(0, 60, 400)),
                       "lv": pa.array(np.arange(400))})
        rt = pa.table({"k": pa.array(rng.integers(30, 90, 300)),
                       "rv": pa.array(np.arange(300) * 3)})
        out = sort_merge_join(_ds(lt), _ds(rt, parts=3), "k",
                              how="right").to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="right")
        pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                      check_dtype=False)
        # right rows with no left match survive with null left payload
        assert out.loc[out.k >= 60, "lv"].isna().all()
        assert (out.k >= 60).any()

    def test_full_outer_vs_pandas(self, ray_session):
        rng = np.random.default_rng(37)
        lt = pa.table({"k": pa.array(rng.integers(0, 50, 350)),
                       "lv": pa.array(np.arange(350))})
        rt = pa.table({"k": pa.array(rng.integers(25, 75, 250)),
                       "rv": pa.array(np.arange(250) * 2)})
        out = sort_merge_join(_ds(lt), _ds(rt, parts=4), "k",
                              how="full").to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k", how="outer")
        pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                      check_dtype=False)
        assert (out.k < 25).any() and (out.k >= 50).any()

    def test_full_null_keys_preserved_both_sides(self, ray_session):
        lt = pa.table({"k": pa.array(["x", None], type=pa.string()),
                       "lv": pa.array([1, 2])})
        rt = pa.table({"k": pa.array(["y", None], type=pa.string()),
                       "rv": pa.array([10, 20])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1), "k",
                              how="full").to_pandas()
        # x unmatched-left, y unmatched-right, two null-key rows kept
        assert len(out) == 4
        assert out.loc[out.k == "x", "rv"].isna().all()
        assert out.loc[out.k == "y", "lv"].isna().all()
        nulls = out[out.k.isna()]
        assert len(nulls) == 2
        assert sorted(x for x in nulls.lv.tolist() if pd.notna(x)) == [2]
        assert sorted(x for x in nulls.rv.tolist() if pd.notna(x)) == [20]

    def test_right_key_rename_and_collision(self, ray_session):
        lt = pa.table({"ok": pa.array([1, 2]), "v": pa.array([1, 2])})
        rt = pa.table({"rk": pa.array([2, 3, 3]), "v": pa.array([9, 8, 7])})
        out = sort_merge_join(_ds(lt, parts=1), _ds(rt, parts=1),
                              "ok", "rk", how="right").to_pandas()
        assert sorted(out.columns) == ["ok", "v", "v_r"]
        # unmatched right keys surface under the LEFT key name
        assert sorted(out.ok.tolist()) == [2, 3, 3]
        assert out.loc[out.ok == 3, "v"].isna().all()
        assert sorted(out.loc[out.ok == 3, "v_r"].tolist()) == [7, 8]


class TestRangeJoin:
    def test_vs_brute_force(self, ray_session):
        from mini_search_engine_ray.stages.join import range_join

        rng = np.random.default_rng(23)
        nl, nr, users = 2000, 400, 30
        lt = pa.table({"u": pa.array(rng.integers(0, users, nl)),
                       "lid": pa.array(np.arange(nl)),
                       "ts": pa.array(rng.integers(0, 100_000, nl))})
        lo = rng.integers(0, 100_000, nr)
        width = rng.integers(0, 500, nr)
        rt = pa.table({"u": pa.array(rng.integers(0, users, nr)),
                       "rid": pa.array(np.arange(nr)),
                       "lo": pa.array(lo), "hi": pa.array(lo + width)})
        out = range_join(_ds(lt), _ds(rt, parts=3), on="u", left_ts="ts",
                         right_lo="lo", right_hi="hi",
                         band_width=500).to_pandas()
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        exp = ldf.merge(rdf, on="u")
        exp = exp[(exp.lo <= exp.ts) & (exp.ts <= exp.hi)]
        got = set(zip(out.lid, out.rid))
        want = set(zip(exp.lid, exp.rid))
        assert got == want
        assert len(out) == len(want)  # each pair exactly once

    def test_interval_wider_than_band_raises(self, ray_session):
        from mini_search_engine_ray.stages.join import range_join

        lt = pa.table({"u": pa.array([1]), "ts": pa.array([5])})
        rt = pa.table({"u": pa.array([1]), "lo": pa.array([0]),
                       "hi": pa.array([1000])})
        import pytest as _pytest
        with _pytest.raises(Exception, match="band_width"):
            range_join(_ds(lt, parts=1), _ds(rt, parts=1), on="u",
                       left_ts="ts", right_lo="lo", right_hi="hi",
                       band_width=10).to_pandas()


class TestSkewJoin:
    """skew_join == sort_merge_join row-for-row, with hot keys salted
    across buckets instead of concentrated in one sorted block."""

    def _skewed(self):
        rng = np.random.default_rng(41)
        # key 7 is hot on both sides; keys 0..29 are cold
        lk = np.r_[np.full(500, 7), rng.integers(0, 30, 400)]
        rk = np.r_[np.full(60, 7), rng.integers(0, 30, 200)]
        lt = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(len(lk)))})
        rt = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(len(rk)) * 2)})
        return lt, rt

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
    def test_equals_plain_smj(self, ray_session, how):
        from mini_search_engine_ray.stages.join import skew_join

        lt, rt = self._skewed()
        got = skew_join(_ds(lt), _ds(rt, parts=3), "k", how=how, salt=4,
                        hot_threshold=100).to_pandas()
        exp = sort_merge_join(_ds(lt), _ds(rt, parts=3), "k",
                              how=how).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)

    def test_explicit_hot_keys_and_key_rename(self, ray_session):
        from mini_search_engine_ray.stages.join import skew_join

        lt = pa.table({"ok": pa.array([7] * 50 + [1, 2]),
                       "v": pa.array(np.arange(52))})
        rt = pa.table({"rk": pa.array([7, 7, 2]), "w": pa.array([9, 8, 5])})
        got = skew_join(_ds(lt, parts=2), _ds(rt, parts=1), "ok", "rk",
                        hot_keys=[7], salt=4).to_pandas()
        exp = sort_merge_join(_ds(lt, parts=2), _ds(rt, parts=1), "ok",
                              "rk").to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
        assert len(got) == 101  # 50 hot x 2 + key-2 match

    def test_no_hot_keys_degenerates_cleanly(self, ray_session):
        from mini_search_engine_ray.stages.join import skew_join

        lt = pa.table({"k": pa.array([1, 2, 3]), "lv": pa.array([1, 2, 3])})
        rt = pa.table({"k": pa.array([2, 3]), "rv": pa.array([5, 6])})
        got = skew_join(_ds(lt, parts=1), _ds(rt, parts=1), "k",
                        hot_threshold=10).to_pandas()
        exp = lt.to_pandas().merge(rt.to_pandas(), on="k")
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)

    def test_null_keys_left_semantics(self, ray_session):
        from mini_search_engine_ray.stages.join import skew_join

        lt = pa.table({"k": pa.array([7] * 40 + [None, 3],
                                     type=pa.int64()),
                       "lv": pa.array(np.arange(42))})
        rt = pa.table({"k": pa.array([7, 3], type=pa.int64()),
                       "rv": pa.array([1, 2])})
        got = skew_join(_ds(lt, parts=2), _ds(rt, parts=1), "k", how="left",
                        hot_keys=[7], salt=3).to_pandas()
        exp = sort_merge_join(_ds(lt, parts=2), _ds(rt, parts=1), "k",
                              how="left").to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)

    def test_rejects_right_full_and_bad_salt(self, ray_session):
        from mini_search_engine_ray.stages.join import skew_join

        lt = pa.table({"k": pa.array([1])})
        for kw in (dict(how="right"), dict(how="full"), dict(salt=1)):
            with pytest.raises(ValueError):
                skew_join(_ds(lt, parts=1), _ds(lt, parts=1), "k", **kw)


class TestBloomPrefilter:
    def test_no_false_negatives_and_join_equality(self, ray_session):
        from mini_search_engine_ray.stages.join import (bloom_from_keys,
                                                        bloom_prefilter)

        rng = np.random.default_rng(47)
        # left keys 0..9999, right keys only 0..99: most left rows prune
        lt = pa.table({"k": pa.array(rng.integers(0, 10_000, 5000)),
                       "lv": pa.array(np.arange(5000))})
        rt = pa.table({"k": pa.array(rng.integers(0, 100, 300)),
                       "rv": pa.array(np.arange(300))})
        bloom = bloom_from_keys(_ds(rt, parts=3), "k", bits=1 << 16)
        pre = bloom_prefilter(_ds(lt), bloom, "k")
        got = sort_merge_join(pre, _ds(rt, parts=3), "k",
                              how="semi").to_pandas()
        exp = sort_merge_join(_ds(lt), _ds(rt, parts=3), "k",
                              how="semi").to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
        # the prefilter really pruned (most keys >= 100 rejected)
        n_pre = pre.count()
        assert n_pre < 2500, n_pre
        # no false negatives by construction: every true-match row kept
        keys_r = set(rt["k"].to_pylist())
        kept = set(pre.to_pandas().lv)
        for i, kv in enumerate(lt["k"].to_pylist()):
            if kv in keys_r:
                assert i in kept

    def test_string_keys_and_null_drop(self, ray_session):
        from mini_search_engine_ray.stages.join import (bloom_from_keys,
                                                        bloom_prefilter)

        rt = pa.table({"k": pa.array(["a", "b", None])})
        bloom = bloom_from_keys(_ds(rt, parts=1), "k", bits=1 << 12)
        lt = pa.table({"k": pa.array(["a", "zzz", None]),
                       "lv": pa.array([1, 2, 3])})
        out = bloom_prefilter(_ds(lt, parts=1), bloom, "k").to_pandas()
        assert 1 in set(out.lv)      # true member kept
        assert 3 not in set(out.lv)  # null key dropped
