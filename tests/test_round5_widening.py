"""Unit tests for the round-5 widening operators: GROUP BY ROLLUP by
composition, quantile winsorization, and conditional bigram-LM quality
scoring.  (The driver-facing queries built on these are additionally
value-checked against their DuckDB oracles by test_driver_parity.)"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------
# rollup_agg
# ---------------------------------------------------------------------


def _rollup_fixture(with_nulls: bool):
    rng = np.random.default_rng(7)
    n = 2_000
    a = rng.choice(["x", "y", "z"], n).astype(object)
    b = rng.choice(["p", "q", "r", "s"], n).astype(object)
    if with_nulls:
        a[rng.random(n) < 0.1] = None
        b[rng.random(n) < 0.1] = None
    v = rng.integers(0, 100, n)
    return pa.table({"a": pa.array(a.tolist(), pa.string()),
                     "b": pa.array(b.tolist(), pa.string()),
                     "v": pa.array(v, pa.int64())})


@pytest.mark.parametrize("with_nulls", [False, True])
def test_rollup_matches_duckdb(ray_session, with_nulls):
    """ROLLUP(a, b) with count/sum/min/max across 7 blocks matches
    DuckDB GROUP BY ROLLUP + GROUPING bitmask — including natural NULL
    key values, which stay their own lvl-0/lvl-1 groups (the lvl
    column is what disambiguates them from rollup nulls)."""
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import rollup_agg

    t = _rollup_fixture(with_nulls)
    ds = rd.from_arrow(t).repartition(7)
    got = rollup_agg(ds, ["a", "b"],
                     [("v", "count", "n"), ("v", "sum", "s"),
                      ("v", "min", "lo"), ("v", "max", "hi")]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
SELECT a, b, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
       min(v) AS lo, max(v) AS hi,
       GROUPING(a, b)::BIGINT AS lvl
FROM t GROUP BY ROLLUP(a, b)
""").df()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_rollup_single_key_and_validation(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import rollup_agg

    t = pa.table({"k": pa.array(["a", "b", "a"], pa.string()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    got = rollup_agg(ds, ["k"], [("v", "sum", "s")]).to_pandas()
    got = got.sort_values(["lvl", "k"], na_position="last") \
        .reset_index(drop=True)
    assert got.loc[0, "k"] == "a" and got.loc[0, "s"] == 4
    assert got.loc[1, "k"] == "b" and got.loc[1, "s"] == 2
    assert got.loc[2, "lvl"] == 1 and pd.isna(got.loc[2, "k"]) \
        and got.loc[2, "s"] == 6
    with pytest.raises(ValueError):
        rollup_agg(ds, [], [("v", "sum", "s")])
    with pytest.raises(ValueError):
        rollup_agg(ds, ["k"], [("v", "median", "s")])
    with pytest.raises(ValueError):
        rollup_agg(ds, ["k"], [("v", "sum", "lvl")])


# ---------------------------------------------------------------------
# clip_by_quantiles
# ---------------------------------------------------------------------


def test_clip_by_quantiles_matches_duckdb(ray_session):
    """Winsorization clamps to the exact quantile_disc values; output
    values are either original or one of the two clip points, so the
    comparison is float-exact."""
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import clip_by_quantiles

    rng = np.random.default_rng(11)
    v = rng.normal(50, 20, 5_000)
    t = pa.table({"id": pa.array(np.arange(len(v))), "v": pa.array(v)})
    ds = rd.from_arrow(t).repartition(6)
    got = clip_by_quantiles(ds, "v", 0.05, 0.95,
                            out_col="v_w").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
WITH b AS (SELECT quantile_disc(v, 0.05) AS lo,
                  quantile_disc(v, 0.95) AS hi FROM t)
SELECT id, v, least(greatest(v, lo), hi) AS v_w FROM t CROSS JOIN b
""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)
    # in-place clamp (out_col == value_col) keeps the column position
    got2 = clip_by_quantiles(ds, "v", 0.05, 0.95).to_pandas()
    assert list(got2.columns) == ["id", "v"]
    assert got2["v"].min() == exp["v_w"].min()
    assert got2["v"].max() == exp["v_w"].max()


def test_clip_by_quantiles_validation(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import clip_by_quantiles

    ds = rd.from_arrow(pa.table({"v": pa.array([1.0, 2.0])}))
    for lo, hi in [(0.0, 0.9), (0.5, 0.5), (0.9, 0.5), (0.05, 1.5)]:
        with pytest.raises(ValueError):
            clip_by_quantiles(ds, "v", lo, hi)


# ---------------------------------------------------------------------
# bigram_logprob
# ---------------------------------------------------------------------


def _brute_bigram(texts, top_v, oov_count):
    """Reference implementation with plain Python dicts."""
    def toks(s):
        # the fixture texts are space-joined lowercase words, so a
        # plain whitespace split mirrors the engine tokenizer exactly
        return [w for w in s.strip().lower().split() if w]

    docs = [toks(s) for s in texts]
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    for d in docs:
        for w in d:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(d) - 1):
            g = d[i] + " " + d[i + 1]
            big[g] = big.get(g, 0) + 1
    n_total = sum(big.values())
    head = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    logp = {g: np.log(c / uni[g.split(" ", 1)[0]]) for g, c in head}
    floor = np.log(oov_count / max(n_total, 1))
    out = []
    for d in docs:
        gs = [d[i] + " " + d[i + 1] for i in range(len(d) - 1)]
        if not gs:
            out.append((0, 0.0))
            continue
        lps = [logp.get(g, floor) for g in gs]
        out.append((len(gs), float(np.mean(lps))))
    return out


def test_bigram_logprob_brute_force(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.textstats import bigram_logprob

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
             for _ in range(120)]
    texts[7] = ""          # token-less doc
    texts[11] = "alpha"    # single token -> zero bigrams
    t = pa.table({"doc_id": pa.array(np.arange(len(texts))),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(5)
    got = bigram_logprob(ds, top_v=10, oov_count=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _brute_bigram(texts, 10, 0.5)
    assert got["n_bigrams"].tolist() == [e[0] for e in exp]
    np.testing.assert_allclose(got["logprob"].to_numpy(),
                               [e[1] for e in exp], rtol=1e-12, atol=1e-12)


def test_bigram_logprob_validation(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.textstats import bigram_logprob

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0]),
                                 "text": pa.array(["a b"])}))
    with pytest.raises(ValueError):
        bigram_logprob(ds, top_v=0)
    with pytest.raises(ValueError):
        bigram_logprob(ds, top_v=4, oov_count=0.0)


# ---------------------------------------------------------------------
# pivot_counts
# ---------------------------------------------------------------------


def test_pivot_counts_matches_duckdb(ray_session):
    """Crosstab over 6 blocks matches conditional aggregation; pivot
    values outside the fixed list are ignored; keys with no matching
    rows still emit zero rows for every pivot column."""
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import pivot_counts

    rng = np.random.default_rng(5)
    n = 3_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "v": pa.array(rng.choice(["a", "b", "c", "d", "zz"], n).tolist(),
                      pa.string()),
    })
    ds = rd.from_arrow(t).repartition(6)
    got = pivot_counts(ds, "k", "v", ["a", "b", "c"]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
SELECT k, count(*) FILTER (v = 'a')::BIGINT AS n_a,
       count(*) FILTER (v = 'b')::BIGINT AS n_b,
       count(*) FILTER (v = 'c')::BIGINT AS n_c
FROM t GROUP BY k
""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_pivot_counts_validation(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import pivot_counts

    ds = rd.from_arrow(pa.table({"k": pa.array([1]),
                                 "v": pa.array(["a"])}))
    with pytest.raises(ValueError):
        pivot_counts(ds, "k", "v", [])
    with pytest.raises(ValueError):
        pivot_counts(ds, "k", "v", ["a", "a"])


# ---------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------


def test_token_entropy_brute_force(ray_session):
    import math

    import ray.data as rd

    from mini_search_engine_ray.stages.textstats import token_entropy

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 15)))
             for _ in range(80)]
    texts[3] = ""             # token-less
    texts[5] = "aa"           # single token: entropy exactly +0.0
    texts[9] = "aa aa aa aa"  # fully repetitive: entropy +0.0, ttr 0.25
    t = pa.table({"doc_id": pa.array(np.arange(len(texts))),
                  "text": pa.array(texts)})
    got = token_entropy(rd.from_arrow(t).repartition(4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        toks = s.split()
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_distinct"] == len(set(toks))
        if toks:
            exp_h = -sum((c / len(toks)) * math.log(c / len(toks))
                         for c in
                         [toks.count(w) for w in sorted(set(toks))])
            assert abs(got.loc[i, "entropy"] - exp_h) < 1e-12
            assert abs(got.loc[i, "ttr"]
                       - len(set(toks)) / len(toks)) < 1e-15
        else:
            assert got.loc[i, "entropy"] == 0.0
            assert got.loc[i, "ttr"] == 0.0
    # single-token and repetitive docs give POSITIVE zero
    assert not np.signbit(got.loc[5, "entropy"])
    assert not np.signbit(got.loc[9, "entropy"])


# ---------------------------------------------------------------------
# grouping_sets_agg / cube_agg
# ---------------------------------------------------------------------


@pytest.mark.parametrize("with_nulls", [False, True])
def test_cube_matches_duckdb(ray_session, with_nulls):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import cube_agg

    t = _rollup_fixture(with_nulls)
    ds = rd.from_arrow(t).repartition(7)
    got = cube_agg(ds, ["a", "b"],
                   [("v", "count", "n"), ("v", "sum", "s"),
                    ("v", "min", "lo"), ("v", "max", "hi")]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql("""
SELECT a, b, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
       min(v) AS lo, max(v) AS hi, GROUPING(a, b)::BIGINT AS lvl
FROM t GROUP BY CUBE(a, b)
""").df()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_grouping_sets_subset_and_validation(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import (cube_agg,
                                                          grouping_sets_agg)

    t = _rollup_fixture(False)
    ds = rd.from_arrow(t).repartition(3)
    got = grouping_sets_agg(ds, ["a", "b"], [["b"], []],
                            [("v", "sum", "s")]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    # DuckDB rejects GROUPING(a) when a is in no set; a's bit is
    # constantly 1 here, so build the bitmask from GROUPING(b) alone
    exp = con.sql("""
SELECT NULL::VARCHAR AS a, b, sum(v)::BIGINT AS s,
       (2 + GROUPING(b))::BIGINT AS lvl
FROM t GROUP BY GROUPING SETS ((b), ())
""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)
    with pytest.raises(ValueError):
        grouping_sets_agg(ds, ["a"], [], [("v", "sum", "s")])
    with pytest.raises(ValueError):
        grouping_sets_agg(ds, ["a"], [["zzz"]], [("v", "sum", "s")])
    with pytest.raises(ValueError):
        cube_agg(ds, ["a", "b", "a2", "b2", "c"], [("v", "sum", "s")])


# ---------------------------------------------------------------------
# value_histogram
# ---------------------------------------------------------------------


def test_value_histogram_counts_and_edges(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.aggregates import value_histogram

    rng = np.random.default_rng(13)
    v = rng.normal(0, 1, 20_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)})).repartition(8)
    got = value_histogram(ds, "v", bins=32).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    assert got["cnt"].sum() == len(v)
    mn, mx = v.min(), v.max()
    w = (mx - mn) / 32
    exp = np.bincount(np.minimum(np.floor((v - mn) / w), 31).astype(int),
                      minlength=32)
    nz = np.flatnonzero(exp)
    assert got["bucket"].tolist() == nz.tolist()
    assert got["cnt"].tolist() == exp[nz].tolist()
    np.testing.assert_allclose(got["lo"], mn + nz * w, rtol=0, atol=0)
    # degenerate: all-equal values -> one bucket, width rule 1.0
    ds1 = rd.from_arrow(pa.table({"v": pa.array([5.0] * 7)}))
    one = value_histogram(ds1, "v", bins=8).to_pandas()
    assert len(one) == 1 and one.loc[0, "cnt"] == 7 \
        and one.loc[0, "bucket"] == 0 and one.loc[0, "lo"] == 5.0
    # empty input -> empty histogram
    ds0 = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert len(value_histogram(ds0, "v").to_pandas()) == 0
    with pytest.raises(ValueError):
        value_histogram(ds1, "v", bins=0)


# ---------------------------------------------------------------------
# cross_split_gram_stats
# ---------------------------------------------------------------------


def test_cross_split_gram_stats_brute_force(ray_session):
    import ray.data as rd

    from mini_search_engine_ray.stages.dedup import cross_split_gram_stats

    rng = np.random.default_rng(21)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = []
    for i in range(150):
        toks = rng.choice(vocab, rng.integers(0, 10)).tolist()
        split = ["train", "test", "valid"][i % 3]
        rows.append((i, " ".join(toks), split))
    rows[4] = (4, "", "test")  # gram-less probe doc
    t = pa.table({"doc_id": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows]),
                  "split": pa.array([r[2] for r in rows])})
    ds = rd.from_arrow(t).repartition(6)
    got = cross_split_gram_stats(ds, n=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def grams(s):
        w = s.split()
        return [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]

    train_grams = {g for r in rows if r[2] == "train" for g in grams(r[1])}
    probe = [r for r in rows if r[2] == "test"]
    assert got["doc_id"].tolist() == [r[0] for r in probe]
    for (_, row), r in zip(got.iterrows(), probe):
        gs = grams(r[1])
        leaked = sum(g in train_grams for g in gs)
        assert row["n_grams"] == len(gs)
        assert row["n_leaked"] == leaked
        expf = leaked / len(gs) if gs else 0.0
        assert abs(row["leak_frac"] - expf) < 1e-12
    with pytest.raises(ValueError):
        cross_split_gram_stats(ds, n=0)
    with pytest.raises(ValueError):
        cross_split_gram_stats(ds, probe="train", reference="train")
