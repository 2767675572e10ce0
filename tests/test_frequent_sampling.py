"""Frequent-items (heavy hitters, bigram PMI) and deterministic
sampling (hash split, per-group cap) vs brute-force Python oracles,
including multi-block candidate-union behavior and boundary exactness
of the fractional count*k > N filter."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.frequent import bigram_pmi, heavy_hitters
from mini_search_engine_ray.stages.sampling import (cap_per_group, hash_split,
                                                    md5_low64)
from mini_search_engine_ray.stages.textstats import round4


def _ds(t: pa.Table, parts: int = 6):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


def _tokens(texts):
    from mini_search_engine_ray.functions.tokenizers import punctuation_tokenize

    for s in texts:
        # sketch/frequency operators run over the RAW token stream
        yield from punctuation_tokenize(s, stop_words=frozenset())


def _corpus(rng, n_docs=300):
    # Zipf-ish synthetic corpus: a few hot words, a long tail
    hot = ["alpha", "beta", "gamma"]
    tail = [f"w{i}" for i in range(200)]
    texts = []
    for _ in range(n_docs):
        words = list(rng.choice(hot, size=rng.integers(5, 15)))
        words += list(rng.choice(tail, size=rng.integers(5, 25)))
        rng.shuffle(words)
        texts.append(" ".join(words))
    return texts


class TestHeavyHitters:
    def test_vs_exact_counter(self, ray_session):
        rng = np.random.default_rng(7)
        texts = _corpus(rng)
        t = pa.table({"text": pa.array(texts)})
        k = 25
        out = heavy_hitters(_ds(t), k=k)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        got = dict(zip(df["term"], df["cnt"]))
        cnt = Counter(_tokens(texts))
        n = sum(cnt.values())
        exp = {w: c for w, c in cnt.items() if c * k > n}
        assert got == exp
        assert len(exp) > 0 and len(exp) < k  # pigeonhole bound

    def test_empty_and_no_hitters(self, ray_session):
        t = pa.table({"text": pa.array(["", "", ""])})
        out = heavy_hitters(_ds(t, parts=2), k=10)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) == 0


class TestBigramPMI:
    def test_vs_brute_force(self, ray_session):
        rng = np.random.default_rng(11)
        texts = _corpus(rng, n_docs=200)
        # plant a strong collocation
        texts += ["alpha beta " * 30 for _ in range(20)]
        t = pa.table({"text": pa.array(texts)})
        k = 50
        out = bigram_pmi(_ds(t), k=k).to_pandas()
        # brute force
        uni = Counter(_tokens(texts))
        n1 = sum(uni.values())
        from mini_search_engine_ray.functions.tokenizers import punctuation_tokenize

        pairs = Counter()
        for s in texts:
            toks = punctuation_tokenize(s, stop_words=frozenset())
            pairs.update(zip(toks, toks[1:]))
        n2 = sum(pairs.values())
        exp = {}
        for (w1, w2), c12 in pairs.items():
            if c12 * k > n2:
                pmi = float(round4(np.array(
                    [np.log(c12 * float(n1) * n1 / (float(n2) * uni[w1] * uni[w2]))]))[0])
                exp[(w1, w2)] = (c12, pmi)
        got = {(r.w1, r.w2): (r.c12, r.pmi) for r in out.itertuples()}
        assert got == exp
        assert ("alpha", "beta") in got

    def test_no_pairs(self, ray_session):
        t = pa.table({"text": pa.array(["one", "two", ""])})
        out = bigram_pmi(_ds(t, parts=2), k=10).to_pandas()
        # single-token docs produce no adjacent pairs
        assert len(out) == 0


class TestHashSplit:
    def test_deterministic_and_partition_invariant(self, ray_session):
        texts = [f"doc number {i} body" for i in range(400)]
        t = pa.table({"doc_id": pa.array(np.arange(400)),
                      "text": pa.array(texts)})
        a = hash_split(_ds(t, parts=8)).to_pandas().sort_values("doc_id")
        b = hash_split(_ds(t, parts=2)).to_pandas().sort_values("doc_id")
        assert (a.values == b.values).all()
        # matches the md5-low-64 definition row by row
        h = md5_low64(texts) % np.uint64(10000)
        assert (a["bucket"].values == h.astype(np.int64)).all()
        exp_split = np.where(h < 8000, "train", np.where(h < 9000, "valid", "test"))
        assert (a["split"].values == exp_split).all()
        # roughly 80/10/10
        vc = a["split"].value_counts()
        assert vc["train"] > vc.get("valid", 0) + vc.get("test", 0)

    def test_weights_must_sum(self, ray_session):
        t = pa.table({"doc_id": pa.array([1]), "text": pa.array(["x"])})
        with pytest.raises(ValueError):
            hash_split(_ds(t, parts=1), splits=[("a", 1), ("b", 2)])


class TestCapPerGroup:
    def test_vs_brute_force(self, ray_session):
        rng = np.random.default_rng(3)
        n = 600
        groups = [f"g{int(i)}" for i in rng.integers(0, 12, n)]
        texts = [f"content {i} {rng.integers(0, 10)}" for i in range(n)]
        t = pa.table({"doc_id": pa.array(np.arange(n)),
                      "src": pa.array(groups),
                      "text": pa.array(texts)})
        cap = 7
        out = cap_per_group(_ds(t), ["src"], cap, id_col="doc_id",
                            out_cols=["doc_id", "src"]).to_pandas()
        h = md5_low64(texts)
        import pandas as pd

        df = pd.DataFrame({"doc_id": np.arange(n), "src": groups, "h": h})
        exp = (df.sort_values(["src", "h", "doc_id"]).groupby("src")
               .head(cap)[["doc_id", "src"]])
        assert set(map(tuple, out.values)) == set(map(tuple, exp.values))
        assert (out.groupby("src").size() <= cap).all()

    def test_groups_under_cap_untouched(self, ray_session):
        t = pa.table({"doc_id": pa.array([0, 1, 2]),
                      "src": pa.array(["a", "a", "b"]),
                      "text": pa.array(["x", "y", "z"])})
        out = cap_per_group(_ds(t, parts=1), ["src"], 5, id_col="doc_id",
                            out_cols=["doc_id", "src"]).to_pandas()
        assert len(out) == 3


class TestNullText:
    def test_hash_split_null_text_hashes_like_empty(self, ray_session):
        from mini_search_engine_ray.stages.sampling import md5_low64

        t = pa.table({"doc_id": pa.array([0, 1]),
                      "text": pa.array(["abc", None])})
        out = hash_split(_ds(t, parts=1)).to_pandas().sort_values("doc_id")
        exp = md5_low64(["abc", ""]) % np.uint64(10000)
        assert (out.bucket.values == exp.astype(np.int64)).all()

    def test_lsh_bands_mismatch_raises(self, ray_session):
        from mini_search_engine_ray.stages.dedup import lsh_band_batch, minhash_batch

        t = pa.table({"doc_id": pa.array([1]), "text": pa.array(["a b c d e"])})
        sigs = minhash_batch(t, num_perm=64)
        with pytest.raises(ValueError, match="bands"):
            lsh_band_batch(sigs, bands=8, rows=4)


class TestSampleFraction:
    def test_stratified_vs_brute_force(self, ray_session):
        from mini_search_engine_ray.stages.sampling import sample_fraction

        rng = np.random.default_rng(3)
        langs = np.array(["en", "es", "de", None], dtype=object)
        texts = [f"doc number {i} body" for i in range(400)]
        t = pa.table({"doc_id": pa.array(np.arange(400)),
                      "text": pa.array(texts),
                      "lang": pa.array(langs[rng.integers(0, 4, 400)].tolist(),
                                       pa.string())})
        rates, default = {"en": 10_000, "es": 2_500}, 5_000
        out = sample_fraction(_ds(t), rates, default=default,
                              group_col="lang").to_pandas()
        kept = set(out.doc_id)
        for i, txt in enumerate(texts):
            lang = t["lang"][i].as_py()
            r = rates.get(lang, default)
            h = int.from_bytes(hashlib.md5(txt.encode()).digest()[8:],
                               "little") % 10_000
            assert (i in kept) == (h < r), (i, lang, h, r)
        # all columns pass through by default
        assert sorted(out.columns) == ["doc_id", "lang", "text"]

    def test_uniform_rate_and_salt_independence(self, ray_session):
        from mini_search_engine_ray.stages.sampling import sample_fraction

        t = pa.table({"doc_id": pa.array(np.arange(2000)),
                      "text": pa.array([f"t{i}" for i in range(2000)])})
        a = sample_fraction(_ds(t), 5_000, out_cols=["doc_id"]).to_pandas()
        b = sample_fraction(_ds(t), 5_000, salt="2",
                            out_cols=["doc_id"]).to_pandas()
        # both near half, but different draws
        assert 800 < len(a) < 1200 and 800 < len(b) < 1200
        assert set(a.doc_id) != set(b.doc_id)
        # rerun is bit-stable
        a2 = sample_fraction(_ds(t), 5_000, out_cols=["doc_id"]).to_pandas()
        assert set(a.doc_id) == set(a2.doc_id)

    def test_rate_validation(self, ray_session):
        from mini_search_engine_ray.stages.sampling import sample_fraction

        t = pa.table({"text": pa.array(["x"])})
        with pytest.raises(ValueError):
            sample_fraction(_ds(t, parts=1), 20_000)
        with pytest.raises(ValueError):
            sample_fraction(_ds(t, parts=1), {"en": 1})  # no group_col
        with pytest.raises(ValueError):
            sample_fraction(_ds(t, parts=1), {"en": 1}, group_col="lang")


class TestGroupCentroids:
    def test_vs_numpy_means(self, ray_session):
        from mini_search_engine_ray.stages.similarity import group_centroids

        rng = np.random.default_rng(7)
        n, d, g = 500, 16, 9
        labels = rng.integers(0, g, n)
        m = rng.normal(size=(n, d)).astype(np.float32)
        t = pa.table({"label": pa.array(labels),
                      "embedding": pa.array(list(m))})
        out = group_centroids(_ds(t), "label").to_pandas()
        assert len(out) == len(np.unique(labels))
        for _, row in out.iterrows():
            sel = m[labels == row.label].astype(np.float64)
            np.testing.assert_allclose(np.asarray(row.centroid),
                                       sel.mean(axis=0), rtol=1e-12)
            assert row.n == len(sel)

    def test_string_keys_and_empty_blocks(self, ray_session):
        from mini_search_engine_ray.stages.similarity import group_centroids

        t = pa.table({"k": pa.array(["b", "a", "b"]),
                      "embedding": pa.array([[1.0, 2.0], [3.0, 4.0],
                                             [5.0, 6.0]])})
        out = group_centroids(_ds(t, parts=3), "k",
                              emb_col="embedding").to_pandas()
        got = {r.k: list(r.centroid) for _, r in out.iterrows()}
        assert got == {"a": [3.0, 4.0], "b": [3.0, 4.0]}


class TestSampleExactN:
    def _docs(self, n=400, seed=41):
        rng = np.random.default_rng(seed)
        return pa.table({
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["txt-%d-%d" % (i, rng.integers(0, 9)) for i in
                     range(n)]})

    def test_exact_size_and_smallest_hashes(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.functions.hashing import (
            md5_low64_batch,
        )
        from mini_search_engine_ray.stages.sampling import sample_exact_n

        t = self._docs()
        got = sample_exact_n(rd.from_arrow(t).repartition(9), 37) \
            .to_pandas()
        assert len(got) == 37
        h = md5_low64_batch(t["text"].to_pylist())
        order = np.lexsort((np.arange(len(h)), h))[:37]
        assert sorted(got["doc_id"]) == sorted(
            t["doc_id"].to_numpy()[order].tolist())

    def test_partition_invariance_and_salt(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import sample_exact_n

        t = self._docs(seed=43)
        a = set(sample_exact_n(rd.from_arrow(t).repartition(2), 25)
                .to_pandas()["doc_id"])
        b = set(sample_exact_n(rd.from_arrow(t).repartition(13), 25)
                .to_pandas()["doc_id"])
        assert a == b
        c = set(sample_exact_n(rd.from_arrow(t).repartition(13), 25,
                               salt="x").to_pandas()["doc_id"])
        assert c != a  # independent draw

    def test_n_beyond_corpus_and_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import sample_exact_n

        t = self._docs(n=10)
        assert sample_exact_n(rd.from_arrow(t), 999).count() == 10
        with pytest.raises(ValueError, match="n must"):
            sample_exact_n(rd.from_arrow(t), 0)


class TestFilterByZscore:
    def test_vs_numpy(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import filter_by_zscore

        rng = np.random.default_rng(47)
        v = rng.standard_normal(5000) * 3 + 10
        t = pa.table({"i": np.arange(5000), "v": v})
        got = filter_by_zscore(rd.from_arrow(t).repartition(7), "v",
                               max_abs_z=2.0).to_pandas()
        mu, sd = v.mean(), v.std()
        exp = np.flatnonzero(np.abs(v - mu) <= 2.0 * sd)
        assert sorted(got["i"]) == exp.tolist()

    def test_nulls_and_degenerate(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import filter_by_zscore

        t = pa.table({"v": pa.array([1.0, None, 1.0, 50.0])})
        got = filter_by_zscore(rd.from_arrow(t), "v", max_abs_z=1.0) \
            .to_pandas()
        assert (got["v"] == 1.0).all()  # null dropped by default
        kept = filter_by_zscore(rd.from_arrow(t), "v", max_abs_z=1.0,
                                keep_nulls=True).count()
        assert kept == 3
        # zero variance keeps every non-null row
        t2 = pa.table({"v": [5.0] * 8})
        assert filter_by_zscore(rd.from_arrow(t2), "v",
                                max_abs_z=0.1).count() == 8
        with pytest.raises(ValueError, match="max_abs_z"):
            filter_by_zscore(rd.from_arrow(t2), "v", max_abs_z=0)


class TestNtile:
    @pytest.mark.parametrize("n,k", [(100, 7), (10, 10), (5, 9),
                                     (1000, 3)])
    def test_vs_duckdb(self, ray_session, n, k):
        import duckdb
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import ntile

        rng = np.random.default_rng(n + k)
        t = pa.table({"o": rng.permutation(n),
                      "v": rng.integers(0, 5, n)})
        got = ntile(rd.from_arrow(t).repartition(6), k=k,
                    order_by="o").to_pandas().sort_values("o")
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        exp = con.sql(f"SELECT o, ntile({k}) OVER (ORDER BY o) AS nt "
                      f"FROM tt ORDER BY o").df()
        np.testing.assert_array_equal(got["ntile"].to_numpy(),
                                      exp["nt"].to_numpy())

    def test_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.scan import ntile

        ds = rd.from_arrow(pa.table({"o": [1]}))
        with pytest.raises(ValueError, match="k must"):
            ntile(ds, k=0, order_by="o")


class TestSampleByRate:
    def test_row_level_brute_force(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.functions.hashing import (
            md5_low64_batch,
        )
        from mini_search_engine_ray.stages.sampling import sample_by_rate

        rng = np.random.default_rng(83)
        n = 600
        texts = [f"doc-{i}-{rng.integers(0, 9)}" for i in range(n)]
        rates = rng.uniform(-0.2, 1.3, n)  # deliberately out of range
        t = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                      "text": texts, "r": rates})
        got = set(sample_by_rate(rd.from_arrow(t).repartition(7), "r")
                  .to_pandas()["doc_id"])
        h = md5_low64_batch(texts) % np.uint64(10_000)
        thresh = np.floor(np.clip(rates, 0, 1) * 10_000).astype(np.int64)
        exp = set(np.flatnonzero(h.astype(np.int64) < thresh).tolist())
        assert got == exp

    def test_null_rate_drops_and_salt(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import sample_by_rate

        t = pa.table({"doc_id": [0, 1, 2],
                      "text": ["a", "b", "c"],
                      "r": pa.array([1.0, None, 1.0], pa.float64())})
        got = sample_by_rate(rd.from_arrow(t), "r").to_pandas()
        assert sorted(got["doc_id"]) == [0, 2]
        # rate 0.5 with different salts gives different draws
        n = 400
        t2 = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                       "text": [f"x{i}" for i in range(n)],
                       "r": np.full(n, 0.5)})
        a = set(sample_by_rate(rd.from_arrow(t2), "r").to_pandas()["doc_id"])
        b = set(sample_by_rate(rd.from_arrow(t2), "r", salt="s")
                .to_pandas()["doc_id"])
        assert a != b and 100 < len(a) < 300 and 100 < len(b) < 300


class TestWeightedSampleExactN:
    @staticmethod
    def _corpus(n=200, seed=13):
        rng = np.random.default_rng(seed)
        texts = [f"doc {i} " + " ".join(
            rng.choice(["a", "b", "c"], 4)) for i in range(n)]
        w = rng.integers(1, 50, n).astype(np.int64)
        return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                         "text": pa.array(texts),
                         "w": pa.array(w)})

    def test_matches_brute_force_and_reshard_stable(self, ray_session):
        import hashlib

        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import (
            weighted_sample_exact_n,
        )

        t = self._corpus()
        keys = []
        for i in range(t.num_rows):
            h = int.from_bytes(hashlib.md5(
                t["text"][i].as_py().encode()).digest()[8:], "little")
            u = (float(h) + 1.0) / 2 ** 64
            keys.append(np.log(u) / float(t["w"][i].as_py()))
        exp = [i for _, i in sorted(
            ((-k, i) for i, k in enumerate(keys)))][:30]
        for blocks in (1, 7):
            got = weighted_sample_exact_n(
                rd.from_arrow(t).repartition(blocks), 30, "w") \
                .take_all()
            assert sorted(r["doc_id"] for r in got) == sorted(exp)

    def test_weight_monotonicity(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import (
            weighted_sample_exact_n,
        )

        # same text (same u) duplicated with tiny vs huge weight:
        # ln(u)/w rises with w (u < 1), so the huge-weight copy wins
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["same text", "same text"]),
                      "w": pa.array([1, 1000], pa.int64())})
        got = weighted_sample_exact_n(rd.from_arrow(t), 1, "w") \
            .take_all()
        assert got[0]["doc_id"] == 2

    def test_validation(self, ray_session):
        import pytest
        import ray.data as rd

        from mini_search_engine_ray.stages.sampling import (
            weighted_sample_exact_n,
        )

        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["x"]),
                      "w": pa.array([0], pa.int64())})
        with pytest.raises(ValueError):
            weighted_sample_exact_n(rd.from_arrow(t), 0, "w")
        with pytest.raises(Exception):
            weighted_sample_exact_n(rd.from_arrow(t), 1, "w").take_all()
