"""scrub_text (ordered RE2 redaction) and doc_keywords (per-doc
TF-IDF top-k) vs brute-force python/pandas oracles."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.functions.hashing import md5_low64_str
from mini_search_engine_ray.stages.scrub import PII_RULES, scrub_text
from mini_search_engine_ray.stages.textstats import doc_keywords


def _ds(t: pa.Table, parts: int = 4):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


class TestScrubText:
    def test_ordered_rules_and_counts(self, ray_session):
        rules = [("[0-9]{3,}", "<NUM>"), ("Customer#", "cust:")]
        t = pa.table({"id": pa.array([0, 1, 2]),
                      "text": pa.array(["Customer#000123", "no digits 12",
                                        "999 Customer#1 Customer#22222"])})
        out = scrub_text(_ds(t, parts=1), rules, out_col="clean",
                         count_col="hits").to_pandas().sort_values("id")
        def oracle(s):
            h = len(re.findall("[0-9]{3,}", s))
            s = re.sub("[0-9]{3,}", "<NUM>", s)
            h += len(re.findall("Customer#", s))
            return re.sub("Customer#", "cust:", s), h
        for _, row in out.iterrows():
            exp_text, exp_hits = oracle(t["text"][row.id].as_py())
            assert row.clean == exp_text
            assert row.hits == exp_hits
        # original column untouched when out_col differs
        assert out.text.tolist() == t["text"].to_pylist()

    def test_default_pii_rules(self, ray_session):
        t = pa.table({"text": pa.array(
            ["mail me at a.b+c@x-corp.io now",
             "see https://ex.com/p?q=1 and http://a.b/c",
             "card 4111111111111111 zip 12345"])})
        out = scrub_text(_ds(t, parts=1)).to_pandas()
        joined = " | ".join(sorted(out.text))
        assert "<EMAIL>" in joined and "@" not in joined
        assert "<URL>" in joined and "http" not in joined
        assert "<NUM>" in joined and "4111111111111111" not in joined
        assert "12345" in joined  # short digit runs survive

    def test_in_place_and_null_text(self, ray_session):
        t = pa.table({"text": pa.array(["a@b.co", None])})
        out = scrub_text(_ds(t, parts=1), count_col="n").to_pandas()
        byv = sorted(out.text.fillna("~"))
        assert byv == ["<EMAIL>", "~"]  # null passes through as null
        assert sorted(out.n.fillna(-1)) in ([0.0, 1.0], [-1.0, 1.0], [0, 1])

    def test_bad_rule_type_raises(self, ray_session):
        t = pa.table({"text": pa.array(["x"])})
        with pytest.raises(TypeError):
            scrub_text(_ds(t, parts=1), [("a", 3)])


def _brute_keywords(docs: list[tuple[int, str]], n_docs: int, k: int):
    rows = []
    for did, text in docs:
        toks = [w for w in re.split(r"[,.;?! ^\f\n\r\t\x0b\x85  ]+",
                                    text.strip().lower()) if w]
        for term in set(toks):
            rows.append((did, term, toks.count(term)))
    df = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    dfx = df.groupby("term").size().rename("df").reset_index()
    df = df.merge(dfx, on="term")
    df["score"] = df.tf.astype(float) * (float(n_docs) / df["df"].astype(float))
    df["tb"] = [md5_low64_str(s) for s in df.term]
    df = df.sort_values(["doc_id", "score", "tb"],
                        ascending=[True, False, True])
    return df.groupby("doc_id").head(k)[["doc_id", "term", "score"]]


class TestDocKeywords:
    def test_vs_brute_force_with_ties(self, ray_session):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(40):
            words = rng.choice(vocab, size=rng.integers(3, 25)).tolist()
            docs.append((d, " ".join(words)))
        docs.append((40, ""))       # empty doc: contributes no rows
        t = pa.table({"doc_id": pa.array([d for d, _ in docs]),
                      "text": pa.array([s for _, s in docs])})
        out = doc_keywords(_ds(t), n_docs=len(docs), k=3).to_pandas()
        exp = _brute_keywords(docs, n_docs=len(docs), k=3)
        a = out.sort_values(["doc_id", "term"]).reset_index(drop=True)
        b = exp.sort_values(["doc_id", "term"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert 40 not in set(a.doc_id)
        # small vocab guarantees score ties; the hash tiebreak decided them
        assert len(a) == len(b)

    def test_k_larger_than_vocab(self, ray_session):
        t = pa.table({"doc_id": pa.array([1]), "text": pa.array(["a b a"])})
        out = doc_keywords(_ds(t, parts=1), n_docs=1, k=10).to_pandas()
        assert sorted(out.term) == ["a", "b"]
        # tf=2 * (1/1) vs tf=1
        assert out.set_index("term").score["a"] == 2.0


def _lloyd_reference(m: np.ndarray, ids: np.ndarray, k: int, iters: int):
    order = np.argsort(ids, kind="stable")
    cents = m[order[:k]].astype(np.float64)
    x = m.astype(np.float64)
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        new = cents.copy()
        for c in range(k):
            sel = x[assign == c]
            if len(sel):
                new[c] = sel.mean(axis=0)
        cents = new
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, np.argmin(d, axis=1)


class TestKMeans:
    def test_vs_numpy_lloyd(self, ray_session):
        from mini_search_engine_ray.stages.similarity import kmeans

        rng = np.random.default_rng(13)
        n, d, k = 300, 8, 5
        m = (rng.normal(size=(k, d))[rng.integers(0, k, n)]
             + 0.1 * rng.normal(size=(n, d))).astype(np.float32)
        ids = rng.permutation(n).astype(np.int64)
        t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(m))})
        import ray.data as rd
        ds = rd.from_arrow([t.slice(i, 60) for i in range(0, n, 60)])
        cents, assign = kmeans(ds, k, iters=5)
        ref_c, ref_a = _lloyd_reference(m, ids, k, iters=5)
        np.testing.assert_allclose(cents, ref_c, rtol=1e-9, atol=1e-12)
        out = assign.to_pandas().set_index("vec_id").sort_index()
        ref = pd.Series(ref_a, index=ids).sort_index()
        assert (out.cluster.values == ref.values).all()
        # dist column is the distance to the assigned centroid
        some = out.iloc[7]
        x = m[np.flatnonzero(ids == out.index[7])[0]].astype(np.float64)
        assert abs(some.dist
                   - np.linalg.norm(x - cents[int(some.cluster)])) < 1e-9

    def test_too_few_rows_raises(self, ray_session):
        from mini_search_engine_ray.stages.similarity import kmeans

        t = pa.table({"vec_id": pa.array([1, 2]),
                      "embedding": pa.array([[0.0, 1.0], [1.0, 0.0]])})
        import ray.data as rd
        with pytest.raises(ValueError):
            kmeans(rd.from_arrow(t), 5, iters=1)

    def test_early_stop_on_converged(self, ray_session):
        from mini_search_engine_ray.stages.similarity import kmeans

        # two tight blobs, k=2: converges after one iteration
        pts = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]])
        t = pa.table({"vec_id": pa.array([0, 2, 1, 3]),
                      "embedding": pa.array([pts[0], pts[2], pts[1], pts[3]])})
        import ray.data as rd
        cents, assign = kmeans(rd.from_arrow(t), 2, iters=50, tol=1e-12)
        out = assign.to_pandas().sort_values("vec_id")
        # seeds are ids 0 and 1 (both in blob A); Lloyd pulls c1 to
        # blob B within two iterations
        assert out.cluster.tolist() == [0, 0, 1, 1]
        np.testing.assert_allclose(sorted(cents[:, 0]), [0.05, 5.05])


class TestFilterByQuantile:
    def test_vs_numpy(self, ray_session):
        from mini_search_engine_ray.stages.aggregates import filter_by_quantile

        rng = np.random.default_rng(19)
        v = rng.uniform(size=1000)
        t = pa.table({"id": pa.array(np.arange(1000)), "v": pa.array(v)})
        out = filter_by_quantile(_ds(t, parts=6), "v", 0.9).to_pandas()
        # duckdb quantile_disc rank: value at 0-based rank ceil(q*n)-1
        thr = np.sort(v)[int(np.ceil(0.9 * len(v))) - 1]
        exp = set(np.flatnonzero(v >= thr))
        assert set(out.id) == exp
        lo = filter_by_quantile(_ds(t, parts=6), "v", 0.9,
                                keep="lt").to_pandas()
        assert set(lo.id) == set(range(1000)) - exp

    def test_empty_and_validation(self, ray_session):
        from mini_search_engine_ray.stages.aggregates import filter_by_quantile

        t = pa.table({"v": pa.array([], pa.float64())})
        out = filter_by_quantile(_ds(t, parts=1), "v", 0.5)
        assert out.count() == 0
        with pytest.raises(ValueError):
            filter_by_quantile(_ds(t, parts=1), "v", 0.5, keep="x")


class TestEmptyInputsNewOps:
    """Every round-4 second-wave operator on a zero-row input: schema-
    stable empty out, no crash."""

    def test_all(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.join import skew_join, \
            sort_merge_join
        from mini_search_engine_ray.stages.sampling import sample_fraction
        from mini_search_engine_ray.stages.similarity import group_centroids

        et = pa.table({"k": pa.array([], pa.int64()),
                       "v": pa.array([], pa.float64())})
        e = rd.from_arrow(et)
        for how in ("right", "full"):
            assert sort_merge_join(e, e, "k", how=how).count() == 0
        assert skew_join(e, e, "k", hot_threshold=1).count() == 0

        td = pa.table({"doc_id": pa.array([], pa.int64()),
                       "text": pa.array([], pa.string()),
                       "lang": pa.array([], pa.string())})
        assert sample_fraction(rd.from_arrow(td), {"en": 1}, default=0,
                               group_col="lang").count() == 0
        assert scrub_text(rd.from_arrow(td), count_col="n").count() == 0
        assert doc_keywords(rd.from_arrow(td), n_docs=0, k=3).count() == 0

        te = pa.table({"label": pa.array([], pa.int64()),
                       "embedding": pa.array([], pa.list_(pa.float32()))})
        assert group_centroids(rd.from_arrow(te), "label").count() == 0


class TestSilhouette:
    @staticmethod
    def _mk(n=300, d=8, k=4, seed=3):
        rng = np.random.default_rng(seed)
        cents = rng.normal(size=(k, d)) * 6
        pts = cents[rng.integers(0, k, n)] + rng.normal(size=(n, d))
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(pts.astype(np.float64))),
        })
        return t, pts, cents

    def test_reference_parity(self):
        import ray

        from mini_search_engine_ray.stages.similarity import (
            cluster_silhouette,
            silhouette_batch,
        )

        t, pts, cents = self._mk()
        got = silhouette_batch(t, cents, round_dist=False)
        d = np.sqrt(((pts[:, None, :] - cents[None, :, :]) ** 2)
                    .sum(axis=2))
        own = np.argmin(d, axis=1)
        a = d[np.arange(len(own)), own]
        dd = d.copy()
        dd[np.arange(len(own)), own] = np.inf
        b = dd.min(axis=1)
        sil = (b - a) / np.maximum(a, b)
        assert np.array_equal(got["cluster"].to_numpy(), own)
        np.testing.assert_allclose(got["sil"].to_numpy(), sil,
                                   rtol=1e-10)
        # grouped means across 5 blocks match the per-point reference
        rows = cluster_silhouette(_ds(t, 5), ray.put(cents),
                                  round_dist=False).take_all()
        for r in rows:
            m = own == r["cluster"]
            assert r["n"] == int(m.sum())
            assert abs(r["mean_sil"] - sil[m].mean()) < 1e-10

    def test_well_separated_beats_degenerate(self):
        from mini_search_engine_ray.stages.similarity import \
            silhouette_batch

        t, pts, cents = self._mk(seed=9)
        good = silhouette_batch(t, cents)["sil"].to_numpy().mean()
        # all centroids identical except one: silhouette collapses
        bad_c = np.r_[[cents[0]], [cents[0] + 1e-3], [cents[0] + 2e-3],
                      [cents[1]]]
        bad = silhouette_batch(t, np.asarray(bad_c))["sil"].to_numpy() \
            .mean()
        assert good > bad

    def test_point_on_centroid_and_validation(self):
        import pytest as _pytest

        from mini_search_engine_ray.stages.similarity import \
            silhouette_batch

        cents = np.array([[0.0, 0.0], [3.0, 0.0]])
        t = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [1.5, 0.0]]),
        })
        out = silhouette_batch(t, cents, round_dist=False)
        sil = out["sil"].to_numpy()
        assert sil[0] == 1.0          # a = 0, b = 3 -> (3-0)/3
        assert sil[1] == 0.0          # equidistant -> (b-a)/max = 0
        with _pytest.raises(ValueError):
            silhouette_batch(t, cents[:1])
