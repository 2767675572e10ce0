"""SQ8 embedding quantization + asymmetric quantized ANN
(stages/quantize.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.quantize import (
    ann_quantized_topk,
    embedding_minmax,
    quant_params,
    quantize_embeddings,
)
from mini_search_engine_ray.stages.similarity import ann_cosine_topk


def _emb_table(x: np.ndarray) -> pa.Table:
    d = x.shape[1]
    offs = np.arange(len(x) + 1, dtype=np.int32) * d
    return pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(x.ravel().astype(np.float64))),
    })


def _ds(x: np.ndarray, blocks: int = 7):
    import ray.data as rd

    return rd.from_arrow(_emb_table(x)).repartition(blocks)


def test_minmax_block_count_invariance(ray_session):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4000, 16))
    for blocks in (1, 37):
        mn, mx = embedding_minmax(_ds(x, blocks))
        np.testing.assert_array_equal(mn, x.min(axis=0))
        np.testing.assert_array_equal(mx, x.max(axis=0))


def test_quantize_codes_match_numpy(ray_session):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(500, 8))
    x[:, 3] = 2.5  # constant dimension -> scale 0 -> code 0
    mn, mx = x.min(axis=0), x.max(axis=0)
    rows = quantize_embeddings(_ds(x), mn, mx, bits=8).take_all()
    got = np.array([r["q"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    m64, scale = quant_params(mn, mx, bits=8)
    safe = np.where(scale == 0, 1.0, scale)
    exp = np.where(scale == 0, 0,
                   np.clip(np.floor((x - m64) / safe), 0, 255)).astype(np.int64)
    np.testing.assert_array_equal(got, exp)
    assert (got[:, 3] == 0).all()
    # reconstruction error bounded by one quantization step per dim
    dq = m64 + got * scale
    assert (np.abs(dq - np.where(scale == 0, m64, x)) <= scale + 1e-12).all()


def test_quantized_ann_recall(ray_session):
    # clustered cloud: quantized top-10 should almost always agree
    # with exact float top-10
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(6, 24)) * 4
    x = np.concatenate([c + rng.normal(size=(200, 24)) * 0.3
                        for c in centers])
    queries = x[:8] + rng.normal(size=(8, 24)) * 0.01
    exact = ann_cosine_topk(_ds(x), queries, k=10).take_all()
    quant = ann_quantized_topk(_ds(x), queries, k=10, bits=8).take_all()

    def by_q(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    e, g = by_q(exact), by_q(quant)
    recall = np.mean([len(e[q] & g[q]) / len(e[q]) for q in e])
    assert recall >= 0.9, recall


def test_bits_validation_and_lower_bits(ray_session):
    rng = np.random.default_rng(6)
    x = rng.normal(size=(50, 4))
    mn, mx = x.min(axis=0), x.max(axis=0)
    with pytest.raises(ValueError):
        quant_params(mn, mx, bits=0)
    with pytest.raises(ValueError):
        quant_params(mn, mx, bits=32)
    rows = quantize_embeddings(_ds(x, 2), mn, mx, bits=4).take_all()
    codes = np.array([r["q"] for r in rows])
    assert codes.max() <= 15 and codes.min() >= 0


class TestRandomSignProjection:
    def test_matches_numpy_and_is_content_addressed(self, ray_session):
        from mini_search_engine_ray.functions.hashing import md5_low64_str
        from mini_search_engine_ray.stages.similarity import (
            random_sign_projection)

        rng = np.random.default_rng(51)
        x = rng.standard_normal((120, 16))
        k = 6
        mat = (np.array([md5_low64_str(f"{i},{j},0") & 1
                         for i in range(16) for j in range(k)],
                        dtype=np.float64).reshape(16, k) * 2.0 - 1.0)
        exp = (x @ mat) / np.sqrt(float(k))
        got = random_sign_projection(_ds(x, 5), k).to_pandas() \
            .sort_values("vec_id")
        # the MATRIX is content-addressed and bit-stable; the matmul
        # reduction itself is IEEE-order-dependent (BLAS kernel choice
        # varies with block row counts), like every float reduction in
        # this repo — agreement to 1e-12, exactness via the _r4 gate
        np.testing.assert_allclose(
            np.stack(got["proj"].to_numpy()), exp, rtol=1e-12, atol=1e-12)
        got2 = random_sign_projection(_ds(x, 11), k).to_pandas() \
            .sort_values("vec_id")
        np.testing.assert_allclose(np.stack(got2["proj"].to_numpy()),
                                   np.stack(got["proj"].to_numpy()),
                                   rtol=1e-12, atol=1e-12)
        # a different salt gives a different matrix
        got3 = random_sign_projection(_ds(x, 5), k, salt=1).to_pandas()
        assert not np.array_equal(np.stack(got3["proj"].to_numpy()), exp)

    def test_jl_distance_preservation(self, ray_session):
        # JL sanity: pairwise distances in the projection approximate
        # the originals (loose statistical bound, fixed seed)
        from mini_search_engine_ray.stages.similarity import (
            random_sign_projection)

        rng = np.random.default_rng(52)
        x = rng.standard_normal((40, 128))
        got = random_sign_projection(_ds(x, 4), 32).to_pandas() \
            .sort_values("vec_id")
        y = np.stack(got["proj"].to_numpy())
        dx = np.linalg.norm(x[:, None] - x[None, :], axis=2)
        dy = np.linalg.norm(y[:, None] - y[None, :], axis=2)
        iu = np.triu_indices(40, 1)
        ratio = dy[iu] / dx[iu]
        assert 0.5 < ratio.min() and ratio.max() < 1.6
        assert abs(ratio.mean() - 1.0) < 0.1

    def test_empty_and_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.similarity import (
            random_sign_projection)

        empty = rd.from_arrow(_emb_table(np.zeros((0, 4))))
        out = random_sign_projection(empty, 3).to_pandas()
        assert len(out) == 0
        with pytest.raises(ValueError):
            random_sign_projection(_ds(np.zeros((2, 4)), 1), 0)


class TestProductQuantization:
    """PQ codebook / assign / encode / ADC top-k
    (stages/quantize.py: pq_codebook_from_seeds, pq_assign,
    pq_encode, ann_pq_topk)."""

    def test_codebook_shape_and_validation(self):
        from mini_search_engine_ray.stages.quantize import (
            pq_codebook_from_seeds)

        rng = np.random.default_rng(7)
        seeds = rng.standard_normal((16, 64))
        cb = pq_codebook_from_seeds(seeds, n_subspaces=8)
        assert cb.shape == (8, 16, 8)
        # subspace s of centroid c IS the seed's slice
        np.testing.assert_array_equal(cb[3, 5], seeds[5, 24:32])
        with pytest.raises(ValueError):
            pq_codebook_from_seeds(seeds, n_subspaces=7)

    def test_assign_matches_bruteforce(self):
        from mini_search_engine_ray.stages.quantize import (
            pq_assign, pq_codebook_from_seeds)
        from mini_search_engine_ray.stages.textstats import round4

        rng = np.random.default_rng(8)
        x = rng.standard_normal((100, 32))
        cb = pq_codebook_from_seeds(rng.standard_normal((4, 32)),
                                    n_subspaces=4)
        codes = pq_assign(x, cb)
        assert codes.shape == (100, 4)
        for i in (0, 17, 99):
            for s in range(4):
                sub = x[i, s * 8:(s + 1) * 8]
                d = round4(np.sqrt(
                    ((sub[None, :] - cb[s]) ** 2).sum(axis=1)))
                assert codes[i, s] == int(np.argmin(d))

    def test_encode_and_adc_vs_reconstruction(self, ray_session):
        from mini_search_engine_ray.stages.quantize import (
            ann_pq_topk, pq_assign, pq_codebook_from_seeds, pq_encode)

        rng = np.random.default_rng(9)
        x = rng.standard_normal((60, 16))
        cb = pq_codebook_from_seeds(x[:8], n_subspaces=4)
        enc = pq_encode(_ds(x, 5), cb).to_pandas() \
            .sort_values(["vec_id", "subspace"])
        assert len(enc) == 60 * 4
        np.testing.assert_array_equal(
            enc["code"].to_numpy().reshape(60, 4), pq_assign(x, cb))
        # a codebook seed reconstructs to itself -> its own query
        # ranks it at similarity ~1
        q = x[:2]
        top = ann_pq_topk(_ds(x, 5), q, cb, k=3).to_pandas()
        for qi in (0, 1):
            rows = top[top.query_id == qi].sort_values("rank")
            assert rows.iloc[0]["score"] >= rows.iloc[-1]["score"]
            # exact ADC replay: cosine vs the gathered reconstruction
            codes = pq_assign(x, cb)
            recon = cb[np.arange(4)[None, :], codes].reshape(60, 16)
            qs = q[qi] / np.linalg.norm(q[qi])
            rn = recon / np.linalg.norm(recon, axis=1, keepdims=True)
            sims = rn @ qs
            order = np.lexsort((np.arange(60), -sims))[:3]
            np.testing.assert_array_equal(
                rows["vec_id"].to_numpy(), order)
