"""Scalar (int8-style) embedding quantization + quantized ANN.

At 100 TB an embedding store's cost is memory bandwidth: a float32
d=1024 vector is 4 KB, its uint8 quantization 1 KB — the standard SQ8
scheme (as in FAISS's ``ScalarQuantizer``): per-DIMENSION affine
quantization ``q = clip(floor((x - mn_d) / scale_d), 0, 2^bits - 1)``
with ``scale_d = (mx_d - mn_d) / (2^bits - 1)`` from the global
per-dimension min/max, and ASYMMETRIC search — the query stays full
precision, stored vectors are dequantized on the fly as
``mn_d + q * scale_d``.

Scale shape:
- the per-dimension (min, max) reduction is one d-sized partial row
  per batch, tree-combined distributed-side and folded incrementally
  on the driver (same pattern as ``embedding_moments`` — driver
  memory is two d-vectors regardless of batch count);
- (mn, scale) broadcast once via ``ray.put``; quantization and
  quantized scoring are pure maps (one fused multiply-add + matmul
  per batch);
- the quantized top-k reuses the brute-force ANN's tree merge
  (O(tasks * Q * k) gather, no all-to-all).

Every arithmetic step (min/max, ``(mx-mn)/(2^bits-1)``, floor, clip,
``mn + q*scale``) is order-independent IEEE float64, so the DuckDB
oracle replays the quantized codes AND the quantized scores exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import (
    _emb_matrix,
    _normalize,
    _topk_ids_scores,
    _tree_merge_topk,
)


def _minmax_rows(t: pa.Table):
    """Fold a table of (mn, mx) partial rows into one pair, or None."""
    if t.num_rows == 0:
        return None
    mns = np.array([np.asarray(v) for v in t["mn"].to_pylist()])
    mxs = np.array([np.asarray(v) for v in t["mx"].to_pylist()])
    return mns.min(axis=0), mxs.max(axis=0)


def embedding_minmax(ds, *, emb_col: str = "embedding"):
    """Global per-dimension (min, max) of the embedding column —
    d-sized partials, tree combine, incremental driver fold (never a
    batch-count-sized driver list).  Returns (mn[d], mx[d]) float64,
    or (None, None) on an empty column."""
    schema = pa.schema([("mn", pa.list_(pa.float64())),
                        ("mx", pa.list_(pa.float64()))])

    def partial(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t, emb_col).astype(np.float64)
        if x.size == 0:
            return schema.empty_table()
        return pa.table({"mn": pa.array([x.min(axis=0)], schema[0].type),
                         "mx": pa.array([x.max(axis=0)], schema[1].type)})

    def combine(t: pa.Table) -> pa.Table:
        acc = _minmax_rows(t)
        if acc is None:
            return schema.empty_table()
        return pa.table({"mn": pa.array([acc[0]], schema[0].type),
                         "mx": pa.array([acc[1]], schema[1].type)})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
              .map_batches(combine, batch_size=64, batch_format="pyarrow")
    mn_tot, mx_tot = None, None
    for block in parts.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
        acc = _minmax_rows(block)
        if acc is None:
            continue
        mn_tot = acc[0] if mn_tot is None else np.minimum(mn_tot, acc[0])
        mx_tot = acc[1] if mx_tot is None else np.maximum(mx_tot, acc[1])
    return mn_tot, mx_tot


def quant_params(mn: np.ndarray, mx: np.ndarray, *, bits: int = 8):
    """(mn, scale) with scale_d = (mx_d - mn_d) / (2^bits - 1); a
    constant dimension (mx == mn) gets scale 0 and quantizes to 0."""
    if not (isinstance(bits, int) and 1 <= bits <= 16):
        raise ValueError(f"bits must be an int in [1, 16], got {bits!r}")
    levels = float(2 ** bits - 1)
    return np.asarray(mn, np.float64), \
        (np.asarray(mx, np.float64) - np.asarray(mn, np.float64)) / levels


def _quantize_matrix(x: np.ndarray, mn: np.ndarray, scale: np.ndarray,
                     *, bits: int) -> np.ndarray:
    hi = 2 ** bits - 1
    safe = np.where(scale == 0, 1.0, scale)
    q = np.floor((x - mn) / safe)
    q = np.clip(q, 0, hi)
    return np.where(scale == 0, 0, q).astype(np.int64)


def quantize_embeddings(ds, mn: np.ndarray, mx: np.ndarray, *,
                        bits: int = 8, emb_col: str = "embedding",
                        id_col: str = "vec_id", out_col: str = "q"):
    """Pure-map quantization: (id_col, out_col:list<int64>) — the
    storage representation (int64 here for oracle comparability; a
    writer would cast to uint8/uint16)."""
    import ray

    mn64, scale = quant_params(mn, mx, bits=bits)
    ref = ray.put((mn64, scale))

    def apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.list_(pa.int64()))})
        m, s = ray.get(ref)
        x = _emb_matrix(t, emb_col).astype(np.float64)
        q = _quantize_matrix(x, m, s, bits=bits)
        offs = np.arange(len(q) + 1, dtype=np.int32) * q.shape[1]
        return pa.table({
            id_col: t[id_col],
            out_col: pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(q.ravel())),
        })

    return ds.map_batches(apply, batch_format="pyarrow")


def ann_quantized_topk(ds, queries: np.ndarray, *, k: int = 10,
                       bits: int = 8, emb_col: str = "embedding",
                       id_col: str = "vec_id",
                       mn: np.ndarray | None = None,
                       mx: np.ndarray | None = None):
    """Asymmetric quantized cosine top-k: full-precision queries
    against the SQ-quantized store (each batch quantizes, dequantizes
    ``mn + q*scale`` and scores in one fused pass — exactly the
    arithmetic a reader of the quantized representation performs).
    ``mn``/``mx`` default to one ``embedding_minmax`` pass over
    ``ds``.  Returns (query_id, rank, id_col, score) like
    ``ann_cosine_topk``."""
    import ray

    if mn is None or mx is None:
        mn, mx = embedding_minmax(ds, emb_col=emb_col)
        if mn is None:
            return ds.map_batches(
                lambda t: pa.table({
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64())}),
                batch_format="pyarrow")
    mn64, scale = quant_params(mn, mx, bits=bits)
    qn = _normalize(np.ascontiguousarray(queries, dtype=np.float64))
    ref = ray.put((qn, mn64, scale))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qm, m, s = ray.get(ref)
        x = _emb_matrix(t, emb_col).astype(np.float64)
        dq = m + _quantize_matrix(x, m, s, bits=bits) * s
        dqn = _normalize(dq)
        sims = dqn @ qm.T
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            sv = sims[:, qi]
            order = _topk_ids_scores(ids, sv, k)
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(sv[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partial = ds.map_batches(score, batch_format="pyarrow")
    return _tree_merge_topk(partial, id_col=id_col, k=k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the sub-vector codebook scheme
# ---------------------------------------------------------------------------

def pq_codebook_from_seeds(seeds: np.ndarray, *, n_subspaces: int):
    """Deterministic PQ codebook from a (k, d) seed matrix (the
    kmeans-seed convention: the embeddings of the k smallest ids, no
    training iterations — same determinism contract as
    ``kmeans_init``): returns (n_subspaces, k, d/n_subspaces)
    float64.  Raises when d is not divisible by n_subspaces."""
    seeds = np.ascontiguousarray(seeds, dtype=np.float64)
    k, d = seeds.shape
    if d % n_subspaces:
        raise ValueError(f"pq: dim {d} not divisible by "
                         f"{n_subspaces} subspaces")
    dsub = d // n_subspaces
    return np.ascontiguousarray(
        np.transpose(seeds.reshape(k, n_subspaces, dsub), (1, 0, 2)))


def pq_assign(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Per-subspace nearest-centroid codes for a (n, d) matrix
    against the (m, k, dsub) codebook: per-subspace L2 distances
    ROUNDED to 4dp before the argmin (the ``round_dist`` trick the
    kmeans oracle contract pinned — rounding makes the first-minimum
    tie rule identical to SQL's ORDER BY dist, cid across engines).
    Returns int64 codes (n, m)."""
    m, _, dsub = cb.shape
    xs = x.reshape(len(x), m, dsub)
    # ||x-c||^2 expansion with ONE batched (m, n, d) @ (m, d, k)
    # matmul (the kmeans_assign_batch device) instead of an
    # (n, m, k, dsub) broadcast temporary, and every elementwise pass
    # IN PLACE in the matmul's own contiguous (m, n, k) layout —
    # operating on the transposed view was measured 3-5x slower per
    # pass.  argmin over floor(dist*1e4 + 0.5) is EXACTLY argmin over
    # the 4dp-rounded distance (equal floors == equal round4 values,
    # order preserved), so the /1e4 never needs to run.
    x2 = (xs * xs).sum(axis=2)                       # (n, m)
    c2 = (cb * cb).sum(axis=2)                       # (m, k)
    cbc = cb if cb.flags["C_CONTIGUOUS"] else np.ascontiguousarray(cb)
    dm = np.matmul(np.transpose(xs, (1, 0, 2)),
                   np.transpose(cbc, (0, 2, 1)))     # (m, n, k)
    dm *= -2.0
    dm += x2.T[:, :, None]
    dm += c2[:, None, :]
    np.maximum(dm, 0.0, out=dm)
    np.sqrt(dm, out=dm)
    dm *= 1e4
    dm += 0.5
    np.floor(dm, out=dm)
    return np.argmin(dm, axis=2).T.astype(np.int64)


def pq_encode(ds, cb: np.ndarray, *, emb_col: str = "embedding",
              id_col: str = "vec_id"):
    """PQ-encode the embedding column: codebook broadcast once via
    ``ray.put``, one vectorized assign per batch, exploded to
    (id, subspace, code) integer rows the oracle replays exactly."""
    import ray

    m = cb.shape[0]
    ref = ray.put(np.ascontiguousarray(cb, dtype=np.float64))
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("subspace", pa.int64()),
                            ("code", pa.int64())])

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        codes = pq_assign(_emb_matrix(t, emb_col).astype(np.float64),
                          ray.get(ref))
        n = len(codes)
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, m)),
            "subspace": pa.array(np.tile(np.arange(m, dtype=np.int64),
                                         n)),
            "code": pa.array(codes.ravel())})

    # 64k-row cap: the per-batch (m, n, k) distance table is the
    # working set — at an uncapped 1M-row block it is ~1 GB/task
    # (measured 17x-for-10x at 10M rows from spill pressure)
    return ds.map_batches(encode, batch_size=65536,
                          batch_format="pyarrow")


def ann_pq_topk(ds, queries: np.ndarray, cb: np.ndarray, *,
                k: int = 10, emb_col: str = "embedding",
                id_col: str = "vec_id"):
    """Asymmetric PQ ANN (ADC): full-precision queries scored by
    cosine against each vector's RECONSTRUCTION (the per-subspace
    codebook rows its codes select) — the memory-bandwidth serving
    path where the store holds m log2(k) bits per vector instead of
    4d bytes.  Each batch assigns codes, gathers the reconstruction
    and scores in one fused pass; same broadcast + tree-merge shape
    as the float and SQ8 baselines.  Returns
    (query_id, rank, id_col, score)."""
    import ray

    m, _, dsub = cb.shape
    qn = _normalize(np.ascontiguousarray(queries, dtype=np.float64))
    ref = ray.put((qn, np.ascontiguousarray(cb, dtype=np.float64)))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qm, c = ray.get(ref)
        x = _emb_matrix(t, emb_col).astype(np.float64)
        codes = pq_assign(x, c)
        n = len(codes)
        recon = c[np.arange(m)[None, :], codes].reshape(n, m * dsub)
        sims = _normalize(recon) @ qm.T
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            sv = sims[:, qi]
            order = _topk_ids_scores(ids, sv, k)
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(sv[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    # same 64k-row cap as pq_encode (bounds the distance table)
    partial = ds.map_batches(score, batch_size=65536,
                             batch_format="pyarrow")
    return _tree_merge_topk(partial, id_col=id_col, k=k)
