"""Deterministic content-addressed sampling operators: train/valid/test
hash splits and per-group frequency capping (the "max N documents per
domain" rule every web-scale corpus curation pipeline applies).

Both key off the LOW 64 bits of md5 of a string column — the same hash
family the dedup sketches use (`stages/dedup._token_hashes`), chosen
because it equals DuckDB's ``md5_number_lower`` so the driver oracle
replicates the assignment exactly in SQL.  Content-addressed splits are
stable under re-sharding, re-ordering and incremental corpus growth:
a document's split never changes when the corpus around it does.

Scale shape: ``hash_split`` is a pure per-batch map (no shuffle at
all); ``cap_per_group`` is one range sort on the group key plus a
vectorized per-block rank sweep (`stages/aggregates.topk_per_group`) —
the md5 order column rides along as uint64, never participating in the
shuffle key, and ascending integer ranking is bit-exact (no float
round-trip).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_low64_batch as md5_low64

SPLIT_BUCKETS = 10_000
DEFAULT_SPLITS = [("train", 8_000), ("valid", 1_000), ("test", 1_000)]


def hash_split(ds, *, splits=None, text_col: str = "text",
               id_col: str = "doc_id", buckets: int = SPLIT_BUCKETS):
    """Deterministic split assignment: bucket = md5_low64(text) %
    buckets, split by cumulative bucket ranges.  Returns a Dataset
    (id_col, bucket, split).  Pure map — no shuffle, no state."""
    splits = list(splits or DEFAULT_SPLITS)
    if sum(w for _, w in splits) != buckets:
        raise ValueError("split weights must sum to the bucket count")
    names = np.asarray([n for n, _ in splits], dtype=object)
    bounds = np.cumsum([w for _, w in splits])

    def assign(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        h = md5_low64(content.to_pylist())
        b = (h % np.uint64(buckets)).astype(np.int64)
        idx = np.searchsorted(bounds, b, side="right")
        return pa.table({
            id_col: t[id_col],
            "bucket": pa.array(b),
            "split": pa.array(names[idx].tolist(), pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def cap_per_group(ds, keys: list[str], cap: int, *,
                  hash_col: str = "text", id_col: str = "doc_id",
                  out_cols: list[str] | None = None):
    """Per-group frequency cap: keep at most ``cap`` rows per distinct
    ``keys`` combination — the ``cap`` rows with the SMALLEST
    md5_low64(hash_col), ties broken by ascending ``id_col``.  The
    selection is content-addressed and deterministic: independent of
    row order, batch boundaries and partitioning, and replicable in
    SQL as ``row_number() OVER (PARTITION BY keys ORDER BY
    md5_number_lower(hash_col), id_col) <= cap``.

    One range sort on ``keys`` (the only shuffle) + per-block
    vectorized rank filter; the hash column is uint64 end to end."""
    from .aggregates import static_schema, topk_per_group

    out_cols = list(out_cols or ([id_col] + [k for k in keys if k != id_col]))
    kept = list(dict.fromkeys(out_cols + keys + [id_col]))

    def prep(t: pa.Table) -> pa.Table:
        content = t[hash_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        cols = {c: t[c] for c in kept}
        cols["_h64"] = pa.array(md5_low64(content.to_pylist()),
                                type=pa.uint64())
        return pa.table(cols)

    # the sweep's input schema is prep's output — derive it from the
    # source so the sort's schema-less empty blocks come out typed
    src_schema = static_schema(ds)
    prep_schema = None
    if src_schema is not None and all(c in src_schema.names for c in kept):
        prep_schema = pa.schema(
            [(c, src_schema.field(c).type) for c in kept]
            + [("_h64", pa.uint64())])

    capped = topk_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys, "_h64", cap, descending=False, tiebreak=id_col,
        in_schema=prep_schema,
    )
    return capped.select_columns(out_cols)


def sample_fraction(ds, rates, *, default: int | None = None,
                    group_col: str | None = None, hash_col: str = "text",
                    salt: str = "", buckets: int = SPLIT_BUCKETS,
                    out_cols: list[str] | None = None):
    """Deterministic content-addressed (stratified) downsampling: keep
    a row iff ``md5_low64(hash_col || salt) % buckets < rate``, where
    the rate is per-group (``rates`` a dict group-value → keep weight
    out of ``buckets``, ``default`` for unlisted groups) or uniform
    (``rates`` an int).  The classic curation move — downsample
    over-represented languages/domains by fixed factors — as a pure
    map: no shuffle, no RNG state, stable under re-sharding and corpus
    growth, independent samples via ``salt``, and replicable in SQL as
    ``md5_number_lower(col || salt) % buckets < rate``.  Null group
    values take ``default``; a null hash column hashes like ''."""
    if isinstance(rates, dict):
        if group_col is None:
            raise ValueError("dict rates require group_col")
        if default is None:
            raise ValueError("dict rates require a default rate")
        bad = [v for v in list(rates.values()) + [default]
               if not 0 <= int(v) <= buckets]
        if bad:
            raise ValueError(f"rates out of [0, {buckets}]: {bad}")
    else:
        rates = int(rates)
        if not 0 <= rates <= buckets:
            raise ValueError(f"rate out of [0, {buckets}]: {rates}")

    def keep(t: pa.Table) -> pa.Table:
        content = t[hash_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        strs = content.to_pylist()
        if salt:
            strs = [(s or "") + salt for s in strs]
        h = (md5_low64(strs) % np.uint64(buckets)).astype(np.int64)
        if isinstance(rates, dict):
            g = t[group_col]
            g = (g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g) \
                .dictionary_encode()
            per_value = np.asarray(
                [int(rates.get(v, default)) for v in g.dictionary.to_pylist()],
                dtype=np.int64)
            codes = g.indices.to_numpy(zero_copy_only=False)
            valid = ~np.isnan(codes) if codes.dtype.kind == "f" else \
                np.ones(len(codes), dtype=bool)
            rate_row = np.full(t.num_rows, int(default), dtype=np.int64)
            if per_value.size:
                rate_row[valid] = per_value[codes[valid].astype(np.int64)]
        else:
            rate_row = np.full(t.num_rows, rates, dtype=np.int64)
        out = t.filter(pa.array(h < rate_row))
        return out.select(out_cols) if out_cols is not None else out

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_exact_n(ds, n: int, *, text_col: str = "text",
                   id_col: str = "doc_id", salt: str = ""):
    """Deterministic EXACT-SIZE corpus sample: the ``n`` rows with the
    globally smallest md5-low-64(text‖salt), ties by ``id_col`` — the
    fixed-size eval-subset / pilot-corpus draw.  Content-addressed like
    :func:`sample_fraction` (stable under re-sharding, independent
    draws via ``salt``) but with an exact row count instead of an
    expected rate.

    Scale shape: a per-batch local top-n PREFILTER (one lexsort per
    batch) bounds the global sort at n·num_batches rows regardless of
    corpus size; then one range sort of that bounded set + ``limit(n)``.
    Returns the sampled rows (hash column dropped)."""
    from ..functions.hashing import md5_low64_batch

    if not (isinstance(n, int) and n >= 1):
        raise ValueError(f"n must be a positive int, got {n!r}")

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_h", pa.array([], pa.uint64()))
        strs = t[text_col].to_pylist()
        if salt:
            strs = [(s or "") + salt for s in strs]
        h = md5_low64_batch(strs)
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        order = np.lexsort((ids.to_numpy(zero_copy_only=False), h))[:n]
        keep = pa.array(np.sort(order))
        return t.take(keep).append_column("_h", pa.array(h[np.sort(order)]))

    bounded = ds.map_batches(prefilter, batch_format="pyarrow")
    return bounded.sort(["_h", id_col]).limit(n).drop_columns(["_h"])


def filter_by_zscore(ds, value_col: str, *, max_abs_z: float,
                     keep_nulls: bool = False):
    """Outlier gate: keep rows with |v - mean| <= max_abs_z * stddev
    over the WHOLE dataset (population stddev) — the remove-length/
    score-outliers curation move.  Two streaming passes: per-batch
    (n, sum, sumsq) partials (three scalars per batch to the driver),
    then one broadcast-threshold filter map; no shuffle, no sort.
    Degenerate inputs (empty, all-null, zero variance) keep every
    non-null row."""
    if not max_abs_z > 0:
        raise ValueError(f"max_abs_z must be > 0, got {max_abs_z!r}")

    def moments(t: pa.Table) -> pa.Table:
        col = t[value_col]
        v = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
             else col).drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"n": [np.int64(len(v))],
                         "s": [float(v.sum())],
                         "ss": [float((v * v).sum())]})

    parts = ds.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        lo, hi = -np.inf, np.inf
    else:
        s = sum(r["s"] for r in parts)
        ss = sum(r["ss"] for r in parts)
        mean = s / n
        var = max(ss / n - mean * mean, 0.0)
        sd = float(np.sqrt(var))
        lo, hi = mean - max_abs_z * sd, mean + max_abs_z * sd

    def flt(t: pa.Table) -> pa.Table:
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        import pyarrow.compute as _pc

        ok = _pc.and_(_pc.greater_equal(col, pa.scalar(lo)),
                      _pc.less_equal(col, pa.scalar(hi)))
        ok = _pc.fill_null(ok, keep_nulls)
        return t.filter(ok)

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_by_rate(ds, rate_col: str, *, hash_col: str = "text",
                   salt: str = "", buckets: int = SPLIT_BUCKETS):
    """Score-proportional content-addressed sampling — the
    quality-weighted curation draw (keep high-quality docs with high
    probability, junk with low): keep a row iff ``md5_low64(hash_col ‖
    salt) % buckets < floor(rate * buckets)`` where ``rate`` is the
    row's OWN [0, 1] keep probability from ``rate_col``.  The
    continuous-rate sibling of :func:`sample_fraction`: pure map, no
    shuffle, no RNG state, stable under re-sharding, independent draws
    via ``salt``, SQL-replicable.  Rates are clipped to [0, 1]; null
    rates drop the row."""

    def keep(t: pa.Table) -> pa.Table:
        content = t[hash_col]
        content = content.combine_chunks() \
            if isinstance(content, pa.ChunkedArray) else content
        strs = content.to_pylist()
        if salt:
            strs = [(s or "") + salt for s in strs]
        h = (md5_low64(strs) % np.uint64(buckets)).astype(np.int64)
        r = t[rate_col]
        r = r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r
        rv = r.to_numpy(zero_copy_only=False).astype(np.float64)
        thresh = np.floor(np.clip(np.nan_to_num(rv, nan=0.0), 0.0, 1.0)
                          * buckets).astype(np.int64)
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_exact_n(ds, n: int, weight_col: str, *,
                            text_col: str = "text",
                            id_col: str = "doc_id", salt: str = ""):
    """Deterministic EXACT-SIZE weighted sample WITHOUT replacement
    (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws the
    content-addressed uniform u = (md5-low-64(text‖salt) + 1) / 2^64
    and the n rows with the LARGEST u^(1/w) win — equivalently the
    largest ln(u)/w, the form computed here (one ln + one divide;
    inclusion probability rises with the weight, re-shard stable,
    independent draws via ``salt``).  The SQL oracle replays every
    key exactly (same md5 → float64 conversion, same two IEEE ops).

    Scale shape: identical to :func:`sample_exact_n` — per-batch local
    top-n prefilter bounds the global exchange at n·num_batches rows,
    then one bounded sort + limit.  Weights must be > 0 (raises on
    w <= 0 — a zero weight has undefined 1/w key, not probability 0).
    Returns the sampled rows (key column dropped)."""
    from ..functions.hashing import md5_low64_batch

    if not (isinstance(n, int) and n >= 1):
        raise ValueError(f"n must be a positive int, got {n!r}")

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_k", pa.array([], pa.float64()))
        strs = t[text_col].to_pylist()
        if salt:
            strs = [(s or "") + salt for s in strs]
        h = md5_low64_batch(strs)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if (w <= 0).any():
            raise ValueError(
                f"weighted_sample_exact_n: non-positive weight in "
                f"{weight_col!r}")
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        key = np.log(u) / w
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        order = np.lexsort((ids.to_numpy(zero_copy_only=False),
                            -key))[:n]
        keep = np.sort(order)
        return t.take(pa.array(keep)) \
            .append_column("_k", pa.array(key[keep]))

    bounded = ds.map_batches(prefilter, batch_format="pyarrow")
    return bounded.sort(["_k", id_col], descending=[True, False]) \
        .limit(n).drop_columns(["_k"])
