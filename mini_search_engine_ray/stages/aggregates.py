"""Vectorized grouped aggregation for HIGH-CARDINALITY keys.

Ray Data's native ``groupby().aggregate(...)`` runs per-row Python in
the combine phase — measured on this host at ~10 s per 1.1M rows even
at 100 distinct keys (32 CPUs), vs 0.15 s for the underlying sort.
For data-sized keyed reductions (one group per node / content hash /
(pair, shingle)), that overhead dominates entire pipelines.

``sorted_groupby_agg`` keeps the same all-to-all exchange (a range
sort on the key columns) but replaces the per-row combine with ONE
numpy ``reduceat`` sweep per output block. Correctness rests on the
sort invariant Ray's own ``map_groups`` relies on: rows with equal
sort keys never straddle an output block, so every group is wholly
contained in exactly one block and per-block run reduction is exact.
Native ``groupby`` remains the right call when partials are collapsed
FIRST and only few rows reach the shuffle (e.g. windowed aggregates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPS = {"min", "max", "sum", "count"}


def key_run_breaks(t: pa.Table, keys: list[str]) -> np.ndarray:
    """breaks[n-1]: True where rows i and i+1 differ on any key column
    of the key-sorted table.  Null-aware with SQL GROUP BY semantics
    (null == null, null != value), so a null-key run is its own group
    instead of silently merging into the neighbor.  Null-free numeric
    keys take the zero-copy numpy fast path.  (NaN float keys are
    unsupported: NaN != NaN splits them into singleton runs.  Null
    STRING keys additionally cannot pass ``Dataset.sort`` at all —
    Ray's boundary sampler raises on None < str — so only null
    numeric keys reach these sweeps in practice.)"""
    n = t.num_rows
    brk = np.zeros(max(n - 1, 0), dtype=bool)
    for k in keys:
        col = t[k]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if (pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)) \
                and arr.null_count == 0:
            v = arr.to_numpy(zero_copy_only=False)
            brk |= v[1:] != v[:-1]
        else:
            a, b = arr.slice(1), arr.slice(0, n - 1)
            ne = pc.not_equal(a, b).fill_null(False) \
                .to_numpy(zero_copy_only=False).astype(bool)
            va = a.is_valid().to_numpy(zero_copy_only=False)
            vb = b.is_valid().to_numpy(zero_copy_only=False)
            brk |= ne | (va != vb)
    return brk


def _agg_out_type(op: str, src: pa.DataType) -> pa.DataType:
    if op == "count":
        return pa.int64()
    return src


def static_schema(ds) -> pa.Schema | None:
    """The Dataset's Arrow schema IF statically known (parquet reads,
    from_arrow, unions of known schemas) — never triggers execution.
    Lets sorted sweeps emit fully-TYPED empty blocks for the schema-less
    empties Ray's range sort produces on empty boundary partitions,
    keeping every output bundle of one operator schema-identical
    (otherwise the streaming executor logs a mixed-schema warning per
    empty block)."""
    try:
        s = ds.schema(fetch_if_missing=False)
    except Exception:
        return None
    if s is None:
        return None
    base = getattr(s, "base_schema", s)
    return base if isinstance(base, pa.Schema) else None


def sorted_groupby_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                       *, in_schema: pa.Schema | None = None):
    """Grouped reduction via sort + vectorized per-block sweep.

    ``aggs``: list of (source_col, op, alias) with op in
    {'min','max','sum','count'} ('count' ignores source_col). Returns
    a Dataset with columns ``keys + [alias, ...]``, one row per
    distinct key combination. The only shuffle is the range sort; the
    sweep is O(rows) numpy with no per-group Python calls.

    ``in_schema``: callers whose input is a ``map_batches`` output (so
    Ray can't know the schema statically) but whose batch fn emits a
    FIXED schema by construction can pass it here, keeping empty-input
    results fully typed instead of schema-less.
    """
    for _, op, _ in aggs:
        if op not in _OPS:
            raise ValueError(f"unsupported agg op: {op}")

    if in_schema is None:
        in_schema = static_schema(ds)

    def _in_type(t: pa.Table, col: str) -> pa.DataType | None:
        if col in t.column_names:
            return t.schema.field(col).type
        if in_schema is not None and col in in_schema.names:
            return in_schema.field(col).type
        return None

    def sweep(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        if t.num_rows == 0 and t.num_columns == 0 and in_schema is None:
            # schema-less empty block from the sort boundary and no
            # static input schema: pass it through rather than
            # inventing (possibly wrong-typed) columns
            return t
        if t.num_rows == 0:
            for k in keys:
                cols[k] = pa.array([], _in_type(t, k) or pa.int64())
            for src, op, alias in aggs:
                cols[alias] = pa.array(
                    [], _agg_out_type(op, _in_type(t, src) or pa.int64()))
            return pa.table(cols)
        n = t.num_rows
        key_arrs = []
        for k in keys:
            col = t[k]
            key_arrs.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        brk = key_run_breaks(t, keys)
        starts = np.flatnonzero(np.r_[True, brk])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        idx = pa.array(starts)
        for k, arr in zip(keys, key_arrs):
            cols[k] = arr.take(idx)
        for src, op, alias in aggs:
            if op == "count":
                cols[alias] = pa.array(lens)
                continue
            col = t[src]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if col.null_count:
                # to_numpy would turn null ints into NaN floats: wrong
                # sums and a crash casting min/max back — fail loudly
                raise ValueError(
                    f"sorted_groupby_agg: null values in aggregate source "
                    f"column {src!r} are not supported; filter or fill first")
            v = col.to_numpy(zero_copy_only=False)
            if op == "min":
                r = np.minimum.reduceat(v, starts)
            elif op == "max":
                r = np.maximum.reduceat(v, starts)
            else:
                r = np.add.reduceat(v, starts)
            cols[alias] = pa.array(r, type=col.type if op != "sum" else None)
        return pa.table(cols)

    return ds.sort(keys).map_batches(sweep, batch_size=None, batch_format="pyarrow")


def global_quantiles(ds, value_col: str, qs: list[float]) -> pa.Table:
    """Exact WHOLE-DATASET discrete quantiles (DuckDB ``quantile_disc``
    rank semantics, 0-based rank ``ceil(q*n) - 1``): one range sort,
    then each rank is located using the sorted blocks' row-count
    METADATA only — exactly one block is fetched per distinct rank
    (``ray.get`` of that block), so the driver never materializes the
    dataset no matter its size.  Returns a pyarrow Table (q, value)."""
    import ray

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    blocks: list[tuple] = []  # (ref, num_rows) in global sorted order
    for bundle in ds.sort(value_col).iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            blocks.append((ref, int(meta.num_rows)))
    counts = np.array([nr for _, nr in blocks], dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    cum = np.cumsum(counts)
    fetched: dict[int, pa.Table] = {}
    out_v = []
    for q in qs:
        rank = max(int(np.ceil(q * n)) - 1, 0)
        bi = int(np.searchsorted(cum, rank, side="right"))
        if bi not in fetched:
            fetched[bi] = ray.get(blocks[bi][0])
        t = fetched[bi]
        off = rank - (int(cum[bi - 1]) if bi else 0)
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out_v.append(col[off].as_py())
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(out_v)})


def global_quantiles_cont(ds, value_col: str,
                          percentiles: list[int]) -> pa.Table:
    """Exact INTERPOLATED whole-dataset quantiles (SQL
    ``percentile_cont`` semantics) over an INTEGER column, decided
    with pure integers: for percentile p the target position is
    h = (n−1)·p/100, and the linear interpolation between the sorted
    neighbours v[⌊h⌋] and v[⌊h⌋+1] is carried as the EXACT int64
    numerator ``v_lo·(100−num) + v_hi·num`` with ``num = ((n−1)·p) mod
    100`` — no float position or fraction exists anywhere, so the
    value replays bit-for-bit on any engine that divides the same
    integer by the same scale.  Same scale plan as
    :func:`global_quantiles`: ONE range sort, ranks located via
    sorted-block row-count METADATA, one block fetched per distinct
    rank — the driver never materializes the dataset.  Returns
    (p:int64, interp_num:int64) where the continuous quantile equals
    ``interp_num / 100`` on the input column's own scale."""
    import ray

    for p in percentiles:
        if not isinstance(p, (int, np.integer)) or not 0 <= p <= 100:
            raise ValueError(f"percentile must be an int in [0, 100]: {p}")
    blocks: list[tuple] = []  # (ref, num_rows) in global sorted order
    for bundle in ds.sort(value_col).iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            blocks.append((ref, int(meta.num_rows)))
    counts = np.array([nr for _, nr in blocks], dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        return pa.table({"p": pa.array([], pa.int64()),
                         "interp_num": pa.array([], pa.int64())})
    cum = np.cumsum(counts)
    fetched: dict[int, pa.Table] = {}

    def value_at(rank: int) -> int:
        bi = int(np.searchsorted(cum, rank, side="right"))
        if bi not in fetched:
            fetched[bi] = ray.get(blocks[bi][0])
        t = fetched[bi]
        off = rank - (int(cum[bi - 1]) if bi else 0)
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        return int(col[off].as_py())

    out = []
    for p in percentiles:
        lo, num = divmod((n - 1) * int(p), 100)
        v_lo = value_at(lo)
        v_hi = value_at(lo + 1) if num else v_lo
        out.append(v_lo * (100 - num) + v_hi * num)
    return pa.table({"p": pa.array([int(p) for p in percentiles],
                                   pa.int64()),
                     "interp_num": pa.array(out, pa.int64())})


def count_distinct_per_group(ds, keys: list[str], value_col: str, *,
                             alias: str = "n_distinct"):
    """Exact per-group COUNT(DISTINCT value): per-batch local dedup of
    (keys, value) rows with Arrow's native hash group-by (so the
    shuffle carries each batch's distinct combinations, not the raw
    stream), one grouped reduction to global-distinct pairs, then a
    second reduction over the (much smaller) pair set.  Companion to
    `distinct_count_hll` (textstats) — exact where HLL is approximate,
    at the cost of a pair-cardinality shuffle."""
    cols = list(keys) + [value_col]

    def local_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(cols) if set(cols) <= set(t.column_names) else t
        # SQL COUNT(DISTINCT v) ignores NULL values — drop them here so
        # a null is never counted as a distinct value (and so a null
        # string value never reaches Ray's sort, which crashes on null
        # keys). Caveat: a group whose values are ALL null disappears
        # from the output instead of appearing with 0, matching an
        # inner-join shape rather than the full GROUP BY key set.
        t = t.filter(pc.is_valid(t[value_col]))
        if t.num_rows == 0:
            return t.select(cols)
        return t.select(cols).group_by(cols).aggregate([])

    dd = ds.map_batches(local_dedup, batch_format="pyarrow")
    pairs = sorted_groupby_agg(dd, cols, [(value_col, "count", "_n")])
    return sorted_groupby_agg(pairs, list(keys),
                              [(value_col, "count", alias)])


def _topk_keep_indices(t: pa.Table, group_ids: np.ndarray, order_col: str,
                       k: int, descending: bool,
                       tiebreak: str | None) -> np.ndarray:
    """Row indices of each group's top-k under (order_col [, tiebreak]),
    given arbitrary int group ids — one lexsort, no per-group Python."""
    n = t.num_rows
    ov = t[order_col]
    ov = (ov.combine_chunks() if isinstance(ov, pa.ChunkedArray) else ov) \
        .to_numpy(zero_copy_only=False)
    if descending:
        # negation needs float; exact only below 2^53 for int orders
        key = -ov.astype(np.float64)
    else:
        # ascending keeps the native dtype: int64/uint64 orders
        # (e.g. md5-low-64 caps) stay bit-exact
        key = ov
    lex = [key, group_ids]
    if tiebreak is not None:
        tb = t[tiebreak]
        tb = (tb.combine_chunks() if isinstance(tb, pa.ChunkedArray) else tb) \
            .to_numpy(zero_copy_only=False)
        lex.insert(0, tb)
    order = np.lexsort(lex)  # primary: group, then order_col, then tiebreak
    sg = group_ids[order]
    brk = sg[1:] != sg[:-1]
    starts = np.flatnonzero(np.r_[True, brk])
    rank = np.arange(n, dtype=np.int64) - starts[
        np.cumsum(np.r_[0, brk.astype(np.int64)])]
    return np.sort(order[rank < k])


def _batch_group_codes(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Dense per-batch int group codes over arbitrary key columns
    (nulls form their own group, SQL GROUP BY semantics); re-encoded
    after each column so the combined code never overflows."""
    code = None
    for kcol in keys:
        col = t[kcol]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        d = col.dictionary_encode()
        c = d.indices.to_numpy(zero_copy_only=False)
        card = len(d.dictionary)
        cc = np.where(np.isnan(c), card, c).astype(np.int64) \
            if c.dtype.kind == "f" else c.astype(np.int64)
        if code is None:
            # first column's dictionary codes are already dense —
            # skip the O(n log n) re-encode
            code = cc
        else:
            code = np.unique(code * (card + 1) + cc,
                             return_inverse=True)[1]
    return code


def topk_per_group(ds, keys: list[str], order_col: str, k: int, *,
                   descending: bool = True, tiebreak: str | None = None,
                   in_schema: pa.Schema | None = None):
    """Top-k rows per key group, whole rows preserved.

    A per-batch local top-k PREFILTER runs first (the global top-k of
    a group is a subset of the union of its per-batch top-k's), so the
    shuffle carries at most k rows per (batch, group) instead of the
    whole dataset — at 100 TB with bounded group counts this is the
    difference between a data-sized and an output-shaped exchange.
    Then one range sort on the KEY columns alone (so key runs never
    straddle sorted blocks — the invariant holds only for the full
    sort key, which is why the order column must NOT be part of the
    shuffle key) and a vectorized per-block rank-in-run < k filter.
    No per-group Python, no global collect. `order_col` (and
    `tiebreak`) must be numeric. Pass `tiebreak` (ascending) to make
    the kept set deterministic under order-value ties — without one,
    ties at the k boundary are kept arbitrarily (same contract as
    before, though the arbitrary choice may differ).  ``in_schema``:
    the row schema, for callers whose input is a derived Dataset
    without a statically-known schema — lets the sweep emit TYPED
    empty blocks for the sort's schema-less empties instead of
    mixed-schema bundles."""
    if in_schema is None:
        in_schema = static_schema(ds)

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        codes = _batch_group_codes(t, keys)
        keep = _topk_keep_indices(t, codes, order_col, k, descending,
                                  tiebreak)
        if len(keep) == t.num_rows:
            return t
        return t.take(pa.array(keep))

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if t.num_columns == 0 and in_schema is not None:
                # typed empty: keeps every output bundle schema-equal
                return pa.table(
                    {f.name: pa.array([], f.type) for f in in_schema})
            return t
        run_of = np.cumsum(np.r_[0, key_run_breaks(t, keys).astype(np.int64)])
        keep = _topk_keep_indices(t, run_of, order_col, k, descending,
                                  tiebreak)
        return t.take(pa.array(keep))

    return ds.map_batches(prefilter, batch_format="pyarrow") \
        .sort(list(keys)).map_batches(
            sweep, batch_size=None, batch_format="pyarrow")


def quantile_per_group(ds, keys: list[str], value_col: str, qs: list[float]):
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: 0-based rank ``ceil(q*n) - 1`` of the ascending-sorted
    values). Same machinery as ``topk_per_group``: range sort on the
    KEY columns alone, per-block lexsort of (run, value), ranks picked
    vectorized — exact as long as each group fits one sorted block
    (high-cardinality group keys; a handful of giant groups needs a
    histogram pass instead). Returns keys + one ``q<q>`` column per
    requested quantile."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")

    def qname(q: float) -> str:
        return "q" + f"{q:g}".replace("0.", "").replace(".", "_")

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {}
            for k in keys:
                cols[k] = pa.array([], t.schema.field(k).type
                                   if k in t.column_names else pa.int64())
            vt = (t.schema.field(value_col).type
                  if value_col in t.column_names else pa.float64())
            for q in qs:
                cols[qname(q)] = pa.array([], vt)
            return pa.table(cols)
        n = t.num_rows
        key_arrs = []
        for k in keys:
            col = t[k]
            key_arrs.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        run_of = np.cumsum(np.r_[0, key_run_breaks(t, keys).astype(np.int64)])
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, run_of))
        srun = run_of[order]
        starts = np.flatnonzero(np.r_[True, srun[1:] != srun[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        cols = {k: arr.take(pa.array(order[starts])) for k, arr in zip(keys, key_arrs)}
        for q in qs:
            rank = np.maximum(np.ceil(q * lens).astype(np.int64) - 1, 0)
            cols[qname(q)] = pa.array(vals[order[starts + rank]], type=col.type)
        return pa.table(cols)

    return ds.sort(list(keys)).map_batches(
        sweep, batch_size=None, batch_format="pyarrow"
    )


def filter_by_quantile(ds, value_col: str, q: float, *, keep: str = "ge"):
    """Quality-threshold curation gate: keep rows whose ``value_col``
    is >= (``keep='ge'``) or < (``keep='lt'``) the dataset's exact
    q-th discrete quantile.  The threshold comes from
    ``global_quantiles`` (one range sort, one block fetched by
    row-count metadata — never a driver materialization); the filter
    itself is a pure streaming map over a SECOND pass of the input,
    so the input Dataset must be re-readable (parquet reads are; wrap
    a derived pipeline in ``materialize()`` first if recomputing it
    twice is expensive).  SQL mirror:
    ``WHERE value >= (SELECT quantile_disc(value, q) FROM t)``."""
    if keep not in ("ge", "lt"):
        raise ValueError(f"keep must be 'ge' or 'lt', got {keep!r}")
    import pyarrow.compute as pc

    thr_tab = global_quantiles(ds, value_col, [q])
    if thr_tab.num_rows == 0:
        return ds  # empty input: nothing to filter
    thr = thr_tab["value"][0].as_py()
    op = pc.greater_equal if keep == "ge" else pc.less

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(op(t[value_col], pa.scalar(thr)))

    return ds.map_batches(flt, batch_format="pyarrow")


def _global_bin_edges(ds, value_col: str, bins: int):
    """Shared global bin-edge pass for the histogram-quantile
    operators: per-batch null-ignoring min/max partials, a driver
    fold, and the mx==mn width rule — ONE definition, because the
    estimates are SQL-replayable only while operators and oracles
    share this exact IEEE arithmetic.  Returns (found, mn, mx, width);
    ``found`` False means no non-null value exists."""
    def minmax(t: pa.Table) -> pa.Table:
        col = t[value_col]
        v = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
             else col).drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"mn": [float(v.min())], "mx": [float(v.max())]})

    edges = ds.map_batches(minmax, batch_format="pyarrow").take_all()
    if not edges:
        return False, 0.0, 0.0, 1.0
    mn = min(r["mn"] for r in edges)
    mx = max(r["mx"] for r in edges)
    return True, mn, mx, (1.0 if mx == mn else (mx - mn) / bins)


def histogram_quantiles(ds, value_col: str, qs: list[float], *,
                        bins: int = 512) -> pa.Table:
    """APPROXIMATE whole-dataset quantiles via a fixed-bin histogram —
    the scale path beside exact :func:`global_quantiles`: the exact
    operator range-sorts the whole dataset, while this one does two
    streaming passes whose shuffle is BINS-sized regardless of data
    size (per-batch ``np.bincount`` partials, one grouped sum over at
    most ``bins`` keys, an O(bins) driver table).  Deterministic by
    construction: bucket = min(floor((v-mn)/w), bins-1) in IEEE double
    exactly as SQL computes it, estimate = the upper edge of the first
    bucket whose cumulative count reaches ceil(q*n) — error bounded by
    one bucket width (mx-mn)/bins.  NULL values are ignored like SQL
    aggregates.  Returns a pyarrow Table (q, value)."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    if not (isinstance(bins, int) and bins >= 1):
        raise ValueError(f"bins must be a positive int, got {bins!r}")

    found, mn, mx, width = _global_bin_edges(ds, value_col, bins)
    if not found:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    def bucket_counts(t: pa.Table) -> pa.Table:
        col = t[value_col]
        v = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
             else col).drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = np.minimum(np.floor((v - mn) / width), bins - 1) \
            .astype(np.int64)
        cnt = np.bincount(b, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz),
                         "cnt": pa.array(cnt[nz])})

    hist = sorted_groupby_agg(
        ds.map_batches(bucket_counts, batch_format="pyarrow"),
        ["bucket"], [("cnt", "sum", "cnt")],
        in_schema=pa.schema([("bucket", pa.int64()),
                             ("cnt", pa.int64())])).take_all()
    hist.sort(key=lambda r: r["bucket"])
    buckets = np.array([r["bucket"] for r in hist], dtype=np.int64)
    cum = np.cumsum(np.array([r["cnt"] for r in hist], dtype=np.int64))
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        b = int(buckets[int(np.searchsorted(cum, rank, side="left"))])
        out.append(mn if mx == mn else mn + (b + 1) * width)
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(out, pa.float64())})


def set_op(left, right, how: str):
    """SQL set operations with DISTINCT semantics: ``intersect``,
    ``except`` (left minus right) and ``union`` over the datasets'
    full rows (schemas must match by column name).  One pass each
    side tags row provenance (two 0/1 columns), then a single
    null-aware sorted sweep per distinct row decides membership —
    importantly this gives SQL's set-operation NULL handling (NULL
    matches NULL, unlike EXISTS/IN), which a semi/anti join
    composition would get wrong.  Returns a Dataset of the distinct
    qualifying rows."""
    hows = ("intersect", "except", "union")
    if how not in hows:
        raise ValueError(f"how must be one of {hows}, got {how!r}")
    l_schema = static_schema(left)
    if l_schema is None:
        # resolve the column list + types once so both sides align
        l_schema = left.schema().base_schema
    cols = list(l_schema.names)
    # tag() emits a fixed schema by construction (cols + int64 _l/_r):
    # declare it so empty sort-boundary blocks stay typed through both
    # the agg sweep and flt (the mixed-schema empty-bundle hazard the
    # histogram/topk operators were hardened against)
    tagged_schema = pa.schema(
        [(n, l_schema.field(n).type) for n in cols]
        + [("_l", pa.int64()), ("_r", pa.int64())])
    out_schema = pa.schema([(n, l_schema.field(n).type) for n in cols])

    def tag(is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            one = np.ones(t.num_rows, np.int64)
            zero = np.zeros(t.num_rows, np.int64)
            return t.append_column("_l", pa.array(one if is_left else zero)) \
                    .append_column("_r", pa.array(zero if is_left else one))
        return fn

    tagged = left.map_batches(tag(True), batch_format="pyarrow").union(
        right.map_batches(tag(False), batch_format="pyarrow"))
    agg = sorted_groupby_agg(tagged, cols,
                             [("_l", "max", "_l"), ("_r", "max", "_r")],
                             in_schema=tagged_schema)

    def flt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keep_l = t["_l"].to_numpy(zero_copy_only=False).astype(bool)
        keep_r = t["_r"].to_numpy(zero_copy_only=False).astype(bool)
        if how == "intersect":
            keep = keep_l & keep_r
        elif how == "except":
            keep = keep_l & ~keep_r
        else:
            keep = np.ones(t.num_rows, bool)
        return t.filter(pa.array(keep)).select(cols)

    return agg.map_batches(flt, batch_format="pyarrow")


def histogram_quantiles_per_group(ds, key_col: str, value_col: str,
                                  qs: list[float], *, bins: int = 512):
    """APPROXIMATE per-group quantiles via a fixed-bin histogram — the
    giant-group scale path that :func:`quantile_per_group`'s docstring
    promises (the exact operator needs each group inside one sorted
    block; this one handles groups of ANY size because the shuffle
    carries at most keys × bins register rows).  Bin edges are GLOBAL
    (one min/max pass) so the bucket arithmetic stays deterministic
    and SQL-replayable exactly, like :func:`histogram_quantiles`;
    error per estimate ≤ one global bucket width.  Per batch, one
    ``np.bincount`` over a (batch-keys × bins) plane; one grouped sum;
    then a key-only register sort and a vectorized per-run sweep.
    NULL values are ignored.  Returns a Dataset (key_col, q, value)."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    if not (isinstance(bins, int) and bins >= 1):
        raise ValueError(f"bins must be a positive int, got {bins!r}")

    src = static_schema(ds)
    kt_static = src.field(key_col).type \
        if src is not None and key_col in src.names else None

    def empty_out(kt):
        return pa.table({key_col: pa.array([], kt),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    found, mn, mx, width = _global_bin_edges(ds, value_col, bins)
    if not found:
        import ray.data as rd

        return rd.from_arrow(empty_out(kt_static or pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
            else keys
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        ok = pc.is_valid(col).to_numpy(zero_copy_only=False)
        empty = pa.table({key_col: pa.array([], keys.type),
                          "bucket": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if not ok.any():
            return empty
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)[ok]
        b = np.minimum(np.floor((v - mn) / width), bins - 1) \
            .astype(np.int64)
        d = keys.filter(pa.array(ok)).dictionary_encode()
        card = len(d.dictionary)
        raw = d.indices.to_numpy(zero_copy_only=False)
        # NULL keys form their own group (SQL GROUP BY): null indices
        # surface as NaN — route them to the extra plane row `card`
        # instead of letting the int cast wrap into another key's rows
        codes = (np.where(np.isnan(raw), card, raw).astype(np.int64)
                 if raw.dtype.kind == "f" else raw.astype(np.int64))
        plane = np.bincount(codes * bins + b,
                            minlength=(card + 1) * bins)
        nz = np.flatnonzero(plane)
        idx = nz // bins
        key_vals = d.dictionary.take(
            pa.array(np.where(idx == card, 0, idx),
                     mask=(idx == card))) if card else \
            pa.array([None] * len(nz), keys.type)
        return pa.table({key_col: key_vals,
                         "bucket": pa.array(nz % bins),
                         "cnt": pa.array(plane[nz].astype(np.int64))})

    reg_schema = pa.schema([(key_col, kt_static), ("bucket", pa.int64()),
                            ("cnt", pa.int64())]) \
        if kt_static is not None else None
    regs = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col, "bucket"], [("cnt", "sum", "cnt")],
        in_schema=reg_schema)
    qarr = np.array([float(q) for q in qs], dtype=np.float64)

    def sweep(t: pa.Table) -> pa.Table:
        kt = t.schema.field(key_col).type if key_col in t.column_names \
            else (kt_static or pa.int64())
        if t.num_rows == 0:
            return empty_out(kt)
        keys = t[key_col]
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
            else keys
        n = t.num_rows
        brk = key_run_breaks(t, [key_col])
        run_id = np.cumsum(np.r_[0, brk.astype(np.int64)])
        # order buckets within each key run
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bkt, run_id))
        srun, sbkt, scnt = run_id[order], bkt[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, srun[1:] != srun[:-1]])
        ends = np.r_[starts[1:], n]
        cs = np.cumsum(scnt)
        base = np.concatenate(([0], cs[starts[1:] - 1]))
        cum = cs - base[srun]                  # cumulative within run
        totals = cs[ends - 1] - np.r_[0, cs[starts[1:] - 1]]
        out_k, out_q, out_v = [], [], []
        first_keys = keys.take(pa.array(order[starts]))
        # one GLOBAL searchsorted per q via the composite-key trick:
        # cum is ascending within each run and totals < M, so
        # cum + run*M is globally non-decreasing and rank_r + r*M
        # lands inside run r
        M = int(totals.max()) + 1
        comp = cum + srun * M
        run_ids = np.arange(len(starts), dtype=np.int64)
        for q in qarr:
            rank = np.maximum(np.ceil(q * totals).astype(np.int64), 1)
            sel = np.searchsorted(comp, rank + run_ids * M, side="left")
            b = sbkt[sel]
            out_k.append(first_keys)
            out_q.append(np.full(len(starts), q))
            out_v.append(np.where(mx == mn, mn, mn + (b + 1) * width))
        return pa.table({
            key_col: pa.concat_arrays([a.combine_chunks()
                                       if isinstance(a, pa.ChunkedArray)
                                       else a for a in out_k]),
            "q": pa.array(np.concatenate(out_q)),
            "value": pa.array(np.concatenate(out_v)),
        })

    return regs.sort(key_col).map_batches(sweep, batch_size=None,
                                          batch_format="pyarrow")



_COMPOSE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def batch_partial_agg(keys: list[str], aggs: list[tuple[str, str, str]]):
    """Map-side combiner for composing ops (sum/min/max/count): reduce
    each batch to ONE row per distinct key tuple BEFORE the range sort,
    so a low-cardinality grouped reduction exchanges (batches × groups)
    partial rows instead of the data — the classic pre-aggregation the
    rollup/cube/pivot class is entitled to (high-cardinality callers
    like token counts apply their own value_counts partials instead).

    Returns ``(batch_fn, reaggs)``: apply ``batch_fn`` in a
    ``map_batches`` and reduce its output with
    ``sorted_groupby_agg(..., reaggs)`` — count partials re-aggregate
    as sums.  Key columns must be sortable (nulls handled upstream by
    the caller's null-safe encoding); null aggregate sources are
    rejected exactly like :func:`sorted_groupby_agg`."""
    for _, op, _ in aggs:
        if op not in _COMPOSE:
            raise ValueError(f"op does not compose: {op!r}")
    reaggs = [(a, _COMPOSE[op], a) for _, op, a in aggs]

    def fn(t: pa.Table) -> pa.Table:
        cols: dict = {}
        if t.num_rows == 0:
            for k in keys:
                cols[k] = t[k]
            for src, op, alias in aggs:
                cols[alias] = pa.array(
                    [], _agg_out_type(op, t.schema.field(src).type
                                      if src in t.column_names
                                      else pa.int64()))
            return pa.table(cols)
        codes = _batch_group_codes(t, keys)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        brk = sc[1:] != sc[:-1]
        starts = np.flatnonzero(np.r_[True, brk])
        first_idx = pa.array(order[starts])
        lens = np.diff(np.r_[starts, len(sc)]).astype(np.int64)
        for k in keys:
            col = t[k]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            cols[k] = col.take(first_idx)
        for src, op, alias in aggs:
            if op == "count":
                cols[alias] = pa.array(lens)
                continue
            col = t[src]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            if col.null_count:
                raise ValueError(
                    f"batch_partial_agg: null values in aggregate source "
                    f"column {src!r} are not supported; filter or fill "
                    "first")
            v = col.to_numpy(zero_copy_only=False)[order]
            if op == "min":
                r = np.minimum.reduceat(v, starts)
            elif op == "max":
                r = np.maximum.reduceat(v, starts)
            else:
                r = np.add.reduceat(v, starts)
            cols[alias] = pa.array(r, type=col.type if op != "sum" else None)
        return pa.table(cols)

    return fn, reaggs


def rollup_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]], *,
               in_schema: pa.Schema | None = None, lvl_col: str = "lvl"):
    """SQL ``GROUP BY ROLLUP(keys...)`` by composition: ONE data-sized
    :func:`sorted_groupby_agg` computes the finest level, then each
    coarser level is re-aggregated from the PREVIOUS level's output —
    the data itself is touched exactly once, and every exchange above
    the finest level is group-cardinality-bounded (the levels are
    materialized, which is safe for the same reason the re-aggregation
    is: a rollup whose finest level doesn't fit in memory isn't a
    rollup, it's the raw data).

    Supported ops: sum/min/max/count — the ops that COMPOSE under
    re-aggregation ('count' re-aggregates as a sum of partial counts).
    Emits SQL's ``GROUPING(keys...)`` bitmask in ``lvl_col`` (0 =
    finest; rolling up the i-th-from-the-right key sets its bit, so
    the rollup chain is 0, 1, 3, 7, ...); rolled-up key columns are
    NULL, exactly ``GROUP BY ROLLUP`` semantics.

    Natural NULL key values keep their own lvl-0 groups (SQL GROUP BY
    semantics; the bitmask is what disambiguates them from rollup
    nulls).  Ray's range sort cannot order null keys, so each key is
    shuffled as a (null-indicator, null-filled value) PAIR — grouping
    only needs equal tuples contiguous, and the indicator keeps a
    filled null distinct from a genuine fill-value row; the indicator
    columns never appear in the output."""
    if not keys:
        raise ValueError("rollup_agg requires at least one key")
    if lvl_col in keys or any(lvl_col == a for _, _, a in aggs):
        raise ValueError(f"lvl_col {lvl_col!r} collides with an output "
                         "column")
    _REOP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, op, _ in aggs:
        if op not in _REOP:
            raise ValueError(f"unsupported rollup op: {op!r} (need one "
                             "that composes under re-aggregation: "
                             f"{sorted(_REOP)})")

    import pyarrow.compute as pc

    def _fill_scalar(tp: pa.DataType):
        if pa.types.is_string(tp) or pa.types.is_large_string(tp):
            return pa.scalar("", tp)
        if pa.types.is_binary(tp) or pa.types.is_large_binary(tp):
            return pa.scalar(b"", tp)
        return pa.scalar(0, tp)

    nn = {k: f"_nn_{k}" for k in keys}
    src_cols = [c for c in dict.fromkeys(c for c, _, _ in aggs)
                if c not in keys]

    def tag(t: pa.Table) -> pa.Table:
        cols: dict = {}
        for k in keys:
            col = t[k]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            cols[nn[k]] = pc.cast(col.is_valid(), pa.int64())
            cols[k] = pc.fill_null(col, _fill_scalar(col.type))
        for c in src_cols:
            cols[c] = t[c]
        return pa.table(cols)

    tag_schema = None
    base_schema = in_schema if in_schema is not None else static_schema(ds)
    if base_schema is not None and all(c in base_schema.names
                                       for c in list(keys) + src_cols):
        fields = []
        for k in keys:
            fields.append((nn[k], pa.int64()))
            fields.append((k, base_schema.field(k).type))
        fields += [(c, base_schema.field(c).type) for c in src_cols]
        tag_schema = pa.schema(fields)

    # map-side combiner first: each batch reduces to one row per
    # distinct key tuple, so the only data-sized work is the per-batch
    # sweep — the exchange carries (batches × groups) partial rows
    pair_keys = [c for k in keys for c in (nn[k], k)]
    part_fn, part_aggs = batch_partial_agg(pair_keys, aggs)
    part_schema = None
    if tag_schema is not None:
        part_schema = pa.schema(
            [(c, tag_schema.field(c).type) for c in pair_keys]
            + [(a, _agg_out_type(op, tag_schema.field(srcc).type))
               for srcc, op, a in aggs])
    finest = sorted_groupby_agg(
        ds.map_batches(tag, batch_format="pyarrow")
        .map_batches(part_fn, batch_format="pyarrow"),
        pair_keys, part_aggs, in_schema=part_schema).materialize()
    fin_schema = static_schema(finest)
    key_types = {k: fin_schema.field(k).type for k in keys}
    alias_types = {a: fin_schema.field(a).type for _, _, a in aggs}
    out_names = list(keys) + [a for _, _, a in aggs] + [lvl_col]

    def widen(level: int):
        """Project a level's (kept pairs + aliases) rows to the full
        output schema: kept keys restored to null where the indicator
        is 0, rolled-up keys NULL, lvl = 2^level - 1."""
        kept = keys[:len(keys) - level]
        lvl = (1 << level) - 1

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for k in keys:
                if k in kept:
                    valid = pc.equal(t[nn[k]], pa.scalar(1, pa.int64()))
                    cols[k] = pc.if_else(valid, t[k],
                                         pa.scalar(None, key_types[k]))
                else:
                    cols[k] = pa.nulls(n, key_types[k])
            for _, _, a in aggs:
                cols[a] = t[a]
            cols[lvl_col] = pa.array(np.full(n, lvl, dtype=np.int64))
            return pa.table(cols).select(out_names)

        return fn

    levels = [finest.map_batches(widen(0), batch_format="pyarrow")]
    prev = finest
    reaggs = [(a, _REOP[op], a) for _, op, a in aggs]
    for level in range(1, len(keys) + 1):
        kept_pairs = pair_keys[:2 * (len(keys) - level)]
        prev_schema = pa.schema(
            [(c, pa.int64() if c.startswith("_nn_") else key_types[
                c]) for c in pair_keys[:2 * (len(keys) - level + 1)]]
            + [(a, alias_types[a]) for _, _, a in aggs])
        if kept_pairs:
            cur = sorted_groupby_agg(
                prev.select_columns(list(prev_schema.names)), kept_pairs,
                reaggs, in_schema=prev_schema).materialize()
        else:
            # grand total: constant-key reduction of the 1-key level
            def add_one(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "_one", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

            one_schema = pa.schema(list(prev_schema)
                                   + [("_one", pa.int64())])
            cur = sorted_groupby_agg(
                prev.map_batches(add_one, batch_format="pyarrow"),
                ["_one"], reaggs, in_schema=one_schema) \
                .drop_columns(["_one"]).materialize()
        levels.append(cur.map_batches(widen(level), batch_format="pyarrow"))
        prev = cur
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def clip_by_quantiles(ds, value_col: str, q_lo: float, q_hi: float, *,
                      out_col: str | None = None):
    """Winsorization — clamp ``value_col`` to its [q_lo, q_hi] GLOBAL
    discrete quantiles (the robust-scaling prelude to normalization and
    the tame-the-outliers curation move).  One range sort locates the
    two clip points via :func:`global_quantiles` (block metadata only —
    the driver never materializes the data), then a pure broadcast
    clamp map.  Outputs are either the original value or one of the two
    exact quantile values, so results are float-EXACT against SQL's
    ``least(greatest(v, lo), hi)``.  ``out_col`` defaults to clamping
    in place (keeps the column's position)."""
    if not 0.0 < q_lo < q_hi <= 1.0:
        raise ValueError(f"need 0 < q_lo < q_hi <= 1, got {q_lo}, {q_hi}")
    qt = global_quantiles(ds, value_col, [q_lo, q_hi])
    if qt.num_rows == 0:  # empty input: nothing to clamp
        return ds
    lo, hi = qt["value"][0].as_py(), qt["value"][1].as_py()
    out_col = out_col or value_col

    def clamp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[value_col]
        v = pc.min_element_wise(pc.max_element_wise(col, pa.scalar(lo)),
                                pa.scalar(hi))
        if out_col in t.column_names:
            i = t.column_names.index(out_col)
            return t.set_column(i, out_col, v)
        return t.append_column(out_col, v)

    return ds.map_batches(clamp, batch_format="pyarrow")


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str], *,
                 prefix: str = "n_", in_schema: pa.Schema | None = None):
    """SQL PIVOT (crosstab) on counts: one row per ``key_col``, one
    int64 count column per ``values`` entry (fixed, caller-supplied —
    the SQL PIVOT contract; pivot values outside the list are ignored,
    exactly conditional aggregation's ``count(*) FILTER (pivot = v)``).

    Scale shape: per batch, ONE ``np.bincount`` over a (batch-keys ×
    len(values)) plane reduces the batch to key-partial rows, so the
    shuffle carries keys × |values| partials, never the event stream;
    one key-sorted grouped sum combines them.  No per-group Python."""
    import pyarrow.compute as pc

    if not values:
        raise ValueError("pivot_counts requires at least one pivot value")
    if len(set(values)) != len(values):
        raise ValueError("duplicate pivot values")
    out_cols = [f"{prefix}{v}" for v in values]
    if key_col in out_cols:
        raise ValueError("pivot output column collides with key_col")
    V = len(values)
    vset = pa.array(values, pa.string())

    def partial(t: pa.Table) -> pa.Table:
        key = t[key_col]
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) \
            else key
        if t.num_rows == 0:
            cols = {key_col: key}
            for c in out_cols:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        codes = _batch_group_codes(t, [key_col])
        g = int(codes.max()) + 1
        piv = t[pivot_col]
        piv = piv.combine_chunks() if isinstance(piv, pa.ChunkedArray) \
            else piv
        vidx = pc.index_in(piv.cast(pa.string()), value_set=vset) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(vidx) if vidx.dtype.kind == "f" else (vidx >= 0)
        vi = vidx[ok].astype(np.int64)
        plane = np.bincount(codes[ok] * V + vi,
                            minlength=g * V).reshape(g, V)
        first = np.unique(codes, return_index=True)[1]
        cols = {key_col: key.take(pa.array(np.sort(first)))}
        order = codes[np.sort(first)]
        for j, c in enumerate(out_cols):
            cols[c] = pa.array(plane[order, j].astype(np.int64))
        return pa.table(cols)

    base = in_schema if in_schema is not None else static_schema(ds)
    part_schema = None
    if base is not None and key_col in base.names:
        part_schema = pa.schema([(key_col, base.field(key_col).type)]
                                + [(c, pa.int64()) for c in out_cols])
    return sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"), [key_col],
        [(c, "sum", c) for c in out_cols], in_schema=part_schema)


def grouping_sets_agg(ds, keys: list[str], sets: list[list[str]],
                      aggs: list[tuple[str, str, str]], *,
                      in_schema: pa.Schema | None = None,
                      lvl_col: str = "lvl"):
    """SQL ``GROUP BY GROUPING SETS(...)`` by composition: ONE
    data-sized :func:`sorted_groupby_agg` to the finest (all-keys)
    level, then every requested set re-aggregates that level's
    group-cardinality-bounded output — the data is touched exactly
    once regardless of how many sets are asked for.  (ROLLUP chains
    should prefer :func:`rollup_agg`, which re-aggregates each level
    from the previous, strictly smaller one; CUBE/arbitrary sets have
    no such chain, so everything derives from the finest level.)

    Same contracts as :func:`rollup_agg`: composing ops only
    (sum/min/max/count), SQL ``GROUPING(keys...)`` bitmask in
    ``lvl_col`` (keys[0] is the most significant bit), rolled-up keys
    NULL, natural NULL key values null-safe via (indicator, filled)
    key pairs."""
    if not keys:
        raise ValueError("grouping_sets_agg requires at least one key")
    if lvl_col in keys or any(lvl_col == a for _, _, a in aggs):
        raise ValueError(f"lvl_col {lvl_col!r} collides with an output "
                         "column")
    _REOP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, op, _ in aggs:
        if op not in _REOP:
            raise ValueError(f"unsupported grouping-sets op: {op!r}")
    canon: list[tuple[str, ...]] = []
    for s in sets:
        extra = [k for k in s if k not in keys]
        if extra:
            raise ValueError(f"set {s!r} references non-keys: {extra}")
        c = tuple(k for k in keys if k in set(s))  # canonical key order
        if c not in canon:
            canon.append(c)
    if not canon:
        raise ValueError("grouping_sets_agg requires at least one set")

    import pyarrow.compute as pc

    def _fill_scalar(tp: pa.DataType):
        if pa.types.is_string(tp) or pa.types.is_large_string(tp):
            return pa.scalar("", tp)
        if pa.types.is_binary(tp) or pa.types.is_large_binary(tp):
            return pa.scalar(b"", tp)
        return pa.scalar(0, tp)

    nn = {k: f"_nn_{k}" for k in keys}
    src_cols = [c for c in dict.fromkeys(c for c, _, _ in aggs)
                if c not in keys]

    def tag(t: pa.Table) -> pa.Table:
        cols: dict = {}
        for k in keys:
            col = t[k]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            cols[nn[k]] = pc.cast(col.is_valid(), pa.int64())
            cols[k] = pc.fill_null(col, _fill_scalar(col.type))
        for c in src_cols:
            cols[c] = t[c]
        return pa.table(cols)

    tag_schema = None
    base_schema = in_schema if in_schema is not None else static_schema(ds)
    if base_schema is not None and all(c in base_schema.names
                                       for c in list(keys) + src_cols):
        fields = []
        for k in keys:
            fields.append((nn[k], pa.int64()))
            fields.append((k, base_schema.field(k).type))
        fields += [(c, base_schema.field(c).type) for c in src_cols]
        tag_schema = pa.schema(fields)

    # map-side combiner first: each batch reduces to one row per
    # distinct key tuple, so the only data-sized work is the per-batch
    # sweep — the exchange carries (batches × groups) partial rows
    pair_keys = [c for k in keys for c in (nn[k], k)]
    part_fn, part_aggs = batch_partial_agg(pair_keys, aggs)
    part_schema = None
    if tag_schema is not None:
        part_schema = pa.schema(
            [(c, tag_schema.field(c).type) for c in pair_keys]
            + [(a, _agg_out_type(op, tag_schema.field(srcc).type))
               for srcc, op, a in aggs])
    finest = sorted_groupby_agg(
        ds.map_batches(tag, batch_format="pyarrow")
        .map_batches(part_fn, batch_format="pyarrow"),
        pair_keys, part_aggs, in_schema=part_schema).materialize()
    fin_schema = static_schema(finest)
    key_types = {k: fin_schema.field(k).type for k in keys}
    alias_types = {a: fin_schema.field(a).type for _, _, a in aggs}
    out_names = list(keys) + [a for _, _, a in aggs] + [lvl_col]
    reaggs = [(a, _REOP[op], a) for _, op, a in aggs]

    def widen(kept: tuple[str, ...]):
        lvl = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in kept)

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for k in keys:
                if k in kept:
                    valid = pc.equal(t[nn[k]], pa.scalar(1, pa.int64()))
                    cols[k] = pc.if_else(valid, t[k],
                                         pa.scalar(None, key_types[k]))
                else:
                    cols[k] = pa.nulls(n, key_types[k])
            for _, _, a in aggs:
                cols[a] = t[a]
            cols[lvl_col] = pa.array(np.full(n, lvl, dtype=np.int64))
            return pa.table(cols).select(out_names)

        return fn

    fin_pair_schema = pa.schema(
        [(c, pa.int64() if c.startswith("_nn_") else key_types[c])
         for c in pair_keys]
        + [(a, alias_types[a]) for _, _, a in aggs])
    out = None
    for kept in canon:
        if len(kept) == len(keys):
            level = finest.map_batches(widen(kept), batch_format="pyarrow")
        elif kept:
            sub_pairs = [c for k in kept for c in (nn[k], k)]
            sub_schema = pa.schema(
                [(c, pa.int64() if c.startswith("_nn_")
                  else key_types[c]) for c in sub_pairs]
                + [(a, alias_types[a]) for _, _, a in aggs])
            sub = sorted_groupby_agg(
                finest.select_columns(list(sub_schema.names)), sub_pairs,
                reaggs, in_schema=sub_schema)
            level = sub.map_batches(widen(kept), batch_format="pyarrow")
        else:
            def add_one(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "_one", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

            one_schema = pa.schema(list(fin_pair_schema)
                                   + [("_one", pa.int64())])
            sub = sorted_groupby_agg(
                finest.map_batches(add_one, batch_format="pyarrow"),
                ["_one"], reaggs, in_schema=one_schema) \
                .drop_columns(["_one"])
            level = sub.map_batches(widen(kept), batch_format="pyarrow")
        out = level if out is None else out.union(level)
    return out


def cube_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]], *,
             in_schema: pa.Schema | None = None, lvl_col: str = "lvl"):
    """SQL ``GROUP BY CUBE(keys...)``: every subset of ``keys`` as a
    grouping set (2^n levels — ``keys`` is validated small).  One
    data-sized exchange; every subset re-aggregates the finest level's
    group-bounded output.  See :func:`grouping_sets_agg`."""
    if len(keys) > 4:
        raise ValueError(f"cube over {len(keys)} keys is 2^{len(keys)} "
                         "grouping sets; pass explicit grouping_sets_agg "
                         "sets instead")
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_agg(ds, keys, sets, aggs, in_schema=in_schema,
                             lvl_col=lvl_col)


def value_histogram(ds, value_col: str, *, bins: int = 64):
    """Equi-width histogram TABLE (bucket, lo, hi, cnt) — the
    distribution report itself, beside the quantile ESTIMATORS that
    consume the same register shape.  Two streaming passes sharing
    :func:`_global_bin_edges`'s exact IEEE bucket arithmetic (bucket =
    min(floor((v-mn)/w), bins-1); edges lo = mn + bucket·w, hi = mn +
    (bucket+1)·w), per-batch ``np.bincount`` partials, one grouped sum
    over at most ``bins`` keys — the shuffle is bins-sized regardless
    of data size.  Empty buckets are omitted (SQL GROUP BY shape);
    NULL values are ignored.  Returns a Dataset."""
    if not (isinstance(bins, int) and bins >= 1):
        raise ValueError(f"bins must be a positive int, got {bins!r}")
    found, mn, mx, width = _global_bin_edges(ds, value_col, bins)

    def bucket_counts(t: pa.Table) -> pa.Table:
        col = t[value_col]
        v = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
             else col).drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(v) == 0 or not found:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        b = np.minimum(np.floor((v - mn) / width), bins - 1) \
            .astype(np.int64)
        cnt = np.bincount(b, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz),
                         "cnt": pa.array(cnt[nz])})

    hist = sorted_groupby_agg(
        ds.map_batches(bucket_counts, batch_format="pyarrow"),
        ["bucket"], [("cnt", "sum", "cnt")],
        in_schema=pa.schema([("bucket", pa.int64()),
                             ("cnt", pa.int64())]))

    def edges(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "bucket": t["bucket"],
            "lo": pa.array(mn + b * width),
            "hi": pa.array(mn + (b + 1.0) * width),
            "cnt": t["cnt"],
        })

    return hist.map_batches(edges, batch_format="pyarrow")


def grouped_quantiles_cont(ds, key_col: str, value_col: str,
                           tiebreak_col: str,
                           percentiles: list[int]):
    """PER-GROUP interpolated quantiles (SQL ``percentile_cont`` over
    ``PARTITION BY key``) as a FULLY DISTRIBUTED plan over an INTEGER
    value column — unlike :func:`global_quantiles_cont`, nothing here
    is ever group-sized on the driver:

    1. ranks: the keyed distributed row_number scan ordered by
       (value, tiebreak) — the tiebreak column (a PK) makes every
       rank deterministic even among duplicate values;
    2. selectors: each group's per-percentile needed ranks expand
       from the per-group count into ≤ 2 weighted rows carrying the
       EXACT integer interpolation split (100−num / num, with
       num = ((n−1)·p) mod 100);
    3. fetch: ONE packed-int64 (key << 32 | rank) sort-merge join;
    4. assemble: ONE (key × percentile)-bounded grouped sum of the
       exact int64 numerator Σ value·weight.

    Returns a Dataset (key_col, p, interp_num) where the continuous
    quantile equals ``interp_num / 100`` on the value column's own
    scale.  Contract: keys are non-negative int64 < 2³¹ and group
    sizes < 2³² (the packed-code layout); violations raise in the
    expanding map."""
    from .join import sort_merge_join
    from .scan import row_number

    for p in percentiles:
        if not isinstance(p, (int, np.integer)) or not 0 <= p <= 100:
            raise ValueError(f"percentile must be an int in [0, 100]: {p}")
    pcts = [int(p) for p in percentiles]

    ranked = row_number(ds, order_by=[value_col, tiebreak_col],
                        key_col=key_col, out_col="rn")

    packed_schema = pa.schema([("code", pa.int64()),
                               (value_col, pa.int64())])

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rn" not in t.column_names:
            return packed_schema.empty_table()
        k = t[key_col].to_numpy(zero_copy_only=False)
        rn = t["rn"].to_numpy(zero_copy_only=False)
        if (k < 0).any() or (k >= (1 << 31)).any():
            raise ValueError("grouped_quantiles_cont: key out of the "
                             "packed-code range [0, 2^31)")
        return pa.table({"code": pa.array((k << 32) | (rn - 1)),
                         value_col: t[value_col]})

    packed = ranked.map_batches(pack, batch_format="pyarrow")

    # per-group counts via per-batch partials: the count exchange is
    # (batches × groups)-sized, not data-sized — the rank sort and the
    # fetch-join sort stay the plan's only corpus-sized exchanges
    cnt_schema = pa.schema([(key_col, pa.int64()),
                            ("c", pa.int64())])

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        k = t[key_col].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table({key_col: pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    nper = sorted_groupby_agg(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        [key_col], [("c", "sum", "n")], in_schema=cnt_schema)

    sel_schema = pa.schema([("code", pa.int64()),
                            (key_col, pa.int64()),
                            ("p", pa.int64()),
                            ("w", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return sel_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ns = t["n"].to_numpy(zero_copy_only=False)
        oc, ok, op, ow = [], [], [], []
        for kk, n in zip(keys.tolist(), ns.tolist()):
            if n >= (1 << 32):
                raise ValueError("grouped_quantiles_cont: group size "
                                 "exceeds the packed-code rank range")
            for p in pcts:
                lo, num = divmod((n - 1) * p, 100)
                if num:
                    oc.append((kk << 32) | lo)
                    ok.append(kk); op.append(p); ow.append(100 - num)
                    oc.append((kk << 32) | (lo + 1))
                    ok.append(kk); op.append(p); ow.append(num)
                else:
                    oc.append((kk << 32) | lo)
                    ok.append(kk); op.append(p); ow.append(100)
        return pa.table({"code": pa.array(oc, pa.int64()),
                         key_col: pa.array(ok, pa.int64()),
                         "p": pa.array(op, pa.int64()),
                         "w": pa.array(ow, pa.int64())})

    sel = nper.map_batches(expand, batch_format="pyarrow")

    joined = sort_merge_join(sel, packed, "code",
                             left_schema=sel_schema,
                             right_schema=packed_schema)

    wc_schema = pa.schema([(key_col, pa.int64()),
                           ("p", pa.int64()),
                           ("wc", pa.int64())])

    def weigh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or value_col not in t.column_names:
            return wc_schema.empty_table()
        w = t["w"].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        return pa.table({key_col: t[key_col], "p": t["p"],
                         "wc": pa.array(w * v)})

    agg = sorted_groupby_agg(
        joined.map_batches(weigh, batch_format="pyarrow"),
        [key_col, "p"], [("wc", "sum", "interp_num")],
        in_schema=wc_schema)

    out_schema = pa.schema([(key_col, pa.int64()),
                            ("p", pa.int64()),
                            ("interp_num", pa.int64())])

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "interp_num" not in t.column_names:
            return out_schema.empty_table()
        return pa.table({key_col: pc.cast(t[key_col], pa.int64()),
                         "p": pc.cast(t["p"], pa.int64()),
                         "interp_num": pc.cast(t["interp_num"],
                                               pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")
