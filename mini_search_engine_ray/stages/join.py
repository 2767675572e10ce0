"""General distributed equi-joins.

Two operators cover the two scale regimes:

``sort_merge_join``   both sides data-sized.  Tag each side, align the
    two relations onto ONE unified Arrow schema (other side's payload
    columns null), union the Datasets, range-sort on the join key
    ALONE (the only shuffle — the side tag must not be part of the
    shuffle key or the two sides of one key could land in different
    blocks), then one vectorized per-block sweep: detect key runs,
    stable-partition each run into left/right rows, and emit the
    segmented cross product with two ``np.repeat`` index constructions
    — no per-key Python, no hash tables.  Equal keys never straddle
    sorted output blocks (the same invariant Ray's own ``map_groups``
    relies on), so every key's match set is wholly local to one block.

``broadcast_join``    one side small.  The small side is ``ray.put``
    once and joined against every batch with Arrow's native hash join
    (``pa.Table.join``) — no shuffle at all; the big side streams.

Skew note: a single hot key's output is materialized inside one block
(cross-product of its two sides).  That is inherent to any non-salted
equi-join; for hot-key workloads pre-aggregate one side first or use
``broadcast_join`` on the deduplicated small side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SIDE = "__join_side"


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenation of arange(start, start+len) segments, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.r_[0, np.cumsum(lens)[:-1]]
    return np.repeat(starts - off, lens) + np.arange(total, dtype=np.int64)


def _combined(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def sort_merge_join(left, right, on, right_on=None, *, how: str = "inner",
                    suffix: str = "_r", left_schema: pa.Schema | None = None,
                    right_schema: pa.Schema | None = None,
                    partitions: int | None = None):
    """Distributed equi-join of two Datasets.

    ``on`` is the left key column (or list); ``right_on`` the right key
    (defaults to ``on``).  ``how`` is ``inner``, ``left``, ``right``,
    ``full``, ``semi`` (left rows WITH a match, SQL EXISTS — emitted
    once each) or ``anti`` (left rows WITHOUT a match, SQL NOT EXISTS
    — null-key left rows included, matching NOT EXISTS, not NOT IN).
    Output columns: left columns (key included, left names) followed —
    for inner/left/right/full — by the right payload columns, suffixed
    with ``suffix`` on collision; semi/anti emit left columns only and
    never ship the right payload through the shuffle.  One range sort
    on the key is the only shuffle.

    ``right``/``full`` use SQL ``USING`` key semantics: ONE key column
    (left name) per key, holding the right side's value on unmatched
    right rows — i.e. ``COALESCE(l.k, r.k)``, exactly what ``SELECT *``
    of ``FULL/RIGHT JOIN ... USING (k)`` yields.  Unmatched right rows
    carry a null left payload.

    Pass ``left_schema``/``right_schema`` when an input is a derived
    (lazy) Dataset whose schema is statically known to the caller —
    e.g. the output of another ``sort_merge_join`` — so construction
    never forces a partial execution just to discover it.

    Null join keys follow SQL semantics (match nothing): both sides
    drop them before the shuffle; ``how='left'`` re-emits the left
    side's null-key rows unmatched via a shuffle-free side branch
    (note: that branch re-reads the left input once more).

    ``partitions`` coalesces the unioned input to that many blocks
    before the sort.  Ray's range sort creates #blocks² shuffle
    objects, so a union of two many-block sides pays quadratic
    scheduling overhead for tiny blocks; size ``partitions`` to the
    data (rows / target block rows), not to the block count the reads
    happened to produce.
    """
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unsupported how: {how}")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("key column count mismatch")

    lschema = left_schema if left_schema is not None else left.schema().base_schema
    rschema = right_schema if right_schema is not None else right.schema().base_schema
    lcols = [f.name for f in lschema]
    # semi/anti only test existence: the right payload never enters
    # the shuffle (right rows reduce to key + side tag)
    rpay = [] if how in ("semi", "anti") else \
        [f.name for f in rschema if f.name not in rkeys]
    rout = {c: (c + suffix if c in lcols else c) for c in rpay}
    fields = (
        [(c, lschema.field(c).type) for c in lcols]
        + [(rout[c], rschema.field(c).type) for c in rpay]
        + [(_SIDE, pa.int8())]
    )
    unified = pa.schema(fields)
    lpay = [c for c in lcols if c not in lkeys]

    def _drop_null_keys(t: pa.Table, keycols: list[str]) -> pa.Table:
        # SQL semantics: a null key matches nothing
        import pyarrow.compute as pc

        mask = None
        for k in keycols:
            if t[k].null_count == 0:
                continue
            v = pc.is_valid(t[k])
            mask = v if mask is None else pc.and_(mask, v)
        return t.filter(mask) if mask is not None else t

    def align_left(t: pa.Table) -> pa.Table:
        # null-key left rows never match; for how='left' they bypass
        # the shuffle entirely (see null_left below) — also required
        # because Ray's sort cannot order null string keys
        t = _drop_null_keys(t, lkeys)
        n = t.num_rows
        cols = {c: t[c] for c in lcols}
        for c in rpay:
            cols[rout[c]] = pa.nulls(n, rschema.field(c).type)
        cols[_SIDE] = pa.nulls(n, pa.int8()).fill_null(0)
        return pa.table(cols, schema=unified)

    def align_right(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t, rkeys)
        n = t.num_rows
        cols = {}
        for lk, rk in zip(lkeys, rkeys):
            cols[lk] = t[rk]
        for c in lpay:
            cols[c] = pa.nulls(n, lschema.field(c).type)
        for c in rpay:
            cols[rout[c]] = t[c]
        cols[_SIDE] = pa.nulls(n, pa.int8()).fill_null(1)
        return pa.table(cols, schema=unified)

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow"))
    if partitions is not None:
        both = both.repartition(partitions)

    out_fields = [(c, lschema.field(c).type) for c in lcols] + \
                 [(rout[c], rschema.field(c).type) for c in rpay]

    def sweep(t: pa.Table) -> pa.Table:
        empty = pa.table({name: pa.array([], typ) for name, typ in out_fields})
        if t.num_rows == 0:
            return empty
        from .aggregates import key_run_breaks

        n = t.num_rows
        # null keys never reach this sweep: align_left/align_right drop
        # them before the shuffle for EVERY how (they'd also crash
        # Ray's sort); 'left'/'anti' re-emit them via the shuffle-free
        # null_left branch below
        run_of = np.cumsum(np.r_[0, key_run_breaks(t, lkeys).astype(np.int64)])
        side = _combined(t[_SIDE]).to_numpy(zero_copy_only=False)
        order = np.lexsort((side, run_of))
        srun = run_of[order]
        starts = np.flatnonzero(np.r_[True, srun[1:] != srun[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        nl = np.add.reduceat((side[order] == 0).astype(np.int64), starts)
        nr = lens - nl
        if how in ("semi", "anti"):
            want = np.flatnonzero(
                (nl > 0) & ((nr > 0) if how == "semi" else (nr == 0)))
            if not len(want):
                return empty
            l_take = pa.array(np.sort(order[_ranges(starts[want], nl[want])]))
            return pa.table({c: _combined(t[c]).take(l_take) for c in lcols},
                            schema=pa.schema(out_fields))
        l_parts: list[np.ndarray] = []
        r_parts: list[np.ndarray] = []
        matched = np.flatnonzero((nl > 0) & (nr > 0))
        if len(matched):
            # per left element of a matched run: its run's right span
            left_sel = _ranges(starts[matched], nl[matched])       # in order space
            per_left_nr = np.repeat(nr[matched], nl[matched])      # segment length
            m_total = int(per_left_nr.sum())
            seg_off = np.r_[0, np.cumsum(per_left_nr)[:-1]]
            within = np.arange(m_total, dtype=np.int64) - np.repeat(seg_off, per_left_nr)
            right_base = np.repeat((starts + nl)[matched], nl[matched])
            l_parts.append(order[np.repeat(left_sel, per_left_nr)])
            r_parts.append(order[np.repeat(right_base, per_left_nr) + within])
        if how in ("left", "full"):
            lonely = np.flatnonzero((nl > 0) & (nr == 0))
            if len(lonely):
                l_parts.append(order[_ranges(starts[lonely], nl[lonely])])
                r_parts.append(np.full(int(nl[lonely].sum()), -1, dtype=np.int64))
        if how in ("right", "full"):
            # unmatched right rows: the aligned right row already holds
            # the key under the LEFT name (USING/coalesce semantics) and
            # nulls in the left payload, so the SAME row index serves
            # both the left-column take and the right-payload take
            lonely_r = np.flatnonzero((nl == 0) & (nr > 0))
            if len(lonely_r):
                rr = order[_ranges(starts[lonely_r], nr[lonely_r])]
                l_parts.append(rr)
                r_parts.append(rr)
        if not l_parts:
            return empty
        l_idx = np.concatenate(l_parts)
        r_idx = np.concatenate(r_parts)
        l_take = pa.array(l_idx)
        r_take = pa.array(r_idx, mask=r_idx < 0)  # null index -> null value
        cols = {}
        for c in lcols:
            cols[c] = _combined(t[c]).take(l_take)
        for c in rpay:
            cols[rout[c]] = _combined(t[rout[c]]).take(r_take)
        return pa.table(cols, schema=pa.schema(out_fields))

    joined = both.sort(lkeys).map_batches(sweep, batch_size=None,
                                          batch_format="pyarrow")
    if how not in ("left", "right", "full", "anti"):
        return joined

    out_schema = pa.schema(out_fields)

    def null_left(t: pa.Table) -> pa.Table:
        # rows with a null in ANY key: unmatched by definition, so
        # 'left'/'full' emit them with a null right side and 'anti'
        # (NOT EXISTS) keeps them — all shuffle-free
        import pyarrow.compute as pc

        mask = None
        for k in lkeys:
            v = pc.is_null(t[k])
            mask = v if mask is None else pc.or_(mask, v)
        t = t.filter(mask)
        cols = {c: t[c] for c in lcols}
        for c in rpay:
            cols[rout[c]] = pa.nulls(t.num_rows, rschema.field(c).type)
        return pa.table(cols, schema=out_schema)

    def null_right(t: pa.Table) -> pa.Table:
        # right rows with a null in ANY key: unmatched, preserved by
        # 'right'/'full' with a null left payload — shuffle-free
        import pyarrow.compute as pc

        mask = None
        for k in rkeys:
            v = pc.is_null(t[k])
            mask = v if mask is None else pc.or_(mask, v)
        t = t.filter(mask)
        cols = {}
        for lk, rk in zip(lkeys, rkeys):
            cols[lk] = t[rk]
        for c in lpay:
            cols[c] = pa.nulls(t.num_rows, lschema.field(c).type)
        for c in rpay:
            cols[rout[c]] = t[c]
        return pa.table(cols, schema=out_schema)

    if how in ("left", "anti", "full"):
        joined = joined.union(
            left.map_batches(null_left, batch_format="pyarrow"))
    if how in ("right", "full"):
        joined = joined.union(
            right.map_batches(null_right, batch_format="pyarrow"))
    return joined


def skew_join(left, right, on, right_on=None, *, how: str = "inner",
              salt: int = 16, hot_threshold: int = 500_000,
              hot_keys=None, suffix: str = "_r",
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              partitions: int | None = None):
    """``sort_merge_join`` with salted hot keys — the escape hatch for
    the skew caveat documented at the top of this module.

    A plain sort-merge join materializes each key's full match set
    inside ONE sorted block; a web-corpus hot key (one domain with
    10⁷ rows) makes that block a straggler or an OOM.  Here rows of
    HOT keys get a salt column: each hot LEFT row lands in one of
    ``salt`` buckets (any per-row assignment is correct — the right
    side is replicated to every bucket, so the joined row set is
    identical), each hot RIGHT row is replicated to all ``salt``
    buckets, and the join key becomes (keys..., salt) — the hot key's
    work spreads across ``salt`` blocks instead of one.  Cold keys
    ride along with salt 0 and zero replication.

    Hot-key detection (when ``hot_keys`` is None): one
    ``sorted_groupby_agg`` count over the UNION of both sides' key
    columns — the shuffle carries (key, 1) rows, the driver collects
    only keys with combined count > ``hot_threshold`` (bounded by
    total_rows / hot_threshold).  Pass ``hot_keys`` (an iterable of
    key values, single-column keys only for the explicit form) to
    skip the counting pass.

    ``how``: inner / left / semi / anti.  NOT right / full — an
    unmatched replicated right row would be emitted once per bucket.
    Single- or multi-column keys with auto detection; the replication
    factor is ``salt`` × (hot right rows) only."""
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"skew_join: unsupported how: {how}")
    s = int(salt)
    if s < 2:
        raise ValueError("salt must be >= 2")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys

    lschema = left_schema if left_schema is not None else left.schema().base_schema
    rschema = right_schema if right_schema is not None else right.schema().base_schema

    if hot_keys is None:
        from .aggregates import sorted_groupby_agg

        def lk(t: pa.Table) -> pa.Table:
            return t.select(lkeys)

        def rk(t: pa.Table) -> pa.Table:
            out = t.select(rkeys)
            return out.rename_columns(lkeys)

        allk = left.map_batches(lk, batch_format="pyarrow").union(
            right.map_batches(rk, batch_format="pyarrow"))
        counts = sorted_groupby_agg(allk, lkeys,
                                    [(lkeys[0], "count", "_cnt")])
        hot_tab = counts.filter(
            expr=f"_cnt > {int(hot_threshold)}").to_arrow_refs()
        hot_tab = [x for x in ray.get(hot_tab) if x.num_rows]
        hot_tab = pa.concat_tables(
            [t.select(lkeys) for t in hot_tab]) if hot_tab else \
            pa.table({k: pa.array([], lschema.field(k).type) for k in lkeys})
    else:
        if len(lkeys) != 1:
            raise ValueError("explicit hot_keys requires a single key column")
        hot_tab = pa.table({lkeys[0]: pa.array(
            list(hot_keys), lschema.field(lkeys[0]).type)})
    hot_ref = ray.put(hot_tab)

    def _hot_mask(t: pa.Table, keycols: list[str]) -> np.ndarray:
        import pyarrow.compute as pc

        hot = ray.get(hot_ref)
        if hot.num_rows == 0:
            return np.zeros(t.num_rows, dtype=bool)
        # membership via arrow hash join on the key columns
        probe = t.select(keycols)
        if keycols != lkeys:
            probe = probe.rename_columns(lkeys)
        probe = probe.append_column("_row", pa.array(np.arange(t.num_rows)))
        hit = probe.join(hot.append_column("_one", pa.nulls(hot.num_rows, pa.int8()).fill_null(1)),
                         keys=lkeys, join_type="left outer")
        mask = np.zeros(t.num_rows, dtype=bool)
        rows = hit["_row"].to_numpy(zero_copy_only=False)
        ones = pc.is_valid(hit["_one"]).to_numpy(zero_copy_only=False)
        mask[rows[ones]] = True
        return mask

    def salt_left(t: pa.Table) -> pa.Table:
        hot = _hot_mask(t, lkeys)
        sv = np.zeros(t.num_rows, dtype=np.int64)
        nh = int(hot.sum())
        if nh:
            # any assignment is correct (right hot rows exist in every
            # bucket) — a cycling counter spreads evenly
            sv[hot] = np.arange(nh, dtype=np.int64) % s
        return t.append_column("_salt", pa.array(sv))

    def salt_right(t: pa.Table) -> pa.Table:
        hot = _hot_mask(t, rkeys)
        cold_idx = np.flatnonzero(~hot)
        hot_idx = np.flatnonzero(hot)
        # each hot row s consecutive times, paired with salts 0..s-1
        idx = np.r_[cold_idx, np.repeat(hot_idx, s)]
        sv = np.r_[np.zeros(len(cold_idx), dtype=np.int64),
                   np.tile(np.arange(s, dtype=np.int64), len(hot_idx))]
        out = t.take(pa.array(idx))
        return out.append_column("_salt", pa.array(sv))

    lb = left.map_batches(salt_left, batch_format="pyarrow")
    rb = right.map_batches(salt_right, batch_format="pyarrow")
    lb_schema = pa.schema(list(lschema) + [pa.field("_salt", pa.int64())])
    rb_schema = pa.schema(list(rschema) + [pa.field("_salt", pa.int64())])
    j = sort_merge_join(lb, rb, lkeys + ["_salt"], rkeys + ["_salt"],
                        how=how, suffix=suffix, partitions=partitions,
                        left_schema=lb_schema, right_schema=rb_schema)
    return j.map_batches(lambda t: t.drop_columns(["_salt"]),
                         batch_format="pyarrow")


def range_join(left, right, *, on, left_ts: str, right_lo: str,
               right_hi: str, band_width: int,
               suffix: str = "_r", partitions: int | None = None,
               left_schema: pa.Schema | None = None,
               right_schema: pa.Schema | None = None):
    """Distributed range/interval join via banding: emit (left, right)
    pairs where ``right_lo <= left_ts <= right_hi`` and the equi-keys
    ``on`` match.

    Every interval must satisfy ``hi - lo <= band_width`` (checked per
    batch), so it overlaps at most TWO bands of width ``band_width``:
    each right row is replicated to band(lo) and band(hi) (once if
    equal), each left row lands in exactly band(ts) — which also means
    a surviving pair is emitted exactly once, no dedup pass needed.
    The composition is one ``sort_merge_join`` on (keys..., band)
    followed by a vectorized containment filter; replication factor is
    <= 2 regardless of data size.  Timestamp columns must be integer
    (cast timestamps to epoch units first)."""
    lkeys = [on] if isinstance(on, str) else list(on)
    w = int(band_width)
    if w <= 0:
        raise ValueError("band_width must be positive")

    lschema = left_schema if left_schema is not None else left.schema().base_schema
    rschema = right_schema if right_schema is not None else right.schema().base_schema

    def band_left(t: pa.Table) -> pa.Table:
        ts = _combined(t[left_ts]).to_numpy(zero_copy_only=False)
        return t.append_column("_band", pa.array(ts // w))

    def band_right(t: pa.Table) -> pa.Table:
        lo = _combined(t[right_lo]).to_numpy(zero_copy_only=False)
        hi = _combined(t[right_hi]).to_numpy(zero_copy_only=False)
        if len(lo) and int((hi - lo).max()) > w:
            raise ValueError(
                "range_join: an interval exceeds band_width "
                f"({int((hi - lo).max())} > {w}) — widen band_width")
        b_lo, b_hi = lo // w, hi // w
        second = np.flatnonzero(b_hi != b_lo)
        idx = np.r_[np.arange(t.num_rows), second]
        out = t.take(pa.array(idx))
        return out.append_column("_band", pa.array(np.r_[b_lo, b_hi[second]]))

    lb = left.map_batches(band_left, batch_format="pyarrow")
    rb = right.map_batches(band_right, batch_format="pyarrow")
    lb_schema = pa.schema(list(lschema) + [pa.field("_band", pa.int64())])
    rb_schema = pa.schema(list(rschema) + [pa.field("_band", pa.int64())])
    j = sort_merge_join(lb, rb, lkeys + ["_band"], how="inner",
                        suffix=suffix, partitions=partitions,
                        left_schema=lb_schema, right_schema=rb_schema)
    lo_out = right_lo + (suffix if right_lo in [f.name for f in lschema] else "")
    hi_out = right_hi + (suffix if right_hi in [f.name for f in lschema] else "")

    def contain(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_band"])
        if t.num_rows == 0:
            return t
        ts = _combined(t[left_ts]).to_numpy(zero_copy_only=False)
        lo = _combined(t[lo_out]).to_numpy(zero_copy_only=False)
        hi = _combined(t[hi_out]).to_numpy(zero_copy_only=False)
        return t.filter(pa.array((lo <= ts) & (ts <= hi)))

    return j.map_batches(contain, batch_format="pyarrow")


def broadcast_join(ds, small: pa.Table, on, right_on=None, *,
                   how: str = "inner", suffix: str = "_r"):
    """Join a streaming Dataset against a SMALL in-memory table: the
    table is placed in the object store once (``ray.put``) and every
    batch runs Arrow's native hash join against it — no shuffle, the
    big side streams with full pipeline parallelism."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    join_type = "inner" if how == "inner" else "left outer"
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys
    ref = ray.put(small)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)  # zero-copy from shared memory
        return t.join(s, keys=lkeys, right_keys=rkeys, join_type=join_type,
                      right_suffix=suffix)

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------
# Bloom-filter join prefilter
# ---------------------------------------------------------------------

_BLOOM_DEFAULT_BITS = 1 << 23  # 1 MiB of bits


def _bloom_positions(keys, bits: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing of md5-low-64:
    h1 = low 32 bits, h2 = high 32 bits forced odd; pos_i =
    (h1 + i*h2) mod bits.  Vectorized, deterministic."""
    from ..functions.hashing import md5_low64_batch

    h = md5_low64_batch(keys)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(bits))


def bloom_from_keys(ds, col: str, *, bits: int = _BLOOM_DEFAULT_BITS,
                    k: int = 4) -> np.ndarray:
    """Build a Bloom filter (packed uint64 bitmap, ``bits`` bits) over
    a key column.  Each block reduces to ONE bitmap row (bits/8
    bytes), OR-combined on the driver — so build it over the SMALLER
    join side: driver traffic is blocks × bits/8, independent of row
    count.  Null keys are skipped (they never join)."""
    import ray

    nwords = (bits + 63) // 64

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col_a = t[col]
        col_a = col_a.combine_chunks() if isinstance(col_a, pa.ChunkedArray) else col_a
        if col_a.null_count:
            col_a = col_a.filter(pc.is_valid(col_a))
        bm = np.zeros(nwords, dtype=np.uint64)
        if len(col_a):
            pos = _bloom_positions(
                [str(x) for x in col_a.to_pylist()], bits, k).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    bm = np.zeros(nwords, dtype=np.uint64)
    for ref in ds.map_batches(partial, batch_size=None,
                              batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        for row in range(t.num_rows):
            bm |= np.frombuffer(t["bm"][row].as_py(), dtype=np.uint64)
    return bm


def bloom_prefilter(left, bloom: np.ndarray, on, *, k: int = 4):
    """Keep only left rows whose key MIGHT be in the Bloom filter —
    no false negatives (the subsequent join still decides exactly),
    tunable false positives.  Compose before a semi/inner
    ``sort_merge_join`` when most left keys have no match: the rows a
    bloom of the right side rejects never enter the shuffle.  The
    bitmap is ``ray.put`` once; each batch tests k bits per key.
    Null-key rows are dropped (SQL: they never match)."""
    import ray

    bits = len(bloom) * 64
    bref = ray.put(bloom)
    keycol = on if isinstance(on, str) else on[0]
    if not isinstance(on, str) and len(on) != 1:
        raise ValueError("bloom_prefilter supports a single key column")

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[keycol]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if col.null_count:
            t = t.filter(pc.is_valid(col))
            col = t[keycol]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if t.num_rows == 0:
            return t
        bm = ray.get(bref)  # zero-copy from shared memory
        pos = _bloom_positions([str(x) for x in col.to_pylist()], bits, k)
        word = bm[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return t.filter(pa.array(hit.all(axis=1)))

    return left.map_batches(flt, batch_format="pyarrow")
