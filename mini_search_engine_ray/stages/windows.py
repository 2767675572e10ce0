"""Temporal / streaming-window operators over an event log.

The reference engine has no temporal operators; these are the
beyond-reference training-pipeline additions (windowed aggregates,
gap sessionization, as-of attribution join) over the `events` table
(event_id, ts, user_id, event_type, value).

Scale contracts (what each op ships through the object store):

- ``tumbling_window_agg`` / ``sliding_window_agg``: per-batch partial
  aggregation (lexsort + reduceat inside ``map_batches``), then ONE
  sorted reduceat reduction over the partials (``sorted_groupby_agg``
  — the partial stream is itself data-sized at 10^5 blocks) — the
  all-to-all exchange carries ONE row per (batch, window, key), never
  raw events. The sliding variant replicates the per-HOP partials
  (already collapsed), not the raw rows, so the replication factor
  ``width // hop`` multiplies partial rows only.

- ``sessionize`` / ``asof_join_latest``: ONE global range sort by
  (user, ts), then per-block vectorized sweeps over the materialized
  sorted blocks (``to_arrow_refs`` + one remote task per block — the
  same block-orchestration pattern as ``pipelines/pagerank.py``).
  A user's rows may straddle sorted-block boundaries, so each block
  also emits a TINY edge summary (<= 2 sessions / 3 scalars); a
  driver-side O(num_blocks) scan repairs the boundaries. Per-block
  summaries are the only driver-side data — the same cost class as
  shard manifests, never event-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def _col_np(t: pa.Table, name: str, dtype=None):
    col = t[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype(dtype) if dtype is not None else arr


def _ts_us(t: pa.Table, ts_col: str) -> np.ndarray:
    col = t[ts_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())  # epoch micros for timestamp[us]
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _agg_empty(key_col: str) -> pa.Table:
    return pa.table({
        "window_start_us": pa.array([], pa.int64()),
        key_col: pa.array([], pa.large_string()),
        "n": pa.array([], pa.int64()),
        "s": pa.array([], pa.float64()),
    })


def _bucket_partials(win: np.ndarray, keys: pa.Array, vals: np.ndarray,
                     key_col: str) -> pa.Table:
    """Collapse (window, key, value) rows to per-(window, key) partial
    (n, sum) via one lexsort + reduceat — no Python per row/group."""
    dct = keys.dictionary_encode()
    kidx = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((kidx, win))
    w, k, v = win[order], kidx[order], vals[order]
    brk = np.r_[True, (w[1:] != w[:-1]) | (k[1:] != k[:-1])]
    starts = np.flatnonzero(brk)
    n = np.diff(np.r_[starts, len(w)])
    s = np.add.reduceat(v, starts) if len(v) else np.array([], dtype=np.float64)
    return pa.table({
        "window_start_us": pa.array(w[starts]),
        key_col: pc.take(dct.dictionary, pa.array(k[starts])).cast(pa.large_string()),
        "n": pa.array(n.astype(np.int64)),
        "s": pa.array(s),
    })


def _combine_partials(partials_ds, key_col: str):
    """Combine per-batch (window, key, n, s) partials: one sorted
    reduceat reduction — at 100 TB the partial stream itself is
    data-sized (blocks x windows x keys), so the per-row-Python native
    groupby combine is avoided here too (stages/aggregates.py)."""
    from .aggregates import sorted_groupby_agg

    out = sorted_groupby_agg(
        partials_ds, ["window_start_us", key_col],
        [("n", "sum", "n_events"), ("s", "sum", "sum_value")],
    )

    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window_start_us" not in t.column_names:
            return pa.table({
                "window_start_us": pa.array([], pa.int64()),
                key_col: pa.array([], pa.large_string()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        return pa.table({
            "window_start_us": pc.cast(t["window_start_us"], pa.int64()),
            key_col: pc.cast(t[key_col], pa.large_string()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.cast(t["sum_value"], pa.float64()),
        })

    return out.map_batches(fix, batch_format="pyarrow")


def tumbling_window_agg(ds, *, width_s: float, ts_col: str = "ts",
                        key_col: str = "event_type", value_col: str = "value"):
    """Non-overlapping fixed windows: count + sum of `value_col` per
    (window_start, key). Returns (window_start_us, key, n_events,
    sum_value) — window_start_us = floor(ts / width) * width in epoch
    micros."""
    width_us = int(round(width_s * _US))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _agg_empty(key_col)
        tu = _ts_us(t, ts_col)
        win = (tu // width_us) * width_us
        keys = t[key_col].combine_chunks() if isinstance(t[key_col], pa.ChunkedArray) else t[key_col]
        vals = _col_np(t, value_col, np.float64)
        return _bucket_partials(win, keys, vals, key_col)

    return _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"), key_col
    )


def sliding_window_agg(ds, *, width_s: float, hop_s: float, ts_col: str = "ts",
                       key_col: str = "event_type", value_col: str = "value"):
    """Overlapping (hopping) windows: width must be a multiple of hop;
    every event belongs to exactly ``width // hop`` windows. The
    replication happens AFTER per-hop partial aggregation, so the
    factor multiplies collapsed partial rows, not raw events."""
    width_us = int(round(width_s * _US))
    hop_us = int(round(hop_s * _US))
    if width_us % hop_us != 0:
        raise ValueError("width_s must be a multiple of hop_s")
    m = width_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _agg_empty(key_col)
        tu = _ts_us(t, ts_col)
        hop_bucket = (tu // hop_us) * hop_us
        keys = t[key_col].combine_chunks() if isinstance(t[key_col], pa.ChunkedArray) else t[key_col]
        vals = _col_np(t, value_col, np.float64)
        p = _bucket_partials(hop_bucket, keys, vals, key_col)
        # replicate the COLLAPSED hop partials into the m windows that
        # contain each hop bucket: window_start = bucket - j*hop
        k = p.num_rows
        b = p["window_start_us"].to_numpy(zero_copy_only=False)
        j = np.tile(np.arange(m, dtype=np.int64) * hop_us, k)
        rep = np.repeat(np.arange(k), m)
        return pa.table({
            "window_start_us": pa.array(np.repeat(b, m) - j),
            key_col: pc.take(p[key_col].combine_chunks(), pa.array(rep)),
            "n": pc.take(p["n"].combine_chunks(), pa.array(rep)),
            "s": pc.take(p["s"].combine_chunks(), pa.array(rep)),
        })

    return _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"), key_col
    )


_SESS_SCHEMA = {
    "user_id": pa.int64(), "session_start_us": pa.int64(),
    "session_end_us": pa.int64(), "n_events": pa.int64(),
    "sum_value": pa.float64(),
}


def _sess_table(u, s, e, n, v) -> pa.Table:
    return pa.table({
        "user_id": pa.array(np.asarray(u, dtype=np.int64)),
        "session_start_us": pa.array(np.asarray(s, dtype=np.int64)),
        "session_end_us": pa.array(np.asarray(e, dtype=np.int64)),
        "n_events": pa.array(np.asarray(n, dtype=np.int64)),
        "sum_value": pa.array(np.asarray(v, dtype=np.float64)),
    })


def _sess_empty() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _SESS_SCHEMA.items()})


def sessionize(ds, *, gap_s: float, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value"):
    """Gap-based sessionization: a new session starts when the gap to
    the user's previous event EXCEEDS ``gap_s``. Returns one row per
    session: (user_id, session_start_us, session_end_us, n_events,
    sum_value).

    One global sort by (user, ts); per-block vectorized session sweep
    (remote task per sorted block); each block's FIRST and LAST
    sessions may continue across block boundaries, so they are emitted
    as edge summaries and stitched in an O(num_blocks) driver scan
    (handles a single user spanning arbitrarily many blocks)."""
    import ray
    import ray.data as rd

    gap_us = int(round(gap_s * _US))
    sorted_ds = (
        ds.select_columns([user_col, ts_col, value_col])
        .sort([user_col, ts_col])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def block_sessions(t: pa.Table):
        if t.num_rows == 0:
            return _sess_empty(), _sess_empty()
        u = _col_np(t, user_col, np.int64)
        tu = _ts_us(t, ts_col)
        v = _col_np(t, value_col, np.float64)
        brk = np.r_[True, (u[1:] != u[:-1]) | (tu[1:] - tu[:-1] > gap_us)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(u)]
        su, ss = u[starts], tu[starts]
        se = tu[ends - 1]
        sn = ends - starts
        sv = np.add.reduceat(v, starts)
        k = len(starts)
        interior = (_sess_table(su[1:k - 1], ss[1:k - 1], se[1:k - 1],
                                sn[1:k - 1], sv[1:k - 1])
                    if k > 2 else _sess_empty())
        edge_idx = [0] if k == 1 else [0, k - 1]
        edges = _sess_table(su[edge_idx], ss[edge_idx], se[edge_idx],
                            sn[edge_idx], sv[edge_idx])
        return interior, edges

    interior_refs, edge_refs = [], []
    for r in refs:
        i_ref, e_ref = block_sessions.remote(r)
        interior_refs.append(i_ref)
        edge_refs.append(e_ref)
    edge_tables = ray.get(edge_refs)  # tiny: <= 2 rows per block

    # stitch block-edge sessions in block (= global sort) order
    completed: list[tuple] = []
    pending: tuple | None = None  # (user, start, end, n, sum)
    for et in edge_tables:
        rows = [tuple(et.slice(i, 1).to_pydict()[c][0] for c in et.column_names)
                for i in range(et.num_rows)]
        if not rows:
            continue
        first = rows[0]
        if (pending is not None and pending[0] == first[0]
                and first[1] - pending[2] <= gap_us):
            first = (pending[0], pending[1], first[2],
                     pending[3] + first[3], pending[4] + first[4])
            pending = None
        if pending is not None:
            completed.append(pending)
            pending = None
        if len(rows) == 1:
            pending = first  # whole block was one session: may continue
        else:
            completed.append(first)
            pending = rows[1]
    if pending is not None:
        completed.append(pending)
    edge_out = (_sess_table(*zip(*completed)) if completed else _sess_empty())

    out = rd.from_arrow_refs(interior_refs)
    return out.union(rd.from_arrow(edge_out))


def asof_join_latest(ds, *, left_type: str = "click", right_type: str = "view",
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type", id_col: str = "event_id"):
    """As-of attribution join: for every `left_type` event, the ts of
    the LATEST `right_type` event by the same user at-or-before it
    (inclusive — DuckDB ``ASOF JOIN ... ON l.user=r.user AND l.ts >=
    r.ts`` semantics). Returns (event_id, user_id, ts_us, view_ts_us)
    with view_ts_us = -1 when no prior right-event exists.

    One global sort by (user, ts, views-first); per-block segmented
    running-latest-view sweep (encoded cummax, fully vectorized); a
    3-scalar edge summary per block + O(num_blocks) driver scan
    computes each block's carry-in (the head user's latest view in all
    prior blocks, propagated across blocks the user spans)."""
    import ray
    import ray.data as rd

    def prune(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[type_col], value_set=pa.array([left_type, right_type]))
        t = t.filter(mask)
        tu = _ts_us(t, ts_col)
        is_right = pc.equal(t[type_col], right_type)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            user_col: pc.cast(t[user_col], pa.int64()),
            "ts_us": pa.array(tu),
            # views sort BEFORE clicks at equal (user, ts) so the
            # inclusive at-or-before contract holds
            "rk": pc.cast(pc.invert(is_right), pa.int8()),
        })

    sorted_ds = (
        ds.map_batches(prune, batch_format="pyarrow")
        .sort([user_col, "ts_us", "rk"])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summarize(t: pa.Table):
        if t.num_rows == 0:
            return None
        u = _col_np(t, user_col, np.int64)
        rk = _col_np(t, "rk", np.int8)
        tu = _col_np(t, "ts_us", np.int64)
        tail_mask = (u == u[-1]) & (rk == 0)
        tail_last_view = int(tu[tail_mask].max()) if tail_mask.any() else -1
        return (int(u[0]), int(u[-1]), tail_last_view)

    summaries = ray.get([summarize.remote(r) for r in refs])

    carry_in = []
    cur_user: int | None = None
    last_view = -1
    for s in summaries:
        if s is None:
            carry_in.append(-1)
            continue
        head_u, tail_u, tail_lv = s
        c = last_view if head_u == cur_user else -1
        carry_in.append(c)
        if tail_lv != -1:
            last_view = tail_lv
        elif tail_u == head_u:
            last_view = c  # tail user spans from prior blocks, no view here
        else:
            last_view = -1
        cur_user = tail_u

    @ray.remote
    def block_join(t: pa.Table, carry: int):
        empty = pa.table({
            id_col: pa.array([], pa.int64()), user_col: pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()), "view_ts_us": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        n = t.num_rows
        u = _col_np(t, user_col, np.int64)
        rk = _col_np(t, "rk", np.int8)
        tu = _col_np(t, "ts_us", np.int64)
        ids = _col_np(t, id_col, np.int64)
        ur = np.cumsum(np.r_[0, (u[1:] != u[:-1]).astype(np.int64)])
        is_view = rk == 0
        # segmented running-latest-view via encoded cummax: a previous
        # user's encoding is always < this user's minimum, so decoding
        # the segment id exposes stale carries
        enc = np.where(is_view, ur * np.int64(n + 1) + np.arange(n, dtype=np.int64),
                       np.int64(-1))
        cm = np.maximum.accumulate(enc)
        valid = (cm >= 0) & (cm // (n + 1) == ur)
        # clamp BEFORE the modulo: (-1) % (n+1) wraps to n (OOB)
        view_ts = np.where(valid, tu[np.maximum(cm, 0) % (n + 1)], np.int64(-1))
        if carry != -1:  # head user's latest view from prior blocks
            view_ts = np.where((ur == 0) & ~valid, np.int64(carry), view_ts)
        keep = ~is_view
        return pa.table({
            id_col: pa.array(ids[keep]), user_col: pa.array(u[keep]),
            "ts_us": pa.array(tu[keep]), "view_ts_us": pa.array(view_ts[keep]),
        })

    out_refs = [block_join.remote(r, c) for r, c in zip(refs, carry_in)]
    return rd.from_arrow_refs(out_refs)


def funnel_depths(ds, steps, *, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered funnel analysis (view -> click -> purchase): per user,
    the greedy-earliest completion — t1 = min ts of step 1, then
    t_i = min ts of step i STRICTLY after t_{i-1} — and the reached
    ``depth`` (1-based count of completed steps) with the completing
    step's timestamp.  Users who never hit step 1 emit nothing.

    Scale shape: k = len(steps) chained passes, each a type-filtered
    grouped MIN (one user-keyed reduction over only that step's
    events) sort-merge-joined against the previous step's user->t map
    (user-sized, never event-sized); the depth/timestamp pair is
    assembled with ONE encoded grouped max (depth*2^52 + t_us — valid
    through ~2112 and depth <= 2047), so the final exchange is
    user-sized too.  No per-row Python anywhere.

    Returns (user_col, depth:int64, last_ts_us:int64)."""
    from .aggregates import sorted_groupby_agg
    from .join import sort_merge_join

    if not steps:
        raise ValueError("steps must be non-empty")
    if len(steps) > 2000:
        raise ValueError("depth encoding supports at most 2000 steps")
    shift = np.int64(1) << 52

    def step_rows(step, prev):
        """(user, us) rows of `step`-type events; with a prev map,
        joined and filtered to strictly-later-than-prev."""
        def pick(t: pa.Table) -> pa.Table:
            empty = pa.table({user_col: pa.array([], pa.int64()),
                              "us": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            tc = t[type_col]
            if isinstance(tc, pa.ChunkedArray):
                tc = tc.combine_chunks()
            m = pc.equal(tc, step).to_numpy(zero_copy_only=False)
            if not m.any():
                return empty
            us = _ts_us(t, ts_col)[m]
            users = t[user_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)[m]
            return pa.table({user_col: pa.array(users),
                             "us": pa.array(us)})

        rows = ds.map_batches(pick, batch_format="pyarrow")
        if prev is None:
            return rows
        joined = sort_merge_join(
            rows, prev, on=user_col, how="inner",
            left_schema=pa.schema([(user_col, pa.int64()),
                                   ("us", pa.int64())]),
            right_schema=pa.schema([(user_col, pa.int64()),
                                    ("t", pa.int64())]))

        def later(t: pa.Table) -> pa.Table:
            empty = pa.table({user_col: pa.array([], pa.int64()),
                              "us": pa.array([], pa.int64())})
            if t.num_rows == 0 or "us" not in t.column_names:
                return empty
            keep = pc.greater(t["us"], t["t"])
            return t.filter(keep).select([user_col, "us"])

        return joined.map_batches(later, batch_size=None,
                                  batch_format="pyarrow")

    tagged = []
    prev = None
    for i, step in enumerate(steps):
        stage = sorted_groupby_agg(
            step_rows(step, prev), [user_col], [("us", "min", "t")],
            in_schema=pa.schema([(user_col, pa.int64()),
                                 ("us", pa.int64())]))
        prev = stage

        def tag(t: pa.Table, _d=np.int64(i + 1)) -> pa.Table:
            if t.num_rows == 0 or "t" not in t.column_names:
                return pa.table({user_col: pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            tv = t["t"].to_numpy(zero_copy_only=False)
            return pa.table({user_col: t[user_col],
                             "v": pa.array(_d * shift + tv)})

        tagged.append(stage.map_batches(tag, batch_size=None,
                                        batch_format="pyarrow"))

    allrows = tagged[0]
    for extra in tagged[1:]:
        allrows = allrows.union(extra)
    best = sorted_groupby_agg(
        allrows, [user_col], [("v", "max", "v")],
        in_schema=pa.schema([(user_col, pa.int64()),
                             ("v", pa.int64())]))

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "v" not in t.column_names:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "depth": pa.array([], pa.int64()),
                             "last_ts_us": pa.array([], pa.int64())})
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({user_col: t[user_col],
                         "depth": pa.array(v >> 52),
                         "last_ts_us": pa.array(v & (shift - 1))})

    return best.map_batches(decode, batch_size=None,
                            batch_format="pyarrow")


def gapfill_counts(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   bucket_s: int = 86400):
    """Time-series DENSIFICATION: per key, one row per bucket in the
    key's [first-active, last-active] range with the activity count —
    zeros where the key was silent — the gap-fill every
    dashboard/forecasting pipeline runs before a rolling model (SQL's
    ``generate_series`` LEFT JOIN idiom).  Buckets are exact int64
    ``epoch_us // (bucket_s · 10⁶)``, all decisions integer.

    Plan: per-batch (key, bucket, cnt) partials → ONE activity-sized
    grouped sum → ONE range sort by key (equal-keys-one-block) whose
    per-block sweep emits each key's full bucket grid via a segmented
    arange and places the observed counts with one searchsorted —
    pure row-expanding, no further exchange.  Output is grid-sized
    (keys × per-key span): the scale contract is that the time span
    is bounded (buckets, not events, is the expanding dimension).
    Returns (key_col, bucket, cnt)."""
    from .aggregates import sorted_groupby_agg

    if not (isinstance(bucket_s, int) and bucket_s > 0):
        raise ValueError(f"bucket_s must be a positive int, got {bucket_s!r}")
    div = bucket_s * 1_000_000

    part_schema = pa.schema([(key_col, pa.int64()), ("bucket", pa.int64()),
                             ("cnt", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        k = t[key_col]
        k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        if k.null_count:
            raise ValueError("gapfill_counts: NULL key")
        kn = k.to_numpy(zero_copy_only=False).astype(np.int64)
        w = _ts_us(t, ts_col) // div
        order = np.lexsort((w, kn))
        ks, ws = kn[order], w[order]
        starts = np.flatnonzero(
            np.r_[True, (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])])
        cnt = np.diff(np.r_[starts, len(ks)]).astype(np.int64)
        return pa.table({key_col: pa.array(ks[starts]),
                         "bucket": pa.array(ws[starts]),
                         "cnt": pa.array(cnt)})

    kb = sorted_groupby_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        [key_col, "bucket"], [("cnt", "sum", "cnt")],
        in_schema=part_schema)

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return part_schema.empty_table()
        k = _col_np(t, key_col).astype(np.int64)
        w = _col_np(t, "bucket").astype(np.int64)
        c = _col_np(t, "cnt").astype(np.int64)
        order = np.lexsort((w, k))
        k, w, c = k[order], w[order], c[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        lo, hi = w[starts], w[ends - 1]
        spans = hi - lo + 1
        # segmented arange: the dense grid, one np pass
        off = np.repeat(np.r_[0, np.cumsum(spans)[:-1]], spans)
        grid_w = np.arange(int(spans.sum()), dtype=np.int64) - off \
            + np.repeat(lo, spans)
        grid_k = np.repeat(k[starts], spans)
        # place observed counts: global position = key-segment offset
        # + (bucket - lo); observed rows are unique (key, bucket)
        seg_base = np.r_[0, np.cumsum(spans)[:-1]]
        pos = np.repeat(seg_base, ends - starts) + \
            (w - np.repeat(lo, ends - starts))
        out_c = np.zeros(int(spans.sum()), dtype=np.int64)
        out_c[pos] = c
        return pa.table({key_col: pa.array(grid_k),
                         "bucket": pa.array(grid_w),
                         "cnt": pa.array(out_c)})

    return kb.sort(key_col).map_batches(fill, batch_size=None,
                                        batch_format="pyarrow")
