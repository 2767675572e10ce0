"""Behavioral / product analytics over an event log.

Two classic operators every event-warehouse pipeline runs, expressed
as narrow Ray Data exchanges whose every decision is exact-integer and
therefore SQL-replayable:

* :func:`cohort_retention` — the cohort retention triangle: of the
  users first seen active in time bucket *a*, how many were also
  active in bucket *a+δ*?  Plan: per-batch local distinct
  (user, bucket) → ONE grouped distinct (activity-sized narrow
  exchange of two int64s) → ONE range sort by user whose segmented
  all-pairs sweep is bounded by C(buckets-per-user, 2) rows per user
  (the timeline is short; the user set is what scales) → pair-keyed
  grouped count; cohort sizes are a buckets-bounded collect broadcast
  into the final map.  rate = retained / cohort is the only float.

* :func:`funnel_counts` — strict-order funnel conversion: per user,
  t₁ = min ts of step 1, t₂ = min ts of step 2 with ts > t₁, …  (the
  chained-min formulation, so SQL replays it with k−1 joins).  Plan:
  one grouped-min over the step-1 events, then per further step one
  user-keyed sort-merge join + grouped min — each exchange carries
  (user, int64 µs) only, never the event payload.  Equal-timestamp
  ties are immaterial by construction: the strict ``ts > t_prev``
  comparison is on the VALUE, so intra-timestamp order never matters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregates import sorted_groupby_agg
from .join import sort_merge_join

__all__ = ["cohort_retention", "event_pair_support", "funnel_counts"]


def _ts_us(t: pa.Table, ts_col: str) -> np.ndarray:
    ts = t[ts_col]
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    if pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.int64())
    return ts.to_numpy(zero_copy_only=False).astype(np.int64)


def cohort_retention(events, *, user_col: str = "user_id",
                     ts_col: str = "ts", bucket_s: int = 7 * 86400):
    """Cohort retention counts: rows (week, delta, retained, cohort,
    rate) for every bucket pair a < b with at least one common active
    user, where week = a, delta = b − a (in buckets), retained =
    |users active in both a and b|, cohort = |users active in a| and
    rate = retained / cohort (one IEEE division; rounding is the
    caller's concern).  Buckets are ``epoch_us // (bucket_s · 10⁶)``
    — exactly DuckDB's integer division, so membership is replayable.

    NOTE "cohort" here is activity-based (active in a), the
    retention-triangle convention; first-seen-cohort variants compose
    by filtering the pairs on a first-activity join.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    div = int(bucket_s) * 1_000_000

    uw_schema = pa.schema([("u", pa.int64()), ("w", pa.int64())])

    def local_uw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return uw_schema.empty_table()
        u = t[user_col]
        u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
        if u.null_count:
            raise ValueError("cohort_retention: NULL user key")
        un = u.to_numpy(zero_copy_only=False).astype(np.int64)
        w = _ts_us(t, ts_col) // div
        order = np.lexsort((w, un))
        us, ws = un[order], w[order]
        first = np.r_[True, (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])]
        return pa.table({"u": pa.array(us[first]), "w": pa.array(ws[first])})

    uw = sorted_groupby_agg(
        events.map_batches(local_uw, batch_format="pyarrow"),
        ["u", "w"], [("w", "count", "_m")],
        in_schema=uw_schema).map_batches(
            lambda t: t.drop_columns(["_m"]), batch_format="pyarrow") \
        .materialize()

    # cohort sizes: buckets-bounded by contract -> collect + broadcast
    import ray

    sizes = sorted_groupby_agg(uw, ["w"], [("w", "count", "n")],
                               in_schema=uw_schema)
    sz: dict[int, int] = {}
    for b in sizes.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "w" not in b.column_names:
            continue
        for k, v in zip(b["w"].to_pylist(), b["n"].to_pylist()):
            sz[int(k)] = int(v)
    sz_ref = ray.put(sz)

    pair_schema = pa.schema([("week", pa.int64()), ("delta", pa.int64())])

    def user_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pair_schema.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        per_left = np.repeat(starts + lens, lens) \
            - np.arange(n, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return pair_schema.empty_table()
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(n, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        return pa.table({"week": pa.array(w[li]),
                         "delta": pa.array(w[ri] - w[li])})

    retained = sorted_groupby_agg(
        uw.sort("u").map_batches(user_pairs, batch_size=None,
                                 batch_format="pyarrow"),
        ["week", "delta"], [("week", "count", "retained")],
        in_schema=pair_schema)

    out_schema = pa.schema([
        ("week", pa.int64()), ("delta", pa.int64()),
        ("retained", pa.int64()), ("cohort", pa.int64()),
        ("rate", pa.float64())])

    def finish(t: pa.Table, _s=sz_ref) -> pa.Table:
        if t.num_rows == 0 or "week" not in t.column_names:
            return out_schema.empty_table()
        import ray as _ray

        szd = _ray.get(_s)
        wk = t["week"].to_numpy(zero_copy_only=False)
        r = t["retained"].to_numpy(zero_copy_only=False).astype(np.int64)
        co = np.array([szd[int(x)] for x in wk], dtype=np.int64)
        return pa.table({
            "week": t["week"], "delta": t["delta"],
            "retained": t["retained"], "cohort": pa.array(co),
            "rate": pa.array(r.astype(np.float64) / co.astype(np.float64)),
        })

    return retained.map_batches(finish, batch_format="pyarrow")


def funnel_counts(events, steps: list[str], *, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type"):
    """Strict-order funnel conversion counts: a pyarrow Table
    (step int64, event_type, users int64) where ``users`` at step k is
    the number of users with a chain ts₁ < ts₂ < … < ts_k through the
    given step types (each ts_j the EARLIEST qualifying event — the
    chained-min formulation SQL replays with k−1 joins).

    Each stage is a (user, int64 µs) dataset: stage 1 is a grouped
    min; stage k a user-keyed sort-merge join of the step-k events
    against the stage-k−1 table, a strict ``ts > t_prev`` filter, and
    a grouped min.  The result is k scalars — a driver-sized output —
    while every exchange stays user-bounded, never event-sized.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    import pyarrow.compute as pc

    ut_schema = pa.schema([("u", pa.int64()), ("t", pa.int64())])

    def proj(step_type: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return ut_schema.empty_table()
            m = pc.equal(t[type_col], step_type)
            t = t.filter(m)
            u = t[user_col]
            u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
            if u.null_count:
                raise ValueError("funnel_counts: NULL user key")
            return pa.table({
                "u": pa.array(u.to_numpy(
                    zero_copy_only=False).astype(np.int64)),
                "t": pa.array(_ts_us(t, ts_col)),
            })
        return f

    prev = sorted_groupby_agg(
        events.map_batches(proj(steps[0]), batch_format="pyarrow"),
        ["u"], [("t", "min", "t")], in_schema=ut_schema).materialize()
    counts = [prev.count()]

    for step_type in steps[1:]:
        ev = events.map_batches(proj(step_type), batch_format="pyarrow")
        joined = sort_merge_join(ev, prev, "u", suffix="_p",
                                 left_schema=ut_schema,
                                 right_schema=ut_schema)

        def strict_after(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "t" not in t.column_names:
                return ut_schema.empty_table()
            keep = pc.greater(t["t"], t["t_p"])
            return t.filter(keep).select(["u", "t"])

        prev = sorted_groupby_agg(
            joined.map_batches(strict_after, batch_format="pyarrow"),
            ["u"], [("t", "min", "t")], in_schema=ut_schema).materialize()
        counts.append(prev.count())

    return pa.table({
        "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
        "event_type": pa.array(list(steps), pa.string()),
        "users": pa.array(np.asarray(counts, dtype=np.int64)),
    })


def event_pair_support(events, *, user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts"):
    """Sequential-pattern SUPPORT counts: rows (type_a, type_b, users)
    for every ORDERED type pair a ≠ b, where ``users`` is the number
    of distinct users with at least one *a* event STRICTLY before some
    *b* event — the length-2 sequential-pattern support every
    market-basket / clickstream miner starts from (Agrawal & Srikant,
    ICDE 1995's support counting, specialized to 2-sequences).

    The existence test is the min/max formulation:
    ``∃ (e_a, e_b): t_a < t_b  ⇔  min_ts(a) < max_ts(b)`` — so the
    whole operator reduces to per-(user, type) min/max timestamps.
    Strictness is on the int64 µs VALUE, so equal-timestamp ties never
    qualify and intra-timestamp ordering is immaterial.

    Plan: per-batch local (user, type, min, max) partials → ONE
    activity-sized grouped min/max of two int64s → ONE range sort by
    user whose segmented sweep emits both directions of every
    qualifying type pair (bounded by |types|·(|types|−1) rows per
    user; the type alphabet is small by contract, the user set is what
    scales) → ONE pair-keyed grouped count.  Each user contributes a
    given ordered pair at most once by construction, so the count IS
    the distinct-user support.  All-integer decisions; a DuckDB oracle
    replays it with one self-join over the grouped min/max CTE."""
    mm_schema = pa.schema([("u", pa.int64()), ("ty", pa.string()),
                           ("mn", pa.int64()), ("mx", pa.int64())])

    def local_mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mm_schema.empty_table()
        u = t[user_col]
        u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
        if u.null_count:
            raise ValueError("event_pair_support: NULL user key")
        ty = t[type_col]
        ty = ty.combine_chunks() if isinstance(ty, pa.ChunkedArray) else ty
        if ty.null_count:
            raise ValueError("event_pair_support: NULL event type")
        un = u.to_numpy(zero_copy_only=False).astype(np.int64)
        den = ty.dictionary_encode()
        codes = den.indices.to_numpy(zero_copy_only=False)
        ts = _ts_us(t, ts_col)
        order = np.lexsort((ts, codes, un))
        us, cs, tss = un[order], codes[order], ts[order]
        starts = np.flatnonzero(
            np.r_[True, (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])])
        ends = np.r_[starts[1:], len(us)] - 1
        return pa.table({
            "u": pa.array(us[starts]),
            "ty": den.dictionary.take(pa.array(cs[starts])),
            "mn": pa.array(tss[starts]),
            "mx": pa.array(tss[ends]),
        })

    mm = sorted_groupby_agg(
        events.map_batches(local_mm, batch_format="pyarrow"),
        ["u", "ty"], [("mn", "min", "mn"), ("mx", "max", "mx")],
        in_schema=mm_schema)

    pair_schema = pa.schema([("type_a", pa.string()),
                             ("type_b", pa.string())])

    def user_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pair_schema.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        mn = t["mn"].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = t["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t["ty"]
        ty = ty.combine_chunks() if isinstance(ty, pa.ChunkedArray) else ty
        order = np.lexsort((mn, u))
        u, s_mn, s_mx = u[order], mn[order], mx[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        per_left = np.repeat(starts + lens, lens) \
            - np.arange(n, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return pair_schema.empty_table()
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(n, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        # both directions of each within-user unordered pair, each
        # kept iff min(first) < max(second), strict on the µs value
        fwd = s_mn[li] < s_mx[ri]
        rev = s_mn[ri] < s_mx[li]
        a_idx = np.r_[li[fwd], ri[rev]]
        b_idx = np.r_[ri[fwd], li[rev]]
        tko = pa.array(order[a_idx])
        tkb = pa.array(order[b_idx])
        return pa.table({"type_a": ty.take(tko), "type_b": ty.take(tkb)})

    return sorted_groupby_agg(
        mm.sort("u").map_batches(user_sweep, batch_size=None,
                                 batch_format="pyarrow"),
        ["type_a", "type_b"], [("type_a", "count", "users")],
        in_schema=pair_schema)
