"""Distributed prefix scan — running (cumulative) aggregates.

SQL's ``SUM(v) OVER (PARTITION BY k ORDER BY o ROWS UNBOUNDED
PRECEDING)`` is the missing Ray Data primitive behind a family of
pipeline operators: running per-user totals, cumulative token counts,
and token-budget sharding (pack documents into ~B-token training
shards by global cumulative position).  A prefix scan is inherently
sequential in its ORDER — but only at the level of BLOCK TOTALS:

1. ONE global range sort by ``(key, *order_by)``.
2. Per sorted block, a tiny summary task: the block's first/last key,
   the per-key totals of just those two edge keys, and the boundary
   order tuples (for the uniqueness check below).  Driver traffic is
   O(num_blocks) scalars — the shard-manifest cost class, never rows.
3. An O(num_blocks) driver scan threads the carry: block i's rows of
   its FIRST key start from the accumulated total of that key in
   blocks < i (a key's run is contiguous after the sort, so one
   scalar per block suffices, even when one key spans many blocks).
4. Per block, one vectorized apply task: segmented ``np.cumsum`` with
   resets at key breaks, plus the carry on the first key's rows.

Ties: a range sort gives no guarantee which side of a block boundary
equal-order rows land on, and SQL's ROWS frame is equally
order-dependent under ties — so the contract REQUIRES ``(key,
*order_by)`` to be unique per row.  That's the standard fix (order by
a unique id last), and this operator enforces it loudly: duplicate
adjacent sort tuples are detected inside the blocks and across block
boundaries, and raise instead of returning an order-dependent answer.

Sum dtype follows the value column: integer columns scan in int64
(exact, oracle-hashable); floats in float64 with sequential
left-to-right association — the same association a SQL engine's
running frame uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .windows import _col_np


def _key_breaks(keys: np.ndarray | None, n: int) -> np.ndarray:
    """Boolean mask: row starts a new key run (row 0 excluded)."""
    if keys is None or n < 2:
        return np.zeros(max(n - 1, 0), dtype=bool)
    return keys[1:] != keys[:-1]


def _keys_np(t: pa.Table, key_col: str) -> np.ndarray:
    """Partition-key column as numpy, REJECTING nulls loudly: every
    carry/break comparison in this module uses ``==``, and a null key
    surfaces as None/NaN where NaN != NaN — the running aggregate
    would silently restart at every row instead of forming SQL's
    single NULL partition.  Same contract style as
    ``sorted_groupby_agg``'s null-source check."""
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            f"scan partition key {key_col!r} contains NULLs; SQL forms "
            "one NULL partition but this operator's ==-based carry "
            "cannot — filter or fill the key first")
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "f" and np.isnan(arr).any():
        raise ValueError(
            f"scan partition key {key_col!r} contains NaN; NaN != NaN "
            "breaks the carry — filter or fill the key first")
    return arr



def _resolve_descending(descending, order_by, key_col):
    """Full per-column descending list for ds.sort: partition keys
    always ascend (grouping only needs contiguity), order_by columns
    follow the caller's SQL ASC/DESC."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    if len(descending) != len(order_by):
        raise ValueError("descending must match order_by length")
    return ([False] if key_col else []) + list(descending)


def _typed_empty(schema: pa.Schema, *extra: tuple) -> pa.Table:
    """Empty OUTPUT block carrying the full typed schema.  Ray's range
    sort forwards empty boundary blocks with NO columns (ray-project
    plan_udf_map_op TODO: "some all-to-all operators output empty
    blocks with no schema"), so ``t.append_column(out_col, ...)`` on
    such a block yields a 1-column table whose schema intermittently
    poisons the NEXT sort's ``unify_ref_bundles_schema`` validation —
    the daily_value_anomaly chained-rolling failure mode.  Build the
    empty from the sorted dataset's static schema plus the output
    column(s) instead, exactly like range_rolling_agg always did."""
    for name, typ in extra:
        schema = schema.append(pa.field(name, typ))
    return schema.empty_table()


_RUNNING_OPS = ("sum", "count", "min", "max")


def running_agg(ds, *, order_by: list[str] | str, op: str = "sum",
                value_col: str | None = None,
                key_col: str | None = None,
                out_col: str | None = None,
                descending: bool | list[bool] = False):
    """Append ``out_col`` = the running (cumulative) aggregate of
    ``value_col`` in ``order_by`` order, restarting per ``key_col``
    when given — SQL's ``<op>(v) OVER (PARTITION BY key ORDER BY
    order_by ROWS UNBOUNDED PRECEDING)``.  ``op`` is one of ``sum``,
    ``count`` (value_col-less: ROW_NUMBER), ``min``, ``max``; every
    op shares the same one-sort + O(num_blocks) carry-thread plan
    because each is an associative fold whose block partial is a
    single scalar per edge key.  ``(key_col, *order_by)`` must be
    unique per row (enforced).  Returns a Dataset of the sorted rows
    plus the scan column."""
    import ray
    import ray.data as rd

    if op not in _RUNNING_OPS:
        raise ValueError(f"op must be one of {_RUNNING_OPS}, got {op!r}")
    if op != "count" and value_col is None:
        raise ValueError(f"op={op!r} requires value_col")
    out_col = out_col or f"running_{op}"
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    sort_cols = ([key_col] if key_col else []) + order_by
    desc = _resolve_descending(descending, order_by, key_col)
    sorted_ds = ds.sort(sort_cols, descending=desc).materialize()
    refs = sorted_ds.to_arrow_refs()
    schema = sorted_ds.schema().base_schema
    as_int = op == "count" or \
        pa.types.is_integer(schema.field(value_col).type)
    dtype = np.int64 if as_int else np.float64
    reduce_fn = {"sum": np.sum, "count": len,
                 "min": np.min, "max": np.max}[op]
    combine = {"sum": lambda a, b: a + b, "count": lambda a, b: a + b,
               "min": min, "max": max}[op]

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, part_first, part_last, first_tuple,
        last_tuple) — the edge keys' fold partials only."""
        n = t.num_rows
        if n == 0:
            return None
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        if np.any(brk):
            first_end = int(np.flatnonzero(brk)[0]) + 1
            last_start = int(np.flatnonzero(brk)[-1]) + 1
        else:
            first_end, last_start = n, 0
        tup = lambda i: tuple(t[c][i].as_py() for c in sort_cols)
        # in-block uniqueness check on the full sort tuple
        dup = np.ones(n - 1, dtype=bool) if n > 1 else np.zeros(0, bool)
        for c in sort_cols:
            col = _col_np(t, c)
            dup &= col[1:] == col[:-1]
        if np.any(dup):
            i = int(np.flatnonzero(dup)[0])
            raise ValueError(
                f"running_agg requires unique {sort_cols} per row; "
                f"duplicate sort tuple {tup(i)!r} — add a unique "
                f"tiebreaker column to order_by")
        if op == "count":
            pf, pl = dtype(first_end), dtype(n - last_start)
        else:
            v = _col_np(t, value_col, dtype)
            pf = dtype(reduce_fn(v[:first_end]))
            pl = dtype(reduce_fn(v[last_start:]))
        return (keys[0] if keys is not None else None,
                keys[-1] if keys is not None else None,
                pf, pl, tup(0), tup(n - 1))

    summaries = ray.get([summarize.remote(r) for r in refs])

    # O(num_blocks) carry thread + cross-boundary uniqueness check.
    # carry=None means "no preceding rows of this block's first key"
    # — the fold identity, kept symbolic so min/max never touch a
    # float infinity (int64 stays exact).
    carries: list = []
    cur_key, acc = object(), None      # sentinel: matches no key
    prev_last_tuple = None
    for s in summaries:
        if s is None:
            carries.append(None)
            continue
        first_key, last_key, part_first, part_last, tfirst, tlast = s
        if prev_last_tuple is not None and tfirst == prev_last_tuple:
            raise ValueError(
                f"running_agg requires unique {sort_cols} per row; "
                f"duplicate sort tuple {tfirst!r} across sorted blocks")
        prev_last_tuple = tlast
        same_key = (key_col is None) or (first_key == cur_key)
        carry = acc if same_key else None
        carries.append(carry)
        if key_col is None or last_key == first_key:
            # single-key block: part_last folds the WHOLE block
            acc = combine(carry, part_last) if carry is not None \
                else part_last
        else:
            acc = part_last   # last key starts fresh inside this block
        if key_col is not None:
            cur_key = last_key
    carry_it = iter(carries)

    @ray.remote
    def apply(t: pa.Table, carry):
        n = t.num_rows
        if n == 0:
            return _typed_empty(
                schema, (out_col, pa.int64() if as_int else pa.float64()))
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        first_run = run_id == 0
        if op == "count":
            run_start = np.concatenate(([0], starts))[run_id]
            cs = np.arange(n, dtype=np.int64) - run_start + 1
        elif op == "sum":
            v = _col_np(t, value_col, dtype)
            cs = np.cumsum(v, dtype=dtype)
            if len(starts):
                # reset at key breaks: subtract the run's preceding total
                run_base = np.concatenate(([dtype(0)], cs[starts - 1]))
                cs = cs - run_base[run_id]
        else:
            v = _col_np(t, value_col, dtype)
            acc_fn = np.minimum if op == "min" else np.maximum
            if len(starts):
                import pandas as pd
                g = pd.Series(v).groupby(run_id)
                cs = (g.cummin() if op == "min" else g.cummax()) \
                    .to_numpy()
            else:
                cs = acc_fn.accumulate(v)
        if carry is not None:
            if op in ("sum", "count"):
                cs = cs + np.where(first_run, dtype(carry), dtype(0))
            else:
                acc_fn = np.minimum if op == "min" else np.maximum
                cs = np.where(first_run, acc_fn(cs, dtype(carry)), cs)
        return t.append_column(out_col, pa.array(cs))

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)


def running_sum(ds, *, value_col: str, order_by: list[str] | str,
                key_col: str | None = None,
                out_col: str = "running_sum",
                descending: bool | list[bool] = False):
    """SQL ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` — see :func:`running_agg`."""
    return running_agg(ds, order_by=order_by, op="sum",
                       value_col=value_col, key_col=key_col,
                       out_col=out_col, descending=descending)


def row_number(ds, *, order_by: list[str] | str,
               key_col: str | None = None,
               out_col: str = "row_number"):
    """SQL ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...)`` —
    the running count, well-defined because :func:`running_agg`
    enforces a unique sort tuple per row."""
    return running_agg(ds, order_by=order_by, op="count",
                       key_col=key_col, out_col=out_col)


def token_budget_shards(docs_ds, *, budget: int, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Pack documents into ~``budget``-token training shards by global
    cumulative position in ``id_col`` order: ``shard_id =
    exclusive_prefix_sum(n_tokens) // budget`` — the deterministic
    sequence-sharding step before tokenized-dataset writing.  Returns
    ``(id_col, n_tokens, shard_id)``.  One token-count map + one
    prefix scan; no driver materialization."""
    from functools import partial

    from .textstats import _split_tokens

    if not (isinstance(budget, int) and budget >= 1):
        raise ValueError(f"budget must be a positive int, got {budget!r}")

    def count(t: pa.Table) -> pa.Table:
        content = t[text_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        parents, _ = _split_tokens(content)
        n = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        ids = t[id_col]
        return pa.table({id_col: ids, "n_tokens": pa.array(n)})

    counted = docs_ds.map_batches(count, batch_format="pyarrow")
    scanned = running_sum(counted, value_col="n_tokens",
                          order_by=[id_col], out_col="cum_tokens")

    def shard(t: pa.Table) -> pa.Table:
        cum = _col_np(t, "cum_tokens", np.int64)
        ntok = _col_np(t, "n_tokens", np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "shard_id": pa.array((cum - ntok) // budget),
        })

    return scanned.map_batches(shard, batch_format="pyarrow")


# ---------------------------------------------------------------------
# Bounded-frame windows: rolling aggregates, lag/lead
# ---------------------------------------------------------------------
#
# SQL's ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW (and LAG/LEAD k)
# share the prefix scan's distribution shape with ONE difference: a
# bounded frame needs at most the w-1 (or k) rows immediately before
# (after) each block boundary, never a fold over the whole prefix.  So
# the driver threads a ROW carry — tail(carry ++ block_tail, w-1) —
# instead of a scalar carry: O(num_blocks * w) driver bytes, fine for
# the frame lengths these clauses are used with.  Everything else is
# identical: one range sort, the unique-(key, *order_by) contract
# (bounded frames are as order-dependent under ties as running ones,
# enforced in-block and across boundaries), and one vectorized apply
# per block.


def _edge_check_tuples(t: pa.Table, sort_cols: list[str], op_name: str):
    """(first_tuple, last_tuple) of the block's sort key, raising on a
    duplicate adjacent sort tuple (the uniqueness contract every
    order-dependent window op shares)."""
    n = t.num_rows
    tup = lambda i: tuple(t[c][i].as_py() for c in sort_cols)
    dup = np.ones(n - 1, dtype=bool) if n > 1 else np.zeros(0, bool)
    for c in sort_cols:
        col = _col_np(t, c)
        dup &= col[1:] == col[:-1]
    if np.any(dup):
        i = int(np.flatnonzero(dup)[0])
        raise ValueError(
            f"{op_name} requires unique {sort_cols} per row; duplicate "
            f"sort tuple {tup(i)!r} — add a unique tiebreaker column "
            f"to order_by")
    return tup(0), tup(n - 1)


_ROLLING_OPS = ("sum", "count", "min", "max", "avg")


def rolling_agg(ds, *, order_by: list[str] | str, window: int,
                op: str = "sum", value_col: str | None = None,
                key_col: str | None = None, out_col: str | None = None,
                descending: bool | list[bool] = False):
    """Append ``out_col`` = SQL's ``<op>(v) OVER (PARTITION BY key
    ORDER BY order_by ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``.  ``op`` in {sum, count, avg, min, max}; sum/count are
    int64-exact on integer columns, ``avg`` is float64 (SQL AVG), and
    min/max preserve the input dtype exactly (the full-window part
    uses the classic chunked prefix/suffix two-array trick — O(rows),
    no per-row Python — and the run-clamped part a segmented
    cummin/cummax, composed by frame width).  ``(key, *order_by)``
    must be unique per row (enforced in-block and across sorted block
    boundaries).  Returns the sorted rows plus the window column."""
    import ray
    import ray.data as rd

    if op not in _ROLLING_OPS:
        raise ValueError(f"op must be one of {_ROLLING_OPS}, got {op!r}")
    if op != "count" and value_col is None:
        raise ValueError(f"op={op!r} requires value_col")
    if not (isinstance(window, int) and window >= 1):
        raise ValueError(f"window must be a positive int, got {window!r}")
    out_col = out_col or f"rolling_{op}"
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    sort_cols = ([key_col] if key_col else []) + order_by
    desc = _resolve_descending(descending, order_by, key_col)
    sorted_ds = ds.sort(sort_cols, descending=desc).materialize()
    refs = sorted_ds.to_arrow_refs()
    schema = sorted_ds.schema().base_schema
    as_int = op == "count" or (
        op != "avg" and pa.types.is_integer(schema.field(value_col).type))
    dtype = np.int64 if as_int else np.float64
    out_type = pa.int64() if as_int else pa.float64()
    carry_n = window - 1
    need_vals = op != "count"

    @ray.remote
    def summarize(t: pa.Table):
        """(first_tuple, last_tuple, tail_keys, tail_vals, n) — the
        last min(window-1, n) rows' keys/values plus the boundary
        tuples for the uniqueness check."""
        n = t.num_rows
        if n == 0:
            return None
        tfirst, tlast = _edge_check_tuples(t, sort_cols, "rolling_agg")
        lo = max(n - carry_n, 0)
        tk = _keys_np(t, key_col)[lo:] if key_col else None
        tv = _col_np(t, value_col, dtype)[lo:] if need_vals else None
        return (tfirst, tlast, tk, tv, n)

    summaries = ray.get([summarize.remote(r) for r in refs])

    # Thread the row carry: carry_i = tail(carry ++ block_tail, w-1).
    carries: list[tuple] = []
    ck = np.empty(0, dtype=object) if key_col else None
    cv = np.empty(0, dtype=dtype) if need_vals else None
    clen = 0
    prev_last_tuple = None
    for s in summaries:
        if s is None:
            carries.append((ck, cv, clen))
            continue
        tfirst, tlast, tk, tv, nblk = s
        if prev_last_tuple is not None and tfirst == prev_last_tuple:
            raise ValueError(
                f"rolling_agg requires unique {sort_cols} per row; "
                f"duplicate sort tuple {tfirst!r} across sorted blocks")
        prev_last_tuple = tlast
        carries.append((ck, cv, clen))
        if carry_n:
            if key_col:
                ck = np.concatenate([ck, tk.astype(object)])[-carry_n:]
            if need_vals:
                cv = np.concatenate([cv, tv])[-carry_n:]
            clen = min(clen + nblk, carry_n)
    carry_it = iter(carries)

    def _seg_cumsum(v: np.ndarray, starts: np.ndarray,
                    run_id: np.ndarray) -> np.ndarray:
        cs = np.cumsum(v, dtype=v.dtype)
        if len(starts):
            base = np.concatenate(([v.dtype.type(0)], cs[starts - 1]))
            cs = cs - base[run_id]
        return cs

    @ray.remote
    def apply(t: pa.Table, carry):
        carry_keys, carry_vals, c = carry
        n = t.num_rows
        if n == 0:
            return _typed_empty(schema, (out_col, out_type))
        if key_col:
            keys = _keys_np(t, key_col)
            allk = np.concatenate([carry_keys, keys.astype(object)]) \
                if c else keys
        else:
            allk = None
        if need_vals:
            v = _col_np(t, value_col, dtype)
            allv = np.concatenate([carry_vals, v]) if c else v
        N = c + n
        brk = _key_breaks(allk, N)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(N, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        run_start = np.concatenate(([0], starts))[run_id]
        pos = np.arange(N, dtype=np.int64) - run_start
        if op == "count":
            out = np.minimum(pos + 1, window)
        elif op in ("sum", "avg"):
            cs = _seg_cumsum(allv, starts, run_id)
            idx = np.arange(N, dtype=np.int64) - window
            prev = np.where(pos >= window, cs[np.maximum(idx, 0)],
                            dtype(0))
            s = cs - prev
            out = s if op == "sum" else \
                s.astype(np.float64) / np.minimum(pos + 1, window)
        else:
            import pandas as pd

            g = pd.Series(allv).groupby(run_id)
            clamped = (g.cummin() if op == "min" else g.cummax()) \
                .to_numpy()
            pad = (-N) % window
            padv = (np.iinfo(np.int64).max if as_int else np.inf) \
                if op == "min" else \
                (np.iinfo(np.int64).min if as_int else -np.inf)
            arr = np.concatenate([allv, np.full(pad, padv, dtype)]) \
                if pad else allv
            m = arr.reshape(-1, window)
            acc = np.minimum if op == "min" else np.maximum
            prefix = acc.accumulate(m, axis=1).ravel()[:N]
            suffix = acc.accumulate(m[:, ::-1], axis=1)[:, ::-1] \
                .ravel()[:N]
            i = np.arange(N, dtype=np.int64)
            fixed = acc(suffix[np.maximum(i - window + 1, 0)], prefix)
            out = np.where(pos <= window - 1, clamped, fixed)
        return t.append_column(out_col, pa.array(out[c:], out_type))

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)


def _shift_column(ds, *, value_col: str, order_by: list[str] | str,
                  key_col: str | None, offset: int, out_col: str,
                  op_name: str, descending: bool | list[bool] = False):
    """Shared LAG (offset>0 looks back) / LEAD (driven by op_name with
    a forward carry) core — see :func:`lag_column` / :func:`lead_column`."""
    import ray
    import ray.data as rd

    if not (isinstance(offset, int) and offset >= 1):
        raise ValueError(f"offset must be a positive int, got {offset!r}")
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    lead = op_name == "lead_column"
    sort_cols = ([key_col] if key_col else []) + order_by
    desc = _resolve_descending(descending, order_by, key_col)
    sorted_ds = ds.sort(sort_cols, descending=desc).materialize()
    refs = sorted_ds.to_arrow_refs()
    schema = sorted_ds.schema().base_schema
    val_type = schema.field(value_col).type

    @ray.remote
    def summarize(t: pa.Table):
        """Boundary tuples + the edge slice (head for LEAD, tail for
        LAG) of (keys, values): at most ``offset`` rows."""
        n = t.num_rows
        if n == 0:
            return None
        tfirst, tlast = _edge_check_tuples(t, sort_cols, op_name)
        sl = slice(0, min(offset, n)) if lead else \
            slice(max(n - offset, 0), n)
        ek = _keys_np(t, key_col)[sl].astype(object) if key_col else None
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        ev = col.slice(sl.start, sl.stop - sl.start)
        return (tfirst, tlast, ek, ev, n)

    summaries = ray.get([summarize.remote(r) for r in refs])
    # cross-boundary uniqueness check in forward order
    prev_last = None
    for s in summaries:
        if s is None:
            continue
        if prev_last is not None and s[0] == prev_last:
            raise ValueError(
                f"{op_name} requires unique {sort_cols} per row; "
                f"duplicate sort tuple {s[0]!r} across sorted blocks")
        prev_last = s[1]

    empty_k = np.empty(0, dtype=object) if key_col else None
    empty_v = pa.array([], val_type)
    carries: list[tuple] = []
    ck, cv = empty_k, empty_v
    it = reversed(summaries) if lead else iter(summaries)
    for s in it:
        carries.append((ck, cv))
        if s is None:
            continue
        _, _, ek, ev, _ = s
        if lead:
            # carry = head(block_head ++ carry, offset)
            if key_col:
                ck = np.concatenate([ek, ck])[:offset]
            cv = pa.concat_arrays([ev, cv])[:offset]
        else:
            if key_col:
                ck = np.concatenate([ck, ek])[-offset:]
            cv = pa.concat_arrays([cv, ev])[-offset:]
    if lead:
        carries.reverse()
    carry_it = iter(carries)

    @ray.remote
    def apply(t: pa.Table, carry):
        carry_keys, carry_vals, = carry
        n = t.num_rows
        if n == 0:
            return _typed_empty(schema, (out_col, val_type))
        c = len(carry_vals)
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        if lead:
            allv = pa.concat_arrays([col, carry_vals])
            src = np.arange(n, dtype=np.int64) + offset
            valid = src < n + c
        else:
            allv = pa.concat_arrays([carry_vals, col])
            src = np.arange(c, c + n, dtype=np.int64) - offset
            valid = src >= 0
        if key_col:
            keys = _keys_np(t, key_col).astype(object)
            allk = np.concatenate([keys, carry_keys]) if lead \
                else np.concatenate([carry_keys, keys])
            here = np.arange(n) if lead else np.arange(c, c + n)
            valid &= allk[np.clip(src, 0, len(allk) - 1)] == allk[here]
        idx = pa.array(np.clip(src, 0, len(allv) - 1), pa.int64(),
                       mask=~valid)
        return t.append_column(out_col, allv.take(idx))

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)


def lag_column(ds, *, value_col: str, order_by: list[str] | str,
               key_col: str | None = None, offset: int = 1,
               out_col: str | None = None,
               descending: bool | list[bool] = False):
    """Append SQL's ``LAG(value, offset) OVER (PARTITION BY key ORDER
    BY order_by)`` (NULL where no such row).  Type-generic — the
    shifted column is built by one Arrow ``take`` with null indices,
    so strings/timestamps shift as exactly as ints.  One range sort;
    the driver threads an O(offset)-row carry per block; ``(key,
    *order_by)`` must be unique per row (enforced)."""
    return _shift_column(ds, value_col=value_col, order_by=order_by,
                         key_col=key_col, offset=offset,
                         out_col=out_col or f"lag_{value_col}",
                         op_name="lag_column", descending=descending)


def lead_column(ds, *, value_col: str, order_by: list[str] | str,
                key_col: str | None = None, offset: int = 1,
                out_col: str | None = None,
                descending: bool | list[bool] = False):
    """Append SQL's ``LEAD(value, offset) OVER (PARTITION BY key ORDER
    BY order_by)`` — :func:`lag_column` with a forward row carry."""
    return _shift_column(ds, value_col=value_col, order_by=order_by,
                         key_col=key_col, offset=offset,
                         out_col=out_col or f"lead_{value_col}",
                         op_name="lead_column", descending=descending)


def ntile_ids(r0: np.ndarray, n, k: int) -> np.ndarray:
    """SQL NTILE's big-tiles-first closed form, 1-based: over ``n``
    rows (scalar or per-row array — a scalar broadcasts) the first
    ``n % k`` tiles hold ``n//k + 1`` rows.  ``r0`` is the 0-based
    rank within the frame.  Shared by the global operator below and
    the keyed composition (row_number + counts + join)."""
    s, rem = np.divmod(np.asarray(n, dtype=np.int64), k)
    big = rem * (s + 1)
    small = np.maximum(s, 1)  # s==0 (n<k): every row takes the first
    tl = np.where(r0 < big, r0 // (s + 1), rem + (r0 - big) // small)
    return (tl + 1).astype(np.int64)


def ntile(ds, *, k: int, order_by: list[str] | str,
          out_col: str = "ntile"):
    """SQL ``NTILE(k) OVER (ORDER BY ...)`` — global frames: big tiles
    first (the first n%k tiles hold n//k+1 rows), 1-based tile ids.
    Built on :func:`row_number` (same one-sort + O(num_blocks) carry
    plan, same unique-sort-tuple contract); the total row count comes
    from the materialized blocks' metadata, then the tile id is one
    closed-form vectorized map (:func:`ntile_ids`).  A keyed NTILE
    composes row_number with per-key counts via a join instead."""
    if not (isinstance(k, int) and k >= 1):
        raise ValueError(f"k must be a positive int, got {k!r}")
    rn = row_number(ds, order_by=order_by, out_col="_rn")
    n = rn.count()

    def tile(t: pa.Table) -> pa.Table:
        r0 = _col_np(t, "_rn", np.int64) - 1
        return t.drop_columns(["_rn"]) \
            .append_column(out_col, pa.array(ntile_ids(r0, n, k)))

    return rn.map_batches(tile, batch_format="pyarrow")


def add_ranks(ds, *, order_by: list[str] | str,
              descending: bool | list[bool] = False,
              rank_col: str = "rank", dense_col: str = "dense_rank",
              pct_col: str = "percent_rank"):
    """Append SQL's tie-aware GLOBAL rank family — ``RANK()``,
    ``DENSE_RANK()`` and ``PERCENT_RANK()`` ``OVER (ORDER BY ...)``.
    Unlike the running/bounded frames, ties are the POINT here (equal
    order tuples share a rank), so there is no uniqueness contract:
    the result is deterministic for any tie order.  One range sort;
    the driver threads THREE scalars per block (row offset, the rank
    at the last value-run's start, the dense rank so far) because a
    run spanning blocks inherits the rank fixed at its first row; one
    vectorized run-break apply per block.  ``percent_rank`` =
    (rank-1)/(N-1), 0.0 when N==1 (SQL).  ``descending`` mirrors SQL's
    per-column ASC/DESC (rank-by-score-descending is the common
    curation direction) — the carry thread only needs CONTIGUOUS equal
    runs, which any consistent sort direction gives, so nothing else
    changes.  A PARTITION BY variant composes this with per-key totals
    via a join."""
    import ray
    import ray.data as rd

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    if len(descending) != len(order_by):
        raise ValueError("descending must match order_by length")
    sorted_ds = ds.sort(order_by, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    def _breaks(t: pa.Table) -> np.ndarray:
        n = t.num_rows
        brk = np.zeros(max(n - 1, 0), dtype=bool)
        for c in order_by:
            v = _col_np(t, c)
            brk |= v[1:] != v[:-1]
        return brk

    @ray.remote
    def summarize(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        brk = _breaks(t)
        starts = np.flatnonzero(brk) + 1
        tup = lambda i: tuple(t[c][i].as_py() for c in order_by)
        last_run_start = int(starts[-1]) if len(starts) else 0
        return (tup(0), tup(n - 1), n, len(starts) + 1, last_run_start)

    summaries = ray.get([summarize.remote(r) for r in refs])

    # thread (offset, continuation rank, dense base) — O(blocks) scalars
    carries: list[tuple] = []
    offset = 0               # rows before this block
    prev_last = None         # last order tuple seen
    last_rank = 0            # rank at the last run's start (1-based)
    dense_so_far = 0         # dense rank of the last run
    total = 0
    for s in summaries:
        if s is None:
            carries.append((offset, None, dense_so_far))
            continue
        tfirst, tlast, n, n_runs, last_run_start = s
        cont = prev_last is not None and tfirst == prev_last
        carries.append((offset, last_rank if cont else None,
                        dense_so_far))
        dense_first = dense_so_far if cont else dense_so_far + 1
        dense_so_far = dense_first + (n_runs - 1)
        if n_runs == 1 and cont:
            pass  # the whole block continues the carried run
        else:
            last_rank = offset + last_run_start + 1
        offset += n
        prev_last = tlast
        total += n
    carry_it = iter(carries)
    denom = float(total - 1) if total > 1 else 1.0
    base_schema = sorted_ds.schema().base_schema

    @ray.remote
    def apply(t: pa.Table, carry):
        off, cont_rank, dense_base = carry
        n = t.num_rows
        if n == 0:
            return _typed_empty(base_schema,
                                (rank_col, pa.int64()),
                                (dense_col, pa.int64()),
                                (pct_col, pa.float64()))
        brk = _breaks(t)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        run_start = np.concatenate(([0], starts))[run_id]
        rank = off + run_start + 1
        dense = dense_base + run_id + (0 if cont_rank is not None else 1)
        if cont_rank is not None:
            rank = np.where(run_id == 0, cont_rank, rank)
        pct = (rank - 1) / denom
        return t.append_column(rank_col, pa.array(rank.astype(np.int64))) \
            .append_column(dense_col, pa.array(dense.astype(np.int64))) \
            .append_column(pct_col, pa.array(pct))

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------
# Time-based (RANGE) rolling frame
# ---------------------------------------------------------------------


def range_rolling_agg(ds, *, key_col: str, ts_col: str, value_col: str,
                      window_s: float,
                      out_sum: str = "win_sum", out_cnt: str = "win_cnt"):
    """SQL's TIME-based window frame, exact at any window length:

        SUM(v), COUNT(v) OVER (PARTITION BY key ORDER BY ts
            RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)

    RANGE frames include ALL peer rows of the current timestamp, so
    every event at the same (key, ts) shares one frame value — the
    output is therefore one row per distinct ``(key, ts_us)`` with the
    frame's sum and count (callers needing per-event rows join back on
    the unique pair).  ``ts_col`` may be timestamp[us] or int64;
    ``window_s`` is seconds (scaled to integer microseconds).

    A ROWS carry (:func:`rolling_agg` threads the w-1 boundary rows)
    cannot bound a time frame — any number of rows may fall inside the
    trailing window — so the frame START is resolved the way a column
    store does it: against running prefix sums.

    Plan (exactly 2 shuffles, O(num_blocks) driver scalars):
      1. grouped reduction per (key, ts_us): ``_s = sum(v)``,
         ``_c = count`` (sort #1; blocks arrive key-ordered);
      2. carry-threaded sweep appends per-key running prefix sums
         ``(_cs, _cc)`` — the :func:`running_agg` idiom, two values
         per carry, no extra shuffle;
      3. every row re-emits itself as a DATA row (``_t = ts_us``) and
         a QUERY row (``_t = ts_us - window``), each carrying its own
         prefix sums; sort #2 over the union by (key, _t,
         query-before-data) and a segmented running-last-data sweep
         (the encoded-cummax idiom of ``asof_join_latest``) hands each
         query row the prefix sums of the last data row STRICTLY
         before its window start: ``win = own_prefix - lookup``
         (lookup = 0 when the window reaches past the key's history).
      Query-before-data at equal ``_t`` is what makes the lower bound
      INCLUSIVE: a data row AT ts - window is not subtracted.
    """
    import ray
    import ray.data as rd

    from .aggregates import sorted_groupby_agg
    from .windows import _ts_us

    if not window_s > 0:
        raise ValueError(f"window_s must be > 0, got {window_s!r}")
    win_us = int(round(window_s * 1_000_000))

    k_type = ds.schema().base_schema.field(key_col).type

    def prune(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "ts_us": pa.array(_ts_us(t, ts_col)),
            "_v": pc.cast(t[value_col], pa.float64()),
        })

    in_schema = pa.schema([(key_col, k_type), ("ts_us", pa.int64()),
                           ("_v", pa.float64())])
    grouped = sorted_groupby_agg(
        ds.map_batches(prune, batch_format="pyarrow"),
        [key_col, "ts_us"],
        [("_v", "sum", "_s"), ("_v", "count", "_c")],
        in_schema=in_schema)
    refs = grouped.materialize().to_arrow_refs()

    # ---- pass 2: per-key running prefix sums, 4-scalar summaries ----
    @ray.remote
    def summarize(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        keys = _keys_np(t, key_col)
        brk = _key_breaks(keys, n)
        if np.any(brk):
            first_end = int(np.flatnonzero(brk)[0]) + 1
            last_start = int(np.flatnonzero(brk)[-1]) + 1
        else:
            first_end, last_start = n, 0
        s = _col_np(t, "_s", np.float64)
        c = _col_np(t, "_c", np.int64)
        return (keys[0], keys[-1],
                float(s[:first_end].sum()), int(c[:first_end].sum()),
                float(s[last_start:].sum()), int(c[last_start:].sum()))

    summaries = ray.get([summarize.remote(r) for r in refs])
    carries: list = []
    cur_key, acc = object(), None       # acc = (cs, cc) of cur_key
    for sm in summaries:
        if sm is None:
            carries.append(None)
            continue
        first_key, last_key, sf, cf, sl, cl = sm
        carry = acc if first_key == cur_key else None
        carries.append(carry)
        if last_key == first_key:
            acc = (carry[0] + sl, carry[1] + cl) if carry is not None \
                else (sl, cl)
        else:
            acc = (sl, cl)
        cur_key = last_key
    carry_it = iter(carries)

    @ray.remote
    def cum_and_expand(t: pa.Table, carry):
        empty = pa.table({
            key_col: pa.array([], k_type), "_t": pa.array([], pa.int64()),
            "_rk": pa.array([], pa.int8()), "ts_us": pa.array([], pa.int64()),
            "_cs": pa.array([], pa.float64()), "_cc": pa.array([], pa.int64()),
        })
        n = t.num_rows
        if n == 0:
            return empty
        keys = _keys_np(t, key_col)
        brk = _key_breaks(keys, n)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        first_run = run_id == 0
        s = _col_np(t, "_s", np.float64)
        c = _col_np(t, "_c", np.int64)
        cs = np.cumsum(s)
        cc = np.cumsum(c)
        if len(starts):
            cs = cs - np.concatenate(([0.0], cs[starts - 1]))[run_id]
            cc = cc - np.concatenate(([np.int64(0)], cc[starts - 1]))[run_id]
        if carry is not None:
            cs = cs + np.where(first_run, carry[0], 0.0)
            cc = cc + np.where(first_run, np.int64(carry[1]), np.int64(0))
        ts = _col_np(t, "ts_us", np.int64)
        kc = t[key_col]
        kc = kc.combine_chunks() if isinstance(kc, pa.ChunkedArray) else kc
        both = pa.table({
            key_col: pa.concat_arrays([kc, kc]),
            "_t": pa.array(np.concatenate([ts, ts - win_us])),
            "_rk": pa.array(np.concatenate(
                [np.ones(n, np.int8), np.zeros(n, np.int8)])),
            "ts_us": pa.array(np.concatenate([ts, ts])),
            "_cs": pa.array(np.concatenate([cs, cs])),
            "_cc": pa.array(np.concatenate([cc, cc])),
        })
        return both

    union = rd.from_arrow_refs(
        [cum_and_expand.remote(r, next(carry_it)) for r in refs])
    sorted_u = union.sort([key_col, "_t", "_rk"]).materialize()
    urefs = sorted_u.to_arrow_refs()

    # ---- pass 3: strictly-before as-of lookup (value = prefix sums) --
    @ray.remote
    def summarize2(t: pa.Table):
        if t.num_rows == 0:
            return None
        keys = _keys_np(t, key_col)
        rk = _col_np(t, "_rk", np.int8)
        tail = (keys == keys[-1]) & (rk == 1)
        if tail.any():
            i = int(np.flatnonzero(tail)[-1])
            tail_val = (float(t["_cs"][i].as_py()),
                        int(t["_cc"][i].as_py()))
        else:
            tail_val = None
        return (keys[0], keys[-1], tail_val)

    summaries2 = ray.get([summarize2.remote(r) for r in urefs])
    carries2: list = []
    cur_key, last_val = object(), None
    for sm in summaries2:
        if sm is None:
            carries2.append(None)
            continue
        head_k, tail_k, tail_val = sm
        c = last_val if head_k == cur_key else None
        carries2.append(c)
        if tail_val is not None:
            last_val = tail_val
        elif tail_k == head_k:
            last_val = c
        else:
            last_val = None
        cur_key = tail_k
    carry2_it = iter(carries2)

    @ray.remote
    def resolve(t: pa.Table, carry):
        empty = pa.table({
            key_col: pa.array([], k_type), "ts_us": pa.array([], pa.int64()),
            out_sum: pa.array([], pa.float64()),
            out_cnt: pa.array([], pa.int64()),
        })
        n = t.num_rows
        if n == 0:
            return empty
        keys = _keys_np(t, key_col)
        rk = _col_np(t, "_rk", np.int8)
        cs = _col_np(t, "_cs", np.float64)
        cc = _col_np(t, "_cc", np.int64)
        ur = np.cumsum(np.r_[0, (keys[1:] != keys[:-1]).astype(np.int64)])
        is_data = rk == 1
        enc = np.where(is_data,
                       ur * np.int64(n + 1) + np.arange(n, dtype=np.int64),
                       np.int64(-1))
        cm = np.maximum.accumulate(enc)
        valid = (cm >= 0) & (cm // (n + 1) == ur)
        idx = np.maximum(cm, 0) % (n + 1)
        base_s = np.where(valid, cs[idx], 0.0)
        base_c = np.where(valid, cc[idx], np.int64(0))
        if carry is not None:
            head = (ur == 0) & ~valid
            base_s = np.where(head, carry[0], base_s)
            base_c = np.where(head, np.int64(carry[1]), base_c)
        q = ~is_data
        kc = t[key_col]
        kc = kc.combine_chunks() if isinstance(kc, pa.ChunkedArray) else kc
        return pa.table({
            key_col: kc.filter(pa.array(q)),
            "ts_us": pa.array(_col_np(t, "ts_us", np.int64)[q]),
            out_sum: pa.array((cs - base_s)[q]),
            out_cnt: pa.array((cc - base_c)[q]),
        })

    out_refs = [resolve.remote(r, next(carry2_it)) for r in urefs]
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------
# Exponential smoothing (EWMA) — a multiplicative-carry prefix scan
# ---------------------------------------------------------------------


def ewma_column(ds, *, value_col: str, order_by: list[str] | str,
                alpha: float, key_col: str | None = None,
                out_col: str = "ewma"):
    """Append ``out_col`` = the exponentially weighted moving average
    of ``value_col`` in ``order_by`` order, restarting per ``key_col``:

        y_1 = v_1;   y_i = alpha * v_i + (1 - alpha) * y_{i-1}

    (the ``adjust=False`` recurrence — the streaming/online form used
    for smoothed rates and anomaly baselines).  An EWMA is a prefix
    scan whose carry composes AFFINELY, not additively: a run of m
    rows maps an incoming state y_in to ``A*y_in + B`` with
    ``A = (1-alpha)^m`` and B the zero-start fold — so the same
    one-sort + O(num_blocks) carry-thread plan as :func:`running_agg`
    applies, with a (A, B) pair per block edge instead of a scalar
    sum.  In-block work is pandas' C ``groupby(...).ewm(adjust=False)``
    (bit-identical recurrence; no per-row Python even when runs are
    short), and an incoming carry c is applied to the first run as
    ``y'_i = y_i + (1-alpha)^i * (c - v_1)`` — exact because two
    solutions of the same linear recurrence differ by a geometric
    decay (underflow of the factor to 0.0 is the correct limit).

    ``(key_col, *order_by)`` must be unique per row (enforced in-block
    and across sorted block boundaries, as for every order-dependent
    scan here).  Returns the sorted rows plus the float64 scan column.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    sort_cols = ([key_col] if key_col else []) + order_by
    sorted_ds = ds.sort(sort_cols).materialize()
    refs = sorted_ds.to_arrow_refs()
    om = 1.0 - alpha

    @ray.remote
    def summarize(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        tfirst, tlast = _edge_check_tuples(t, sort_cols, "ewma_column")
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        last_start = int(np.flatnonzero(brk)[-1]) + 1 if np.any(brk) else 0
        v = _col_np(t, value_col, np.float64)[last_start:]
        m = len(v)
        fresh_end = float(pd.Series(v).ewm(alpha=alpha, adjust=False)
                          .mean().iloc[-1])
        a_pow = om ** m          # underflow to 0.0 is the exact limit
        return (keys[0] if keys is not None else None,
                keys[-1] if keys is not None else None,
                tfirst, tlast, a_pow, fresh_end - a_pow * float(v[0]),
                float(v[0]))

    summaries = ray.get([summarize.remote(r) for r in refs])

    carries: list = []
    cur_key, acc = object(), None
    prev_last_tuple = None
    for sm in summaries:
        if sm is None:
            carries.append(None)
            continue
        first_key, last_key, tfirst, tlast, a_l, b_l, v1_l = sm
        if prev_last_tuple is not None and tfirst == prev_last_tuple:
            raise ValueError(
                f"ewma_column requires unique {sort_cols} per row; "
                f"duplicate sort tuple {tfirst!r} across sorted blocks")
        prev_last_tuple = tlast
        same_key = (key_col is None) or (first_key == cur_key)
        carry = acc if same_key else None
        carries.append(carry)
        single_key = key_col is None or last_key == first_key
        start = carry if (single_key and carry is not None) else v1_l
        acc = b_l + a_l * start
        if key_col is not None:
            cur_key = last_key
    carry_it = iter(carries)
    base_schema = sorted_ds.schema().base_schema

    @ray.remote
    def apply(t: pa.Table, carry):
        n = t.num_rows
        if n == 0:
            return _typed_empty(base_schema, (out_col, pa.float64()))
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        v = _col_np(t, value_col, np.float64)
        y = pd.Series(v).groupby(run_id).ewm(alpha=alpha, adjust=False) \
            .mean().to_numpy()
        if carry is not None:
            # apply the carry BIT-IDENTICALLY to the sequential
            # recurrence: re-run pandas' ewm over [carry, v_0..v_m-1]
            # and drop the synthetic seed row — the geometric-decay
            # closed form (y + om**i * (carry - v0)) is mathematically
            # equal but rounds differently at the last ulp, which
            # flips a half-up 4dp gate when values sit exactly on a
            # decimal boundary (alpha = 1/4 over cent values lands
            # there structurally).  The carry STATE itself still
            # comes from the affine block chain (eps-level, see
            # docstring); this removes the second drift source.
            m = int(starts[0]) if len(starts) else n
            seeded = pd.Series(np.r_[carry, v[:m]]) \
                .ewm(alpha=alpha, adjust=False).mean().to_numpy()
            y[:m] = seeded[1:]
        return t.append_column(out_col, pa.array(y))

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)


def locf_fill(ds, *, value_col: str, order_by: list[str] | str,
              key_col: str | None = None, out_col: str | None = None,
              direction: str = "forward"):
    """Forward-fill (LOCF — last observation carried forward): append
    ``out_col`` = the most recent NON-NULL ``value_col`` at or before
    each row in ``order_by`` order, restarting per ``key_col`` — SQL's
    ``last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``.  The gap-repair primitive every
    time-series cleaning pass runs.

    Same plan as the rest of the scan family: ONE range sort, a
    per-block summary carrying each edge key's last observed value
    (one scalar per block), an O(num_blocks) driver carry thread, and
    a vectorized per-block apply (index-take fill — type-generic, so
    strings and timestamps fill as exactly as ints).  Rows before any
    observation stay NULL.  ``(key, *order_by)`` must be unique per
    row (enforced in-block and across block boundaries).

    ``direction="backward"`` gives NOCB (next observation carried
    backward — SQL ``first_value(v IGNORE NULLS) OVER (... ROWS
    BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)``): the identical
    plan over the DESCENDING sort, so every carry/uniqueness
    contract holds unchanged."""
    import ray
    import ray.data as rd

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if direction not in ("forward", "backward"):
        raise ValueError(
            f"direction must be 'forward' or 'backward', got {direction!r}")
    out_col = out_col or (f"locf_{value_col}" if direction == "forward"
                          else f"nocb_{value_col}")
    sort_cols = ([key_col] if key_col else []) + order_by
    desc = [direction == "backward"] * len(sort_cols)
    sorted_ds = ds.sort(sort_cols, descending=desc).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, last_valid_of_last_run | _NOVAL,
        first_tuple, last_tuple)."""
        n = t.num_rows
        if n == 0:
            return None
        tfirst, tlast = _edge_check_tuples(t, sort_cols, "locf_fill")
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        last_start = int(np.flatnonzero(brk)[-1]) + 1 if np.any(brk) \
            else 0
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid[last_start:])
        last_val = col[last_start + int(idx[-1])].as_py() if idx.size \
            else None
        has = bool(idx.size)
        return (keys[0] if keys is not None else None,
                keys[-1] if keys is not None else None,
                has, last_val, tfirst, tlast)

    summaries = ray.get([summarize.remote(r) for r in refs])

    carries: list = []
    cur_key, acc = object(), None     # acc: last observed value or None
    prev_last_tuple = None
    for s in summaries:
        if s is None:
            carries.append(None)
            continue
        first_key, last_key, has, last_val, tfirst, tlast = s
        if prev_last_tuple is not None and tfirst == prev_last_tuple:
            raise ValueError(
                f"locf_fill requires unique {sort_cols} per row; "
                f"duplicate sort tuple {tfirst!r} across sorted blocks")
        prev_last_tuple = tlast
        same_key = (key_col is None) or (first_key == cur_key)
        carries.append(acc if same_key else None)
        if has:
            acc = last_val
        elif key_col is not None and last_key != first_key:
            acc = None         # last key started fresh, saw no value
        elif not same_key:
            acc = None         # new single-key block with no value
        # else: same key, nothing observed — acc carries through
        if key_col is not None:
            cur_key = last_key
    carry_it = iter(carries)

    base_schema = sorted_ds.schema().base_schema
    val_type = base_schema.field(value_col).type

    @ray.remote
    def apply(t: pa.Table, carry):
        n = t.num_rows
        if n == 0:
            return _typed_empty(base_schema, (out_col, val_type))
        keys = _keys_np(t, key_col) if key_col else None
        brk = _key_breaks(keys, n)
        starts = np.flatnonzero(brk) + 1
        seg = np.zeros(n, dtype=np.int64)
        seg[starts] = 1
        run_id = np.cumsum(seg)
        run_start = np.concatenate(([0], starts))[run_id]
        col = t[value_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        pos = np.arange(n, dtype=np.int64)
        ff = np.maximum.accumulate(np.where(valid, pos, -1))
        ff = np.where(ff < run_start, -1, ff)   # never cross a key break
        filled = col.take(pa.array(ff, pa.int64(),
                                   mask=ff < 0))
        if carry is not None:
            need = (run_id == 0) & (ff < 0)
            if need.any():
                filled = pa.compute.if_else(
                    pa.array(need), pa.scalar(carry, val_type), filled)
        return t.append_column(out_col, filled)

    out_refs = [apply.remote(r, next(carry_it)) for r in refs]
    return rd.from_arrow_refs(out_refs)
