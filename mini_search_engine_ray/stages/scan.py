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

from .windows import _col_np


def _key_breaks(keys: np.ndarray | None, n: int) -> np.ndarray:
    """Boolean mask: row starts a new key run (row 0 excluded)."""
    if keys is None or n < 2:
        return np.zeros(max(n - 1, 0), dtype=bool)
    return keys[1:] != keys[:-1]


_RUNNING_OPS = ("sum", "count", "min", "max")


def running_agg(ds, *, order_by: list[str] | str, op: str = "sum",
                value_col: str | None = None,
                key_col: str | None = None,
                out_col: str | None = None):
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
    sorted_ds = ds.sort(sort_cols).materialize()
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
        keys = _col_np(t, key_col) if key_col else None
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
            out = pa.array([], pa.int64() if as_int else pa.float64())
            return t.append_column(out_col, out)
        keys = _col_np(t, key_col) if key_col else None
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
                out_col: str = "running_sum"):
    """SQL ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` — see :func:`running_agg`."""
    return running_agg(ds, order_by=order_by, op="sum",
                       value_col=value_col, key_col=key_col,
                       out_col=out_col)


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
