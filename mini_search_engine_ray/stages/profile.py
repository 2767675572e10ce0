"""Distributed table profiling — the data-engineering "describe" pass.

``profile_table`` reduces a Dataset to ONE summary row per column:
row count, null count, exact distinct count, and numeric/temporal
min/max — the profile every ingestion pipeline computes before
trusting a new 100 TB drop.  Everything is expressed as narrow
constant-width exchanges:

* **n / nulls / min / max** — one row PER COLUMN PER BATCH of
  partials (a few dozen bytes), combined by one tiny grouped
  sum/min/max.  Missing extrema travel as ±inf sentinels (the
  combiner never sees a null aggregate source) and surface as NULL.
* **exact distinct** — per-batch LOCAL distinct (column, md5-low-64
  hash) rows, one vocabulary-sized grouped distinct, one
  column-keyed count.  The hash is md5-low-64 of the value's
  canonical string (integers/epoch-µs format identically in numpy
  and DuckDB ``CAST(v AS VARCHAR)``; strings hash directly), so
  DuckDB ``count(DISTINCT md5_number_lower(...))`` replays the count
  exactly, collisions included.  SQL ``COUNT(DISTINCT)`` null
  semantics: nulls are dropped before hashing.
  Float columns report ``n_distinct`` = NULL — float-repr hashing is
  not replayable across engines, and the approximate scale path for
  high-cardinality profiling is the existing HLL operator
  (``stages/textstats.py: distinct_hll``).

Column typing of the output: ``min_v``/``max_v`` are DOUBLE (int64
and epoch-µs cast; both engines apply the same IEEE nearest rounding
above 2⁵³), NULL for string columns.  The scale contract for the
exact-distinct plane is the vocabulary of each profiled column —
bounded by design for id/enum/string-key columns; for genuinely
unbounded-cardinality columns use the HLL profile instead.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_INF = float("inf")


def _is_numericish(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_timestamp(t))


def profile_table(ds, columns: list[str] | None = None):
    """Profile ``columns`` (default: every column of the static
    schema) into rows (column, n, nulls, n_distinct, min_v, max_v),
    ordered by column name.  See the module docstring for semantics
    and the exchange inventory."""
    from ..functions.hashing import md5_low64_batch
    from .aggregates import sorted_groupby_agg, static_schema

    schema = static_schema(ds)
    if schema is None:
        schema = ds.schema().base_schema
    if columns is None:
        columns = list(schema.names)
    if not columns:
        raise ValueError("profile_table: no columns to profile")
    for c in columns:
        if c not in schema.names:
            raise ValueError(f"profile_table: unknown column {c!r}")
        t = schema.field(c).type
        if not (_is_numericish(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            raise ValueError(
                f"profile_table: unsupported column type {t} for {c!r}")
    types = {c: schema.field(c).type for c in columns}

    stat_schema = pa.schema([
        ("column", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("mn", pa.float64()), ("mx", pa.float64())])

    def stat_partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return stat_schema.empty_table()
        names, ns, nulls, mns, mxs = [], [], [], [], []
        for c in columns:
            col = t[c]
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            if _is_numericish(types[c]) and col.null_count < t.num_rows:
                v = col.cast(pa.int64()) \
                    if pa.types.is_timestamp(types[c]) else col
                mm = pc.min_max(v)
                mns.append(float(mm["min"].as_py()))
                mxs.append(float(mm["max"].as_py()))
            else:
                mns.append(_INF)    # sentinel: no numeric extrema here
                mxs.append(-_INF)
        return pa.table({"column": pa.array(names, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "nulls": pa.array(nulls, pa.int64()),
                         "mn": pa.array(mns, pa.float64()),
                         "mx": pa.array(mxs, pa.float64())})

    stats = sorted_groupby_agg(
        ds.map_batches(stat_partials, batch_format="pyarrow"),
        ["column"],
        [("n", "sum", "n"), ("nulls", "sum", "nulls"),
         ("mn", "min", "mn"), ("mx", "max", "mx")],
        in_schema=stat_schema)

    hash_cols = [c for c in columns if not pa.types.is_floating(types[c])]
    rows_schema = pa.schema([("column", pa.string()), ("h", pa.uint64())])

    def hash_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not hash_cols:
            return rows_schema.empty_table()
        names_out, hs_out = [], []
        for c in hash_cols:
            col = t[c]
            col = col.combine_chunks() \
                if isinstance(col, pa.ChunkedArray) else col
            col = col.drop_null()
            if len(col) == 0:
                continue
            if pa.types.is_timestamp(types[c]):
                col = col.cast(pa.int64())
            uniq = col.unique()  # Arrow-native local distinct first,
            # so md5 runs once per unique value, and integers format
            # via Arrow's decimal cast (== DuckDB CAST(v AS VARCHAR))
            if pa.types.is_integer(uniq.type):
                uniq = uniq.cast(pa.string())
            h = md5_low64_batch(uniq.to_pylist())
            names_out.append(np.full(len(h), c, dtype=object))
            hs_out.append(h)
        if not names_out:
            return rows_schema.empty_table()
        return pa.table({
            "column": pa.array(np.concatenate(names_out), pa.string()),
            "h": pa.array(np.concatenate(hs_out), pa.uint64())})

    dedup = sorted_groupby_agg(
        ds.map_batches(hash_rows, batch_format="pyarrow"),
        ["column", "h"], [("h", "count", "_m")],
        in_schema=rows_schema)

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "column" not in t.column_names:
            return rows_schema.empty_table()
        return t.drop_columns(["_m"])

    nd = sorted_groupby_agg(
        dedup.map_batches(strip, batch_size=None, batch_format="pyarrow"),
        ["column"], [("column", "count", "n_distinct")],
        in_schema=rows_schema)

    from .join import sort_merge_join

    joined = sort_merge_join(
        stats, nd, on="column", how="left",
        left_schema=pa.schema([
            ("column", pa.string()), ("n", pa.int64()),
            ("nulls", pa.int64()), ("mn", pa.float64()),
            ("mx", pa.float64())]),
        right_schema=pa.schema([("column", pa.string()),
                                ("n_distinct", pa.int64())]))

    out_schema = pa.schema([
        ("column", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("n_distinct", pa.int64()), ("min_v", pa.float64()),
        ("max_v", pa.float64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "column" not in t.column_names:
            return out_schema.empty_table()
        mn = t["mn"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx = t["mx"].to_numpy(zero_copy_only=False).astype(np.float64)
        names = t["column"].to_pylist()
        # float columns keep n_distinct NULL (not replayable); an
        # all-null hashable column genuinely has 0 distinct values
        ndv = []
        for nm, v in zip(names, t["n_distinct"].to_pylist()):
            if nm in hash_cols:
                ndv.append(int(v) if v is not None else 0)
            else:
                ndv.append(None)
        return pa.table({
            "column": t["column"], "n": t["n"], "nulls": t["nulls"],
            "n_distinct": pa.array(ndv, pa.int64()),
            "min_v": pa.array(np.where(np.isinf(mn), np.nan, mn)),
            "max_v": pa.array(np.where(np.isinf(mx), np.nan, mx)),
        })

    def null_nan(t: pa.Table) -> pa.Table:
        # NaN sentinels -> true nulls so the schema is SQL-comparable
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return out_schema.empty_table()
        for name in ("min_v", "max_v"):
            col = t[name]
            col = col.combine_chunks() \
                if isinstance(col, pa.ChunkedArray) else col
            mask = pc.is_nan(col)
            t = t.set_column(t.schema.get_field_index(name), name,
                             pc.if_else(mask, pa.scalar(None, pa.float64()),
                                        col))
        return t

    return joined.map_batches(finish, batch_format="pyarrow") \
                 .map_batches(null_nan, batch_format="pyarrow") \
                 .sort("column")
