"""2-D skyline / Pareto-frontier query (Börzsönyi, Kossmann &
Stocker, "The Skyline Operator", ICDE 2001).

``pareto_frontier`` keeps the rows NOT dominated under (maximize
``max_col``, minimize ``min_col``): row *i* is dominated iff some row
*j* has ``x_j >= x_i AND y_j <= y_i`` with at least one strict — the
standard skyline semantics, identical to SQL's ``NOT EXISTS``
dominance test, which is the oracle.

The 2-D case reduces to a scan: group rows by x (only the min-y row
per x can survive — an equal-x smaller-y row dominates), order the
groups by x DESCENDING, and a group survives iff its min-y is
STRICTLY below the running minimum of every strictly-larger-x group.
That is exactly one grouped min + the repo's existing scan carries:

  1. ONE grouped min of y per distinct x (exchange bounded by the
     distinct-x count);
  2. ``running_agg(op="min", descending)`` + ``lag_column`` over the
     grouped table — one x-sized range sort with the O(num_blocks)
     carry thread — to get each group's strict-prefix minimum;
  3. survivors are frontier COORDINATES; one (x, y) sort-merge SEMI
     join re-attaches every original row sharing a surviving
     coordinate.  Duplicate points are all kept (mutual
     non-domination needs one strict inequality), matching the
     ``NOT EXISTS`` oracle exactly.

Decisions are comparisons on the stored values, so integer inputs
replay exactly; float inputs replay bit-identically too (both engines
compare the same IEEE doubles — no arithmetic is performed).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def pareto_frontier(ds, *, max_col: str, min_col: str,
                    partitions: int | None = None):
    """Rows of ``ds`` on the Pareto frontier under (maximize
    ``max_col``, minimize ``min_col``).  NULL in either column raises
    (SQL dominance with NULLs is three-valued; callers filter first).
    Returns the surviving rows with their original columns."""
    import pyarrow.compute as pc

    from .aggregates import sorted_groupby_agg, static_schema
    from .join import sort_merge_join
    from .scan import lag_column, running_agg

    schema = static_schema(ds)
    if schema is None:
        schema = ds.schema().base_schema
    for c in (max_col, min_col):
        if c not in schema.names:
            raise ValueError(f"pareto_frontier: unknown column {c!r}")
    x_t = schema.field(max_col).type
    y_t = schema.field(min_col).type

    xy_schema = pa.schema([("x", x_t), ("y", y_t)])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return xy_schema.empty_table()
        x, y = t[max_col], t[min_col]
        if (x.null_count if hasattr(x, "null_count") else 0) or \
           (y.null_count if hasattr(y, "null_count") else 0):
            raise ValueError("pareto_frontier: NULL in a frontier column")
        return pa.table({"x": x, "y": y})

    grouped = sorted_groupby_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        ["x"], [("y", "min", "ymin")], in_schema=xy_schema)

    ran = running_agg(grouped, order_by="x", descending=True, op="min",
                      value_col="ymin", out_col="run_min")
    lagged = lag_column(ran, value_col="run_min", order_by="x",
                        descending=True, out_col="prev_min")

    surv_schema = pa.schema([("x", x_t), ("y", y_t)])

    def survivors(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return surv_schema.empty_table()
        prev = t["prev_min"]
        prev = prev.combine_chunks() \
            if isinstance(prev, pa.ChunkedArray) else prev
        ymin = t["ymin"]
        ymin = ymin.combine_chunks() \
            if isinstance(ymin, pa.ChunkedArray) else ymin
        keep = pc.or_kleene(pc.is_null(prev), pc.less(ymin, prev))
        kept = t.filter(pc.fill_null(keep, False))
        return pa.table({"x": kept["x"],
                         "y": kept["ymin"].combine_chunks()
                         if isinstance(kept["ymin"], pa.ChunkedArray)
                         else kept["ymin"]})

    surv = lagged.map_batches(survivors, batch_size=None,
                              batch_format="pyarrow")

    return sort_merge_join(
        ds, surv, on=[max_col, min_col], right_on=["x", "y"], how="semi",
        left_schema=schema, right_schema=surv_schema,
        partitions=partitions)
