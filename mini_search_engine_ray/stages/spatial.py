"""Spatial operators: grid-bucketed radius join.

``radius_join`` finds every pair of points within Euclidean distance
``r`` — the spatial self-join behind store-clustering, co-location
mining and trajectory contact tracing — without ever going all-pairs:
the classic fixed-grid plan (cell side = r, so any qualifying pair
lives in the same or an ADJACENT cell; e.g. Bentley's 1975 fixed-grid
method, the standard ε-join blocking).

Duplicate-free candidate generation: every point emits ONE home row
(flag 1) into its own cell and four PROBE rows (flag 0) into the
lexicographically-forward neighbors (E, N, NE, NW).  Within a cell,
candidates are home×home pairs with ``id_a < id_b`` (same-cell pairs,
found once) plus home×probe pairs (adjacent-cell pairs — exactly one
of the two cells is forward of the other, so each pair is generated
exactly once).  The exact ``dx² + dy² ≤ r²`` filter runs inline in
the sweep; both engines evaluate the identical three-IEEE-op
expression over the identical doubles, so the decision replays
deterministically.

Scale shape: the ONLY exchange is one range sort of the 5×-stamped
(cell, flag, id, x, y) rows keyed by the int64 cell code; per-cell
fan-out is bounded by occupancy (the caller picks r — the scale
contract of every grid join), and the sweep is a segmented numpy
all-pairs per equal-cell run.  Cell codes pack (cx + 2³¹, cy + 2³¹)
into one int64 ((c + 2³⁰) < 2³¹ keeps the 2³²-shift product
in range), valid for |coordinate / r| < 2³⁰.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_OFF = np.int64(1) << 30
_FWD = ((1, 0), (0, 1), (1, 1), (-1, 1))  # E, N, NE, NW


def radius_join(ds, *, r: float, id_col: str = "id", x_col: str = "x",
                y_col: str = "y"):
    """All pairs (a < b by id) of points within Euclidean distance
    ``r`` (inclusive).  Returns (a, b, dist) with dist the one IEEE
    sqrt both engines share.  See the module docstring for the plan;
    ids must be unique, coordinates non-null."""
    from .aggregates import sorted_groupby_agg  # noqa: F401 (family import)

    if not (isinstance(r, (int, float)) and r > 0):
        raise ValueError(f"r must be a positive number, got {r!r}")
    r = float(r)

    stamp_schema = pa.schema([("cell", pa.int64()), ("flag", pa.int64()),
                              ("pid", pa.int64()), ("x", pa.float64()),
                              ("y", pa.float64())])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stamp_schema.empty_table()
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        if ids.null_count:
            raise ValueError("radius_join: NULL id")
        pid = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(x).any() or np.isnan(y).any():
            raise ValueError("radius_join: NaN coordinate")
        cx = np.floor(x / r).astype(np.int64)
        cy = np.floor(y / r).astype(np.int64)
        if (np.abs(cx) >= (1 << 30)).any() or \
           (np.abs(cy) >= (1 << 30)).any():
            raise ValueError("radius_join: |coordinate/r| exceeds 2^30")
        cells = [(cx + _OFF) * (np.int64(1) << 32) + (cy + _OFF)]
        flags = [np.ones(len(pid), np.int64)]
        for dx, dy in _FWD:
            cells.append((cx + dx + _OFF) * (np.int64(1) << 32)
                         + (cy + dy + _OFF))
            flags.append(np.zeros(len(pid), np.int64))
        k = len(cells)
        return pa.table({
            "cell": pa.array(np.concatenate(cells)),
            "flag": pa.array(np.concatenate(flags)),
            "pid": pa.array(np.tile(pid, k)),
            "x": pa.array(np.tile(x, k)),
            "y": pa.array(np.tile(y, k)),
        })

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("dist", pa.float64())])
    r2 = r * r

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cell" not in t.column_names:
            return out_schema.empty_table()
        cell = t["cell"].to_numpy(zero_copy_only=False)
        flag = t["flag"].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pid, flag, cell))
        cell, flag, pid = cell[order], flag[order], pid[order]
        x, y = x[order], y[order]
        n = len(cell)
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        # all ordered in-run pairs (li < ri in the sorted layout)
        per_left = np.repeat(starts + lens, lens) \
            - np.arange(n, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return out_schema.empty_table()
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(n, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        # sorted by (cell, flag, pid): probes (flag 0) precede homes
        # (flag 1).  Keep home×home (same-cell) and probe×home
        # (adjacent-cell) pairs; probe×probe pairs are noise.
        keep = flag[ri] == 1
        li, ri = li[keep], ri[keep]
        dx = x[li] - x[ri]
        dy = y[li] - y[ri]
        d2 = dx * dx + dy * dy
        hit = d2 <= r2
        # same point stamped twice can meet itself across cells only
        # as probe×home with equal pid — drop self pairs
        hit &= pid[li] != pid[ri]
        li, ri = li[hit], ri[hit]
        a = np.minimum(pid[li], pid[ri])
        b = np.maximum(pid[li], pid[ri])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "dist": pa.array(np.sqrt(d2[hit]))})

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    return stamped.sort("cell").map_batches(sweep, batch_size=None,
                                            batch_format="pyarrow")
