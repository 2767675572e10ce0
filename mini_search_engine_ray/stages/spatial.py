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




def _dbscan_small(ds, pairs, min_pts: int, id_col: str):
    """Driver-side DBSCAN labeling over a collected pair list (the
    sub-threshold dispatch of :func:`dbscan_labels`): numpy degree
    count, path-compressed union-find over core-core pairs with
    MIN-id root labels, min-label border assignment — bit-identical
    semantics to the distributed plan."""
    import ray.data as rd

    tab = pa.concat_tables(
        [b for b in pairs.iter_batches(batch_format="pyarrow")
         if b.num_rows and "a" in b.column_names]
    ) if pairs.count() else None
    ids_t = pa.concat_tables([
        pa.table({id_col: (b[id_col].combine_chunks()
                           if isinstance(b[id_col], pa.ChunkedArray)
                           else b[id_col]).cast(pa.int64())})
        for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows])
    all_ids = ids_t[id_col].to_numpy(zero_copy_only=False)
    out_schema = pa.schema([(id_col, pa.int64()), ("label", pa.int64()),
                            ("role", pa.string())])
    if tab is None:
        if min_pts == 1:
            return rd.from_arrow(pa.table({
                id_col: pa.array(all_ids),
                "label": pa.array(all_ids),
                "role": pa.array(["core"] * len(all_ids), pa.string())}))
        return rd.from_arrow(pa.table({
            id_col: pa.array(all_ids),
            "label": pa.array(np.full(len(all_ids), -1, np.int64)),
            "role": pa.array(["noise"] * len(all_ids), pa.string())}))
    a = tab["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tab["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    # dense-code the ids
    uniq = np.unique(all_ids)
    ai = np.searchsorted(uniq, a)
    bi = np.searchsorted(uniq, b)
    deg = np.zeros(len(uniq), np.int64)
    np.add.at(deg, ai, 1)
    np.add.at(deg, bi, 1)
    core = deg + 1 >= min_pts
    # union-find over core-core pairs
    parent = np.arange(len(uniq), dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    cc_m = core[ai] & core[bi]
    for i, j in zip(ai[cc_m].tolist(), bi[cc_m].tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    label = np.full(len(uniq), -1, np.int64)
    roles = np.full(len(uniq), "noise", dtype=object)
    core_idx = np.flatnonzero(core)
    for i in core_idx.tolist():
        label[i] = uniq[find(i)]
    roles[core] = "core"
    # border: min core-neighbor label
    for pi, qi in zip(np.r_[ai, bi].tolist(), np.r_[bi, ai].tolist()):
        if not core[pi] and core[qi]:
            lbl = label[qi]
            if label[pi] == -1 or lbl < label[pi]:
                label[pi] = lbl
                roles[pi] = "border"
    if min_pts == 1:
        iso = deg == 0
        label[iso] = uniq[iso]
        roles[iso] = "core"
    return rd.from_arrow(pa.table({
        id_col: pa.array(uniq),
        "label": pa.array(label),
        "role": pa.array(list(roles), pa.string()),
    }))

def dbscan_labels(ds, *, r: float, min_pts: int, id_col: str = "id",
                  x_col: str = "x", y_col: str = "y",
                  small_threshold: int = 2_000_000):
    """DBSCAN (Ester, Kriegel, Sander & Xu, KDD 1996) as a composition
    of oracle-tested operators — the density clustering every
    embedding-curation pipeline reaches for once k-means' spherical
    assumption breaks:

      1. neighbor pairs   = :func:`radius_join` (the ε-join),
      2. core points      = degree + 1 ≥ ``min_pts`` (the point
                            itself counts, the sklearn convention),
      3. clusters         = connected components over CORE–CORE pairs
                            (min-reachable-id labels — deterministic,
                            unlike visit-order implementations), with
                            isolated cores as singleton clusters,
      4. border points    = non-core with ≥1 core neighbor, assigned
                            the MINIMUM neighbor cluster label
                            (deterministic where the textbook leaves
                            it order-dependent),
      5. noise            = everything else, label −1.

    Returns (id_col, label int64, role string ∈ {core, border,
    noise}).  Exchanges: the ε-join's cell sort, one degree count,
    two pair semi joins, the component propagation (output-sized
    rounds), one border min — each narrow."""
    import pyarrow.compute as pc

    from .aggregates import sorted_groupby_agg
    from .dedup import connected_components
    from .join import sort_merge_join

    if not (isinstance(min_pts, int) and min_pts >= 1):
        raise ValueError(f"min_pts must be an int >= 1, got {min_pts!r}")

    pairs = radius_join(ds, r=r, id_col=id_col, x_col=x_col,
                        y_col=y_col).select_columns(["a", "b"]) \
        .materialize()
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    # size dispatch (the bfs_hops / compute_page_rank pattern): below
    # ``small_threshold`` pairs the whole label computation is a
    # pairs-BOUNDED driver union-find — identical semantics, none of
    # the ~15 distributed exchanges' fixed overhead; above it, the
    # distributed plan below is the scale path.
    if pairs.count() <= small_threshold:
        return _dbscan_small(ds, pairs, min_pts, id_col)

    def both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(np.r_[a, b])})

    deg = sorted_groupby_agg(
        pairs.map_batches(both, batch_format="pyarrow"),
        ["n"], [("n", "count", "deg")],
        in_schema=pa.schema([("n", pa.int64())]))

    def core_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64())})
        d = t["deg"].to_numpy(zero_copy_only=False)
        return pa.table({"n": t["n"]}).filter(
            pa.array(d + 1 >= min_pts))

    cores = deg.map_batches(core_only, batch_size=None,
                            batch_format="pyarrow").materialize()
    n_schema = pa.schema([("n", pa.int64())])

    # isolated points (no neighbors at all) can still be core when
    # min_pts == 1; they never enter `pairs`, handled as noise/core
    # singletons in the final union below via the full point set
    cc_pairs = sort_merge_join(
        sort_merge_join(pairs, cores, on="a", right_on="n", how="semi",
                        left_schema=pair_schema, right_schema=n_schema),
        cores, on="b", right_on="n", how="semi",
        left_schema=pair_schema, right_schema=n_schema).materialize()

    comp = connected_components(cc_pairs).materialize()

    # singleton cores: cores absent from the component table
    comp_schema = pa.schema([("node", pa.int64()),
                             ("component", pa.int64())])
    lone = sort_merge_join(
        cores, comp, on="n", right_on="node", how="anti",
        left_schema=n_schema, right_schema=comp_schema)

    def self_comp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return comp_schema.empty_table()
        return pa.table({"node": t["n"], "component": t["n"]})

    core_lbl = comp.union(lone.map_batches(
        self_comp, batch_format="pyarrow")).materialize()

    # border: non-core endpoint of a pair whose OTHER endpoint is a
    # labeled core -> min core-neighbor label
    def directed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"p": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array(np.r_[a, b]),
                         "q": pa.array(np.r_[b, a])})

    dir_pairs = pairs.map_batches(directed, batch_format="pyarrow")
    dir_schema = pa.schema([("p", pa.int64()), ("q", pa.int64())])
    # p non-core (anti core), q labeled core (inner join to labels)
    p_border = sort_merge_join(
        dir_pairs, cores, on="p", right_on="n", how="anti",
        left_schema=dir_schema, right_schema=n_schema)
    bl = sort_merge_join(
        p_border, core_lbl, on="q", right_on="node", how="inner",
        left_schema=dir_schema, right_schema=comp_schema)

    def bproj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p" not in t.column_names:
            return comp_schema.empty_table()
        return pa.table({"node": t["p"], "component": t["component"]})

    border_lbl = sorted_groupby_agg(
        bl.map_batches(bproj, batch_format="pyarrow"),
        ["node"], [("component", "min", "component")],
        in_schema=comp_schema)

    # assemble: every input id LEFT-joined to core/border labels
    def tag(role: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({
                    "node": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                    "role": pa.array([], pa.string())})
            return t.append_column(
                "role", pa.array([role] * t.num_rows, pa.string()))
        return f

    labels = core_lbl.map_batches(tag("core"), batch_format="pyarrow") \
        .union(border_lbl.map_batches(tag("border"),
                                      batch_format="pyarrow"))
    lbl_schema = pa.schema([("node", pa.int64()),
                            ("component", pa.int64()),
                            ("role", pa.string())])

    def ids_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        return pa.table({id_col: ids.cast(pa.int64())})

    out = sort_merge_join(
        ds.map_batches(ids_only, batch_format="pyarrow"), labels,
        on=id_col, right_on="node", how="left",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=lbl_schema)

    out_schema = pa.schema([(id_col, pa.int64()), ("label", pa.int64()),
                            ("role", pa.string())])

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return out_schema.empty_table()
        comp_c = t["component"]
        comp_c = comp_c.combine_chunks() \
            if isinstance(comp_c, pa.ChunkedArray) else comp_c
        role = t["role"]
        role = role.combine_chunks() \
            if isinstance(role, pa.ChunkedArray) else role
        if min_pts == 1:
            # an isolated point (no neighbor pairs at all) is still a
            # core singleton when min_pts == 1 — its own cluster
            ids64 = t[id_col]
            ids64 = ids64.combine_chunks() \
                if isinstance(ids64, pa.ChunkedArray) else ids64
            comp_c = pc.coalesce(comp_c, ids64)
            role = pc.coalesce(role, pa.scalar("core", pa.string()))
        return pa.table({
            id_col: t[id_col],
            "label": pc.fill_null(comp_c, -1),
            "role": pc.fill_null(role, "noise"),
        })

    return out.map_batches(fin, batch_format="pyarrow")
