"""Distributed graph analytics beyond PageRank: exact triangle
counting (and the local clustering signal it powers).

Triangle counting is THE canonical "joins explode unless you orient"
graph workload: the naive wedge join generates sum(deg^2) candidate
pairs — hub nodes make that quadratic — while orienting every edge
from its lower-(degree, id) endpoint to the higher one bounds each
node's OUT-degree by O(sqrt(E)), so the wedge set is O(E^1.5) worst
case and near-linear on real skewed graphs (Suri & Vassilvitskii 2011,
"Counting Triangles and the Curse of the Last Reducer"; Schank &
Wagner 2005).  Everything here is a composition of the repo's own
bounded-exchange primitives: `sorted_groupby_agg` for distinct /
degree / final counts, `sort_merge_join` for degree attachment, the
wedge self-join, and the closing-edge SEMI join (which never ships
the probe payload through the shuffle).

Scale shape: every exchange is a narrow int64 range sort sized by the
edge list or the (orientation-bounded) wedge list; no stage holds a
neighbor list in Python, no driver materialization anywhere — the
result streams out as a Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregates import sorted_groupby_agg, static_schema, topk_per_group
from .join import sort_merge_join

__all__ = ["undirected_edges", "triangle_counts", "local_clustering",
           "bfs_hops", "common_neighbor_pairs", "degree_assortativity",
           "k_core", "feature_propagation", "label_propagation",
           "modularity", "shortest_paths"]


def undirected_edges(ds, src_col: str = "src", dst_col: str = "dst", *,
                     in_schema: pa.Schema | None = None):
    """Canonicalize a directed/multi edge list to DISTINCT undirected
    edges ``(u, v)`` with ``u < v``: self-loops and null endpoints
    drop, duplicates and reversed copies collapse.  One edge-sized
    range sort (the distinct) is the only exchange."""
    import pyarrow.compute as pc

    if in_schema is None:
        in_schema = static_schema(ds)

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        u = pc.min_element_wise(s, d)
        v = pc.max_element_wise(s, d)
        keep = pc.and_kleene(pc.less(u, v),
                             pc.and_kleene(pc.is_valid(u), pc.is_valid(v)))
        out = pa.table({"u": pc.cast(u, pa.int64()),
                        "v": pc.cast(v, pa.int64())})
        return out.filter(pc.fill_null(keep, False))

    schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    dedup = sorted_groupby_agg(
        ds.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"], [("u", "count", "_m")], in_schema=schema)
    return dedup.map_batches(lambda t: t.drop_columns(["_m"]),
                             batch_format="pyarrow")


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_DEG_SCHEMA = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
_OE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("db", pa.int64())])


def triangle_counts(edges, src_col: str = "src", dst_col: str = "dst", *,
                    partitions: int | None = None):
    """Per-node exact triangle counts over the undirected simple graph
    induced by ``edges`` — rows ``(node, triangles)`` for every node in
    >=1 triangle (total triangles = sum/3; see :func:`local_clustering`
    for the coefficient that joins degrees back on).

    Plan (each step a bounded narrow-int64 exchange):
      1. canonicalize + distinct undirected edges (u < v);
      2. degrees: explode each edge to its two endpoints, grouped
         count;
      3. attach deg(u), deg(v) with two edge⨝degree sort-merge joins
         (the degree side is node-sized);
      4. ORIENT each edge a→b from lower (deg, id) to higher — the
         out-degree bound that keeps step 5 from going quadratic on
         hubs;
      5. wedges: self-join oriented edges on the center ``a``; keep
         each unordered out-pair once ((db, b) < (db', b') — the same
         total order the orientation used, so the pair (x, y) is
         emitted exactly in closing-edge orientation);
      6. close: SEMI join wedges (x, y) against oriented edges (a, b)
         — a wedge survives iff its closing edge exists; each
         surviving row IS one triangle, seen exactly once (at its
         lowest-(deg, id) corner);
      7. per-node counts: explode each triangle to its three corners,
         grouped count.

    ``partitions`` sizes the join/sort block counts (see
    :func:`sort_merge_join`).
    """
    tris, _deg = _triangle_plan(edges, src_col, dst_col,
                                partitions=partitions)
    return tris


def _edges_with_degrees(edges, src_col: str, dst_col: str, *,
                        partitions: int | None):
    """Shared sub-plan: distinct undirected edges with both endpoint
    degrees attached — returns ``(both, und, deg)`` where ``both`` has
    columns (u, v, deg, deg_v).  ``und``/``deg`` come back materialized
    (they feed multiple consumers in every caller; a lazy Dataset would
    re-execute the distinct + degree passes once per consumer — they
    are edge-/node-sized narrow int64 tables, so pinning them as
    object-store blocks is the intended checkpoint, not a driver
    materialization)."""
    und = undirected_edges(edges, src_col, dst_col).materialize()

    def explode_endpoints(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) else t["u"]
        v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) else t["v"]
        return pa.table({"node": pa.concat_arrays([u, v])})

    deg = sorted_groupby_agg(
        und.map_batches(explode_endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")],
        in_schema=pa.schema([("node", pa.int64())])).materialize()

    with_du = sort_merge_join(und, deg, on="u", right_on="node",
                              left_schema=_EDGE_SCHEMA,
                              right_schema=_DEG_SCHEMA,
                              partitions=partitions)
    du_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                           ("deg", pa.int64())])
    both = sort_merge_join(with_du, deg, on="v", right_on="node",
                           suffix="_v", left_schema=du_schema,
                           right_schema=_DEG_SCHEMA,
                           partitions=partitions)
    return both, und, deg


def _triangle_plan(edges, src_col: str, dst_col: str, *,
                   partitions: int | None):
    """Shared plan: returns ``(per-node triangle counts, degrees)`` —
    both Datasets, degrees materialized (it feeds three joins)."""
    both, und, deg = _edges_with_degrees(edges, src_col, dst_col,
                                         partitions=partitions)

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        du = t["deg"].to_numpy(zero_copy_only=False)
        dv = t["deg_v"].to_numpy(zero_copy_only=False)
        # a→b iff (deg, id) of a < of b; ids are distinct (u < v), so
        # the tuple order is total
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "a": pa.array(np.where(u_first, u, v)),
            "b": pa.array(np.where(u_first, v, u)),
            "db": pa.array(np.where(u_first, dv, du)),
        })

    oe = both.map_batches(orient, batch_format="pyarrow").materialize()

    # -- wedges: FUSED out-pair enumeration — one range sort of the
    #    oriented edges by center, then a vectorized segmented
    #    all-pairs sweep per block (a self-JOIN would shuffle the
    #    relation twice and materialize the full out-deg² cross
    #    product only to filter half away).  Within a center's run the
    #    rows are ordered by (db, b) — the same total order the
    #    orientation used — so pair (x, y) comes out exactly in
    #    closing-edge orientation, C(out_deg, 2) rows per center. ----
    def center_out_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"center": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        db = t["db"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, db, a))
        a, b = a[order], b[order]
        n = len(a)
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        per_left = np.repeat(starts + lens, lens) \
            - np.arange(n, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return empty
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(n, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        return pa.table({"center": pa.array(a[li]),
                         "x": pa.array(b[li]), "y": pa.array(b[ri])})

    wedges = oe.sort("a").map_batches(center_out_pairs, batch_size=None,
                                      batch_format="pyarrow")
    wedge_schema = pa.schema([("center", pa.int64()), ("x", pa.int64()),
                              ("y", pa.int64())])

    # -- close each wedge against the oriented edge set (semi: the
    #    edge payload never enters the shuffle) -----------------------
    tris = sort_merge_join(wedges, oe, on=["x", "y"],
                           right_on=["a", "b"], how="semi",
                           left_schema=wedge_schema,
                           right_schema=_OE_SCHEMA, partitions=partitions)

    # -- per-corner counts --------------------------------------------
    def explode_corners(t: pa.Table) -> pa.Table:
        cols = [t[c] for c in ("center", "x", "y")]
        cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in cols]
        return pa.table({"node": pa.concat_arrays(cols)})

    per_node = sorted_groupby_agg(
        tris.map_batches(explode_corners, batch_format="pyarrow"),
        ["node"], [("node", "count", "triangles")],
        in_schema=pa.schema([("node", pa.int64())]))
    return per_node, deg


_TRI_SCHEMA = pa.schema([("node", pa.int64()), ("triangles", pa.int64())])


def local_clustering(edges, src_col: str = "src", dst_col: str = "dst", *,
                     partitions: int | None = None):
    """Local clustering coefficient (Watts & Strogatz 1998) per node:
    ``lcc = 2·triangles / (deg·(deg−1))`` — the fraction of a node's
    neighbor pairs that are themselves connected.  Rows ``(node, deg,
    triangles, lcc)`` for every node with ``deg >= 2`` (C(deg,2)=0
    makes the coefficient undefined below that); triangle-free nodes
    get 0.  One node-keyed LEFT sort-merge join on top of the
    :func:`triangle_counts` plan is the only added exchange, and the
    closing expression is two IEEE float64 ops so a SQL oracle replays
    the value exactly."""
    tris, deg = _triangle_plan(edges, src_col, dst_col,
                               partitions=partitions)
    joined = sort_merge_join(deg, tris, on="node", how="left",
                             left_schema=_DEG_SCHEMA,
                             right_schema=_TRI_SCHEMA,
                             partitions=partitions)

    def coeff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t["deg"].to_numpy(zero_copy_only=False)
        tri = pc.fill_null(t["triangles"], 0).to_numpy(zero_copy_only=False)
        keep = d >= 2
        d, tri = d[keep], tri[keep]
        lcc = (2.0 * tri) / (d * (d - 1)).astype(np.float64)
        node = t["node"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"node": pa.array(node), "deg": pa.array(d),
                         "triangles": pa.array(tri),
                         "lcc": pa.array(lcc)})

    return joined.map_batches(coeff, batch_format="pyarrow")


def bfs_hops(edges, seeds, *, max_hops: int, src_col: str = "src",
             dst_col: str = "dst", partitions: int | None = None,
             broadcast_nodes: int = 4_000_000):
    """Multi-source BFS levels over the undirected graph: rows
    ``(node, hop)`` where ``hop`` is the minimum edge count from any
    seed, for every node within ``max_hops`` (seeds themselves are
    hop 0, present even when isolated).  The crawl-depth /
    degrees-of-separation primitive.

    Level-synchronous frontier expansion (the Pregel/Pegasus BFS
    shape), with a per-round SIZE DISPATCH on both exchanges:

    * frontier/settled sets up to ``broadcast_nodes`` rows (the common
      case — a 3-hop ball around a seed set) are collected, sorted and
      ``ray.put`` ONCE per round, and expansion / settled-removal are
      then pure ``pc.is_in`` map passes over the streaming sides — the
      adjacency list is NEVER re-sorted per round (re-sorting E rows
      per level is the classic iterated-BFS scale killer);
    * above the threshold the round falls back to the frontier⨝adj
      SEMI join + settled ANTI join (narrow int64 range sorts), the
      shape that holds when the frontier itself is data-sized.

    A node settles exactly once, so total work over all rounds is
    O(E·hops) filter reads + O(reached) exchange rows in broadcast
    mode. ``seeds`` is a driver-side list by contract (query/crawl
    seed sets are small); ``broadcast_nodes`` (default 4M ≈ 32 MB of
    int64 per broadcast) bounds driver/object-store memory.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("seeds must be non-empty")
    import ray as _ray
    import ray.data as rd

    und = undirected_edges(edges, src_col, dst_col)

    def symmetrize(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) \
            else t["u"]
        v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) \
            else t["v"]
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    adj = und.map_batches(symmetrize, batch_format="pyarrow").materialize()
    adj_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])

    settled = rd.from_arrow(pa.table({
        "node": pa.array(seeds, pa.int64()),
        "hop": pa.array([0] * len(seeds), pa.int64())})).materialize()
    frontier = settled.map_batches(
        lambda t: t.drop_columns(["hop"]), batch_format="pyarrow") \
        .materialize()

    def _collect_nodes(ds) -> np.ndarray:
        # bounded by the broadcast_nodes check at the call site
        parts = [b["node"].to_numpy(zero_copy_only=False)
                 for b in ds.select_columns(["node"])
                            .iter_batches(batch_format="pyarrow")]
        return np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, dtype=np.int64)

    n_settled = len(seeds)
    for hop in range(1, max_hops + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_nodes:
            fr_ref = _ray.put(_collect_nodes(frontier))

            def expand(t: pa.Table, _r=fr_ref) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.is_in(t["a"],
                                value_set=pa.array(_ray.get(_r)))
                return pa.table({"node": pc.filter(t["b"], mask)})

            nxt = adj.map_batches(expand, batch_format="pyarrow")
        else:
            # frontier itself is data-sized: expand via the semi join
            # (the join ships only the int64 key — frontier rows have
            # no payload)
            nxt = sort_merge_join(adj, frontier, on="a", right_on="node",
                                  how="semi", left_schema=adj_schema,
                                  right_schema=node_schema,
                                  partitions=partitions)
            nxt = nxt.map_batches(
                lambda t: pa.table({"node": t["b"]}),
                batch_format="pyarrow")
        # dedup within the level (reached-set-sized sort), then drop
        # already-settled nodes
        nxt = sorted_groupby_agg(nxt, ["node"],
                                 [("node", "count", "_m")],
                                 in_schema=node_schema)
        nxt = nxt.map_batches(lambda t: t.drop_columns(["_m"]),
                              batch_format="pyarrow")
        if n_settled <= broadcast_nodes:
            st_ref = _ray.put(_collect_nodes(settled))

            def drop_settled(t: pa.Table, _r=st_ref) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.is_in(t["node"],
                                value_set=pa.array(_ray.get(_r)))
                return t.filter(pc.invert(mask))

            fresh = nxt.map_batches(drop_settled,
                                    batch_format="pyarrow").materialize()
        else:
            fresh = sort_merge_join(
                nxt, settled, on="node", how="anti",
                left_schema=node_schema,
                right_schema=pa.schema([("node", pa.int64()),
                                        ("hop", pa.int64())]),
                partitions=partitions).materialize()
        n_fresh = fresh.count()
        if n_fresh == 0:
            break
        h = hop

        def stamp(t: pa.Table, _h=h) -> pa.Table:
            return t.append_column(
                "hop", pa.array(np.full(t.num_rows, _h, dtype=np.int64)))

        settled = settled.union(
            fresh.map_batches(stamp, batch_format="pyarrow")).materialize()
        n_settled += n_fresh
        frontier = fresh

    return settled


def common_neighbor_pairs(edges, *, min_common: int = 2,
                          max_degree: int | None = None,
                          adamic_adar: bool = False,
                          src_col: str = "src", dst_col: str = "dst",
                          partitions: int | None = None):
    """Link prediction by common-neighbor counting (Liben-Nowell &
    Kleinberg 2003): for every NON-adjacent node pair ``(x, y)`` with
    at least ``min_common`` shared neighbors, rows ``(x, y, common,
    deg_x, deg_y, jaccard)`` where ``jaccard = common /
    (deg_x + deg_y − common)`` — the neighborhood-overlap score.
    Integer arithmetic end to end plus ONE IEEE float64 division, so a
    SQL oracle replays scores exactly.

    Unlike triangle counting, every wedge center must be enumerated
    (the pair needs credit from ALL its shared neighbors), so the
    orientation trick doesn't apply and the self-join is bounded by
    sum(deg(z)²) over centers — quadratic in hub degree.
    ``max_degree`` drops hub CENTERS above the cap before the
    explosion (standard link-prediction practice: a hub shared by
    everyone carries negligible signal, and the cap is a plain degree
    predicate an oracle replays); pass None only on degree-bounded
    graphs.  Degrees ``deg_x``/``deg_y`` are TRUE degrees (the cap
    prunes centers only, not the scored pair's own edges).  The
    non-adjacency filter is one pair-keyed ANTI join against the edge
    list.

    ``adamic_adar=True`` adds the Adamic-Adar affinity (Adamic & Adar
    2003: Σ over shared neighbors z of 1/ln(deg z)) in a DETERMINISTIC
    fixed-point form: each shared neighbor contributes the int64 term
    ``floor(1e8 / ln(deg z) + 0.5)`` and the per-pair sum is an exact
    integer reduction (``aa_fx``; ``aa = aa_fx / 1e8`` — one IEEE
    division) — a float Σ 1/ln(dz) would be summation-order-dependent
    and unreplayable, the integer terms are order-free.  The center's
    degree is its RUN LENGTH in the half-adjacency (the cap drops
    whole centers, never individual neighbors), so the term needs no
    extra join.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    if max_degree is not None and max_degree < 1:
        raise ValueError("max_degree must be >= 1")

    und = undirected_edges(edges, src_col, dst_col).materialize()

    def explode_endpoints(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) \
            else t["u"]
        v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) \
            else t["v"]
        return pa.table({"node": pa.concat_arrays([u, v])})

    deg = sorted_groupby_agg(
        und.map_batches(explode_endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")],
        in_schema=pa.schema([("node", pa.int64())])).materialize()

    # directed half-adjacency keyed by CENTER: for each center z the
    # rows (z, neighbor); cap prunes hub centers before the self-join
    def symmetrize(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) \
            else t["u"]
        v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) \
            else t["v"]
        return pa.table({"z": pa.concat_arrays([u, v]),
                         "nb": pa.concat_arrays([v, u])})

    adj = und.map_batches(symmetrize, batch_format="pyarrow")
    adj_schema = pa.schema([("z", pa.int64()), ("nb", pa.int64())])
    if max_degree is not None:
        cap = max_degree

        def under_cap(t: pa.Table, _c=cap) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.less_equal(t["deg"], _c))

        ok = deg.map_batches(under_cap, batch_format="pyarrow")
        adj = sort_merge_join(adj, ok, on="z", right_on="node",
                              how="semi", left_schema=adj_schema,
                              right_schema=_DEG_SCHEMA,
                              partitions=partitions)

    # FUSED wedge enumeration: one range sort of the half-adjacency by
    # center, then a vectorized segmented all-pairs sweep per block —
    # a self-JOIN here would shuffle the relation twice (tagged union)
    # and materialize the full deg² cross product (including the
    # diagonal and both orientations) only to filter half away; the
    # sweep emits exactly C(deg, 2) rows per center, already ordered
    # (neighbors are unique per center, sorted ascending inside the
    # run, so x < y by construction).
    def center_pairs(t: pa.Table) -> pa.Table:
        cols = {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
        if adamic_adar:
            cols["term_fx"] = pa.array([], pa.int64())
        empty = pa.table(cols)
        if t.num_rows == 0 or "z" not in t.column_names:
            return empty
        z = t["z"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, z))
        z, nb = z[order], nb[order]
        n = len(z)
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        lens = np.diff(np.r_[starts, n]).astype(np.int64)
        ends = starts + lens
        # element k of a run pairs as LEFT with (run_end - k - 1)
        # rights; the classic segmented-arange construction
        per_left = np.repeat(ends, lens) - np.arange(n, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return empty
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(n, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        out = {"x": pa.array(nb[li]), "y": pa.array(nb[ri])}
        if adamic_adar:
            # the run length IS deg(center): lens >= 2 for any run that
            # pairs, so ln() is positive and the fixed-point term exact
            dz = np.repeat(lens, lens)[li].astype(np.float64)
            out["term_fx"] = pa.array(np.floor(
                1e8 / np.log(dz) + 0.5).astype(np.int64))
        return pa.table(out)

    pair_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64())]
        + ([("term_fx", pa.int64())] if adamic_adar else []))
    # the capped semi join's output already keeps each center's run
    # whole inside one block (the sort-merge sweep invariant); the
    # uncapped path needs the range sort itself
    wedges_src = adj if max_degree is not None else adj.sort("z")
    aggs = [("x", "count", "common")]
    if adamic_adar:
        aggs.append(("term_fx", "sum", "aa_fx"))
    common = sorted_groupby_agg(
        wedges_src.map_batches(center_pairs, batch_size=None,
                               batch_format="pyarrow"),
        ["x", "y"], aggs, in_schema=pair_schema)
    mc = min_common

    def common_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["common"], mc))

    common = common.map_batches(common_filter, batch_format="pyarrow")
    common_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("common", pa.int64())]
        + ([("aa_fx", pa.int64())] if adamic_adar else []))

    # drop ADJACENT pairs: x<y matches the canonical edge orientation,
    # so one (x,y)=(u,v) anti join suffices
    cand = sort_merge_join(common, und, on=["x", "y"],
                           right_on=["u", "v"], how="anti",
                           left_schema=common_schema,
                           right_schema=_EDGE_SCHEMA,
                           partitions=partitions)

    # attach true degrees + the closing score
    with_dx = sort_merge_join(cand, deg, on="x", right_on="node",
                              left_schema=common_schema,
                              right_schema=_DEG_SCHEMA,
                              partitions=partitions)
    dx_schema = pa.schema(list(common_schema)
                          + [pa.field("deg", pa.int64())])
    with_dy = sort_merge_join(with_dx, deg, on="y", right_on="node",
                              suffix="_y", left_schema=dx_schema,
                              right_schema=_DEG_SCHEMA,
                              partitions=partitions)

    def score(t: pa.Table) -> pa.Table:
        c = t["common"].to_numpy(zero_copy_only=False)
        dx = t["deg"].to_numpy(zero_copy_only=False)
        dy = t["deg_y"].to_numpy(zero_copy_only=False)
        cols = {
            "x": t["x"], "y": t["y"], "common": t["common"],
            "deg_x": pa.array(dx), "deg_y": pa.array(dy),
            "jaccard": pa.array(c / (dx + dy - c)),
        }
        if adamic_adar:
            fx = t["aa_fx"].to_numpy(zero_copy_only=False)
            cols["aa_fx"] = t["aa_fx"]
            cols["aa"] = pa.array(fx / 1e8)
        return pa.table(cols)

    return with_dy.map_batches(score, batch_format="pyarrow")


def degree_assortativity(edges, *, src_col: str = "src",
                         dst_col: str = "dst",
                         partitions: int | None = None) -> pa.Table:
    """Degree assortativity coefficient (Newman 2002) of the
    undirected simple graph: the Pearson correlation of the degrees at
    the two ends of every edge, each edge contributing BOTH
    orientations (the standard symmetrized definition).  One-row
    table ``(n_edges, assortativity)``.

    Moments are EXACT int64 sums — per batch six scalars to the
    driver, nothing else materialized — and the closing expression is
    the identical IEEE float64 formula a SQL oracle replays, the same
    contract as the repo's exact-moment Pearson correlation
    (`q_corr_qty_price`).  By symmetry Σx=Σy and Σx²=Σy², but all six
    sums are kept so the closing formula stays the generic one."""
    both, _und, _deg = _edges_with_degrees(edges, src_col, dst_col,
                                           partitions=partitions)

    def moments(t: pa.Table) -> pa.Table:
        du = t["deg"].to_numpy(zero_copy_only=False)
        dv = t["deg_v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([np.int64(2 * len(du))]),
            "sx": pa.array([du.sum() + dv.sum()]),
            "sy": pa.array([du.sum() + dv.sum()]),
            "sxx": pa.array([(du * du).sum() + (dv * dv).sum()]),
            "syy": pa.array([(du * du).sum() + (dv * dv).sum()]),
            "sxy": pa.array([2 * (du * dv).sum()]),
        })

    parts = both.map_batches(moments, batch_format="pyarrow").take_all()
    n = float(sum(r["n"] for r in parts))
    sx = float(sum(r["sx"] for r in parts))
    sy = float(sum(r["sy"] for r in parts))
    sxx = float(sum(r["sxx"] for r in parts))
    syy = float(sum(r["syy"] for r in parts))
    sxy = float(sum(r["sxy"] for r in parts))
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                               * np.sqrt(n * syy - sy * sy))
    return pa.table({"n_edges": pa.array([np.int64(n) // 2]),
                     "assortativity": pa.array([float(r)])})


def k_core(edges, k: int, *, rounds: int | None = None,
           src_col: str = "src", dst_col: str = "dst",
           partitions: int | None = None,
           broadcast_nodes: int = 4_000_000):
    """k-core peeling (Seidman 1983): iteratively remove nodes of
    degree < ``k`` until the remaining induced subgraph has minimum
    degree >= k.  Rows ``(node, deg)`` — the surviving nodes with
    their degree INSIDE the core.  ``rounds=None`` peels to the exact
    fixpoint (early-stops when a round removes nothing);
    ``rounds=R`` runs exactly R peels — the bounded-round form a SQL
    oracle can replay as an unrolled CTE chain (exact whenever the
    graph converges within R).

    Per round: degrees of the surviving subgraph (one grouped count
    over its edge endpoints) and an edge filter against the surviving
    node set — sub-threshold survivor sets broadcast once via
    ``ray.put`` and the filter is a pure ``pc.is_in`` map pass (the
    same size dispatch as :func:`bfs_hops`; above ``broadcast_nodes``
    the filter falls back to two node-keyed SEMI sort joins).  Work
    per round is edge-sized; rounds are typically few (peeling
    cascades converge in O(diameter)-ish rounds on real graphs).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds is not None and rounds < 0:
        raise ValueError("rounds must be >= 0")
    import ray as _ray

    und = undirected_edges(edges, src_col, dst_col).materialize()
    node_schema = pa.schema([("node", pa.int64())])

    def degrees(e):
        def explode(t: pa.Table) -> pa.Table:
            u = t["u"].combine_chunks() \
                if isinstance(t["u"], pa.ChunkedArray) else t["u"]
            v = t["v"].combine_chunks() \
                if isinstance(t["v"], pa.ChunkedArray) else t["v"]
            return pa.table({"node": pa.concat_arrays([u, v])})

        return sorted_groupby_agg(
            e.map_batches(explode, batch_format="pyarrow"),
            ["node"], [("node", "count", "deg")], in_schema=node_schema)

    cur = und
    n_prev = None
    r = 0
    while True:
        kk = k

        def keep_node(t: pa.Table, _k=kk) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t["deg"], _k))

        # ONE materialization per round: the degree pipeline fuses
        # straight into the filter (alive feeds count + the edge
        # filter, so it is the only handle worth pinning)
        alive = degrees(cur).map_batches(
            keep_node, batch_format="pyarrow").materialize()
        n_alive = alive.count()
        done = (rounds is not None and r >= rounds) or \
            (rounds is None and n_prev is not None and n_alive == n_prev)
        if n_alive == 0:
            # a fully-dissolved core: return a TYPED empty (an empty
            # Dataset pipeline loses its schema through the sort)
            import ray.data as rd

            return rd.from_arrow(pa.table(
                {"node": pa.array([], pa.int64()),
                 "deg": pa.array([], pa.int64())}))
        if done:
            # deg of the returned nodes is their in-core degree only
            # at the fixpoint; in bounded-round mode it is the degree
            # after the LAST completed peel — exactly what the
            # unrolled oracle computes
            return alive
        n_prev = n_alive
        r += 1
        if n_alive <= broadcast_nodes:
            arr = np.sort(np.concatenate(
                [b["node"].to_numpy(zero_copy_only=False)
                 for b in alive.select_columns(["node"])
                           .iter_batches(batch_format="pyarrow")]
            )) if n_alive else np.empty(0, dtype=np.int64)
            ref = _ray.put(arr)

            def both_alive(t: pa.Table, _r=ref) -> pa.Table:
                import pyarrow.compute as pc

                vs = pa.array(_ray.get(_r))
                m = pc.and_(pc.is_in(t["u"], value_set=vs),
                            pc.is_in(t["v"], value_set=vs))
                return t.filter(m)

            cur = und.map_batches(both_alive, batch_format="pyarrow")
        else:
            cur = sort_merge_join(und, alive, on="u", right_on="node",
                                  how="semi", left_schema=_EDGE_SCHEMA,
                                  right_schema=_DEG_SCHEMA,
                                  partitions=partitions)
            cur = sort_merge_join(cur, alive, on="v", right_on="node",
                                  how="semi", left_schema=_EDGE_SCHEMA,
                                  right_schema=_DEG_SCHEMA,
                                  partitions=partitions)


def feature_propagation(features, edges, *, rounds: int = 1,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        src_col: str = "src", dst_col: str = "dst"):
    """GNN-style neighborhood feature propagation (the SGC / LightGCN
    preprocessing step — Wu et al. 2019): per round, each node's new
    vector is the MEAN of its in-neighbors' vectors,

        x'_v = mean_{(u,v) in E} x_u

    computed distributed with the vectors travelling along the edges:
    per round TWO range sorts (the only exchanges) — (1) features
    union edge rows sorted by the source id, a per-block sweep
    replicating each source's vector onto its out-edges via ONE Arrow
    ``take`` on the list column; (2) the (dst, vec) rows sorted by
    dst, a segmented ``np.add.reduceat`` mean over the stacked
    (rows, d) matrix.  Both sweeps lean on Ray's equal-keys-one-block
    range-sort invariant used throughout this repo.

    INNER-join semantics, replayable in SQL: only nodes with at least
    one in-neighbor that HAS a feature row appear in a round's output
    (so isolated / source-only nodes drop out, and round r+1
    propagates round r's output).  Duplicate (src, dst) edges count
    once each (multigraph mean); feature ids are assumed unique.
    Values are accumulated in float64 (float32 inputs are exactly
    representable), matching SQL ``avg(val::DOUBLE)`` up to summation
    order.  Returns (node, ``emb_col`` list<double>).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    from .similarity import _emb_matrix

    vec_t = pa.list_(pa.float64())

    def tag_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        return pa.table({"key": pc.cast(t[src_col], pa.int64()),
                         "t": pa.array(np.ones(n, np.int8)),
                         "dst": pc.cast(t[dst_col], pa.int64()),
                         "vec": pa.nulls(n, vec_t)})

    def replicate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "vec": pa.array([], vec_t)})
        key = t["key"].to_numpy(zero_copy_only=False)
        tt = t["t"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        run_of = np.cumsum(np.r_[0, (key[1:] != key[:-1]).astype(np.int64)])
        m0 = tt == 0
        vec_row = np.full(len(starts), -1, dtype=np.int64)
        vec_row[run_of[m0]] = np.flatnonzero(m0)
        em = (tt == 1) & (vec_row[run_of] >= 0)
        vec = t["vec"].combine_chunks() \
            if isinstance(t["vec"], pa.ChunkedArray) else t["vec"]
        take = pa.array(vec_row[run_of[em]])
        return pa.table({"node": t["dst"].filter(pa.array(em)),
                         "vec": vec.take(take)})

    def mean_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             emb_col: pa.array([], vec_t)})
        node = t["node"].to_numpy(zero_copy_only=False)
        m = _emb_matrix(t, "vec").astype(np.float64)
        d = m.shape[1]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        sums = np.add.reduceat(m, starts, axis=0)
        cnt = np.diff(np.r_[starts, len(node)]).astype(np.float64)
        means = sums / cnt[:, None]
        off = pa.array(np.arange(len(starts) + 1, dtype=np.int32) * d)
        return pa.table({
            "node": pa.array(node[starts]),
            emb_col: pa.ListArray.from_arrays(off, pa.array(means.ravel())),
        })

    cur = features
    cur_id, cur_emb = id_col, emb_col
    for r in range(rounds):
        def tf(t: pa.Table, _id=cur_id, _emb=cur_emb) -> pa.Table:
            m = _emb_matrix(t, _emb).astype(np.float64)
            n, d = m.shape
            off = pa.array(np.arange(n + 1, dtype=np.int32) * d)
            vec = pa.ListArray.from_arrays(off, pa.array(m.ravel()))
            import pyarrow.compute as pc

            return pa.table({"key": pc.cast(t[_id], pa.int64()),
                             "t": pa.array(np.zeros(n, np.int8)),
                             "dst": pa.array(np.zeros(n, np.int64)),
                             "vec": vec})

        tagged = cur.map_batches(tf, batch_format="pyarrow").union(
            edges.map_batches(tag_edges, batch_format="pyarrow"))
        routed = tagged.sort("key").map_batches(
            replicate, batch_size=None, batch_format="pyarrow")
        cur = routed.sort("node").map_batches(
            mean_sweep, batch_size=None, batch_format="pyarrow")
        cur_id, cur_emb = "node", emb_col
    return cur


def label_propagation(edges, *, rounds: int = 3,
                      src_col: str = "src", dst_col: str = "dst",
                      partitions: int | None = None):
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) with the DETERMINISTIC tie rule that makes bounded-round
    runs SQL-replayable: every node starts labeled with its own id,
    and each round simultaneously adopts the label most frequent among
    its neighbors — ties broken by the SMALLEST label (SQL:
    ``row_number() OVER (ORDER BY c DESC, lbl ASC) = 1``).  Returns
    (node, label) after exactly ``rounds`` rounds for every node that
    has at least one edge.

    Per round: labels sort-merge-join onto the symmetrized adjacency
    (node-sized right side, ONE key range sort), a (node, lbl) grouped
    count (second range sort), and ``topk_per_group(k=1)`` whose local
    top-1 prefilter bounds that exchange at one row per (batch, node).
    All counts are exact int64; no floats anywhere, so the unrolled
    oracle replays every round bit for bit.  Synchronous LPA can
    oscillate on bipartite structures — bounded ``rounds`` is the
    contract (it is also what makes the oracle expressible); callers
    wanting a fixpoint compose with connected components instead.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    und = undirected_edges(edges, src_col, dst_col)

    def symmetrize(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() \
            if isinstance(t["u"], pa.ChunkedArray) else t["u"]
        v = t["v"].combine_chunks() \
            if isinstance(t["v"], pa.ChunkedArray) else t["v"]
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    adj = und.map_batches(symmetrize, batch_format="pyarrow").materialize()
    adj_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["a"], "lbl": t["a"]})

    lbl_schema = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])
    labels = sorted_groupby_agg(
        adj, ["a"], [("a", "min", "lbl")], in_schema=adj_schema
    ).map_batches(lambda t: t.rename_columns(["node", "lbl"]),
                  batch_format="pyarrow")

    cnt_schema = pa.schema([("a", pa.int64()), ("lbl", pa.int64()),
                            ("c", pa.int64())])
    for _ in range(rounds):
        joined = sort_merge_join(
            adj, labels, on="b", right_on="node", how="inner",
            left_schema=adj_schema, right_schema=lbl_schema,
            partitions=partitions)

        def votes(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "a" not in t.column_names:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "lbl": pa.array([], pa.int64())})
            return t.select(["a", "lbl"])

        cnt = sorted_groupby_agg(
            joined.map_batches(votes, batch_format="pyarrow"),
            ["a", "lbl"], [("a", "count", "c")],
            in_schema=pa.schema([("a", pa.int64()), ("lbl", pa.int64())]))
        top = topk_per_group(cnt, ["a"], "c", 1, descending=True,
                             tiebreak="lbl", in_schema=cnt_schema)

        def strip(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "a" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "lbl": pa.array([], pa.int64())})
            return pa.table({"node": t["a"], "lbl": t["lbl"]})

        labels = top.map_batches(strip, batch_format="pyarrow")

    def out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"node": t["node"], "label": t["lbl"]})

    return labels.map_batches(out, batch_format="pyarrow")


def shortest_paths(edges, seeds, *, rounds: int,
                   weight_col: str | None = None,
                   src_col: str = "src", dst_col: str = "dst",
                   partitions: int | None = None):
    """Weighted multi-source shortest paths by ``rounds`` synchronous
    Bellman-Ford relaxations — the weighted generalization of
    :func:`bfs_hops` (distance = sum of edge weights instead of hop
    count).  Returns (node, d): the exact shortest distance from the
    nearest seed among paths of at most ``rounds`` edges; with
    ``rounds`` >= the weighted-path diameter this is the true SSSP
    fixpoint.  Edges are DIRECTED as given (symmetrize first for
    undirected semantics); weights must be non-negative int64 (the
    all-integer arithmetic is what makes an unrolled SQL replay
    exact — no float min anywhere).

    Per round: the distance table (node-sized) sort-merge-joins the
    edge list on the source (ONE key range sort), candidates
    (dst, d + w) union the previous table, and a grouped MIN collapses
    them — every exchange edge- or node-sized, nothing dense, nothing
    on the driver.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("seeds must be non-empty")
    import pyarrow.compute as pc
    import ray.data as rd

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64())
        d = pc.cast(t[dst_col], pa.int64())
        if weight_col is None:
            w = pa.array(np.ones(t.num_rows, dtype=np.int64))
        else:
            w = pc.cast(t[weight_col], pa.int64())
            if t.num_rows and pc.min(w).as_py() < 0:
                raise ValueError("edge weights must be non-negative")
        keep = pc.and_kleene(pc.is_valid(s), pc.is_valid(d))
        return pa.table({"src": s, "dst": d, "w": w}).filter(
            pc.fill_null(keep, False))

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()
    e_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                          ("w", pa.int64())])
    dist_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    dist = rd.from_arrow(pa.table({
        "node": pa.array(seeds, pa.int64()),
        "d": pa.array(np.zeros(len(seeds), dtype=np.int64))}))

    def relax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        return pa.table({"node": t["dst"],
                         "d": pc.add(t["d"], t["w"])})

    for _ in range(rounds):
        j = sort_merge_join(e, dist, on="src", right_on="node",
                            how="inner", left_schema=e_schema,
                            right_schema=dist_schema,
                            partitions=partitions)
        cand = j.map_batches(relax, batch_format="pyarrow")
        dist = sorted_groupby_agg(dist.union(cand), ["node"],
                                  [("d", "min", "d")],
                                  in_schema=dist_schema)
    return dist


def negative_edges(edges, *, num_nodes: int, per_node: int = 4,
                   salt: int = 0, src_col: str = "src",
                   dst_col: str = "dst", partitions: int | None = None):
    """Deterministic NEGATIVE sampling for link-prediction training:
    for every distinct source in the edge set, propose ``per_node``
    candidate destinations content-addressed as
    ``md5_low64(f"{src},{slot},{salt}") % num_nodes`` (node ids are a
    dense ``[0, num_nodes)`` range by contract, like the rest of the
    graph family), then drop self-loops and proposals that are REAL
    edges.  Content addressing makes the sample re-shard stable,
    RNG-state-free, and exactly replayable by DuckDB's
    ``md5_number_lower(s::VARCHAR || ',' || j::VARCHAR || ',salt')``
    — the training/eval split every GNN pipeline draws, reproducible
    across engines.

    Plan: per-batch local-distinct sources → ONE source-sized grouped
    distinct → a pure row-expanding map emitting ``per_node`` slots
    per source → ONE (src, dst) sort-merge ANTI join against the edge
    set.  Output (src, dst, slot); (src, slot) is unique by
    construction, and a destination hit by two slots keeps both rows
    (the slot column is the identity — drop it to dedup).  Returns
    rows in no particular order."""
    from .aggregates import sorted_groupby_agg
    from .join import sort_merge_join
    from ..functions.hashing import md5_low64_batch

    if not (isinstance(num_nodes, int) and num_nodes > 0):
        raise ValueError(f"num_nodes must be a positive int, got {num_nodes!r}")
    if not (isinstance(per_node, int) and per_node >= 1):
        raise ValueError(f"per_node must be an int >= 1, got {per_node!r}")

    src_schema = pa.schema([("s", pa.int64())])

    def local_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return src_schema.empty_table()
        s = t[src_col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        if s.null_count:
            raise ValueError("negative_edges: NULL source id")
        u = np.unique(s.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"s": pa.array(u)})

    srcs = sorted_groupby_agg(
        edges.map_batches(local_src, batch_format="pyarrow"),
        ["s"], [("s", "count", "_m")],
        in_schema=src_schema)

    prop_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                             ("slot", pa.int64())])

    def propose(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s" not in t.column_names:
            return prop_schema.empty_table()
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        src_rep = np.repeat(s, per_node)
        slot = np.tile(np.arange(per_node, dtype=np.int64), len(s))
        keys = [f"{a},{j},{salt}" for a, j in zip(src_rep, slot)]
        dst = (md5_low64_batch(keys) % np.uint64(num_nodes)).astype(np.int64)
        keep = dst != src_rep
        return pa.table({"src": pa.array(src_rep[keep]),
                         "dst": pa.array(dst[keep]),
                         "slot": pa.array(slot[keep])})

    props = srcs.map_batches(propose, batch_format="pyarrow")

    def edge_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        s = t[src_col]
        d = t[dst_col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        return pa.table({"src": s.cast(pa.int64()),
                         "dst": d.cast(pa.int64())})

    real = edges.map_batches(edge_rows, batch_format="pyarrow")
    return sort_merge_join(
        props, real, on=["src", "dst"], how="anti",
        left_schema=prop_schema,
        right_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        partitions=partitions)


def modularity(edges, labels, *, src_col: str = "src",
               dst_col: str = "dst", node_col: str = "node",
               label_col: str = "label", partitions: int | None = None):
    """Newman-Girvan modularity of a node partition over the
    undirected simple graph — the community-quality score every
    clustering evaluation reports:

      Q = Σ_c [ e_c/m  −  (deg_c / 2m)² ]

    with e_c = edges whose BOTH endpoints carry label c, deg_c = sum
    of member degrees, m = |undirected distinct edges|.  e_c and
    deg_c stay EXACT int64 through the whole plan and 2m = Σ_c deg_c
    by the handshake identity, so the only float work is the final
    per-community closed form — deterministic on both engines.

    Plan: canonicalize to distinct undirected edges (one range sort)
    → labels sort-merge-join onto u then onto v (two node-keyed range
    sorts; labels must cover every endpoint — inner-join semantics,
    matching label_propagation's every-edged-node output) → per-batch
    (label → e_in, deg) partials → ONE label-bounded grouped sum →
    label-bounded finalize.  Returns one row per community
    (label, e_in, deg, q_term) with Q = Σ q_term; empty graphs raise
    (modularity of nothing is undefined)."""
    und = undirected_edges(edges, src_col, dst_col)
    lab = labels.map_batches(
        lambda t: pa.table({"node": t[node_col], "lbl": t[label_col]}),
        batch_format="pyarrow")
    lab_schema = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])
    j1 = sort_merge_join(
        und, lab, on="u", right_on="node",
        left_schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
        right_schema=lab_schema, partitions=partitions)
    j2 = sort_merge_join(
        j1, lab, on="v", right_on="node", suffix="_v",
        left_schema=pa.schema([("u", pa.int64()), ("v", pa.int64()),
                               ("lbl", pa.int64())]),
        right_schema=lab_schema, partitions=partitions)

    part_schema = pa.schema([("lbl", pa.int64()), ("e_in", pa.int64()),
                             ("deg", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        lu = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        lv = t["lbl_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        both = np.concatenate([lu, lv])
        u_all, inv = np.unique(both, return_inverse=True)
        deg = np.bincount(inv, minlength=u_all.size)
        same = lu == lv
        e_in = np.bincount(
            np.searchsorted(u_all, lu[same]), minlength=u_all.size)
        return pa.table({"lbl": pa.array(u_all),
                         "e_in": pa.array(e_in.astype(np.int64)),
                         "deg": pa.array(deg.astype(np.int64))})

    agg = sorted_groupby_agg(
        j2.map_batches(partials, batch_format="pyarrow"),
        ["lbl"], [("e_in", "sum", "e_in"), ("deg", "sum", "deg")],
        in_schema=part_schema)

    tabs = [b for b in agg.iter_batches(batch_format="pyarrow")
            if b.num_rows and "lbl" in b.column_names]   # label-bounded
    if not tabs:
        raise ValueError("modularity: empty graph — undefined")
    cells = pa.concat_tables(tabs)
    lbl = cells["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
    e_in = cells["e_in"].to_numpy(zero_copy_only=False).astype(np.int64)
    deg = cells["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    two_m = int(deg.sum())                    # handshake: Σ deg_c = 2m
    m = two_m // 2
    q = e_in / float(m) - (deg / float(two_m)) ** 2
    order = np.argsort(lbl)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "label": pa.array(lbl[order]),
        "e_in": pa.array(e_in[order]),
        "deg": pa.array(deg[order]),
        "q_term": pa.array(q[order], pa.float64()),
    }))
