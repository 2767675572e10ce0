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

from .aggregates import sorted_groupby_agg, static_schema
from .join import sort_merge_join

__all__ = ["undirected_edges", "triangle_counts", "local_clustering",
           "bfs_hops"]


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


def _triangle_plan(edges, src_col: str, dst_col: str, *,
                   partitions: int | None):
    """Shared plan: returns ``(per-node triangle counts, degrees)`` —
    both Datasets, degrees materialized (it feeds three joins)."""
    # und / deg / oe each feed MULTIPLE downstream consumers; a lazy
    # Dataset would re-execute its whole lineage once per consumer
    # (the joins would rebuild the distinct + degree passes three
    # times over).  They are edge-/node-sized narrow int64 tables —
    # pinning them as object-store blocks is the intended checkpoint,
    # not a driver materialization.
    und = undirected_edges(edges, src_col, dst_col).materialize()

    # -- degrees ------------------------------------------------------
    def explode_endpoints(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) else t["u"]
        v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) else t["v"]
        return pa.table({"node": pa.concat_arrays([u, v])})

    deg = sorted_groupby_agg(
        und.map_batches(explode_endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")],
        in_schema=pa.schema([("node", pa.int64())])).materialize()

    # -- attach degrees, orient --------------------------------------
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

    # -- wedges: out-pair self-join on the center ----------------------
    wedges_raw = sort_merge_join(oe, oe, on="a", left_schema=_OE_SCHEMA,
                                 right_schema=_OE_SCHEMA,
                                 partitions=partitions)

    def keep_ordered(t: pa.Table) -> pa.Table:
        b = t["b"].to_numpy(zero_copy_only=False)
        db = t["db"].to_numpy(zero_copy_only=False)
        b2 = t["b_r"].to_numpy(zero_copy_only=False)
        db2 = t["db_r"].to_numpy(zero_copy_only=False)
        keep = (db < db2) | ((db == db2) & (b < b2))
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        m = pa.array(keep)
        return pa.table({"center": a.filter(m),
                         "x": pa.array(b[keep]), "y": pa.array(b2[keep])})

    wedges = wedges_raw.map_batches(keep_ordered, batch_format="pyarrow")
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
             dst_col: str = "dst", partitions: int | None = None):
    """Multi-source BFS levels over the undirected graph: rows
    ``(node, hop)`` where ``hop`` is the minimum edge count from any
    seed, for every node within ``max_hops`` (seeds themselves are
    hop 0, present even when isolated).  The crawl-depth /
    degrees-of-separation primitive.

    Level-synchronous frontier expansion (the Pregel/Pegasus BFS
    shape): per round, ONE frontier⨝adjacency sort-merge join expands
    the frontier, a grouped-min dedups it, and an ANTI join against
    the settled set keeps only first-time nodes — every exchange is
    frontier- or adjacency-sized, narrow int64 keys, and a node
    settles exactly once so the total work over all rounds is
    O(E + V) rows.  ``seeds`` is a driver-side list by contract
    (query/crawl seed sets are small); the frontier/settled sets stay
    Datasets throughout.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("seeds must be non-empty")
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

    for hop in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        # expand: neighbors of the frontier (the join ships only the
        # int64 key — frontier rows have no payload)
        nxt = sort_merge_join(adj, frontier, on="a", right_on="node",
                              how="semi", left_schema=adj_schema,
                              right_schema=node_schema,
                              partitions=partitions)
        nxt = nxt.map_batches(
            lambda t: pa.table({"node": t["b"]}), batch_format="pyarrow")
        # dedup within the level, then drop already-settled nodes
        nxt = sorted_groupby_agg(nxt, ["node"],
                                 [("node", "count", "_m")],
                                 in_schema=node_schema)
        nxt = nxt.map_batches(lambda t: t.drop_columns(["_m"]),
                              batch_format="pyarrow")
        fresh = sort_merge_join(
            nxt, settled, on="node", how="anti",
            left_schema=node_schema,
            right_schema=pa.schema([("node", pa.int64()),
                                    ("hop", pa.int64())]),
            partitions=partitions).materialize()
        if fresh.count() == 0:
            break
        h = hop

        def stamp(t: pa.Table, _h=h) -> pa.Table:
            return t.append_column(
                "hop", pa.array(np.full(t.num_rows, _h, dtype=np.int64)))

        settled = settled.union(
            fresh.map_batches(stamp, batch_format="pyarrow")).materialize()
        frontier = fresh

    return settled
