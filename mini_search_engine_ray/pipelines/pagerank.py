"""PageRank + score fusion (the IcsSearchEngine surface).

Reference recurrence (`search/IcsSearchEngine.java:116-164`):
UNNORMALIZED damped PageRank, d = 0.85, init 1.0, 100 iterations:

    score_new[v] = (1 - d) + d * sum_{(u,v) in E} score_old[u] / outdeg[u]

Nodes with no out-edges contribute nothing (no dangling-mass
redistribution); there is NO 1/N term. Fusion
(`search/IcsSearchEngine.java:199-234`): fused = base_score +
w * pagerank, sorted desc, top-k.

Three implementations with identical results (tested), by scale tier:
  * `pagerank_numpy` — CSR-style vectorized driver loop; the edge list
    for even a 10^9-page web graph is narrow (two int64 columns), so
    iterating in memory on one node is usually right below ~10^9 edges.
  * `pagerank_dataset` — edges stay a distributed Dataset; the DENSE
    score vector is broadcast per iteration (8 bytes/node — fine to
    ~10^9 nodes); one groupby shuffle per iteration.
  * `pagerank_dataset_join` — scores-join-edges: scores themselves are
    a (node, score) Dataset, nothing dense anywhere; two exchanges per
    iteration. For node counts beyond one worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAMPING = 0.85
ITERATIONS = 100


def pagerank_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    personalization: np.ndarray | None = None,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized reference-exact PageRank; returns scores[node].

    ``personalization``: optional per-node teleport weights (the
    personalized-PageRank variant — e.g. 1.0 on a seed set, 0
    elsewhere): iteration becomes ``(1-d)*p_i + d*sum`` starting from
    ``p``; ``None`` keeps the reference's uniform behavior exactly
    (all-ones start, constant ``1-d`` base).

    ``weights``: optional per-EDGE positive weights (weighted
    PageRank — e.g. click counts on links): edge (u, v) carries the
    fraction w_e / sum of u's outgoing weights instead of 1/outdeg.
    Arithmetic is exactly ``score * (w / out_w)`` — the same two IEEE
    ops a SQL replay computes — and ``None`` keeps the unweighted
    path byte-identical to before (multiply by the precomputed
    reciprocal)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if personalization is None:
        personal = np.ones(num_nodes, dtype=np.float64)
    else:
        personal = np.asarray(personalization, dtype=np.float64)
        if personal.shape != (num_nodes,):
            raise ValueError(
                f"personalization must have shape ({num_nodes},), "
                f"got {personal.shape}")
    if weights is None:
        outdeg = np.bincount(src, minlength=num_nodes).astype(np.float64)
        inv_out = np.zeros(num_nodes)
        nz = outdeg > 0
        inv_out[nz] = 1.0 / outdeg[nz]
        frac = inv_out[src]
    else:
        w = np.asarray(weights, dtype=np.float64)
        if w.shape != src.shape:
            raise ValueError("weights must have one entry per edge")
        if w.size and w.min() <= 0:
            raise ValueError("edge weights must be positive")
        out_w = np.zeros(num_nodes)
        np.add.at(out_w, src, w)
        frac = w / out_w[src]
    scores = personal.copy()
    base = (1.0 - damping) * personal
    for _ in range(iterations):
        contrib = scores[src] * frac
        new = base.copy()
        np.add.at(new, dst, damping * contrib)
        # exact reference arithmetic: (1-d)*p + d * sum
        scores = new
    return scores


def pagerank_dataset(
    edges_ds,
    num_nodes: int,
    *,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    personalization=None,
    weight_col: str | None = None,
):
    """Distributed PageRank over an edges Dataset (src:int64, dst:int64).

    ``weight_col``: optional positive per-edge weight column — edge
    (u, v) then carries ``score * (w / out_w[u])`` (weighted PageRank;
    the out-weight pass becomes a grouped SUM instead of a count, the
    same single exchange). ``None`` keeps the unweighted arithmetic
    byte-identical to before.

    Per iteration: the score vector (8 bytes/node) is broadcast as ONE
    object-store ref; `map_batches` computes per-edge contributions;
    `groupby(dst)` sums them; the new score vector is assembled FROM THE
    AGGREGATE'S BLOCK REFS inside a Ray task (`_assemble_scores`) whose
    result becomes the next broadcast ref. The driver only moves
    ObjectRefs — O(1) driver transfer per iteration, no take_all().
    Returns a Dataset-ready Arrow table (node:int64, score:float64).

    Scale shape: EDGES stay distributed and arbitrarily large; the dense
    score vector must fit one worker's heap (8 GB at 10^9 nodes). For
    node counts beyond that use `pagerank_dataset_join` (scores as a
    Dataset, one more exchange per iteration).
    """
    import ray

    from ..stages.aggregates import sorted_groupby_agg

    @ray.remote
    def _assemble_inv_out(num_nodes: int, *blocks) -> np.ndarray:
        inv = np.zeros(num_nodes)
        for b in blocks:
            if b.num_rows == 0 or "src" not in b.column_names:
                continue  # empty aggregate blocks carry no schema
            src = b["src"].to_numpy(zero_copy_only=False)
            cnt = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
            inv[src] = 1.0 / cnt
        return inv

    @ray.remote
    def _assemble_scores(base: np.ndarray, damping: float, *blocks) -> np.ndarray:
        new = base.copy()
        for b in blocks:
            if b.num_rows == 0 or "dst" not in b.column_names:
                continue  # empty aggregate blocks carry no schema
            dst = b["dst"].to_numpy(zero_copy_only=False)
            s = b["c_sum"].to_numpy(zero_copy_only=False)
            new[dst] = base[dst] + damping * s
        return new

    # materialize edges FIRST: outdegree and the iteration loop both
    # consume them, and a lazy handle would re-execute the upstream
    # edge pipeline once per consumer
    edges_ds = edges_ds.materialize()

    @ray.remote
    def _assemble_out_w(num_nodes: int, *blocks) -> np.ndarray:
        ow = np.zeros(num_nodes)
        for b in blocks:
            if b.num_rows == 0 or "src" not in b.column_names:
                continue  # empty aggregate blocks carry no schema
            src = b["src"].to_numpy(zero_copy_only=False)
            ow[src] = b["wsum"].to_numpy(zero_copy_only=False)
        return ow

    # sorted reduceat reduction, NOT native groupby().aggregate(): the
    # native combine is per-row Python (~60x slower at per-node key
    # cardinality; see stages/aggregates.py)
    if weight_col is None:
        outdeg_blocks = sorted_groupby_agg(
            edges_ds, ["src"], [("src", "count", "count()")]
        ).to_arrow_refs()
        inv_ref = _assemble_inv_out.remote(num_nodes, *outdeg_blocks)
    else:
        out_w_blocks = sorted_groupby_agg(
            edges_ds, ["src"], [(weight_col, "sum", "wsum")]
        ).to_arrow_refs()
        out_w_ref = _assemble_out_w.remote(num_nodes, *out_w_blocks)

    if personalization is None:
        personal = np.ones(num_nodes, dtype=np.float64)
        base = np.full(num_nodes, 1.0 - damping)
    else:
        personal = np.asarray(personalization, dtype=np.float64)
        if personal.shape != (num_nodes,):
            raise ValueError(
                f"personalization must have shape ({num_nodes},), "
                f"got {personal.shape}")
        base = (1.0 - damping) * personal
    base_ref = ray.put(base)
    score_ref = ray.put(personal)
    for _ in range(iterations):

        if weight_col is None:
            def contrib(t: pa.Table, _s=score_ref, _i=inv_ref) -> pa.Table:
                import ray as _ray

                s = _ray.get(_s)
                io = _ray.get(_i)
                src = t["src"].to_numpy(zero_copy_only=False)
                c = s[src] * io[src]
                return pa.table({"dst": t["dst"], "c": pa.array(c)})
        else:
            def contrib(t: pa.Table, _s=score_ref,
                        _o=out_w_ref) -> pa.Table:
                import ray as _ray

                s = _ray.get(_s)
                ow = _ray.get(_o)
                src = t["src"].to_numpy(zero_copy_only=False)
                w = t[weight_col].to_numpy(
                    zero_copy_only=False).astype(np.float64)
                # score * (w / out_w): the same two IEEE ops the SQL
                # replay computes
                c = s[src] * (w / ow[src])
                return pa.table({"dst": t["dst"], "c": pa.array(c)})

        sum_blocks = sorted_groupby_agg(
            edges_ds.map_batches(contrib, batch_format="pyarrow"),
            ["dst"], [("c", "sum", "c_sum")],
        ).to_arrow_refs()
        score_ref = _assemble_scores.remote(base_ref, damping, *sum_blocks)
    scores = ray.get(score_ref)
    return pa.table(
        {"node": pa.array(np.arange(num_nodes, dtype=np.int64)), "score": pa.array(scores)}
    )


def pagerank_dataset_join(
    edges_ds,
    num_nodes: int,
    *,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
):
    """Scores-JOIN-edges PageRank — the variant for node counts whose
    dense score vector no longer fits one worker's heap
    (`pagerank_dataset` broadcasts 8 GB at 10^9 nodes; here scores
    live in a (node, score) Dataset end to end). Reference-exact
    recurrence (init 1.0, no dangling redistribution, no 1/N term);
    equality vs `pagerank_numpy` is tested (allclose — distributed
    Sum order differs by ulps).

    Per iteration, TWO all-to-all exchanges — the unavoidable price of
    not materializing scores:
      1. cogroup on src: one range sort of edges ∪ per-node state
         (equal keys never straddle sort partitions — the map_groups
         invariant — so a vectorized per-block sweep sees each node's
         state row and its out-edges together) emitting per-edge
         contributions (dst, score/outdeg);
      2. groupby(dst).Sum — inbound mass, folded into the NEXT
         iteration's cogroup (nodes absent default to score 1-d).

    Rows are (key, t, w, s, dst) with t ordering state-before-edges:
      t=0 node base (w = 1/outdeg, 0 for sinks), t=1 inbound sum s,
      t=2 out-edge. Nodes are assumed to be 0..num_nodes-1 (every
      edge endpoint has a base row).
    """
    import ray.data as rd

    from ..stages.aggregates import sorted_groupby_agg

    zero8 = lambda n: pa.array(np.zeros(n, dtype=np.int8))  # noqa: E731
    zerof = lambda n: pa.array(np.zeros(n, dtype=np.float64))  # noqa: E731
    zeroi = lambda n: pa.array(np.zeros(n, dtype=np.int64))  # noqa: E731

    # materialize once: outdegree AND per-iteration edge tagging both
    # consume the edges; a lazy handle would re-run the upstream
    # pipeline for each
    edges_ds = edges_ds.materialize()

    # -- static per-node base: w = 1/outdeg (one cogroup, once) --------
    def tag_nodes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"key": t["id"], "t": zero8(n), "w": zerof(n), "dst": zeroi(n)})

    def tag_outdeg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or "src" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()), "t": pa.array([], pa.int8()),
                             "w": pa.array([], pa.float64()), "dst": pa.array([], pa.int64())})
        cnt = t["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"key": t["src"],
                         "t": pa.array(np.ones(n, dtype=np.int8)),
                         "w": pa.array(1.0 / cnt), "dst": zeroi(n)})

    def base_sweep(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()), "w": pa.array([], pa.float64())})
        if t.num_rows == 0 or "key" not in t.column_names:
            return empty
        key = t["key"].to_numpy(zero_copy_only=False)
        tt = t["t"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        run_of = np.cumsum(np.r_[0, (key[1:] != key[:-1]).astype(np.int64)])
        w_run = np.zeros(len(starts))
        m = tt == 1
        w_run[run_of[m]] = w[m]
        return pa.table({"node": pa.array(key[starts]), "w": pa.array(w_run)})

    nodes = rd.range(num_nodes).map_batches(tag_nodes, batch_format="pyarrow")
    outdeg = sorted_groupby_agg(
        edges_ds, ["src"], [("src", "count", "count()")]
    ).map_batches(tag_outdeg, batch_format="pyarrow")
    base = (
        nodes.union(outdeg).sort("key")
        .map_batches(base_sweep, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    # -- tagged invariants reused every iteration ----------------------
    def tag_base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"key": t["node"], "t": zero8(n), "w": t["w"],
                         "s": zerof(n), "dst": zeroi(n)})

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"key": t["src"], "t": pa.array(np.full(n, 2, dtype=np.int8)),
                         "w": zerof(n), "s": zerof(n), "dst": t["dst"]})

    def tag_sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()), "t": pa.array([], pa.int8()),
                             "w": pa.array([], pa.float64()), "s": pa.array([], pa.float64()),
                             "dst": pa.array([], pa.int64())})
        n = t.num_rows
        return pa.table({"key": t["dst"], "t": pa.array(np.ones(n, dtype=np.int8)),
                         "w": zerof(n), "s": t["s"], "dst": zeroi(n)})

    base_tagged = base.map_batches(tag_base, batch_format="pyarrow").materialize()
    edges_tagged = edges_ds.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def make_sweep(init: bool):
        def contrib_sweep(t: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()), "c": pa.array([], pa.float64())})
            if t.num_rows == 0 or "key" not in t.column_names:
                return empty
            key = t["key"].to_numpy(zero_copy_only=False)
            tt = t["t"].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            s = t["s"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            run_of = np.cumsum(np.r_[0, (key[1:] != key[:-1]).astype(np.int64)])
            nr = len(starts)
            w_run = np.zeros(nr)
            m0 = tt == 0
            w_run[run_of[m0]] = w[m0]
            if init:
                score_run = np.ones(nr)
            else:
                s_run = np.zeros(nr)
                m1 = tt == 1
                s_run[run_of[m1]] = s[m1]
                score_run = (1.0 - damping) + damping * s_run
            v_run = score_run * w_run
            em = tt == 2
            if not em.any():
                return empty
            return pa.table({"dst": pa.array(dst[em]), "c": pa.array(v_run[run_of[em]])})

        return contrib_sweep

    sums = None
    for it in range(iterations):
        parts = base_tagged.union(edges_tagged)
        if sums is not None:
            parts = parts.union(sums.map_batches(tag_sums, batch_format="pyarrow"))
        contrib = parts.sort("key").map_batches(
            make_sweep(init=sums is None), batch_size=None, batch_format="pyarrow"
        )
        sums = sorted_groupby_agg(contrib, ["dst"], [("c", "sum", "s")]).materialize()

    if sums is None:  # iterations == 0: parity with pagerank_numpy's init
        return rd.range(num_nodes).map_batches(
            lambda t: pa.table({"node": t["id"],
                                "score": pa.array(np.ones(t.num_rows))}),
            batch_format="pyarrow")

    # -- final scores: one more cogroup of base ∪ sums -----------------
    def final_sweep(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
        if t.num_rows == 0 or "key" not in t.column_names:
            return empty
        key = t["key"].to_numpy(zero_copy_only=False)
        tt = t["t"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        run_of = np.cumsum(np.r_[0, (key[1:] != key[:-1]).astype(np.int64)])
        s_run = np.zeros(len(starts))
        m1 = tt == 1
        s_run[run_of[m1]] = s[m1]
        return pa.table({"node": pa.array(key[starts]),
                         "score": pa.array((1.0 - damping) + damping * s_run)})

    out = base_tagged.union(sums.map_batches(tag_sums, batch_format="pyarrow"))
    return out.sort("key").map_batches(
        final_sweep, batch_size=None, batch_format="pyarrow"
    )


def fuse_scores(
    doc_ids: np.ndarray,
    base_scores: np.ndarray,
    pagerank: np.ndarray,
    *,
    weight: float,
    top_k: int | None,
) -> tuple[np.ndarray, np.ndarray]:
    """fused = base + weight * pagerank[doc]; desc, ties by doc_id.
    weight=0 degrades exactly to the base ranking
    (`IcsSearchEngineTest.java:84-140`).  Docs beyond the score
    vector's length (corpus larger than the id-graph) contribute
    pagerank 0 instead of raising — the reference sizes its array by
    the document count, so an absent graph node scores 0 there too."""
    n_pr = len(pagerank)
    if n_pr == 0:
        # empty id-graph: every doc is out-of-graph, pagerank 0 — the
        # np.where below would still eagerly index the size-0 array
        pr = np.zeros(len(doc_ids))
    else:
        in_range = doc_ids < n_pr
        pr = np.where(in_range,
                      pagerank[np.minimum(doc_ids, n_pr - 1)], 0.0)
    fused = base_scores + weight * pr
    order = np.lexsort((doc_ids, -fused))
    if top_k is not None:
        order = order[:top_k]
    return doc_ids[order], fused[order]


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999) — fixed-point, max-normalized
# ---------------------------------------------------------------------------

HITS_SCALE = 100_000


def hits_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    iterations: int = 16,
    scale: int = HITS_SCALE,
) -> tuple[np.ndarray, np.ndarray]:
    """HITS (Kleinberg 1999) in the DETERMINISTIC fixed-point form:
    scores are int64 multiples of 1/scale, each half-iteration is an
    EXACT integer sum over in/out edges followed by max-normalization
    via one integer floor division — so every value is replayable bit
    for bit by any engine (the aa_fx contract; no float sum order
    anywhere).  Returns ``(auth_fx, hub_fx)`` int64 arrays.

        hub_0      = scale everywhere
        auth_raw[v]= sum_{(u,v)} hub[u]          (exact int64)
        auth       = (auth_raw * scale) // max(auth_raw)
        hub_raw[u] = sum_{(u,v)} auth[v]
        hub        = (hub_raw * scale) // max(hub_raw)

    Classic L2-normalized HITS converges to the same ranking; max
    normalization keeps the arithmetic closed over the integers.  The
    all-zero side (edge-less graph) stays zero.  Overflow bound
    (asserted): max in/out degree * scale^2 must fit int64 — at the
    default scale that allows degrees to ~9.2e8.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    lim = (2**63 - 1) // scale
    auth = np.zeros(num_nodes, dtype=np.int64)
    hub = np.full(num_nodes, scale, dtype=np.int64)

    def _norm(raw: np.ndarray) -> np.ndarray:
        m = int(raw.max()) if raw.size else 0
        if m == 0:
            return raw
        if m > lim:
            raise OverflowError(
                f"fixed-point overflow: max raw score {m} * scale "
                f"{scale} exceeds int64; lower scale or iterations")
        return (raw * scale) // m

    for _ in range(iterations):
        raw_a = np.zeros(num_nodes, dtype=np.int64)
        np.add.at(raw_a, dst, hub[src])
        auth = _norm(raw_a)
        raw_h = np.zeros(num_nodes, dtype=np.int64)
        np.add.at(raw_h, src, auth[dst])
        hub = _norm(raw_h)
    return auth, hub


def hits_dataset(
    edges_ds,
    num_nodes: int,
    *,
    iterations: int = 16,
    scale: int = HITS_SCALE,
):
    """Distributed HITS over an edges Dataset (src, dst int64) —
    bit-identical to :func:`hits_numpy` (tested ==, not allclose:
    integer arithmetic has no order sensitivity).

    The `pagerank_dataset` shape: the dense int64 score vector
    (8 bytes/node, fine to ~10^9 nodes/worker-heap) is broadcast as
    ONE object-store ref per half-iteration; per-edge contributions
    are a pure map; ONE grouped int sum per direction
    (`sorted_groupby_agg` — the only exchanges); the new vector is
    assembled + max-normalized FROM THE AGGREGATE'S BLOCK REFS inside
    a Ray task so the driver only moves ObjectRefs.  Returns an Arrow
    table (node, auth_fx, hub_fx).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    import ray

    from ..stages.aggregates import sorted_groupby_agg

    lim = (2**63 - 1) // scale

    @ray.remote
    def _assemble_norm(num_nodes: int, key: str, *blocks) -> np.ndarray:
        raw = np.zeros(num_nodes, dtype=np.int64)
        for b in blocks:
            if b.num_rows == 0 or key not in b.column_names:
                continue  # empty sort-boundary blocks carry no schema
            k = b[key].to_numpy(zero_copy_only=False)
            raw[k] = b["c_sum"].to_numpy(zero_copy_only=False)
        m = int(raw.max()) if raw.size else 0
        if m == 0:
            return raw
        if m > lim:
            raise OverflowError(
                f"fixed-point overflow: max raw score {m} * scale "
                f"{scale} exceeds int64; lower scale or iterations")
        return (raw * scale) // m

    edges_ds = edges_ds.materialize()
    hub_ref = ray.put(np.full(num_nodes, scale, dtype=np.int64))
    auth_ref = ray.put(np.zeros(num_nodes, dtype=np.int64))

    def _push(score_ref, from_col: str, to_col: str):
        def contrib(t: pa.Table, _s=score_ref) -> pa.Table:
            import ray as _ray

            s = _ray.get(_s)
            f = t[from_col].to_numpy(zero_copy_only=False)
            return pa.table({to_col: t[to_col], "c": pa.array(s[f])})

        blocks = sorted_groupby_agg(
            edges_ds.map_batches(contrib, batch_format="pyarrow"),
            [to_col], [("c", "sum", "c_sum")],
            in_schema=pa.schema([(to_col, pa.int64()),
                                 ("c", pa.int64())]),
        ).to_arrow_refs()
        return _assemble_norm.remote(num_nodes, to_col, *blocks)

    for _ in range(iterations):
        auth_ref = _push(hub_ref, "src", "dst")
        hub_ref = _push(auth_ref, "dst", "src")
    auth, hub = ray.get([auth_ref, hub_ref])
    return pa.table({
        "node": pa.array(np.arange(num_nodes, dtype=np.int64)),
        "auth_fx": pa.array(auth),
        "hub_fx": pa.array(hub),
    })
