"""PageRank + score fusion (the IcsSearchEngine surface).

Reference recurrence (`search/IcsSearchEngine.java:116-164`):
UNNORMALIZED damped PageRank, d = 0.85, init 1.0, 100 iterations:

    score_new[v] = (1 - d) + d * sum_{(u,v) in E} score_old[u] / outdeg[u]

Nodes with no out-edges contribute nothing (no dangling-mass
redistribution); there is NO 1/N term. Fusion
(`search/IcsSearchEngine.java:199-234`): fused = base_score +
w * pagerank, sorted desc, top-k.

Two implementations with identical results (tested):
  * `pagerank_numpy` — CSR-style vectorized driver loop; the edge list
    for even a 10^9-page web graph is narrow (two int64 columns), so
    iterating in memory on one node is usually right below ~10^9 edges.
  * `pagerank_dataset` — distributed Ray Data loop (edges join scores,
    groupby(dst).sum) for graphs whose score vector exceeds one node's
    memory; one groupby shuffle per iteration, partitioned by dst.
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
) -> np.ndarray:
    """Vectorized reference-exact PageRank; returns scores[node]."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    outdeg = np.bincount(src, minlength=num_nodes).astype(np.float64)
    scores = np.ones(num_nodes, dtype=np.float64)
    inv_out = np.zeros(num_nodes)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    for _ in range(iterations):
        contrib = scores[src] * inv_out[src]
        new = np.full(num_nodes, 1.0 - damping)
        np.add.at(new, dst, damping * contrib)
        # exact reference arithmetic: (1-d) + d * sum
        scores = new
    return scores


def pagerank_dataset(
    edges_ds,
    num_nodes: int,
    *,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
):
    """Distributed PageRank over an edges Dataset (src:int64, dst:int64).

    Per iteration: the score vector (8 bytes/node) is broadcast as ONE
    object-store ref; `map_batches` computes per-edge contributions;
    `groupby(dst)` sums them; the new score vector is assembled FROM THE
    AGGREGATE'S BLOCK REFS inside a Ray task (`_assemble_scores`) whose
    result becomes the next broadcast ref. The driver only moves
    ObjectRefs — O(1) driver transfer per iteration, no take_all().
    Returns a Dataset-ready Arrow table (node:int64, score:float64).

    Scale shape: EDGES stay distributed and arbitrarily large; the dense
    score vector must fit one worker's heap (8 GB at 10^9 nodes). For
    node counts beyond that this loop becomes scores-join-edges
    (`Dataset.join`), same structure with one more shuffle per
    iteration.
    """
    import ray
    from ray.data.aggregate import Sum

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
    def _assemble_scores(num_nodes: int, damping: float, *blocks) -> np.ndarray:
        new = np.full(num_nodes, 1.0 - damping)
        for b in blocks:
            if b.num_rows == 0 or "dst" not in b.column_names:
                continue  # empty aggregate blocks carry no schema
            dst = b["dst"].to_numpy(zero_copy_only=False)
            s = b["c_sum"].to_numpy(zero_copy_only=False)
            new[dst] = (1.0 - damping) + damping * s
        return new

    outdeg_blocks = edges_ds.groupby("src").count().to_arrow_refs()
    inv_ref = _assemble_inv_out.remote(num_nodes, *outdeg_blocks)

    score_ref = ray.put(np.ones(num_nodes, dtype=np.float64))
    edges_ds = edges_ds.materialize()
    for _ in range(iterations):

        def contrib(t: pa.Table, _s=score_ref, _i=inv_ref) -> pa.Table:
            import ray as _ray

            s = _ray.get(_s)
            io = _ray.get(_i)
            src = t["src"].to_numpy(zero_copy_only=False)
            c = s[src] * io[src]
            return pa.table({"dst": t["dst"], "c": pa.array(c)})

        sum_blocks = (
            edges_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c_sum"))
            .to_arrow_refs()
        )
        score_ref = _assemble_scores.remote(num_nodes, damping, *sum_blocks)
    scores = ray.get(score_ref)
    return pa.table(
        {"node": pa.array(np.arange(num_nodes, dtype=np.int64)), "score": pa.array(scores)}
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
    (`IcsSearchEngineTest.java:84-140`)."""
    fused = base_scores + weight * pagerank[doc_ids]
    order = np.lexsort((doc_ids, -fused))
    if top_k is not None:
        order = order[:top_k]
    return doc_ids[order], fused[order]
