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

    Per iteration: broadcast the score vector (narrow: 8 bytes/node) via
    ray.put, map_batches computes per-edge contributions, groupby(dst)
    sums. Returns a Dataset (node:int64, score:float64).

    Note: the score vector is broadcast, the EDGES stay distributed —
    at web scale edges >> nodes; if nodes also outgrow memory this loop
    becomes scores-join-edges, same shape, one more shuffle per iter.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # out-degree (one shuffle, reused every iteration)
    outdeg_rows = edges_ds.groupby("src").count().take_all()
    outdeg = np.zeros(num_nodes, dtype=np.float64)
    for r in outdeg_rows:
        outdeg[r["src"]] = r["count()"]
    inv_out = np.zeros(num_nodes)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    inv_ref = ray.put(inv_out)

    scores = np.ones(num_nodes, dtype=np.float64)
    edges_ds = edges_ds.materialize()
    for _ in range(iterations):
        score_ref = ray.put(scores)

        def contrib(t: pa.Table, _s=score_ref, _i=inv_ref) -> pa.Table:
            import ray as _ray

            s = _ray.get(_s)
            io = _ray.get(_i)
            src = t["src"].to_numpy(zero_copy_only=False)
            c = s[src] * io[src]
            return pa.table({"dst": t["dst"], "c": pa.array(c)})

        sums = (
            edges_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c_sum"))
            .take_all()
        )
        new = np.full(num_nodes, 1.0 - damping)
        for r in sums:
            new[r["dst"]] = (1.0 - damping) + damping * r["c_sum"]
        scores = new
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
