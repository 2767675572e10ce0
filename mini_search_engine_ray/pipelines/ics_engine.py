"""The web-corpus application surface: index + PageRank + fused search.

Rebuild of `search/IcsSearchEngine.java` (SURVEY §3.3): read `url.tsv`
(docID -> URL) and `id-graph.tsv` (edge list), index the corpus,
compute 100-iteration unnormalized PageRank, and answer fused queries
`score = tfidf + weight * pagerank` (desc, top-k). The reference's
"docID parsed from the first line of the text" hack
(`IcsSearchEngine.java:222-224`) disappears — doc_id is a real column.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..state.searcher import IndexSearcher
from .build import build_index
from .pagerank import ITERATIONS, fuse_scores, pagerank_dataset, pagerank_numpy

# Above this many edges the composite dispatches to the distributed
# `pagerank_dataset` instead of collecting the edge list: 5e7 edges of
# (src, dst) int64 is ~800 MB on the driver — a safe single-node
# ceiling.  The numpy path is usually RIGHT below it (the web graph is
# narrow and the driver loop beats 100 shuffle rounds); the dense
# num_nodes score vector is held either way, matching the reference's
# by-document-count array (`IcsSearchEngine.java:116-164`).
COLLECT_EDGE_THRESHOLD = 50_000_000


def read_url_tsv(path: str):
    """url.tsv -> Dataset (doc_id:int64, url:string)
    (`IcsSearchEngine.readUrlTsv`, `search/IcsSearchEngine.java:51-66`)."""
    import ray.data as rd
    from pyarrow import csv as pa_csv

    return rd.read_csv(
        path,
        read_options=pa_csv.ReadOptions(column_names=["doc_id", "url"]),
        parse_options=pa_csv.ParseOptions(delimiter="\t"),
    )


def read_id_graph_tsv(path: str):
    """id-graph.tsv -> Dataset (src:int64, dst:int64)
    (`IcsSearchEngine.readIdGraphTsv`, `search/IcsSearchEngine.java:68-94`)."""
    import ray.data as rd
    from pyarrow import csv as pa_csv

    return rd.read_csv(
        path,
        read_options=pa_csv.ReadOptions(column_names=["src", "dst"]),
        parse_options=pa_csv.ParseOptions(delimiter="\t"),
    )


class IcsSearchEngine:
    """Compose index build + PageRank + fused top-k search."""

    def __init__(self, index_dir: str, urls: dict[int, str] | None = None) -> None:
        self.index_dir = index_dir
        self.urls = urls or {}
        self.pagerank_scores: np.ndarray | None = None
        self._searcher: IndexSearcher | None = None

    @classmethod
    def build(
        cls,
        corpus_ds,
        index_dir: str,
        *,
        urls_ds=None,
        n_docs: int | None = None,
        **build_kw,
    ) -> "IcsSearchEngine":
        build_index(corpus_ds, index_dir, n_docs=n_docs, **build_kw)
        urls = {}
        if urls_ds is not None:
            urls = {r["doc_id"]: r["url"] for r in urls_ds.take_all()}
        return cls(index_dir, urls)

    @property
    def searcher(self) -> IndexSearcher:
        if self._searcher is None:
            self._searcher = IndexSearcher(self.index_dir)
        return self._searcher

    @staticmethod
    def _collect_edges(edges) -> tuple[np.ndarray, np.ndarray]:
        """Small-graph path ONLY: pull the edge blocks to the driver
        (vectorized via Arrow refs, not per-row take_all)."""
        import ray

        tbls = [t for t in ray.get(edges.to_arrow_refs())
                if t.num_rows and "src" in t.column_names]
        if not tbls:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        tbl = pa.concat_tables(tbls)
        return (tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64))

    def compute_page_rank(
        self, edges, num_nodes: int, *, iterations: int = ITERATIONS,
        collect_threshold: int = COLLECT_EDGE_THRESHOLD,
        num_edges: int | None = None,
    ) -> np.ndarray:
        """edges: Dataset (src,dst) or (src,dst) numpy arrays.

        Size-dispatching: an edges Dataset with more than
        ``collect_threshold`` rows runs `pagerank_dataset` — edges stay
        distributed, the driver receives only the dense num_nodes score
        vector — instead of being collected for the numpy loop.  The
        paths agree to float reduction-order noise (tested).

        ``num_edges``: callers that already know the edge count (file
        metadata, a prior manifest) pass it to pick the path WITHOUT
        materializing the edges first — above the threshold the edges
        then stream straight into the distributed iteration, never
        pinned whole in the object store by this method."""
        if hasattr(edges, "count"):  # a Dataset
            if num_edges is None:
                # materialize once: count() (then metadata-free) +
                # (either path) re-consume it without recomputation
                edges = edges.materialize()
                num_edges = edges.count()
            if num_edges > collect_threshold:
                tbl = pagerank_dataset(edges, num_nodes, iterations=iterations)
                # node column is arange(num_nodes): score col IS the vector
                self.pagerank_scores = tbl["score"].to_numpy(zero_copy_only=False)
                return self.pagerank_scores
            src, dst = self._collect_edges(edges)
        else:
            src, dst = edges
        self.pagerank_scores = pagerank_numpy(src, dst, num_nodes, iterations=iterations)
        return self.pagerank_scores

    def get_page_rank_scores(self) -> list[tuple[int, float]]:
        """(doc_id, score) sorted desc — reference `getPageRankScores`."""
        assert self.pagerank_scores is not None
        order = np.lexsort((np.arange(len(self.pagerank_scores)), -self.pagerank_scores))
        return [(int(i), float(self.pagerank_scores[i])) for i in order]

    def search_query(self, query: list[str] | str, top_k: int, pagerank_weight: float):
        """Fused search: tfidf(query, ALL docs) + w * pagerank, desc,
        top-k (`IcsSearchEngine.searchQuery`, `:199-234`). weight=0
        degrades exactly to tf-idf ranking."""
        assert self.pagerank_scores is not None, "call compute_page_rank first"
        keywords = query.split() if isinstance(query, str) else query
        ids, base = self.searcher.search_tfidf(keywords, None)
        return fuse_scores(ids, base, self.pagerank_scores, weight=pagerank_weight, top_k=top_k)

    def document_iterator(self):
        """All documents across the doc store (reference
        `documentIterator`, `InvertedIndexManager.java:1533-1541`)."""
        import ray.data as rd

        store = os.path.join(self.index_dir, "docstore")
        return rd.read_parquet(store).iter_rows()
