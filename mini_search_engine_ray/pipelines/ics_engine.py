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
from .pagerank import ITERATIONS, fuse_scores, pagerank_numpy


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

    def compute_page_rank(self, edges, num_nodes: int, *, iterations: int = ITERATIONS) -> np.ndarray:
        """edges: Dataset (src,dst) or (src,dst) numpy arrays."""
        if hasattr(edges, "take_all"):
            rows = edges.take_all()
            src = np.asarray([r["src"] for r in rows], dtype=np.int64)
            dst = np.asarray([r["dst"] for r in rows], dtype=np.int64)
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
