"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship pipeline (index build + BM25 query serving
via a searcher actor pool) on /root/testdata/sf0.001. `queries()` /
`oracle_sql()` expose the operator registry from
`mini_search_engine_ray.pipelines.driver_queries` — one entry per
implemented pipeline/operator from SURVEY.md §2 (+ the training-data
extras). As of round 2 EVERY query carries a DuckDB oracle (sketches
via md5_number_lower + mod-2^64 UHUGEINT arithmetic, PageRank via an
unrolled 100-iteration SQL, compression via varint byte-length
replication, IVF ANN at full probe vs exact brute force).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: build the BM25 index over sf0.001 documents, then
    answer a mixed query batch through a searcher actor pool."""
    import pyarrow as pa
    import ray.data as rd

    from mini_search_engine_ray.pipelines.driver_queries import get_index
    from mini_search_engine_ray.state.searcher import SearcherBatch

    index_dir = get_index(SF_SMOKE)

    query_rows = [
        {"query_id": 0, "kind": "bm25", "terms": ["spark", "window", "merge"], "top_k": 10},
        {"query_id": 1, "kind": "bm25", "terms": ["table", "row"], "top_k": 10},
        {"query_id": 2, "kind": "and", "terms": ["window", "merge"], "top_k": None},
        {"query_id": 3, "kind": "or", "terms": ["spark", "vector"], "top_k": None},
        {"query_id": 4, "kind": "phrase", "terms": ["key", "agg"], "top_k": None},
        {"query_id": 5, "kind": "tfidf", "terms": ["table", "row", "scan"], "top_k": 10},
        {"query_id": 6, "kind": "keyword", "terms": ["spark"], "top_k": None},
    ]
    queries = rd.from_items(query_rows)
    results = queries.map_batches(
        SearcherBatch,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
    )
    return results.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from mini_search_engine_ray.pipelines.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mini_search_engine_ray.pipelines.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
