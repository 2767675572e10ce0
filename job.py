#!/usr/bin/env python
"""Cluster job entrypoint: build the inverted index over a source-code
Parquet corpus, then serve a query batch — the north-rule `ray job
submit` surface.

Usage (multi-node cluster):

    ray job submit --working-dir . -- \
        python job.py --corpus /data/corpus/*.parquet \
                      --index-dir /data/index \
                      --analyzer composable --num-buckets 256 --salt 4 \
                      --queries spark,window "merge,request" --top-k 10

Local smoke (same code path, auto-inits a local Ray):

    python job.py --corpus /tmp/msr_bench_cache/corpus-*.parquet \
                  --index-dir /tmp/msr_job_index

The script NEVER calls ray.init when a cluster runtime already
initialized Ray (ray job submit / RAY_ADDRESS): it attaches via
`ray.init(address=...)` only when not already initialized, per the
driver contract. Output: one JSON line to stdout with build metrics and
per-query top-k results; exit code 0 on success. Re-submitting after a
partial failure resumes from the per-shard manifests (idempotent
writes, fingerprint-matched skips).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", nargs="+", required=True,
                    help="Parquet file(s)/glob(s) with (repo, path, commit, lang, content)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--analyzer", default="composable")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=1)
    ap.add_argument("--positional", action="store_true")
    ap.add_argument("--no-docstore", action="store_true")
    ap.add_argument("--queries", nargs="*", default=["index,merge"],
                    help="comma-separated BM25 term groups")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--query-concurrency", type=int, default=2,
                    help="searcher actor pool size for the query batch")
    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime sets RAY_ADDRESS; standalone
        # runs come up as a local cluster
        ray.init(address=os.environ.get("RAY_ADDRESS") or "local",
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    from mini_search_engine_ray.pipelines.build import build_index
    from mini_search_engine_ray.sources.corpus import (
        corpus_fingerprint,
        corpus_num_rows,
        read_corpus_with_doc_ids,
    )

    paths = sorted(p for g in args.corpus for p in glob.glob(g))
    if not paths:
        print(json.dumps({"error": f"no parquet files match {args.corpus}"}))
        return 2

    t0 = time.time()
    # docstore keeps the full row (repo/path/commit/lang/content);
    # prune to content only when the docstore is off
    ds = read_corpus_with_doc_ids(
        paths, columns=["content"] if args.no_docstore else None
    )
    meta = build_index(
        ds,
        args.index_dir,
        analyzer=args.analyzer,
        num_buckets=args.num_buckets,
        salt=args.salt,
        positional=args.positional,
        fingerprint=corpus_fingerprint(paths),
        write_docstore=not args.no_docstore,
        # footer-metadata count: without it build_index runs a
        # data-reading count() pass, doubling ingest bytes
        n_docs=corpus_num_rows(paths),
    )
    build_sec = time.time() - t0

    # query batch through the stateful searcher actor pool
    t1 = time.time()
    results = []
    if args.queries:
        import pyarrow as pa

        from mini_search_engine_ray.state.searcher import SearcherBatch

        rows = [
            {"query_id": i, "kind": "bm25", "terms": q.split(","), "top_k": args.top_k}
            for i, q in enumerate(args.queries)
        ]
        out = (
            rd.from_arrow(pa.Table.from_pylist(rows))
            .map_batches(
                SearcherBatch,
                fn_constructor_kwargs={"index_dir": args.index_dir},
                batch_format="pyarrow",
                concurrency=args.query_concurrency,
            )
            .take_all()
        )
        results = [
            {
                "query_id": i,
                "query": ",".join(q["terms"]),
                "hits": [
                    {"doc_id": int(r["doc_id"]), "score": round(float(r["score"]), 4)}
                    for r in sorted(
                        (r for r in out if r["query_id"] == i),
                        key=lambda r: r["rank"],
                    )
                ],
            }
            for i, q in enumerate(rows)
        ]
    print(
        json.dumps(
            {
                "metric": "job",
                "build_sec": round(build_sec, 3),
                "query_sec": round(time.time() - t1, 3),
                "n_docs": meta["n_docs"],
                "n_postings": meta["n_postings"],
                "n_shards": meta["n_shards"],
                "docs_per_s": round(meta["n_docs"] / max(build_sec, 1e-9), 1),
                "shards_skipped_resume": meta["shards_skipped"],
                "queries": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
