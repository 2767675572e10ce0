"""Index build: the flagship pipeline.

    read corpus (Parquet, pruned columns)
      -> map_batches(TokenizeExplode actor pool)     zero-copy Arrow
      -> groupby("shard")                             THE shuffle (term-
         .map_groups(write_shard)                     bucketed, salted)
      -> manifests (tiny) -> meta.json
    [+ docstore write: doc_id, repo, path, lang, sha256, content]

Mirrors the reference lifecycle `addDocument* -> flush ->
mergeAllSegments` (`InvertedIndexManager.java:162-298,327-440`) but the
LSM buffer/flush machinery is replaced by the Ray Data shuffle
(SURVEY.md §3.1); merge/compaction of incremental builds lives in
stages/merge.py.

Scale notes (100 TB design point):
  * exactly ONE all-to-all exchange (the term-bucket groupby); content
    is dropped before it — the shuffle carries only exploded posting
    rows (term, shard, doc_id, tf, doc_len[, positions]).
  * hot-term skew: `salt > 1` spreads a term over salt sub-shards
    (doc_id mod salt); compaction merges them.
  * resume: shard writes are idempotent, keyed by a build fingerprint;
    re-running skips committed shards (and a re-run after partial
    failure produces byte-identical output — tested).
  * num_buckets sizes shard tasks: target ~ total_postings/num_buckets
    rows per shard task; raise it with corpus size.
"""

from __future__ import annotations

import functools
import json
import os

import pyarrow as pa

from ..sources.corpus import sha256_column
from ..stages.ingest import TokenizeExplode
from ..stages.shards import write_shard

META_FILE = "meta.json"


def _docstore_batch(t: pa.Table) -> pa.Table:
    keep = [c for c in ("doc_id", "repo", "path", "commit", "lang", "content") if c in t.column_names]
    out = t.select(keep)
    return out.append_column("sha256", sha256_column(t, "content"))


def build_index(
    corpus_ds,
    index_dir: str,
    *,
    analyzer: str = "composable",
    num_buckets: int = 16,
    salt: int = 1,
    positional: bool = False,
    n_docs: int | None = None,
    fingerprint: str = "",
    tokenize_concurrency: int | tuple[int, int] = 2,
    tokenize_batch_size: int = 1024,
    write_docstore: bool = True,
    wordbreak_dict_path: str | None = None,
) -> dict:
    """Build an inverted index under `index_dir`; returns the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    if n_docs is None:
        n_docs = corpus_ds.count()
    fingerprint = fingerprint or "nofp"
    full_fp = f"{fingerprint}:{analyzer}:{num_buckets}:{salt}:{int(positional)}:{n_docs}"

    # docstore write runs CONCURRENTLY with the index pipeline (separate
    # dataset execution in a thread — they contend for different
    # resources: the docstore is IO-bound, tokenize is CPU-bound)
    docstore_thread = None
    if write_docstore:
        import threading

        def _write_docstore():
            corpus_ds.map_batches(_docstore_batch, batch_format="pyarrow").write_parquet(
                os.path.join(index_dir, "docstore")
            )

        docstore_thread = threading.Thread(target=_write_docstore, daemon=True)
        docstore_thread.start()

    exploded = corpus_ds.select_columns(["doc_id", "content"]).map_batches(
        TokenizeExplode,
        fn_constructor_kwargs=dict(
            analyzer=analyzer,
            num_buckets=num_buckets,
            salt=salt,
            positional=positional,
            wordbreak_dict_path=wordbreak_dict_path,
        ),
        batch_format="pyarrow",
        batch_size=tokenize_batch_size,
        concurrency=tokenize_concurrency,
    )

    writer = functools.partial(
        write_shard, index_dir=index_dir, positional=positional, fingerprint=full_fp
    )
    manifests = (
        exploded.groupby("shard")
        .map_groups(writer, batch_format="pyarrow")
        .take_all()
    )
    if docstore_thread is not None:
        docstore_thread.join()

    total_tf = sum(m["total_tf"] for m in manifests)
    n_postings = sum(m["n_postings"] for m in manifests)
    meta = {
        "n_docs": int(n_docs),
        "total_tokens": int(total_tf),
        "avgdl": (total_tf / n_docs) if n_docs else 0.0,
        "n_postings": int(n_postings),
        "n_shards": len(manifests),
        "analyzer": analyzer,
        "num_buckets": num_buckets,
        "salt": salt,
        "positional": positional,
        "wordbreak_dict_path": wordbreak_dict_path,
        "fingerprint": full_fp,
        "shards_written": sum(1 for m in manifests if m["status"] == "written"),
        "shards_skipped": sum(1 for m in manifests if m["status"] == "skipped"),
    }
    tmp = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, META_FILE))
    return meta


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)
