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
from ..stages.ingest import TokenizeExplode, tokenize_explode_task
from ..stages.shards import write_shard

META_FILE = "meta.json"


def _docstore_batch(t: pa.Table) -> pa.Table:
    keep = [c for c in ("doc_id", "repo", "path", "commit", "lang", "content") if c in t.column_names]
    out = t.select(keep)
    return out.append_column("sha256", sha256_column(t, "content"))


def _write_docstore_part(t: pa.Table, docstore_dir: str) -> None:
    """Side-output one docstore partition from a tokenize batch
    (single-pass mode). Batches partition the corpus into disjoint
    doc_id ranges, so the range-named file is unique per batch and a
    retried task rewrites it idempotently (tmp + atomic rename)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if t.num_rows == 0:
        return
    out = _docstore_batch(t)
    lo = int(pc.min(t["doc_id"]).as_py())
    hi = int(pc.max(t["doc_id"]).as_py())
    os.makedirs(docstore_dir, exist_ok=True)
    path = os.path.join(docstore_dir, f"part-{lo:012d}-{hi:012d}.parquet")
    # "_"-prefixed temp name: Arrow dataset discovery ignores it, so a
    # temp file leaked by a killed task is never read as data by
    # docstore consumers (the retried task writes its own temp)
    tmp = os.path.join(docstore_dir,
                       f"_tmp.{os.getpid()}.part-{lo:012d}-{hi:012d}.parquet")
    pq.write_table(out, tmp)
    os.replace(tmp, path)


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
    docstore_mode: str = "single_pass",
    codec: str = "varint",
    wordbreak_dict_path: str | None = None,
    exchange: str = "parquet",
    keep_exchange: bool = False,
    task_num_cpus: int = 1,
) -> dict:
    """Build an inverted index under `index_dir`; returns the meta dict.

    exchange="parquet" (default): a two-phase hash exchange — tokenize
    actors write packed fragments hive-partitioned by shard
    (`write_parquet(partition_cols=["shard"])`), then one stateless
    task per shard reads only its partition and builds the segment.
    This is a map-side-partition / reduce-side-read shuffle: no global
    sort, and the partitioned fragment directory doubles as a durable
    checkpoint (phase A is skipped on resume when its commit marker
    matches the build fingerprint).

    exchange="groupby": single-pipeline `groupby("shard").map_groups`
    (Ray's sort-based shuffle) — simpler, in-memory, preferable for
    small corpora; measurably slower at scale because the sort moves
    every fragment's list-column payload through sample/partition
    steps.

    docstore_mode="single_pass" (default): tokenize tasks side-output
    their batch's docstore partition before exploding — the corpus is
    read ONCE (at 100 TB a second scan doubles ingest bytes). Partition
    files are doc_id-range-named, idempotent under task retry, and
    wiped with the exchange dir on a non-resumed run (batch boundaries
    may differ between runs). "overlap" runs the docstore write as a
    separate concurrent dataset execution (second corpus scan that
    overlaps the CPU-bound tokenize; fine when the corpus is cached /
    small). The word-break actor path always uses "overlap".
    """
    os.makedirs(index_dir, exist_ok=True)
    if n_docs is None:
        n_docs = corpus_ds.count()
    fingerprint = fingerprint or "nofp"
    full_fp = f"{fingerprint}:{analyzer}:{num_buckets}:{salt}:{int(positional)}:{n_docs}"
    if codec != "varint":  # keep round-1 fingerprints valid for the default
        full_fp += f":codec={codec}"

    # fast resume: a COMPLETED build with the same fingerprint is a
    # no-op (meta + every shard manifest match, shard files present) —
    # re-submitting a finished job must not re-read the corpus
    done = _completed_build_meta(index_dir, full_fp, need_docstore=write_docstore)
    if done is not None:
        return done

    docstore_dir = os.path.join(index_dir, "docstore")
    # heavy-dictionary analyzers (word-break DP / japanese) need the
    # actor-pool path and take dict_path
    is_heavy_dict = analyzer.startswith("wordbreak") or analyzer == "japanese"
    single_pass_docstore = (
        write_docstore and docstore_mode == "single_pass" and not is_heavy_dict
    )
    # the phase-A commit marker must also encode whether phase A
    # produced the docstore as a side output: a committed single-pass
    # exchange can't serve a run that needs no docstore side-output and
    # vice versa. none-vs-overlap need NOT be distinguished — the
    # overlap docstore comes from a separate corpus scan, so phase A's
    # bytes are identical either way (shard manifests keep full_fp —
    # shard bytes never depend on docstore settings).
    marker_fp = f"{full_fp}:docstore={'single_pass' if single_pass_docstore else 'external'}"

    # overlap mode: docstore written CONCURRENTLY with the index pipeline
    # (separate dataset execution in a thread — IO-bound vs CPU-bound)
    docstore_thread = None
    docstore_error: list[BaseException] = []
    if write_docstore and not single_pass_docstore:
        import shutil
        import threading

        # stale partitions (from a prior run's different batching or a
        # crashed single-pass attempt) must not survive: write_parquet
        # appends uuid-named files, it does not replace
        shutil.rmtree(docstore_dir, ignore_errors=True)

        def _write_docstore():
            try:
                corpus_ds.map_batches(_docstore_batch, batch_format="pyarrow").write_parquet(
                    docstore_dir
                )
            except BaseException as e:  # surfaced after join
                docstore_error.append(e)

        docstore_thread = threading.Thread(target=_write_docstore, daemon=True)
        docstore_thread.start()

    te_kwargs = dict(
        analyzer=analyzer,
        num_buckets=num_buckets,
        salt=salt,
        positional=positional,
        wordbreak_dict_path=wordbreak_dict_path,
    )
    if is_heavy_dict:
        # heavy per-actor state (frequency dictionary): actor pool
        exploded = corpus_ds.select_columns(["doc_id", "content"]).map_batches(
            TokenizeExplode,
            fn_constructor_kwargs=te_kwargs,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            concurrency=tokenize_concurrency,
        )
    else:
        # light state: stateless tasks with a per-worker cached kernel
        # (see stages/ingest.tokenize_explode_task) — no actor-spawn
        # churn, elastic task scaling
        if single_pass_docstore:
            def tokenize_fn(batch: pa.Table, **kw) -> pa.Table:
                _write_docstore_part(batch, docstore_dir)
                return tokenize_explode_task(batch.select(["doc_id", "content"]), **kw)

            projected = corpus_ds  # docstore needs the full row
        else:
            tokenize_fn = tokenize_explode_task
            projected = corpus_ds.select_columns(["doc_id", "content"])
        exploded = projected.map_batches(
            functools.partial(tokenize_fn, **te_kwargs),
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            num_cpus=task_num_cpus,
        )

    timings: dict[str, float] = {}
    if exchange == "parquet":
        manifests = _parquet_exchange(
            exploded, index_dir, positional=positional, fingerprint=full_fp,
            marker_fingerprint=marker_fp, codec=codec,
            keep_exchange=keep_exchange, task_num_cpus=task_num_cpus,
            also_wipe=[docstore_dir] if single_pass_docstore else [],
            timings=timings,
        )
    else:
        if single_pass_docstore:
            # batch boundaries may differ run to run: clear stale parts
            import shutil

            shutil.rmtree(docstore_dir, ignore_errors=True)
        writer = functools.partial(
            write_shard, index_dir=index_dir, positional=positional,
            fingerprint=full_fp, codec=codec,
        )
        manifests = (
            exploded.groupby("shard")
            .map_groups(writer, batch_format="pyarrow")
            .take_all()
        )
    if docstore_thread is not None:
        docstore_thread.join()
        if docstore_error:
            raise RuntimeError("docstore write failed") from docstore_error[0]

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
        "codec": codec,
        "wordbreak_dict_path": wordbreak_dict_path,
        "fingerprint": full_fp,
        "shards_written": sum(1 for m in manifests if m["status"] == "written"),
        "shards_skipped": sum(1 for m in manifests if m["status"] == "skipped"),
        **{f"{k}_sec": round(v, 3) for k, v in timings.items()},
    }
    tmp = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, META_FILE))
    return meta


def _completed_build_meta(index_dir: str, full_fp: str, *, need_docstore: bool) -> dict | None:
    """Meta of an already-completed identical build, else None. Checks
    meta.json fingerprint plus every shard's manifest fingerprint and
    file presence (cheap: JSON reads, no data)."""
    from ..stages import shards as shards_mod

    try:
        meta = load_meta(index_dir)
    except (FileNotFoundError, json.JSONDecodeError):
        return None
    if meta.get("fingerprint") != full_fp:
        return None
    if need_docstore and not os.path.isdir(os.path.join(index_dir, "docstore")):
        return None
    sids = shards_mod.list_shards(index_dir)
    if len(sids) != meta.get("n_shards"):
        return None
    for sid in sids:
        fpath, mpath = shards_mod.shard_paths(index_dir, sid)
        try:
            with open(mpath) as f:
                if json.load(f).get("fingerprint") != full_fp:
                    return None
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        if not os.path.exists(fpath):
            return None
    return {**meta, "shards_written": 0, "shards_skipped": meta["n_shards"]}


def _parquet_exchange(
    exploded, index_dir: str, *, positional: bool, fingerprint: str,
    marker_fingerprint: str | None = None, codec: str = "varint",
    keep_exchange: bool, task_num_cpus: int = 1,
    also_wipe: list[str] = (),
    timings: dict | None = None,
) -> list[dict]:
    """Phase A: write packed fragments partitioned by shard (skipped on
    resume when committed with the same fingerprint). Phase B: one
    stateless task per shard reads its partition and writes the segment
    (idempotent via the shard manifests). `also_wipe` dirs (the
    single-pass docstore, whose partition boundaries follow phase A's
    batching) are cleared together with a non-resumed exchange and are
    covered by the same commit marker."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    ex_dir = os.path.join(index_dir, "exchange")
    marker = os.path.join(ex_dir, "_COMMITTED.json")
    mfp = marker_fingerprint or fingerprint
    committed = False
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                committed = json.load(f).get("fingerprint") == mfp
        except Exception:
            committed = False
    import time as _time

    t0 = _time.time()
    if not committed:
        shutil.rmtree(ex_dir, ignore_errors=True)
        for d in also_wipe:
            shutil.rmtree(d, ignore_errors=True)
        exploded.write_parquet(ex_dir, partition_cols=["shard"])
        os.makedirs(ex_dir, exist_ok=True)
        with open(marker + ".tmp", "w") as f:
            json.dump({"fingerprint": mfp}, f)
        os.replace(marker + ".tmp", marker)
    if timings is not None:
        timings["phase_a_tokenize_exchange"] = _time.time() - t0
    t1 = _time.time()

    shard_ids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(ex_dir)
        if d.startswith("shard=") and os.path.isdir(os.path.join(ex_dir, d))
    )

    def build_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for sid in batch["sid"].to_pylist():
            t = pq.read_table(os.path.join(ex_dir, f"shard={sid}"))
            t = t.append_column("shard", pa.array([sid] * t.num_rows, type=pa.int32()))
            out.append(
                write_shard(t, index_dir=index_dir, positional=positional,
                            fingerprint=fingerprint, codec=codec)
            )
        return pa.concat_tables(out)

    manifests = (
        rd.from_items([{"sid": s} for s in shard_ids], override_num_blocks=len(shard_ids))
        .map_batches(build_one, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus)
        .take_all()
        if shard_ids
        else []
    )
    if timings is not None:
        timings["phase_b_shard_build"] = _time.time() - t1
    if not keep_exchange:
        shutil.rmtree(ex_dir, ignore_errors=True)
    return manifests


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def add_documents(
    index_dir: str,
    new_docs_ds,
    *,
    dest: str | None = None,
    work_dir: str | None = None,
    n_new_docs: int | None = None,
    fingerprint: str = "",
) -> dict:
    """THE live-index update path — delta build + merge, in one call.

    The reference updates an index by buffering `addDocument` calls
    into an in-memory segment, flushing it, and compacting with
    `mergeAllSegments` (`InvertedIndexManager.java:162-440`); the Ray
    analogue is build-delta-then-merge, which this wrapper packages:

      1. build a DELTA index from ``new_docs_ds`` into ``work_dir``
         (default ``index_dir + ".delta"``) using the live index's own
         analyzer / num_buckets / positional / codec / dictionary
         settings — merge requires them equal;
      2. ``merge_indexes([live, delta])`` — per-bucket stateless
         tasks, byte-identical to having built once over the union;
      3. swap the merged result into place (``dest=None``) or leave
         it at ``dest``.

    ``new_docs_ds`` rows follow the build corpus schema and MUST carry
    doc_ids disjoint from the live index's (caller-assigned identity,
    the same contract as `build_index`; an overlapping id would
    double-count its postings, exactly like calling the reference's
    addDocument twice with the same document).

    Tombstone semantics follow `merge_indexes`: terms tombstoned on
    the live index are PHYSICALLY dropped from the merged result —
    including their occurrences in the new documents (the merge folds
    the union of source tombstones).  To make a previously deleted
    term searchable in new documents, `compact_index` the live index
    first, then add.

    Resumable: the delta build and every merge bucket checkpoint by
    fingerprint, so re-running the same call after a crash completes
    the same update without redoing finished work.  The in-place swap
    is two directory renames at the very end (live -> ``.old``,
    merged -> live); a crash between them leaves ``.old`` intact for
    manual recovery.  Returns the merged meta dict.
    """
    import shutil

    from ..stages.merge import merge_indexes

    meta = load_meta(index_dir)
    delta_dir = work_dir or index_dir + ".delta"
    merged_dir = dest or index_dir + ".merged"
    has_docstore = os.path.isdir(os.path.join(index_dir, "docstore"))
    build_index(
        new_docs_ds,
        delta_dir,
        analyzer=meta["analyzer"],
        num_buckets=meta["num_buckets"],
        positional=bool(meta.get("positional")),
        codec=meta.get("codec", "varint"),
        n_docs=n_new_docs,
        fingerprint=f"delta:{fingerprint}:{meta['fingerprint']}",
        write_docstore=has_docstore,
        wordbreak_dict_path=meta.get("wordbreak_dict_path"),
    )
    merged = merge_indexes(
        [index_dir, delta_dir], merged_dir, merge_docstore=has_docstore
    )
    if dest is None:
        old = index_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(index_dir, old)
        os.rename(merged_dir, index_dir)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(delta_dir, ignore_errors=True)
    return merged
