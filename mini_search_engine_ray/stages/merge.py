"""Segment merge / compaction: sorted k-way merge of index shards.

The reference merges segments pairwise with dictionary full-outer joins
and docID rebasing (`InvertedIndexManager.java:327-440`,
`utils/Utils.java:74-119,169-177`). Here doc_ids are global so no
rebasing is needed, and shard term dictionaries are sorted, so merging
N indexes is: per bucket, decode every source sub-shard (vectorized),
concatenate the exploded postings, and rebuild one compacted shard —
stateless Ray tasks, one per bucket, embarrassingly parallel, each an
idempotent write (temp + atomic rename, like the reference's `_new` +
rename at `IIM:413-431`).

Also serves as the compaction that (a) folds salted sub-shards (salt>1)
back into one shard per bucket and (b) physically drops tombstoned
terms, clearing the tombstone list (reference `IIM:437` clears
`deletedWords` after merge).

Requirement: source indexes must share analyzer/num_buckets and have
disjoint doc_id spaces (global doc ids make this the ingest contract).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

from ..functions.codecs import MANY_CODECS
from ..pipelines.build import META_FILE, load_meta
from ..stages import shards as shards_mod
from ..state.searcher import load_tombstones, save_tombstones


def _bin_column_parts(t: pa.Table, name: str) -> tuple[bytes, np.ndarray]:
    """(concatenated bytes, per-row byte offsets) of a large_binary col."""
    arr = t[name].combine_chunks() if isinstance(t[name], pa.ChunkedArray) else t[name]
    # zero-copy via buffers: [validity, offsets(int64), data]
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[arr.offset :]
    data = bufs[2] if bufs[2] is not None else b""
    return data, off


def decode_shard_table(t: pa.Table, *, positional: bool) -> dict:
    """Vectorized decode of a whole shard table back to exploded posting
    arrays: term(object ndarray, per posting), doc_id, tf, doc_len
    [, positions_flat, positions_offsets]."""
    df = t["df"].to_numpy(zero_copy_only=False)
    terms = np.asarray(t["term"].to_pylist(), dtype=object)
    dec_many = MANY_CODECS[shards_mod.shard_codec(t)][1]

    def _col(name: str, *, delta: bool):
        data, off = _bin_column_parts(t, name)
        return dec_many(memoryview(data)[off[0] : off[-1]], off - off[0], delta=delta)[0]

    out = {
        "term": np.repeat(terms, df),
        "doc_id": _col("docs", delta=True),
        "tf": _col("tfs", delta=False),
        "doc_len": _col("dls", delta=False),
    }
    if positional and "pos" in t.column_names:
        pos_data, pos_off = _bin_column_parts(t, "pos")
        per_doc_bytes = _col("pos_lens", delta=False)
        byte_off = np.r_[0, np.cumsum(per_doc_bytes)]
        flat, val_off = dec_many(
            memoryview(pos_data)[pos_off[0] : pos_off[-1]], byte_off, delta=True
        )
        out["positions_flat"] = flat
        out["positions_offsets"] = val_off
    return out


def _exploded_table(d: dict, shard_id: int, *, positional: bool) -> pa.Table:
    cols = {
        "term": pa.array(d["term"].tolist(), type=pa.string()),
        "shard": pa.array(np.full(len(d["doc_id"]), shard_id, dtype=np.int32)),
        "doc_id": pa.array(d["doc_id"], type=pa.int64()),
        "tf": pa.array(d["tf"].astype(np.int32)),
        "doc_len": pa.array(d["doc_len"].astype(np.int32)),
    }
    if positional and "positions_flat" in d:
        # int64 (large_list) offsets: a merged bucket aggregates ALL
        # sources' postings, so total positions can pass 2^31 at the
        # 100 TB design point — int32 offsets would silently wrap.
        cols["positions"] = pa.LargeListArray.from_arrays(
            pa.array(d["positions_offsets"].astype(np.int64), type=pa.int64()),
            pa.array(d["positions_flat"].astype(np.int32), type=pa.int32()),
        )
    return pa.table(cols)


def merge_bucket(
    bucket: int,
    sources: list[str],
    dest: str,
    *,
    salts: list[int],
    positional: bool,
    fingerprint: str,
    drop_terms: frozenset[str] = frozenset(),
    codec: str = "varint",
) -> pa.Table | None:
    """Merge one bucket from all sources into dest (salt=1)."""
    parts = []
    for src, salt in zip(sources, salts):
        for s in range(salt):
            t = shards_mod.open_shard(src, bucket * salt + s)
            if t is None:
                continue
            if drop_terms:
                keep = [i for i, term in enumerate(t["term"].to_pylist()) if term not in drop_terms]
                if len(keep) == 0:
                    continue
                if len(keep) < t.num_rows:
                    t = t.take(pa.array(keep, type=pa.int64()))
            d = decode_shard_table(t, positional=positional)
            parts.append(_exploded_table(d, bucket, positional=positional))
    if not parts:
        return None
    group = pa.concat_tables(parts)
    return shards_mod.write_shard(
        group, index_dir=dest, positional=positional, fingerprint=fingerprint,
        codec=codec,
    )


def merge_indexes(
    sources: list[str],
    dest: str,
    *,
    merge_docstore: bool = True,
    clear_tombstones: bool = True,
    codec: str | None = None,
) -> dict:
    """Merge N indexes into one compacted index at `dest` (Ray tasks,
    one per bucket). Tombstoned terms (union over sources) are dropped
    physically; the merged index starts with no tombstones."""
    import ray.data as rd

    metas = [load_meta(s) for s in sources]
    m0 = metas[0]
    for m in metas[1:]:
        if m["analyzer"] != m0["analyzer"] or m["num_buckets"] != m0["num_buckets"]:
            raise ValueError("can only merge indexes with the same analyzer and num_buckets")
    positional = all(m.get("positional") for m in metas)
    # dest codec: explicit > first source's > default (sources may mix
    # codecs — each shard table carries its own in schema metadata)
    codec = codec or metas[0].get("codec", "varint")
    salts = [int(m.get("salt", 1)) for m in metas]
    drop = frozenset().union(*(load_tombstones(s) for s in sources))
    # fp must include the DEST codec (re-merging to transcode would
    # otherwise no-op against the existing shard manifests) AND the
    # tombstone drop set: a re-merge after a delete must rewrite the
    # shards, or it would skip them yet still clear the tombstones,
    # resurrecting the deleted terms
    import hashlib as _hashlib

    drop_fp = _hashlib.md5("\x00".join(sorted(drop)).encode()).hexdigest() \
        if drop else "none"
    fp = ("merge:" + ":".join(m["fingerprint"] for m in metas)
          + f":codec={codec}:drop={drop_fp}")
    os.makedirs(dest, exist_ok=True)

    buckets = sorted({sid // salt for src, salt in zip(sources, salts) for sid in shards_mod.list_shards(src)})

    def do_bucket(batch: pa.Table) -> pa.Table:
        rows = []
        for b in batch["bucket"].to_pylist():
            r = merge_bucket(
                int(b), sources, dest, salts=salts, positional=positional,
                fingerprint=fp, drop_terms=drop, codec=codec,
            )
            if r is not None:
                rows.append(r)
        return pa.concat_tables(rows) if rows else shards_mod._manifest_row(
            {"shard": -1, "n_terms": 0, "n_postings": 0, "total_tf": 0, "bytes": 0, "status": "empty"}
        )

    manifests = (
        rd.from_items([{"bucket": b} for b in buckets], override_num_blocks=max(1, len(buckets)))
        .map_batches(do_bucket, batch_size=1, batch_format="pyarrow")
        .take_all()
    )
    manifests = [m for m in manifests if m["status"] != "empty"]

    n_docs = sum(m["n_docs"] for m in metas)
    # avgdl is a CORPUS statistic (the stored per-posting doc_lens are
    # the original analyzed lengths), so carry the sources' token totals
    # rather than recounting surviving postings — otherwise dropping a
    # tombstoned term would silently shift every BM25 score.
    total_tokens = sum(m["total_tokens"] for m in metas)
    meta = {
        "n_docs": n_docs,
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "n_postings": int(sum(m["n_postings"] for m in manifests)),
        "n_shards": len(manifests),
        "analyzer": m0["analyzer"],
        "num_buckets": m0["num_buckets"],
        "salt": 1,
        "positional": positional,
        "codec": codec,
        "fingerprint": fp,
        "merged_from": sources,
    }
    # the searcher reads this key unconditionally for wordbreak/japanese
    # analyzers — a merged index must stay openable
    if "wordbreak_dict_path" in m0:
        meta["wordbreak_dict_path"] = m0["wordbreak_dict_path"]
    tmp = os.path.join(dest, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(dest, META_FILE))

    if merge_docstore:
        stores = [os.path.join(s, "docstore") for s in sources if os.path.isdir(os.path.join(s, "docstore"))]
        if stores:
            dest_store = os.path.join(dest, "docstore")
            # write_parquet APPENDS uuid-named files: a re-merge into an
            # existing dest would duplicate every document (build.py
            # guards its overlap case the same way)
            shutil.rmtree(dest_store, ignore_errors=True)
            # one read per store, unioned: read_parquet accepts a LIST
            # only of files, not of directories
            merged_ds = rd.read_parquet(stores[0])
            for st in stores[1:]:
                merged_ds = merged_ds.union(rd.read_parquet(st))
            merged_ds.write_parquet(dest_store)

    if clear_tombstones:
        save_tombstones(dest, set())
    return meta


def compact_index(index_dir: str, dest: str, **kw) -> dict:
    """Compact one index: fold salted sub-shards, drop tombstones."""
    return merge_indexes([index_dir], dest, **kw)
