"""Memory profile of IndexSearcher term dictionaries on a 10^7-term
synthetic shard set (verdict round-3 item #6 evidence).

Builds 16 real shard files (625k unique terms each, df=1 postings)
via build_shard_table, writes meta.json, then measures:
  1. RssAnon delta of opening the searcher + constructing the
     zero-copy _TermDict for every shard + running 100k lookups.
  2. RssAnon delta of the OLD path (to_pylist -> object ndarray) on
     the same shards, for contrast.
Prints one JSON line.

Measured 2026-08-17 (32-core VM, local disk): 878 MB shard files,
anon_mb_open_and_dicts=90.1, anon_mb_after_100k_lookups=90.8,
file_mb_after_100k_lookups=144.0 (evictable page cache),
anon_mb_legacy_pylist=+691.8, lookups_per_s=76515 (13.1 us median).
"""
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.feather as feather

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mini_search_engine_ray.stages.shards import build_shard_table, shard_paths
from mini_search_engine_ray.state.searcher import IndexSearcher

IDX = "/tmp/mem_profile_idx"
N_SHARDS = 16
TERMS_PER_SHARD = 625_000  # x16 = 10M


def rss_parts():
    anon = filemem = rss = 0
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                anon = int(line.split()[1])
            elif line.startswith("RssFile:"):
                filemem = int(line.split()[1])
            elif line.startswith("VmRSS:"):
                rss = int(line.split()[1])
    return {"anon_kb": anon, "file_kb": filemem, "rss_kb": rss}


def build():
    shutil.rmtree(IDX, ignore_errors=True)
    os.makedirs(os.path.join(IDX, "shards"))
    rng = np.random.default_rng(7)
    for sid in range(N_SHARDS):
        base = sid * TERMS_PER_SHARD
        terms = np.array([f"t{base + i:09d}" for i in range(TERMS_PER_SHARD)])
        group = pa.table(
            {
                "term": pa.array(terms),
                "doc_id": pa.array(base + np.arange(TERMS_PER_SHARD), type=pa.int64()),
                "tf": pa.array(rng.integers(1, 5, TERMS_PER_SHARD), type=pa.int64()),
                "doc_len": pa.array(np.full(TERMS_PER_SHARD, 100), type=pa.int64()),
            }
        )
        table, _ = build_shard_table(group, positional=False, codec="varint")
        fpath, _ = shard_paths(IDX, sid)
        feather.write_feather(table, fpath, compression="uncompressed")
    meta = {
        "analyzer": "punctuation",
        "num_buckets": N_SHARDS,
        "salt": 1,
        "positional": False,
        "n_docs": N_SHARDS * TERMS_PER_SHARD,
        "avgdl": 100.0,
        "wordbreak_dict_path": None,
    }
    with open(os.path.join(IDX, "meta.json"), "w") as f:
        json.dump(meta, f)


def main():
    t0 = time.time()
    build()
    build_s = time.time() - t0
    sz = sum(
        os.path.getsize(os.path.join(IDX, "shards", f))
        for f in os.listdir(os.path.join(IDX, "shards"))
    )

    before = rss_parts()
    s = IndexSearcher(IDX)
    for sid in range(N_SHARDS):
        s._term_dict(sid)
    after_open = rss_parts()

    # 100k random lookups (all hits) through the zero-copy dicts
    rng = np.random.default_rng(1)
    probe_ids = rng.integers(0, N_SHARDS * TERMS_PER_SHARD, 100_000)
    t0 = time.time()
    hits = 0
    for i in probe_ids:
        sid = int(i) // TERMS_PER_SHARD
        if s._term_dict(sid).find(f"t{int(i):09d}") is not None:
            hits += 1
    lookup_s = time.time() - t0
    after_lookups = rss_parts()

    # OLD path for contrast: materialize every shard's terms as a
    # Python-object ndarray (what the round-2 searcher cached per actor)
    legacy = []
    for sid in range(N_SHARDS):
        legacy.append(np.array(s._shard(sid)["term"].to_pylist(), dtype=object))
    after_legacy = rss_parts()
    assert hits == len(probe_ids), hits

    out = {
        "n_terms": N_SHARDS * TERMS_PER_SHARD,
        "n_shards": N_SHARDS,
        "shard_bytes_total": sz,
        "build_s": round(build_s, 1),
        "anon_mb_open_and_dicts": round((after_open["anon_kb"] - before["anon_kb"]) / 1024, 1),
        "anon_mb_after_100k_lookups": round((after_lookups["anon_kb"] - before["anon_kb"]) / 1024, 1),
        "file_mb_after_100k_lookups": round((after_lookups["file_kb"] - before["file_kb"]) / 1024, 1),
        "anon_mb_legacy_pylist": round((after_legacy["anon_kb"] - after_lookups["anon_kb"]) / 1024, 1),
        "lookups_per_s": round(len(probe_ids) / lookup_s, 0),
        "lookup_us_p50": round(lookup_s / len(probe_ids) * 1e6, 1),
    }
    print(json.dumps(out))
    del legacy


if __name__ == "__main__":
    main()
