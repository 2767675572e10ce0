"""clean_corpus — the flagship training-data cleaning composite.

One call chains the canonical LLM-data steps over a document corpus:

  1. quality gate      — vectorized token stats (drop docs under
                         `min_tokens`) + language ID annotation;
  2. exact dedup       — md5 content hash, survivor = min doc_id per
                         hash (losers derived by a sorted per-run
                         sweep, never a broadcast loser set);
  3. near-dup dedup    — MinHash LSH candidates -> exact-Jaccard
                         verification -> transitive connected
                         components; survivor = component minimum.

Survivors = quality-pass ∧ exact-survivor ∧ near-dup-survivor,
assembled by ONE sorted reduction over tagged (doc_id, drop, payload)
rows (`sorted_groupby_agg`) — no driver-side doc sets anywhere; every
stage is the same partitioned machinery its standalone operator uses.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LANGS = ["unknown", "en", "de", "fr", "es"]

CLEAN_MIN_TOKENS = 20


def clean_corpus(docs_ds, *, min_tokens: int = CLEAN_MIN_TOKENS,
                 jaccard_threshold: float = 0.8):
    """Returns a Dataset (doc_id, n_tokens, pred_lang): the surviving
    documents with their token count and predicted language."""
    import ray.data as rd

    from ..stages.aggregates import sorted_groupby_agg
    from ..stages.dedup import near_dup_clusters
    from ..stages.textstats import langid_batch, token_stats_batch

    lang_set = pa.array(LANGS)

    def qual_rows(t: pa.Table) -> pa.Table:
        stats = token_stats_batch(t)
        lang = langid_batch(t)
        n = stats["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = pc.index_in(lang["pred_lang"], value_set=lang_set)
        code = code.combine_chunks() if isinstance(code, pa.ChunkedArray) else code
        code = code.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= min_tokens
        ids = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "drop": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
            "qual": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            "n_tokens": pa.array(n[keep]),
            "lang_code": pa.array(code[keep]),
        })

    def hash_rows(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hex_batch

        h = md5_hex_batch(t["text"].to_pylist())
        return pa.table({"h": pa.array(h), "doc_id": t["doc_id"]})

    def exact_loser_sweep(t: pa.Table) -> pa.Table:
        # sorted on h ALONE (the no-straddle invariant holds only for
        # the full sort key, so sorting by (h, doc_id) could split an
        # equal-h run across blocks and crown two survivors); the
        # per-run min doc_id is picked by an in-block lexsort instead
        empty = pa.table({"doc_id": pa.array([], pa.int64())})
        if t.num_rows == 0 or "h" not in t.column_names:
            return empty
        h = t["h"].combine_chunks() if isinstance(t["h"], pa.ChunkedArray) else t["h"]
        n = t.num_rows
        brk = ~pc.equal(h.slice(1), h.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        run = np.cumsum(np.r_[0, brk.astype(np.int64)])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, run))
        srun = run[order]
        first = np.r_[True, srun[1:] != srun[:-1]]
        return pa.table({"doc_id": pa.array(np.sort(ids[order[~first]]))})

    def drop_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "drop": pa.array([], pa.int64()),
                          "qual": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "lang_code": pa.array([], pa.int64())})
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return empty
        n = t.num_rows
        return pa.table({"doc_id": t["doc_id"],
                         "drop": pa.array(np.ones(n, dtype=np.int64)),
                         "qual": pa.array(np.zeros(n, dtype=np.int64)),
                         "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                         "lang_code": pa.array(np.zeros(n, dtype=np.int64))})

    qual = docs_ds.map_batches(qual_rows, batch_format="pyarrow")
    exact_losers = (
        docs_ds.map_batches(hash_rows, batch_format="pyarrow")
        .sort(["h"])
        .map_batches(exact_loser_sweep, batch_size=None, batch_format="pyarrow")
        .map_batches(drop_rows, batch_format="pyarrow")
    )

    clusters = near_dup_clusters(docs_ds, threshold=jaccard_threshold)

    def near_losers(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.not_equal(t["node"], t["component"])
        return pa.table({"doc_id": t.filter(keep)["node"]})

    near = clusters.map_batches(near_losers, batch_format="pyarrow").map_batches(
        drop_rows, batch_format="pyarrow"
    )

    merged = sorted_groupby_agg(
        qual.union(exact_losers).union(near),
        ["doc_id"],
        [("drop", "max", "dropped"),
         ("qual", "max", "qual"),
         ("n_tokens", "max", "n_tokens"),
         ("lang_code", "max", "lang_code")],
    )

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "pred_lang": pa.array([], pa.large_string())})
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return empty
        # survivors: not dropped AND passed the quality gate (explicit
        # marker — n_tokens>0 as a proxy broke min_tokens<=0)
        keep = pc.and_(pc.equal(t["dropped"], 0), pc.equal(t["qual"], 1))
        t = t.filter(keep)
        code = t["lang_code"].combine_chunks() if isinstance(t["lang_code"], pa.ChunkedArray) else t["lang_code"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "pred_lang": pc.take(pa.array(LANGS, pa.large_string()), code),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")
