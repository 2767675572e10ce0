"""Sparse TF-IDF cosine all-pairs document similarity.

The inverted-index-native near-duplicate detector (Bayardo et al. 2007,
"Scaling Up All Pairs Similarity Search"): documents are sparse TF-IDF
vectors over their token vocabulary, and the cosine between two
documents decomposes into a sum over their SHARED terms — so candidate
pairs can be generated from the posting lists themselves instead of an
all-pairs scan.  The classic scale lever is the document-frequency cap:
a term appearing in a large fraction of the corpus contributes almost
nothing to cosine (its idf is near zero) but generates O(df²)
candidate pairs, so only terms with df <= cap participate in pair
generation.  The operator therefore computes the PARTIAL cosine
restricted to rare terms — the standard candidate-scoring contract of
the prefix-filtering family — which the SQL oracle replays exactly.

Scale shape (100 TB):
- pass 1 (df): per-batch distinct-(doc, term) partials -> one
  vocabulary-sized grouped sum.  The shuffle carries one row per
  distinct (batch, term), never token occurrences.
- the (term, df, idf) table is broadcast ONCE via ``ray.put``
  (vocabulary-sized — the same broadcast contract as
  ``unigram_quality``'s top-V table).
- pass 2: a pure map recomputes per-(doc, term) tf locally, normalizes
  by the per-doc full-vocabulary L2 norm (computed inside the batch —
  every token of a doc lives in one batch), and emits ONLY rare-term
  rows ``(term_idx:int64, doc, wn)`` — candidate-sized, not
  corpus-sized.
- ONE int64 range sort on term_idx groups equal terms (Ray's sort
  keeps equal keys in one block); a per-block sweep expands each
  term run into its (a < b) pairs with the product ``wn_a * wn_b``
  (runs are bounded by the df cap, so a run is at most cap rows and
  cap(cap-1)/2 pairs).
- one pair-keyed grouped sum yields the similarity.  Output
  ``(a, b, n_shared, sim)`` — one row per unordered pair sharing at
  least one rare term.

Reference anchor: tokenization matches the reference's
PunctuationTokenizer exactly (`analysis/PunctuationTokenizer.java:17-57`
via ``textstats._split_tokens``); the TF-IDF weighting here is the
standard ``tf * ln(N/df)`` (not the reference's log-free idf — this
operator is an LLM-curation extension, not a reference port).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregates import sorted_groupby_agg
from .textstats import _split_tokens


def _content_col(t: pa.Table, col: str) -> pa.Array:
    c = t[col]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _ids_np(t: pa.Table, col: str) -> np.ndarray:
    c = t[col]
    c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def _doc_term_runs(parents: np.ndarray, codes: np.ndarray):
    """Collapse flat (token-parent, term-code) occurrences into distinct
    (parent, code, count) triples via one lexsort + run-length sweep."""
    order = np.lexsort((codes, parents))
    p_s, c_s = parents[order], codes[order]
    brk = np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])]
    starts = np.flatnonzero(brk)
    counts = np.diff(np.r_[starts, len(p_s)]).astype(np.int64)
    return p_s[starts], c_s[starts], counts


def term_document_frequencies(ds, *, text_col: str = "text",
                              id_col: str = "doc_id"):
    """(term, df) over the corpus under the PunctuationTokenizer split:
    per-batch distinct-(doc, term) partials, then one vocabulary-sized
    grouped sum.  ``id_col`` only disambiguates rows (a doc never spans
    batches, so within-batch distinctness is global distinctness)."""

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df_part": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        parents, values = _split_tokens(_content_col(t, text_col))
        if len(parents) == 0:
            return empty
        enc = values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        up, uc, _ = _doc_term_runs(parents, codes)
        # df partial per code = number of distinct parents per code
        df_part = np.bincount(uc, minlength=len(enc.dictionary))
        present = np.flatnonzero(df_part)
        return pa.table({
            "term": enc.dictionary.take(pa.array(present)),
            "df_part": pa.array(df_part[present].astype(np.int64)),
        })

    return sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["term"], [("df_part", "sum", "df")],
        in_schema=pa.schema([("term", pa.string()),
                             ("df_part", pa.int64())]))


def tfidf_doc_pairs(ds, *, df_frac: float = 0.2, text_col: str = "text",
                    id_col: str = "doc_id", n_docs: int | None = None):
    """Partial TF-IDF cosine over shared rare terms for every unordered
    document pair — see the module docstring for the contract and scale
    shape.  Returns a Dataset ``(a, b, n_shared, sim)`` with ``a < b``:
    ``sim`` is sum over shared terms with ``df <= floor(df_frac * N)``
    of ``wn_a * wn_b`` where ``wn = tf * ln(N/df) / ||doc||`` and the
    norm runs over the doc's FULL vocabulary."""
    import ray

    if not (0 < df_frac <= 1):
        raise ValueError(f"df_frac must be in (0, 1], got {df_frac!r}")
    n = int(n_docs) if n_docs is not None else int(ds.count())
    if n == 0:
        return ds.map_batches(
            lambda t: pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.int64()),
                                "n_shared": pa.array([], pa.int64()),
                                "sim": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    cap = int(np.floor(df_frac * n))

    # ---- pass 1: vocabulary-sized (term, df) table, broadcast once
    df_rows = term_document_frequencies(
        ds, text_col=text_col, id_col=id_col).take_all()
    terms = pa.array([r["term"] for r in df_rows], pa.string())
    dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
    # idf per TERM computed once — ln(N/df) with N as float64, matching
    # the oracle's per-row ln(n/df) value exactly (same two IEEE ops)
    idf = np.log(np.float64(n) / dfs)
    bcast = ray.put((terms, dfs, idf))

    rare_schema = pa.schema([("term_idx", pa.int64()),
                             ("doc", pa.int64()),
                             ("wn", pa.float64())])

    def rare_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rare_schema.empty_table()
        g_terms, g_df, g_idf = ray.get(bcast)
        parents, values = _split_tokens(_content_col(t, text_col))
        if len(parents) == 0:
            return rare_schema.empty_table()
        gi = pc.index_in(values, value_set=g_terms)
        if gi.null_count:
            raise RuntimeError(
                "tfidf_doc_pairs: batch term missing from the global "
                "df table (corpus changed between passes?)")
        codes = gi.to_numpy(zero_copy_only=False).astype(np.int64)
        up, uc, tf = _doc_term_runs(parents, codes)
        w = tf.astype(np.float64) * g_idf[uc]
        norm2 = np.bincount(up, weights=w * w, minlength=t.num_rows)
        nrm = np.sqrt(norm2)
        keep = (g_df[uc] <= cap) & (nrm[up] > 0)
        if not keep.any():
            return rare_schema.empty_table()
        ids = _ids_np(t, id_col)
        return pa.table({
            "term_idx": pa.array(uc[keep]),
            "doc": pa.array(ids[up[keep]]),
            "wn": pa.array(w[keep] / nrm[up[keep]]),
        })

    def pair_sweep(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "p": pa.array([], pa.float64())})
        if t.num_rows == 0 or "term_idx" not in t.column_names:
            return empty
        ti = t["term_idx"].to_numpy(zero_copy_only=False)
        docs = t["doc"].to_numpy(zero_copy_only=False)
        wn = t["wn"].to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, ti))
        ti, docs, wn = ti[order], docs[order], wn[order]
        starts = np.flatnonzero(np.r_[True, ti[1:] != ti[:-1]])
        ends = np.r_[starts[1:], len(ti)]
        out_a, out_b, out_p = [], [], []
        for s, e in zip(starts, ends):     # O(runs) python; each run is
            m = e - s                      # vectorized and <= cap rows
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            d, v = docs[s:e], wn[s:e]
            out_a.append(d[iu])            # docs ascend within the run,
            out_b.append(d[ju])            # so a < b already
            out_p.append(v[iu] * v[ju])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        return pa.table({"a": pa.array(a),
                         "b": pa.array(np.concatenate(out_b)),
                         "c": pa.array(np.ones(len(a), np.int64)),
                         "p": pa.array(np.concatenate(out_p))})

    exploded = ds.map_batches(rare_rows, batch_format="pyarrow")
    pairs = exploded.sort("term_idx").map_batches(
        pair_sweep, batch_size=None, batch_format="pyarrow")
    return sorted_groupby_agg(
        pairs, ["a", "b"],
        [("c", "sum", "n_shared"), ("p", "sum", "sim")],
        in_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("c", pa.int64()), ("p", pa.float64())]))
