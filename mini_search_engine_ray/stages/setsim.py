"""Exact set-similarity self-join via global-ordering prefix filtering.

``prefix_jaccard_join`` finds EVERY document pair whose distinct-token
Jaccard meets a threshold — the exact counterpart of the MinHash/LSH
candidate path (``stages/dedup.py``), which is probabilistic and can
miss pairs.  The algorithm is the All-Pairs / PPJoin prefix filter
(Bayardo, Ma & Srikant, WWW 2007; Xiao, Wang, Lin & Yu, WWW 2008):
order every document's token set by a single GLOBAL order (ascending
document frequency, ties by hash — rarest first), and observe that two
sets with Jaccard >= t must share a token inside their first
``p = n - ceil(t*n) + 1`` tokens (their *prefix*): if a's prefix missed
the intersection entirely, all ``i >= ceil(t*|a|)`` shared tokens would
sit in a's suffix of length ``ceil(t*|a|) - 1 < i``.  Grouping prefix
tokens therefore generates a candidate superset with NO false
negatives, and rare-first ordering keeps the candidate buckets small
(frequent tokens never make it into a prefix unless a document is
nearly all-frequent).

The threshold is a RATIONAL ``(num, den)`` so every pruning and the
final keep decision is INTEGER arithmetic — no float boundary exists
anywhere, and a DuckDB oracle replays the decision exactly:

  - prefix length    ``p  = n - ceil(num*n/den) + 1``   (integer ceil)
  - size filter      ``den*min(na,nb) >= num*max(na,nb)``
  - final decision   ``den*inter >= num*union``

Tokens are md5-low-64 hashed (``md5_number_lower`` in DuckDB) so no
shuffle ever carries token text and hash collisions replay identically
on both engines.

Distributed shape (exchange inventory, in order):
  1. distinct (doc, h) token rows — local per-batch distinct, then the
     rows Dataset is materialized ONCE and reused three times.
  2. token document frequency — one VOCABULARY-sized grouped count.
  3. df joined back onto rows — one data-sized int64 sort-merge join.
  4. per-doc prefix extraction — one data-sized range sort by doc
     (equal-keys-one-block invariant), vectorized in-block lexsort.
     Prefix rows are ~(1 - num/den) of the data rows.
  5. candidate generation — one PREFIX-sized range sort by h; a
     segmented all-pairs sweep per equal-h run.  Bucket fan-out is
     bounded by the prefix filter on ordinary corpora; on a degenerate
     corpus (thousands of near-identical docs) the fan-out is
     OUTPUT-sized, which is inherent to an exact join.
  6. pair dedup — one CANDIDATE-sized grouped max.
  7. exact verification — one data+candidate-sized sort-merge join of
     exploded pair members against the token rows, then two pair-keyed
     grouped reductions (the ``verify_pairs_jaccard`` plan shape,
     ``stages/dedup.py:278``, specialized to whole-token sets where
     per-pair set sizes are already known).

Token-less documents contribute no rows and thus never pair (their
Jaccard against any non-empty set is 0; the empty-empty pair is
excluded, matching the SQL join semantics — NOT the shingle verifier's
1.0 convention, which serves a different contract).

Reference anchor: complements `minhash_candidate_pairs` /
`verify_pairs_jaccard` (probabilistic recall) with an exact-recall
join; the reference engine has no equivalent — this is part of the
LLM-curation extension surface.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _validate_threshold(threshold) -> tuple[int, int]:
    try:
        num, den = threshold
    except Exception:
        raise ValueError(
            f"threshold must be a (num, den) integer pair, got {threshold!r}")
    if not (isinstance(num, (int, np.integer))
            and isinstance(den, (int, np.integer))):
        raise ValueError(
            f"threshold must be INTEGER (num, den), got {threshold!r}")
    num, den = int(num), int(den)
    if not (0 < num <= den):
        raise ValueError(
            f"threshold must satisfy 0 < num <= den, got {num}/{den}")
    return num, den


def _empty_rows() -> pa.Table:
    return pa.table({"doc": pa.array([], pa.int64()),
                     "h": pa.array([], pa.uint64())})


def prefix_jaccard_join(ds, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: tuple[int, int] = (1, 2),
                        shingle_k: int = 1,
                        join_partitions: int | None = None):
    """All pairs (a < b) of documents whose DISTINCT-set Jaccard is
    >= num/den, EXACTLY (no false negatives, unlike LSH).  The set
    elements are single tokens when ``shingle_k == 1`` (md5-low-64 of
    the token) or token k-grams when ``shingle_k > 1`` (md5-low-64 of
    the space-joined gram, the `dup_passage_stats` convention) — on a
    small-vocabulary corpus single-token sets are degenerate (every
    pair overlaps), while shingle sets separate true near-duplicates
    sharply.  Returns a Dataset with columns (a, b, inter_n, union_n,
    jaccard) where inter_n/union_n are exact int64 set sizes and
    jaccard their ONE IEEE division (rounding is the caller's
    concern).  See the module docstring for the algorithm and the
    exchange inventory."""
    import ray.data as rd  # noqa: F401  (documents the Dataset surface)

    from ..functions.hashing import md5_low64_batch
    from .aggregates import sorted_groupby_agg
    from .dedup import _token_hashes
    from .join import sort_merge_join
    from .textstats import _split_tokens, ngram_strings

    num, den = _validate_threshold(threshold)
    if not (isinstance(shingle_k, int) and shingle_k >= 1):
        raise ValueError(f"shingle_k must be an int >= 1, got {shingle_k!r}")

    # ---- 1. distinct (doc, h) set-element rows ---------------------------
    def token_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_rows()
        content = t[text_col].combine_chunks() \
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        parents, values = _split_tokens(content)
        if len(values) == 0:
            return _empty_rows()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if shingle_k == 1:
            h = _token_hashes(values)
            d = ids[parents]
        else:
            gp, grams = ngram_strings(parents, values, shingle_k)
            if len(gp) == 0:
                return _empty_rows()
            h = md5_low64_batch(grams.to_pylist())
            d = ids[gp]
        order = np.lexsort((h, d))
        ds_, hs = d[order], h[order]
        first = np.r_[True, (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])]
        return pa.table({"doc": pa.array(ds_[first]),
                         "h": pa.array(hs[first])})

    rows_schema = pa.schema([("doc", pa.int64()), ("h", pa.uint64())])
    rows = ds.map_batches(token_rows, batch_format="pyarrow").materialize()

    # ---- 2. global token document frequency (vocabulary-sized) ---------
    df = sorted_groupby_agg(rows, ["h"], [("h", "count", "df")],
                            in_schema=rows_schema)

    # ---- 3. df back onto rows (one data-sized int64 join) ---------------
    rows_df = sort_merge_join(
        rows, df, on="h", how="inner",
        left_schema=rows_schema,
        right_schema=pa.schema([("h", pa.uint64()), ("df", pa.int64())]),
        partitions=join_partitions,
    )

    # ---- 4. per-doc prefix extraction (one range sort by doc) -----------
    prefix_schema = pa.schema([("h", pa.uint64()), ("doc", pa.int64()),
                               ("n", pa.int64())])

    def prefix_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc" not in t.column_names:
            return prefix_schema.empty_table()
        d = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        f = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # within each doc: ascending (df, h) — the one global order
        order = np.lexsort((h, f, d))
        d, h = d[order], h[order]
        nrows = len(d)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        lens = np.diff(np.r_[starts, nrows]).astype(np.int64)
        n_per = np.repeat(lens, lens)
        rank = np.arange(nrows, dtype=np.int64) - np.repeat(starts, lens)
        # p = n - ceil(num*n/den) + 1, integer ceil
        ceil_tn = (num * n_per + den - 1) // den
        keep = rank < (n_per - ceil_tn + 1)
        return pa.table({"h": pa.array(h[keep]),
                         "doc": pa.array(d[keep]),
                         "n": pa.array(n_per[keep])})

    prefixes = rows_df.sort("doc").map_batches(
        prefix_rows, batch_size=None, batch_format="pyarrow")

    # ---- 5. candidate pairs per equal-h run (prefix-sized sort) ---------
    cand_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("na", pa.int64()), ("nb", pa.int64())])

    def run_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h" not in t.column_names:
            return cand_schema.empty_table()
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, h))
        h, d, n = h[order], d[order], n[order]
        m = len(h)
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        lens = np.diff(np.r_[starts, m]).astype(np.int64)
        per_left = np.repeat(starts + lens, lens) \
            - np.arange(m, dtype=np.int64) - 1
        total = int(per_left.sum())
        if total == 0:
            return cand_schema.empty_table()
        seg_off = np.r_[0, np.cumsum(per_left)[:-1]]
        li = np.repeat(np.arange(m, dtype=np.int64), per_left)
        ri = li + 1 + (np.arange(total, dtype=np.int64)
                       - np.repeat(seg_off, per_left))
        a, b = d[li], d[ri]          # a < b: sorted by doc within run
        na, nb = n[li], n[ri]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        keep = den * lo >= num * hi  # integer size filter
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "na": pa.array(na[keep]),
                         "nb": pa.array(nb[keep])})

    cands = sorted_groupby_agg(
        prefixes.sort("h").map_batches(run_pairs, batch_size=None,
                                       batch_format="pyarrow"),
        ["a", "b"], [("na", "max", "na"), ("nb", "max", "nb")],
        in_schema=cand_schema)

    # ---- 6/7. exact verification (verify_pairs_jaccard plan shape) ------
    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table({"jdoc": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "szsum": pa.array([], pa.int64())})
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (t["na"].to_numpy(zero_copy_only=False)
             + t["nb"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"jdoc": pa.array(np.r_[a, b]),
                         "a": pa.array(np.r_[a, a]),
                         "b": pa.array(np.r_[b, b]),
                         "szsum": pa.array(np.r_[s, s])})

    members = cands.map_batches(explode, batch_format="pyarrow")
    joined = sort_merge_join(
        members, rows, on="jdoc", right_on="doc", how="inner",
        left_schema=pa.schema([("jdoc", pa.int64()), ("a", pa.int64()),
                               ("b", pa.int64()), ("szsum", pa.int64())]),
        right_schema=rows_schema,
        partitions=join_partitions,
    ).select_columns(["a", "b", "szsum", "h"])

    per_h = sorted_groupby_agg(
        joined, ["a", "b", "h"],
        [("h", "count", "cnt"), ("szsum", "max", "szsum")],
        in_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("szsum", pa.int64()), ("h", pa.uint64())]))

    import pyarrow.compute as pc

    def flags(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "is_inter": pa.array([], pa.int64()),
                             "szsum": pa.array([], pa.int64())})
        return pa.table({
            "a": t["a"], "b": t["b"],
            "is_inter": pc.cast(pc.equal(t["cnt"], 2), pa.int64()),
            "szsum": t["szsum"],
        })

    agg = sorted_groupby_agg(
        per_h.map_batches(flags, batch_size=None, batch_format="pyarrow"),
        ["a", "b"],
        [("is_inter", "sum", "inter_n"), ("szsum", "max", "szsum")],
        in_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("is_inter", pa.int64()),
                             ("szsum", pa.int64())]))

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("inter_n", pa.int64()),
                            ("union_n", pa.int64()),
                            ("jaccard", pa.float64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return out_schema.empty_table()
        i = t["inter_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = (t["szsum"].to_numpy(zero_copy_only=False).astype(np.int64) - i)
        keep = den * i >= num * u  # the one integer keep decision
        i, u = i[keep], u[keep]
        jac = i.astype(np.float64) / u.astype(np.float64)
        return pa.table({"a": t["a"].filter(pa.array(keep)),
                         "b": t["b"].filter(pa.array(keep)),
                         "inter_n": pa.array(i), "union_n": pa.array(u),
                         "jaccard": pa.array(jac)})

    return agg.map_batches(finish, batch_size=None, batch_format="pyarrow")
