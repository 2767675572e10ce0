"""Exact distributed frequent-items (heavy hitters) and collocation
(bigram PMI) operators over the token stream.

Both use the same two-pass shape, built on the pigeonhole guarantee
behind Misra-Gries / SpaceSaving sketches (Misra & Gries 1982):

  any item with global count * k > N (N = stream length) must have
  batch-local count * k > N_b in at least one batch

so the union of per-batch local candidates is a SUPERSET of the true
heavy hitters, and an exact recount restricted to that candidate set
followed by the global ``count * k > N`` filter yields EXACTLY
``{item : count(item) * k > N}`` — of which there are at most k-1
(their counts sum to <= N).  Pass 1 runs the pigeonhole at TWO levels
with a halved threshold (local count * 2k > N_local per batch, then
summed-estimate * 2k > N_block per Ray block — see
``_pigeonhole_merge_block`` for the soundness argument), so the
shuffle carries

  pass 1:  <= 2k-1 candidate rows + sentinel rows per BLOCK
  pass 2:  <= |candidates| exact-count rows per batch

never the token stream itself, and the driver-side candidate union is
bounded by (2k-1) * num_blocks (~k in practice on Zipfian streams);
if a pathological stream blows it up, the exact full-count fallback is
``sorted_groupby_agg`` over all tokens (what `term_stats` runs).

Thresholds are FRACTIONAL (count * k > N), so the same operator (and
the same oracle SQL) is scale-invariant across sf directories.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _split_tokens, round4

# count*k > N  <=>  frequency > 1/k
HH_K = 40        # tokens with > 2.5% of the token stream
BIGRAM_K = 600   # bigrams with > 1/600 of the adjacent-pair stream

# sentinel "term" carrying per-batch stream totals through the same
# combine (real tokens are never empty: _split_tokens drops empties)
_TOTAL = ""


def _string(arr: pa.Array) -> pa.Array:
    return arr.cast(pa.string()) if arr.type != pa.string() else arr


def _pigeonhole_merge_block(t: pa.Table, key_cols: list[str], k: int,
                            sentinel_col: str,
                            total_w2: str | None = None) -> pa.Table:
    """Second-level pigeonhole combine over one Ray block of per-batch
    candidate summaries, bounding the driver-side candidate union at
    <= (2k-1) * n_blocks rows instead of (2k-1) * n_batches.

    Soundness (two-level pigeonhole with a HALVED threshold): batches
    emit items with cnt_b * 2k > N_b, so within any block the summed
    estimate est(x) undercounts the block's true count by at most
    N_blk/(2k).  A true global heavy hitter (count * k > N) has, by
    pigeonhole over blocks, count_blk(x) > N_blk/k in at least one
    block, where est(x) > N_blk/k - N_blk/(2k) = N_blk/(2k) — so the
    block filter est * 2k > N_blk keeps it.  (The tighter Misra-Gries
    decrement merge is NOT sound here: per-batch exact-survivor
    summaries lack the MG mass invariant M <= N - (k+1)err, and a true
    hitter with count in (N/k, 2N/k] could lose its counter.)  At most
    2k-1 items per block can pass (their estimates sum to <= N_blk).
    Block totals N_blk come from the sentinel rows, which pass through
    untouched for the global combine; pass 2's exact recount and the
    final count * k > n_total filter are unchanged, so the output is
    exact."""
    if t.num_rows == 0:
        return t
    sent_mask = pc.equal(t[sentinel_col], _TOTAL)
    sent = t.filter(sent_mask)
    cand = t.filter(pc.invert(sent_mask))
    tot_rows = sent if total_w2 is None else \
        sent.filter(pc.equal(sent["w2"], total_w2))
    n_blk = int(pc.sum(tot_rows["cnt"]).as_py() or 0)
    merged = cand.group_by(key_cols).aggregate([("cnt", "sum")]) \
        .rename_columns(key_cols + ["cnt"])
    if merged.num_rows and n_blk:
        cnt = merged["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cnt * (2 * k) > n_blk
        merged = pa.table(
            {c: merged[c].filter(pa.array(keep)) for c in key_cols}
            | {"cnt": pa.array(cnt[keep])})
    return pa.concat_tables([merged.select(t.column_names),
                             sent.select(t.column_names)])


def heavy_hitters(ds, *, k: int = HH_K, text_col: str = "text"):
    """Exact tokens with count * k > total_tokens, as a Dataset
    (term, cnt).  Two streaming passes (candidates, exact recount);
    the result has at most k-1 rows."""
    from .aggregates import sorted_groupby_agg

    def local_candidates(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        _, values = _split_tokens(content)
        tot = len(values)
        if tot == 0:
            return pa.table({"term": pa.array([_TOTAL], pa.string()),
                             "cnt": pa.array([0], pa.int64())})
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
        # HALVED threshold (2k): feeds the block-level pigeonhole merge
        # (see _pigeonhole_merge_block soundness note)
        keep = np.flatnonzero(cnt * (2 * k) > tot)
        terms = _string(denc.dictionary.take(pa.array(keep)))
        return pa.table({
            "term": pa.concat_arrays([terms, pa.array([_TOTAL], pa.string())]),
            "cnt": pa.array(np.r_[cnt[keep], tot]),
        })

    combined = sorted_groupby_agg(
        ds.map_batches(local_candidates, batch_format="pyarrow")
          .map_batches(lambda t: _pigeonhole_merge_block(t, ["term"], k, "term"),
                       batch_size=None, batch_format="pyarrow"),
        ["term"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= (k-1) candidates per BLOCK after MG merge
    n_total = int(combined.loc[combined["term"] == _TOTAL, "cnt"].sum())
    cand = sorted(str(s) for s in combined.loc[combined["term"] != _TOTAL, "term"])
    if not cand or n_total == 0:
        import ray.data as rd

        # keep the return type a Dataset on every path
        return rd.from_arrow(pa.table({"term": pa.array([], pa.string()),
                                       "cnt": pa.array([], pa.int64())}))
    cand_set = pa.array(cand, pa.string())

    def recount(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        _, values = _split_tokens(content)
        vals = values.filter(pc.is_in(values, value_set=cand_set))
        if len(vals) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        denc = vals.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
        return pa.table({"term": _string(denc.dictionary),
                         "cnt": pa.array(cnt)})

    exact = sorted_groupby_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["term"], [("cnt", "sum", "cnt")],
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cnt * k > n_total
        return pa.table({"term": _string(t["term"].combine_chunks()
                                          if isinstance(t["term"], pa.ChunkedArray)
                                          else t["term"]).filter(pa.array(keep)),
                         "cnt": pa.array(cnt[keep])})

    return exact.map_batches(final, batch_format="pyarrow")


# pair-key separator: a space is IN the tokenizer's split class, so it
# can never appear inside a token and the join is collision-free (a
# non-split-class char like U+001F can survive mid-token and alias two
# different bigrams into one recount key)
_PAIR_SEP = " "


def bigram_pmi(ds, *, k: int = BIGRAM_K, text_col: str = "text") -> pa.Table:
    """Exact frequent bigrams (adjacent token pairs within a document)
    with count * k > total_pairs, plus their pointwise mutual
    information.  Returns a pyarrow Table (w1, w2, c12, pmi) with at
    most k-1 rows; pmi = round4(ln(c12 * N1^2 / (N2 * c1 * c2))) where
    N1/N2 are the token/pair stream lengths and c1/c2 the exact member
    unigram counts.

    Pass 1 ships <= k+1 rows per batch (local pair candidates + token
    and pair total sentinels); pass 2 recounts ONLY candidate pairs and
    their member words.  All driver-side materializations are bounded
    by k (pigeonhole: at most k-1 survivors)."""
    from .aggregates import sorted_groupby_agg

    def local_candidates(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        n_tok = len(values)
        sent_w1 = pa.array([_TOTAL, _TOTAL], pa.string())
        sent_w2 = pa.array(["#tokens", "#pairs"], pa.string())
        if n_tok == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([0, 0], pa.int64())})
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        adj = parents[:-1] == parents[1:]
        left, right = codes[:-1][adj], codes[1:][adj]
        n_pair = len(left)
        if n_pair == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([n_tok, 0], pa.int64())})
        v = len(denc.dictionary)
        uk, cnt = np.unique(left * v + right, return_counts=True)
        # HALVED threshold (2k) for the block-level pigeonhole merge
        keep = cnt.astype(np.int64) * (2 * k) > n_pair
        uk, cnt = uk[keep], cnt[keep].astype(np.int64)
        w1 = _string(denc.dictionary.take(pa.array(uk // v)))
        w2 = _string(denc.dictionary.take(pa.array(uk % v)))
        return pa.table({
            "w1": pa.concat_arrays([w1, sent_w1]),
            "w2": pa.concat_arrays([w2, sent_w2]),
            "cnt": pa.array(np.r_[cnt, n_tok, n_pair]),
        })

    combined = sorted_groupby_agg(
        ds.map_batches(local_candidates, batch_format="pyarrow")
          .map_batches(lambda t: _pigeonhole_merge_block(t, ["w1", "w2"], k,
                                                         "w1", total_w2="#pairs"),
                       batch_size=None, batch_format="pyarrow"),
        ["w1", "w2"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= k-1 candidates per BLOCK after MG merge
    sent = combined["w1"] == _TOTAL
    totals = dict(zip(combined.loc[sent, "w2"], combined.loc[sent, "cnt"]))
    n1 = int(totals.get("#tokens", 0))
    n2 = int(totals.get("#pairs", 0))
    cand = combined.loc[~sent, ["w1", "w2"]]
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "c12": pa.array([], pa.int64()),
                      "pmi": pa.array([], pa.float64())})
    if n2 == 0 or len(cand) == 0:
        return empty
    pair_keys = sorted(str(a) + _PAIR_SEP + str(b)
                       for a, b in zip(cand["w1"], cand["w2"]))
    word_set = pa.array(sorted({str(w) for col in ("w1", "w2")
                                for w in cand[col]}), pa.string())
    pair_set = pa.array(pair_keys, pa.string())

    def recount(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        out_k: list[pa.Array] = []
        out_c: list[np.ndarray] = []
        member = pc.is_in(values, value_set=word_set)
        mvals = values.filter(member)
        if len(mvals):
            denc = mvals.dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False)
            cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
            out_k.append(_string(denc.dictionary))
            out_c.append(cnt)
        m = member.to_numpy(zero_copy_only=False)
        if len(values) >= 2:
            adj = (parents[:-1] == parents[1:]) & m[:-1] & m[1:]
            if adj.any():
                li, ri = np.flatnonzero(adj), np.flatnonzero(adj) + 1
                pairs = pc.binary_join_element_wise(
                    _string(values.take(pa.array(li))),
                    _string(values.take(pa.array(ri))), _PAIR_SEP)
                pairs = pairs.filter(pc.is_in(pairs, value_set=pair_set))
                if len(pairs):
                    denc = pairs.dictionary_encode()
                    codes = denc.indices.to_numpy(zero_copy_only=False)
                    cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
                    out_k.append(_string(denc.dictionary))
                    out_c.append(cnt)
        if not out_k:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"key": pa.concat_arrays(out_k),
                         "cnt": pa.array(np.concatenate(out_c))})

    exact = sorted_groupby_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["key"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= k-1 pairs + 2(k-1) words
    counts = dict(zip(exact["key"], (int(c) for c in exact["cnt"])))
    rows = []
    for key in pair_keys:
        c12 = counts.get(key, 0)
        if c12 * k <= n2:
            continue
        w1, w2 = key.split(_PAIR_SEP)
        c1, c2 = counts[w1], counts[w2]
        pmi = float(round4(np.array(
            [np.log(c12 * float(n1) * float(n1) / (float(n2) * c1 * c2))]))[0])
        rows.append((w1, w2, c12, pmi))
    if not rows:
        return empty
    rows.sort()
    return pa.table({
        "w1": pa.array([r[0] for r in rows], pa.string()),
        "w2": pa.array([r[1] for r in rows], pa.string()),
        "c12": pa.array([r[2] for r in rows], pa.int64()),
        "pmi": pa.array([r[3] for r in rows], pa.float64()),
    })


def bigram_llr(ds, *, k: int = BIGRAM_K, text_col: str = "text") -> pa.Table:
    """Dunning (1993) log-likelihood-ratio collocations over the same
    frequent-bigram candidate set as :func:`bigram_pmi` (count * k >
    total_pairs): G2 over the 2x2 pair-stream contingency table
    (k11 = c12, k12 = left(w1) - c12, k21 = right(w2) - c12,
    k22 = N2 - left - right + c12), where left/right are EXACT counts
    of pairs with that word in first/second position.  Returns
    (w1, w2, c12, llr) sorted by (w1, w2); llr is the shared
    2*(t11+t12+t21+t22) float expression with zero cells contributing
    exactly 0, 4dp-gated.

    Same two-pass scale shape as bigram_pmi: pass 1 ships <= k+1 rows
    per batch (pigeonhole-merged per block), pass 2 recounts ONLY the
    candidate pairs and their members' left/right-position totals —
    every driver-side materialization is bounded by k."""
    from .aggregates import sorted_groupby_agg

    def local_candidates(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        n_tok = len(values)
        sent_w1 = pa.array([_TOTAL, _TOTAL], pa.string())
        sent_w2 = pa.array(["#tokens", "#pairs"], pa.string())
        if n_tok == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([0, 0], pa.int64())})
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        adj = parents[:-1] == parents[1:]
        left, right = codes[:-1][adj], codes[1:][adj]
        n_pair = len(left)
        if n_pair == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([n_tok, 0], pa.int64())})
        v = len(denc.dictionary)
        uk, cnt = np.unique(left * v + right, return_counts=True)
        keep = cnt.astype(np.int64) * (2 * k) > n_pair
        uk, cnt = uk[keep], cnt[keep].astype(np.int64)
        w1 = _string(denc.dictionary.take(pa.array(uk // v)))
        w2 = _string(denc.dictionary.take(pa.array(uk % v)))
        return pa.table({
            "w1": pa.concat_arrays([w1, sent_w1]),
            "w2": pa.concat_arrays([w2, sent_w2]),
            "cnt": pa.array(np.r_[cnt, n_tok, n_pair]),
        })

    combined = sorted_groupby_agg(
        ds.map_batches(local_candidates, batch_format="pyarrow")
          .map_batches(lambda t: _pigeonhole_merge_block(t, ["w1", "w2"], k,
                                                         "w1", total_w2="#pairs"),
                       batch_size=None, batch_format="pyarrow"),
        ["w1", "w2"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= k-1 candidates per BLOCK after MG merge
    sent = combined["w1"] == _TOTAL
    totals = dict(zip(combined.loc[sent, "w2"], combined.loc[sent, "cnt"]))
    n2 = int(totals.get("#pairs", 0))
    cand = combined.loc[~sent, ["w1", "w2"]]
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "c12": pa.array([], pa.int64()),
                      "llr": pa.array([], pa.float64())})
    if n2 == 0 or len(cand) == 0:
        return empty
    pair_keys = sorted(str(a) + _PAIR_SEP + str(b)
                       for a, b in zip(cand["w1"], cand["w2"]))
    w1_set = pa.array(sorted({str(w) for w in cand["w1"]}), pa.string())
    w2_set = pa.array(sorted({str(w) for w in cand["w2"]}), pa.string())
    pair_set = pa.array(pair_keys, pa.string())

    def recount(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        kinds: list[str] = []
        out_k: list[pa.Array] = []
        out_c: list[np.ndarray] = []
        if len(values) >= 2:
            adj = parents[:-1] == parents[1:]
            li = np.flatnonzero(adj)
            lvals = values.take(pa.array(li))
            rvals = values.take(pa.array(li + 1))
            for kind, vals, vset in (("l", lvals, w1_set),
                                     ("r", rvals, w2_set)):
                hit = vals.filter(pc.is_in(vals, value_set=vset))
                if len(hit):
                    denc = hit.dictionary_encode()
                    codes = denc.indices.to_numpy(zero_copy_only=False)
                    cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
                    kinds += [kind] * len(denc.dictionary)
                    out_k.append(_string(denc.dictionary))
                    out_c.append(cnt)
            pairs = pc.binary_join_element_wise(
                _string(lvals), _string(rvals), _PAIR_SEP)
            pairs = pairs.filter(pc.is_in(pairs, value_set=pair_set))
            if len(pairs):
                denc = pairs.dictionary_encode()
                codes = denc.indices.to_numpy(zero_copy_only=False)
                cnt = np.bincount(codes, minlength=len(denc.dictionary)).astype(np.int64)
                kinds += ["p"] * len(denc.dictionary)
                out_k.append(_string(denc.dictionary))
                out_c.append(cnt)
        if not out_k:
            return pa.table({"kind": pa.array([], pa.string()),
                             "key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "key": pa.concat_arrays(out_k),
                         "cnt": pa.array(np.concatenate(out_c))})

    exact = sorted_groupby_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["kind", "key"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= 3(k-1) rows
    counts = {(kd, ky): int(c) for kd, ky, c
              in zip(exact["kind"], exact["key"], exact["cnt"])}
    rows = []
    for key in pair_keys:
        c12 = counts.get(("p", key), 0)
        if c12 * k <= n2:
            continue
        w1, w2 = key.split(_PAIR_SEP)
        r1 = counts.get(("l", w1), 0)
        c1 = counts.get(("r", w2), 0)
        k11, k12 = c12, r1 - c12
        k21, k22 = c1 - c12, n2 - r1 - c1 + c12
        r2, c2 = n2 - r1, n2 - c1
        fn2 = float(n2)

        def term(kij: int, ri: int, cj: int) -> float:
            if kij <= 0:
                return 0.0
            return float(kij) * np.log(
                float(kij) * fn2 / (float(ri) * float(cj)))

        llr = 2.0 * (term(k11, r1, c1) + term(k12, r1, c2)
                     + term(k21, r2, c1) + term(k22, r2, c2))
        rows.append((w1, w2, c12,
                     float(round4(np.array([llr]))[0])))
    if not rows:
        return empty
    rows.sort()
    return pa.table({
        "w1": pa.array([r[0] for r in rows], pa.string()),
        "w2": pa.array([r[1] for r in rows], pa.string()),
        "c12": pa.array([r[2] for r in rows], pa.int64()),
        "llr": pa.array([r[3] for r in rows], pa.float64()),
    })


SKIPGRAM_W = 3    # co-occurrence window: ordered pairs at distance 1..W
SKIPGRAM_K = 600  # pairs with > 1/600 of the skip-gram pair stream


def skipgram_counts(ds, *, w: int = SKIPGRAM_W, k: int = SKIPGRAM_K,
                    text_col: str = "text") -> pa.Table:
    """Frequent skip-gram co-occurrences — the GloVe/word2vec
    preprocessing statistic: exact counts of ORDERED token pairs at
    distance 1..``w`` within a document, for pairs with
    count * k > total_pairs.  Returns (w1, w2, cnt) sorted by
    (w1, w2).

    Same two-pass pigeonhole shape as :func:`bigram_pmi`: pass 1
    mines local candidates at a halved threshold per batch (merged
    per block, <= k-1 survive globally by pigeonhole), pass 2
    recounts ONLY candidates; every driver-side materialization is
    k-bounded.  The pair stream is w× the bigram stream but never
    leaves the batch — only candidate rows and the two total
    sentinels do."""
    from .aggregates import sorted_groupby_agg

    def pair_streams(parents, codes):
        """(left, right) code arrays over all distances 1..w."""
        ls, rs = [], []
        for d in range(1, w + 1):
            if len(codes) <= d:
                break
            adj = parents[:-d] == parents[d:]
            if adj.any():
                ls.append(codes[:-d][adj])
                rs.append(codes[d:][adj])
        if not ls:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        return np.concatenate(ls), np.concatenate(rs)

    def local_candidates(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        sent_w1 = pa.array([_TOTAL], pa.string())
        sent_w2 = pa.array(["#pairs"], pa.string())
        if len(values) == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([0], pa.int64())})
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        left, right = pair_streams(parents, codes)
        n_pair = len(left)
        if n_pair == 0:
            return pa.table({"w1": sent_w1, "w2": sent_w2,
                             "cnt": pa.array([0], pa.int64())})
        v = len(denc.dictionary)
        uk, cnt = np.unique(left * v + right, return_counts=True)
        keep = cnt.astype(np.int64) * (2 * k) > n_pair
        uk, cnt = uk[keep], cnt[keep].astype(np.int64)
        w1 = _string(denc.dictionary.take(pa.array(uk // v)))
        w2 = _string(denc.dictionary.take(pa.array(uk % v)))
        return pa.table({
            "w1": pa.concat_arrays([w1, sent_w1]),
            "w2": pa.concat_arrays([w2, sent_w2]),
            "cnt": pa.array(np.r_[cnt, n_pair]),
        })

    combined = sorted_groupby_agg(
        ds.map_batches(local_candidates, batch_format="pyarrow")
          .map_batches(lambda t: _pigeonhole_merge_block(t, ["w1", "w2"], k,
                                                         "w1", total_w2="#pairs"),
                       batch_size=None, batch_format="pyarrow"),
        ["w1", "w2"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= k-1 candidates per BLOCK after MG merge
    sent = combined["w1"] == _TOTAL
    n2 = int(combined.loc[sent & (combined["w2"] == "#pairs"),
                          "cnt"].sum())
    cand = combined.loc[~sent, ["w1", "w2"]]
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if n2 == 0 or len(cand) == 0:
        return empty
    pair_keys = sorted(str(a) + _PAIR_SEP + str(b)
                       for a, b in zip(cand["w1"], cand["w2"]))
    pair_set = pa.array(pair_keys, pa.string())

    def recount(t: pa.Table) -> pa.Table:
        content = t[text_col]
        content = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        parents, values = _split_tokens(content)
        if len(values) < 2:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        denc = values.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        left, right = pair_streams(parents, codes)
        if len(left) == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        lv = denc.dictionary.take(pa.array(left))
        rv = denc.dictionary.take(pa.array(right))
        pairs = pc.binary_join_element_wise(_string(lv), _string(rv),
                                            _PAIR_SEP)
        pairs = pairs.filter(pc.is_in(pairs, value_set=pair_set))
        if len(pairs) == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        denc2 = pairs.dictionary_encode()
        cds = denc2.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(cds, minlength=len(denc2.dictionary)).astype(np.int64)
        return pa.table({"key": _string(denc2.dictionary),
                         "cnt": pa.array(cnt)})

    exact = sorted_groupby_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["key"], [("cnt", "sum", "cnt")],
    ).to_pandas()  # bounded: <= k-1 candidate pairs
    counts = dict(zip(exact["key"], (int(c) for c in exact["cnt"])))
    rows = []
    for key in pair_keys:
        c = counts.get(key, 0)
        if c * k <= n2:
            continue
        w1, w2 = key.split(_PAIR_SEP)
        rows.append((w1, w2, c))
    if not rows:
        return empty
    rows.sort()
    return pa.table({
        "w1": pa.array([r[0] for r in rows], pa.string()),
        "w2": pa.array([r[1] for r in rows], pa.string()),
        "cnt": pa.array([r[2] for r in rows], pa.int64()),
    })
