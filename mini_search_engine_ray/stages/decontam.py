"""Benchmark decontamination — drop (or flag) corpus documents that
share any token n-gram with a benchmark / eval set.

The standard LLM-training hygiene step: before training, every
document that contains an n-gram (typically n in 8..13; tests here use
small n so tiny corpora overlap) also present in an evaluation
benchmark is removed, so eval scores measure generalization rather
than memorization.  The benchmark side is ALWAYS tiny relative to the
corpus (megabytes of eval sets vs 100 TB of training text), so the
scale shape is broadcast-membership, not a join:

1. ``ngram_set`` reduces the benchmark dataset to its DISTINCT n-gram
   strings — per-batch vectorized construction + per-batch ``unique``,
   unioned on the driver (driver memory is benchmark-sized by
   definition; this is the documented small-side contract, like the
   ANN query matrix and the broadcast-join small side).
2. ``decontaminate`` puts that set in the object store ONCE
   (``ray.put``) and streams the corpus through a pure per-batch map:
   build each doc's n-grams vectorized, one Arrow ``is_in`` against
   the shared value set, ``bincount``-any per doc.  No shuffle, no
   state, nothing per-row.

Membership is on the EXACT n-gram string (tokens joined with a single
space — a character in the tokenizer split class, so the join is
injective; same trick as ``frequent.bigram_pmi``), making the operator
exactly replayable by a DuckDB EXISTS oracle with zero false positives
or negatives.  For benchmark sets too large even for one worker heap
(not a case that occurs in practice), compose ``join.bloom_from_keys``
/ ``bloom_prefilter`` on the n-gram rows instead — the Bloom path
keeps the no-false-negative guarantee and turns the memory cost into
a fixed bitmap.

Tokens are the analyzed stream (Java-trim + lower + punctuation split,
stopwords retained) shared with every sketch operator.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _split_tokens, ngram_strings


def _batch_ngrams(t: pa.Table, *, n: int, text_col: str):
    content = t[text_col]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    parents, values = _split_tokens(content)
    return ngram_strings(parents, values, n)


def ngram_set(ds, *, n: int, text_col: str = "text") -> pa.Array:
    """Distinct n-gram strings of a (small, benchmark-sized) dataset,
    as one Arrow string array on the driver.  Each batch ships only
    its batch-distinct grams; the final union is benchmark-sized by
    contract (do NOT point this at the 100 TB corpus side)."""
    def local_unique(t: pa.Table) -> pa.Table:
        _, grams = _batch_ngrams(t, n=n, text_col=text_col)
        return pa.table({"gram": pc.unique(grams)})

    parts = ds.map_batches(local_unique, batch_format="pyarrow") \
        .to_arrow_refs()
    import ray
    tables = [t for t in ray.get(parts) if t.num_rows]
    if not tables:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_tables(tables)["gram"].combine_chunks())


def decontaminate(ds, benchmark_ngrams, *, n: int, text_col: str = "text",
                  mode: str = "drop", flag_col: str = "contaminated"):
    """Remove (``mode='drop'``) or mark (``mode='flag'``) every row
    whose text shares at least one n-gram with ``benchmark_ngrams``
    (an Arrow/py list of gram strings from :func:`ngram_set`).
    Documents with fewer than ``n`` tokens can never be contaminated
    and always survive.  Pure streaming map over a broadcast set."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    if not isinstance(benchmark_ngrams, (pa.Array, pa.ChunkedArray)):
        benchmark_ngrams = pa.array(list(benchmark_ngrams), pa.string())
    import ray
    bench_ref = ray.put(benchmark_ngrams)

    def apply(t: pa.Table, *, bench) -> pa.Table:
        # broadcast set: fetched from the object store once per worker
        # (zero-copy shared thereafter), not shipped per batch
        if not isinstance(bench, (pa.Array, pa.ChunkedArray)):
            bench = ray.get(bench)
        parents, grams = _batch_ngrams(t, n=n, text_col=text_col)
        bad = np.zeros(t.num_rows, dtype=bool)
        if len(parents) and len(bench):
            hit = pc.is_in(grams, value_set=bench) \
                .to_numpy(zero_copy_only=False)
            bad[:] = np.bincount(parents[hit], minlength=t.num_rows) > 0
        if mode == "flag":
            return t.append_column(flag_col, pa.array(bad))
        return t.filter(pa.array(~bad))

    return ds.map_batches(partial(apply, bench=bench_ref),
                          batch_format="pyarrow")


def contamination_fraction(ds, benchmark_ngrams, *, n: int,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """FUZZY decontamination signal (the PaLM/GPT-3 'dirtiness' rule:
    drop a doc only when a substantial FRACTION of its n-grams is
    contaminated, not on a single shared gram): per doc, the count and
    fraction of its n-gram occurrences present in the benchmark set.
    Same broadcast-membership scale shape as :func:`decontaminate` —
    one ``is_in`` + two bincounts per batch, no shuffle; docs with
    fewer than ``n`` tokens emit (0, 0, 0.0).  Callers threshold the
    returned ``contam_frac`` themselves (keep < θ)."""
    if not isinstance(benchmark_ngrams, (pa.Array, pa.ChunkedArray)):
        benchmark_ngrams = pa.array(list(benchmark_ngrams), pa.string())
    import ray
    bench_ref = ray.put(benchmark_ngrams)

    def apply(t: pa.Table, *, bench) -> pa.Table:
        if not isinstance(bench, (pa.Array, pa.ChunkedArray)):
            bench = ray.get(bench)
        parents, grams = _batch_ngrams(t, n=n, text_col=text_col)
        m = t.num_rows
        total = np.bincount(parents, minlength=m).astype(np.int64)
        hits = np.zeros(m, dtype=np.int64)
        if len(parents) and len(bench):
            hit = pc.is_in(grams, value_set=bench) \
                .to_numpy(zero_copy_only=False)
            hits = np.bincount(parents[hit], minlength=m).astype(np.int64)
        frac = np.divide(hits, total, out=np.zeros(m, dtype=np.float64),
                         where=total > 0)
        return pa.table({id_col: t[id_col],
                         "n_grams": pa.array(total),
                         "n_contaminated": pa.array(hits),
                         "contam_frac": pa.array(frac)})

    return ds.map_batches(partial(apply, bench=bench_ref),
                          batch_format="pyarrow")
