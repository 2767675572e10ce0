"""Token-window document chunking — the split-long-docs-into-training-
sequences / RAG-passage operator.

Every LLM-data pipeline re-windows documents before training or
retrieval: a document of T tokens becomes ``ceil(T / stride)`` chunks,
chunk ``i`` covering analyzed tokens ``[i*stride, i*stride+window)``
(the final chunks are shorter; ``stride < window`` gives overlapping
context windows, ``stride > window`` gives gap-sampling).  At corpus
scale this must be a pure per-batch map that EXPANDS rows — no
shuffle, no state, no per-row Python — which is exactly what
``map_batches`` allows (output row count is free to differ from the
input's).

Token contract: chunks are windows over the ANALYZED token stream
(Java-trim + lower + punctuation split, stopwords retained — the same
``_split_tokens`` every sketch operator uses), and ``chunk_text`` is
those tokens re-joined with a single space.  That makes the operator
exactly replayable by the DuckDB oracle (``list_slice`` +
``array_to_string`` over the shared tokenizer CTE), at the cost of not
preserving the original inter-token whitespace — the standard contract
for token-window chunking, where the tokenizer's view IS the text.

Zero-token documents (empty or all-separator text) emit no chunks,
matching ``generate_series(0, -1, stride)`` = [] on the SQL side.

Everything is vectorized: the per-chunk token index set is built with
two ``np.repeat``/``cumsum`` constructions (the segmented-arange
idiom), gathered with one Arrow ``take``, and re-joined with one
``pc.binary_join`` over a ListArray — no Python loop at any row or
chunk count.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _split_tokens

CHUNK_SCHEMA_TAIL = [
    ("chunk_id", pa.int64()),
    ("chunk_text", pa.string()),
    ("n_tokens", pa.int64()),
]


def _segmented_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0) ++ [0..c1) ++ ... as one flat int64 array."""
    total = int(counts.sum())
    offs = np.concatenate(([0], np.cumsum(counts)))
    return np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)


def chunk_batch(t: pa.Table, *, window: int, stride: int,
                text_col: str = "text", id_col: str = "doc_id",
                out_col: str = "chunk_text") -> pa.Table:
    """One batch of ``chunk_documents`` (exposed for composition)."""
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    content = t[text_col]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n = t.num_rows
    empty = pa.table({
        id_col: pa.array([], ids.type if n else pa.int64()),
        "chunk_id": pa.array([], pa.int64()),
        out_col: pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()),
    })
    if n == 0:
        return empty
    parents, values = _split_tokens(content)
    n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
    n_chunks = np.where(n_tokens > 0, (n_tokens - 1) // stride + 1, 0)
    total_chunks = int(n_chunks.sum())
    if total_chunks == 0:
        return empty
    rows = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    chunk_id = _segmented_arange(n_chunks)
    start = chunk_id * stride
    clen = np.minimum(window, n_tokens[rows] - start)
    # flat token index of each chunk token: doc base + start + intra
    base = np.concatenate(([0], np.cumsum(n_tokens)))[:-1]
    idx = np.repeat(base[rows] + start, clen) + _segmented_arange(clen)
    toks = values.take(pa.array(idx))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.concatenate(([0], np.cumsum(clen)))
    lists = pa.LargeListArray.from_arrays(offsets.astype(np.int64), toks)
    return pa.table({
        id_col: ids.take(pa.array(rows)),
        "chunk_id": pa.array(chunk_id),
        out_col: pc.binary_join(lists, " "),
        "n_tokens": pa.array(clen),
    })


def chunk_documents(ds, *, window: int, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    out_col: str = "chunk_text"):
    """Expand each document into token-window chunks:
    ``(id_col, chunk_id, chunk_text, n_tokens)`` rows, chunk ``i``
    holding analyzed tokens ``[i*stride, i*stride+window)`` re-joined
    with single spaces.  ``stride`` defaults to ``window``
    (non-overlapping).  Pure streaming map — no shuffle, no driver
    materialization; at 100 TB each block independently fans out to
    its own chunk rows and flows straight to the consumer."""
    stride = window if stride is None else stride
    if not (isinstance(window, int) and window >= 1):
        raise ValueError(f"window must be a positive int, got {window!r}")
    if not (isinstance(stride, int) and stride >= 1):
        raise ValueError(f"stride must be a positive int, got {stride!r}")
    return ds.map_batches(
        partial(chunk_batch, window=window, stride=stride,
                text_col=text_col, id_col=id_col, out_col=out_col),
        batch_format="pyarrow")
