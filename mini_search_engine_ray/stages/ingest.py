"""Tokenize + explode: the ingestion `map_batches` stage.

Stateful actor-pool stage (`map_batches(TokenizeExplode, concurrency=N,
batch_format="pyarrow")`): the analyzer (stemmer memo-cache, compiled
regexes, word-break dictionary) is built ONCE per actor in `__init__`;
each `__call__` turns an Arrow batch of documents into exploded posting
rows `(term, shard, doc_id, tf, doc_len[, positions])` — one row per
distinct (term, doc) pair, replacing the reference's per-document
`addDocument` + `countTokens` loop
(`index/inverted/InvertedIndexManager.java:162-209`) and its positional
re-analysis (`utils/Utils.java:186-201` — here positions come from the
same single pass).

Vectorization: tokenizing is pyarrow.compute (utf8_lower +
split_pattern_regex over the whole batch, zero-copy from the object
store); stemming touches only the batch's *unique* tokens via
dictionary encoding (memoized across batches per actor); tf / positions
/ doc_len come from one numpy lexsort-and-runs pass. No per-row Python
in the punctuation/code paths.

Skew (north rule): the shard key is `hash(term) % num_buckets` salted
by `doc_id % salt` -> `shard = bucket * salt + (doc_id % salt)`, so a
hot term's postings spread over `salt` sub-shards that the compaction
stage (stages/merge.py) or the searcher merges back in doc_id order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analyzers import make_analyzer
from ..functions.porter import PorterStemmer
from ..functions.stopwords import STOP_WORDS
from ..functions.tokenizers import (
    CAMEL_1_RE2,
    CAMEL_2_RE2,
    NON_IDENT_RE2,
    PUNCT_SPLIT_RE2,
)

_STOPWORDS_PA = pa.array(sorted(STOP_WORDS))

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("doc_len", pa.int32()),
    ]
)


def term_bucket(term: str, num_buckets: int) -> int:
    """Deterministic term -> bucket hash (stable across processes)."""
    return int.from_bytes(hashlib.blake2b(term.encode(), digest_size=8).digest(), "big") % num_buckets


class TokenizeExplode:
    """Callable-class stage for `map_batches` actor pools."""

    def __init__(
        self,
        analyzer: str = "composable",
        *,
        num_buckets: int = 16,
        salt: int = 1,
        positional: bool = False,
        wordbreak_dict_path: str | None = None,
    ) -> None:
        self.analyzer_name = analyzer
        self.num_buckets = num_buckets
        self.salt = max(1, salt)
        self.positional = positional
        self._stemmer = PorterStemmer()
        self._bucket_cache: dict[str, int] = {}
        self._vector_path = analyzer in ("composable", "punctuation", "code", "code_nostem", "naive")
        if not self._vector_path:
            kw = {"dict_path": wordbreak_dict_path} if analyzer.startswith("wordbreak") else {}
            self._analyzer = make_analyzer(analyzer, **kw)
        self._stem_tokens = analyzer in ("composable", "code")

    # -- tokenization (vectorized) -------------------------------------

    def _tokens_vector(self, content: pa.Array) -> tuple[np.ndarray, pa.Array]:
        """content -> (parent_doc_index per token, token values)."""
        name = self.analyzer_name
        lower_after = False
        if name in ("composable", "punctuation"):
            arr = pc.utf8_lower(content)
            toks = pc.split_pattern_regex(arr, pattern=PUNCT_SPLIT_RE2)
            drop_stop, min_len = True, 1
        elif name in ("code", "code_nostem"):
            arr = pc.replace_substring_regex(content, pattern=CAMEL_1_RE2, replacement=r"\1 \2")
            arr = pc.replace_substring_regex(arr, pattern=CAMEL_2_RE2, replacement=r"\1 \2")
            arr = pc.utf8_lower(arr)
            toks = pc.split_pattern_regex(arr, pattern=NON_IDENT_RE2)
            drop_stop, min_len = True, 2
        else:  # naive
            arr = pc.utf8_lower(content)
            toks = pc.split_pattern_regex(arr, pattern="[ \\t\\n\\x0B\\f\\r]+")
            drop_stop, min_len = False, 1
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        values = toks.flatten()
        mask = pc.greater_equal(pc.utf8_length(values), min_len) if min_len > 1 else pc.not_equal(values, "")
        if min_len > 1:
            mask = pc.and_(mask, pc.not_equal(values, ""))
        if drop_stop:
            mask = pc.and_(mask, pc.invert(pc.is_in(values, value_set=_STOPWORDS_PA)))
        keep = mask.to_numpy(zero_copy_only=False)
        return parents[keep], values.filter(mask)

    def _tokens_python(self, content: pa.Array) -> tuple[np.ndarray, pa.Array]:
        parents, values = [], []
        for i, text in enumerate(content.to_pylist()):
            for t in self._analyzer.analyze(text):
                parents.append(i)
                values.append(t)
        return np.asarray(parents, dtype=np.int64), pa.array(values, type=pa.string())

    # -- the batch kernel ----------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)

        if self._vector_path:
            parents, values = self._tokens_vector(content)
        else:
            parents, values = self._tokens_python(content)

        if len(parents) == 0:
            cols = {
                "term": pa.array([], type=pa.string()),
                "shard": pa.array([], type=pa.int32()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int32()),
                "doc_len": pa.array([], type=pa.int32()),
            }
            if self.positional:
                cols["positions"] = pa.array([], type=pa.list_(pa.int32()))
            return pa.table(cols)

        # unique-token stemming via dictionary encoding
        dict_arr = values.dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        vocab = dict_arr.dictionary.to_pylist()
        if self._stem_tokens and not self._vector_path_already_stemmed():
            stem = self._stemmer.stem
            vocab = [stem(v) for v in vocab]
        # merge tokens that stem to the same term
        uniq_terms, remap = np.unique(np.asarray(vocab, dtype=object), return_inverse=True)
        term_codes = remap[codes]

        # positions in the analyzed stream + doc lengths (one numpy pass)
        n_tok = len(parents)
        doc_start = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
        run_len = np.diff(np.r_[doc_start, n_tok])
        positions = (np.arange(n_tok) - np.repeat(doc_start, run_len)).astype(np.int32)
        doc_len_by_row = np.bincount(parents, minlength=batch.num_rows).astype(np.int32)

        # group by (doc, term): runs after lexsort
        order = np.lexsort((positions, term_codes, parents))
        g_par = parents[order]
        g_term = term_codes[order]
        g_pos = positions[order]
        boundary = np.r_[True, (g_par[1:] != g_par[:-1]) | (g_term[1:] != g_term[:-1])]
        starts = np.flatnonzero(boundary)
        tf = np.diff(np.r_[starts, n_tok]).astype(np.int32)
        r_par = g_par[starts]
        r_term = g_term[starts]

        # shard = bucket(term) * salt + doc_id % salt
        buckets = np.fromiter(
            (self._bucket(t) for t in uniq_terms), count=len(uniq_terms), dtype=np.int64
        )
        r_doc = doc_ids[r_par]
        shard = (buckets[r_term] * self.salt + (r_doc % self.salt)).astype(np.int32)

        # dictionary-encoded term column: the shuffle ships each unique
        # term once per block instead of one string per posting row
        # (2-3x fewer shuffle bytes on natural-language vocabularies)
        term_col = pa.DictionaryArray.from_arrays(
            pa.array(r_term, type=pa.int32()), pa.array(uniq_terms.tolist(), type=pa.string())
        )
        cols = {
            "term": term_col,
            "shard": pa.array(shard),
            "doc_id": pa.array(r_doc),
            "tf": pa.array(tf),
            "doc_len": pa.array(doc_len_by_row[r_par]),
        }
        if self.positional:
            offsets = np.r_[starts, n_tok].astype(np.int32)
            cols["positions"] = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(g_pos, type=pa.int32())
            )
        return pa.table(cols)

    def _vector_path_already_stemmed(self) -> bool:
        return False  # vector tokenizers never stem; stemming is the dictionary pass

    def _bucket(self, term: str) -> int:
        b = self._bucket_cache.get(term)
        if b is None:
            b = term_bucket(term, self.num_buckets)
            if len(self._bucket_cache) < 1_000_000:
                self._bucket_cache[term] = b
        return b
