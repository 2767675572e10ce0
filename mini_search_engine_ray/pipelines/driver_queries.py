"""Driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Each entry in QUERIES is a callable `f(sf_dir) -> Dataset | DataFrame |
pyarrow.Table`; ORACLE_SQL holds the equivalent ANSI SQL that DuckDB
runs on the same parquet tables (views: documents, embeddings, ...).
Column names and rounding are kept EXACTLY in sync between both sides
(the driver hash-compares values after sorting columns by name).

Tokenization parity: the SQL tokenizer is the same RE2 character class
as `functions/tokenizers.PUNCT_SPLIT_RE2`, verified byte-identical over
the test corpus. SQL-checked search/scoring queries therefore run the
index with the `punctuation` analyzer (no stemming — Porter isn't
SQL-expressible; the stemmed path is covered by pytest golden vectors
and the brute-force oracle, plus the *_golden VALUES oracles below).

Rounding: round-half-up via floor(x*10000 + 0.5)/10000 on BOTH sides
(numpy round is banker's, DuckDB round is half-away — neither matches
the other, so we use an explicit common formula).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..functions.stopwords import STOP_WORDS
from ..functions.tokenizers import PUNCT_SPLIT_RE2

FORMAT_VERSION = "v2"  # bump to invalidate /tmp index caches on format change

# ---------------------------------------------------------------------
# SQL fragments
# ---------------------------------------------------------------------

_SQL_CLASS = "[,.;?! ^\\f\\n\\r\\t\\x0B\\x85\\x{2028}\\x{2029}]+"
assert _SQL_CLASS == PUNCT_SPLIT_RE2
_STOP_IN = "(" + ",".join(f"'{w}'" for w in sorted(STOP_WORDS)) + ")"

_BASE_CTE = f"""
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_SQL_CLASS}'),
                     x -> x <> '') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, toks,
         list_filter(toks, x -> x NOT IN {_STOP_IN}) AS terms
  FROM tok
)
"""

_R4 = "floor({expr} * 10000 + 0.5) / 10000"


def _r4(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1e4 + 0.5) / 1e4


# query constants (fixed, present in the synthetic documents vocabulary)
KW = "spark"
AND_TERMS = ["window", "merge"]
OR_TERMS = ["spark", "vector"]
PHRASE = ["key", "agg"]
PHRASE3 = ["table", "part", "hash"]
BM25_TERMS = ["spark", "window", "merge"]
TFIDF_TERMS = ["table", "row", "scan"]
TOPK = 10
ANN_QUERY_IDS = 5
ANN_K = 10


# ---------------------------------------------------------------------
# index cache (shared across query callables)
# ---------------------------------------------------------------------


def _cache_root() -> str:
    return os.environ.get("MSR_CACHE_DIR", "/tmp/msr_driver_cache")


def get_index(sf_dir: str, *, analyzer: str = "punctuation", positional: bool = True) -> str:
    """Build (or reuse) the documents-table index for sf_dir."""
    import ray.data as rd

    from ..sources.corpus import adapt_documents_table, corpus_fingerprint
    from .build import build_index, load_meta

    src = os.path.join(sf_dir, "documents.parquet")
    fp = f"{FORMAT_VERSION}:{corpus_fingerprint([src])}"
    key = hashlib.sha256(f"{src}:{analyzer}:{positional}:{fp}".encode()).hexdigest()[:16]
    index_dir = os.path.join(_cache_root(), f"idx-{key}")
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        try:
            if load_meta(index_dir)["fingerprint"].startswith(fp):
                return index_dir
        except Exception:
            pass
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(src).num_rows
    ds = adapt_documents_table(sf_dir)
    build_index(
        ds,
        index_dir,
        analyzer=analyzer,
        num_buckets=8,
        positional=positional,
        n_docs=n_docs,
        fingerprint=fp,
        write_docstore=False,
    )
    return index_dir


def _searcher(sf_dir: str):
    from ..state.searcher import IndexSearcher

    return IndexSearcher(get_index(sf_dir))


def _docs_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _ids_table(ids) -> pa.Table:
    return pa.table({"doc_id": pa.array(np.asarray(ids, dtype=np.int64))})


def _scored_table(ids, scores) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "score": pa.array(_r4(scores)),
        }
    )


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------


def q_token_stats(sf_dir: str):
    from ..stages.textstats import token_stats_batch

    def fix(t: pa.Table) -> pa.Table:
        out = token_stats_batch(t)
        cols = {c: out[c] for c in out.column_names}
        for c in ("stop_ratio", "mean_token_len", "uniq_ratio"):
            cols[c] = pa.array(_r4(out[c].to_numpy(zero_copy_only=False)))
        return pa.table(cols)

    return _docs_ds(sf_dir).map_batches(fix, batch_format="pyarrow")


def q_langid(sf_dir: str):
    from ..stages.textstats import langid_batch

    return _docs_ds(sf_dir).map_batches(langid_batch, batch_format="pyarrow")


def q_term_stats(sf_dir: str):
    """(term, df, total_tf) read back from the BUILT index shards —
    checks posting-list construction itself against SQL."""
    import ray.data as rd

    from ..stages.shards import list_shards, open_shard

    index_dir = get_index(sf_dir)
    sids = list_shards(index_dir)

    def read(batch: pa.Table) -> pa.Table:
        parts = []
        for sid in batch["sid"].to_pylist():
            t = open_shard(index_dir, sid)
            if t is not None:
                parts.append(t.select(["term", "df", "total_tf"]))
        return pa.concat_tables(parts) if parts else pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
             "total_tf": pa.array([], pa.int64())}
        )

    return rd.from_items([{"sid": s} for s in sids], override_num_blocks=max(1, len(sids))).map_batches(
        read, batch_size=1, batch_format="pyarrow"
    )


def q_search_keyword(sf_dir: str):
    return _ids_table(_searcher(sf_dir).search_keyword(KW))


def q_search_and(sf_dir: str):
    return _ids_table(_searcher(sf_dir).search_and(AND_TERMS))


def q_search_or(sf_dir: str):
    return _ids_table(_searcher(sf_dir).search_or(OR_TERMS))


def q_search_phrase(sf_dir: str):
    return _ids_table(_searcher(sf_dir).search_phrase(PHRASE))


def q_bm25_topk(sf_dir: str):
    ids, sc = _searcher(sf_dir).search_bm25(BM25_TERMS, TOPK)
    return _scored_table(ids, sc)


def q_bm25_all(sf_dir: str):
    ids, sc = _searcher(sf_dir).search_bm25(BM25_TERMS, None, prune=False)
    return _scored_table(ids, sc)


def q_tfidf_topk(sf_dir: str):
    ids, sc = _searcher(sf_dir).search_tfidf(TFIDF_TERMS, TOPK)
    return _scored_table(ids, sc)


def q_dedup_exact(sf_dir: str):
    from ..stages.dedup import dedup_exact

    return dedup_exact(_docs_ds(sf_dir))


def q_sha256_docs(sf_dir: str):
    from ..sources.corpus import sha256_column

    def add(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "sha256": sha256_column(t, "text")})

    return _docs_ds(sf_dir).map_batches(add, batch_format="pyarrow")


def q_token_count_total(sf_dir: str):
    from ray.data.aggregate import Sum

    stats = q_token_stats(sf_dir)
    agg = stats.aggregate(Sum("n_tokens", alias_name="total_tokens"),
                          Sum("n_terms", alias_name="total_terms"))
    # distinct terms from the index term dictionary
    n_distinct = q_term_stats(sf_dir).count()
    return pa.table(
        {
            "total_tokens": pa.array([int(agg["total_tokens"])], pa.int64()),
            "total_terms": pa.array([int(agg["total_terms"])], pa.int64()),
            "distinct_terms": pa.array([int(n_distinct)], pa.int64()),
        }
    )


def q_ann_cosine_topk(sf_dir: str):
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..stages.similarity import ann_cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, filters=[("vec_id", "<", ANN_QUERY_IDS)])
    qt = qt.sort_by("vec_id")  # query_id i == vec_id i
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    ds = rd.read_parquet(emb_path)
    out = ann_cosine_topk(ds, qm, k=ANN_K)

    def fix(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t["query_id"],  # == vec_id of the query (0..4 in order)
                "vec_id": t["vec_id"],
                "score": pa.array(_r4(t["score"].to_numpy(zero_copy_only=False))),
            }
        )

    return out.drop_columns(["rank"]).map_batches(fix, batch_format="pyarrow")


def q_search_phrase3(sf_dir: str):
    return _ids_table(_searcher(sf_dir).search_phrase(PHRASE3))


def q_tfidf_all(sf_dir: str):
    ids, sc = _searcher(sf_dir).search_tfidf(TFIDF_TERMS, None)
    return _scored_table(ids, sc)


def q_term_positions(sf_dir: str):
    """(doc_id, pos) of the keyword's occurrences in the analyzed
    (stopword-stripped) token stream — value-checks the POSITIONAL
    index payloads (A9/J3 machinery) against SQL."""
    s = _searcher(sf_dir)
    p = s.postings(KW, positions=True)
    if p is None:
        return pa.table({"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())})
    docs, _, _, poslists = p
    out_doc, out_pos = [], []
    for d, pl in zip(docs.tolist(), poslists):
        out_doc.extend([d] * len(pl))
        out_pos.extend(int(x) for x in pl)
    return pa.table(
        {"doc_id": pa.array(out_doc, pa.int64()), "pos": pa.array(out_pos, pa.int64())}
    )


def q_code_term_stats(sf_dir: str):
    """(term, df, total_tf) under the code-aware tokenizer (camelCase /
    snake_case / acronym splitting, no stemming) — SQL-replicable."""
    import ray.data as rd

    from ..stages.ingest import TokenizeExplode

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t2 = pa.table({"doc_id": t["doc_id"], "content": t["text"]})
        te = TokenizeExplode("code_nostem", num_buckets=1, pack=False)
        out = te(t2).select(["term", "doc_id", "tf"])
        # groupby can't key on a dictionary column — cast to plain string
        return out.set_column(0, "term", pc.cast(out["term"], pa.string()))

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # (doc_id, term) rows are distinct by construction, so df = row
    # count per term and total_tf = sum(tf) per term — one aggregate.
    from ray.data.aggregate import Count, Sum

    out = exploded.groupby("term").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="total_tf")
    )

    def fix(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "term": t["term"],
                "df": pc.cast(t["df"], pa.int64()),
                "total_tf": pc.cast(t["total_tf"], pa.int64()),
            }
        )

    return out.map_batches(fix, batch_format="pyarrow")


# -- rows-only (non-SQL-expressible) -----------------------------------


def q_ann_ivf_topk(sf_dir: str):
    """IVF approximate cosine top-k (rows-only: the approximation isn't
    SQL-expressible; recall vs brute force is pytest-verified)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..stages.similarity import ivf_cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, filters=[("vec_id", "<", ANN_QUERY_IDS)]).sort_by("vec_id")
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    out = ivf_cosine_topk(rd.read_parquet(emb_path), qm, k=ANN_K, n_centroids=8, nprobe=3)

    def fix(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t["query_id"],
                "vec_id": t["vec_id"],
                "score": pa.array(_r4(t["score"].to_numpy(zero_copy_only=False))),
            }
        )

    return out.drop_columns(["rank"]).map_batches(fix, batch_format="pyarrow")


def q_compression_ratio(sf_dir: str):
    """Bytes of delta+varint-compressed doc_id postings vs the 4-byte
    naive encoding, summed over the built index — the analogue of the
    reference's page-I/O-counter compression gate
    (`Team6IndexCompressionTest.java:24-42`; the reference asserts
    compressed page counts strictly below naive)."""
    from ..stages.shards import list_shards, open_shard

    index_dir = get_index(sf_dir)
    compressed = naive = postings = 0
    for sid in list_shards(index_dir):
        t = open_shard(index_dir, sid)
        if t is None:
            continue
        col = t["docs"].combine_chunks() if isinstance(t["docs"], pa.ChunkedArray) else t["docs"]
        compressed += sum(len(col[i].as_py()) for i in range(len(col)))
        n = int(np.sum(t["df"].to_numpy(zero_copy_only=False)))
        naive += 4 * n
        postings += n
    return pa.table(
        {
            "compressed_bytes": pa.array([compressed], pa.int64()),
            "naive_bytes": pa.array([naive], pa.int64()),
            "n_postings": pa.array([postings], pa.int64()),
            "beats_naive": pa.array([compressed < naive]),
        }
    )


def q_minhash_signatures(sf_dir: str):
    from ..stages.dedup import minhash_batch

    def sig_hash(t: pa.Table) -> pa.Table:
        out = minhash_batch(t)
        sig = out["sig"].combine_chunks()
        n = len(sig)
        w = sig.type.list_size
        raw = sig.values.to_numpy(zero_copy_only=False).reshape(n, w)
        hashes = [hashlib.blake2b(r.tobytes(), digest_size=8).hexdigest() for r in raw]
        return pa.table({"doc_id": out["doc_id"], "sig_hash": pa.array(hashes)})

    return _docs_ds(sf_dir).map_batches(sig_hash, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    from ..stages.dedup import simhash_batch

    return _docs_ds(sf_dir).map_batches(simhash_batch, batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    from ..stages.textstats import fingerprint_batch

    def counts(t: pa.Table) -> pa.Table:
        out = fingerprint_batch(t)
        return out.select(["doc_id", "n_fingerprints"])

    return _docs_ds(sf_dir).map_batches(counts, batch_format="pyarrow")


def q_minhash_near_pairs(sf_dir: str):
    from ..stages.dedup import minhash_candidate_pairs

    pairs, _ = minhash_candidate_pairs(_docs_ds(sf_dir).select_columns(["doc_id", "text"]))
    return pairs


def q_embedding_dup_pairs(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import embedding_dup_pairs

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = embedding_dup_pairs(ds, threshold=0.9)

    def fix(df):
        df = df.copy()
        df["score"] = np.floor(df["score"] * 1e4 + 0.5) / 1e4
        return df

    return out.map_batches(fix, batch_format="pandas")


def q_pagerank(sf_dir: str):
    """PageRank over a deterministic synthetic link graph derived from
    doc ids (each doc links to (7i+3) mod N and (13i+5) mod N)."""
    import pyarrow.parquet as pq

    from .pagerank import pagerank_numpy

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    i = np.arange(n, dtype=np.int64)
    src = np.r_[i, i]
    dst = np.r_[(7 * i + 3) % n, (13 * i + 5) % n]
    keep = src != dst
    scores = pagerank_numpy(src[keep], dst[keep], n)
    return pa.table({"node": pa.array(i), "score": pa.array(_r4(scores))})


# -- golden VALUES oracles ---------------------------------------------

_CODEC_GOLDEN = [
    ("six_ones", [1, 2, 3, 4, 5, 6]),
    ("powers", [128, 384, 896, 1920, 3968]),
    ("max_int", [2147483647]),
    ("empty", []),
    ("zero", [0]),
]


def q_codec_golden(sf_dir: str):
    from ..functions.codecs import varint_decode, varint_encode

    rows = []
    for name, ints in _CODEC_GOLDEN:
        enc = varint_encode(ints)
        ok = varint_decode(enc).tolist() == ints
        rows.append({"case_id": name, "encoded_hex": enc.hex(), "roundtrip_ok": ok})
    return pa.Table.from_pylist(rows)


_STEM_GOLDEN = {
    "stemming": "stem", "important": "import", "computer": "comput",
    "science": "scienc", "clothes": "cloth", "satisfactory": "satisfactori",
    "wearing": "wear", "worn": "worn", "programmers": "programm",
    "Jerry": "Jerri", "use": "us", "however": "howev", "writing": "write",
    "Turning": "Turn", "results": "result", "applications": "applic",
    "this": "thi", "information": "inform", "retrieval": "retriev",
    "activity": "activ", "obtaining": "obtain", "resources": "resourc",
    "relevant": "relev", "collection": "collect", "fished": "fish",
    "alone": "alon", "weeks": "week", "taking": "take", "rate": "rate",
    "feed": "feed", "sky": "sky", "caress": "caress", "1234": "1234",
}


def q_stemmer_golden(sf_dir: str):
    from ..functions.porter import porter_stem

    return pa.table(
        {
            "word": pa.array(list(_STEM_GOLDEN)),
            "stem": pa.array([porter_stem(w) for w in _STEM_GOLDEN]),
        }
    )


_WB_DICT = [
    "﻿", "さようなら 1 1 1",
    "你好 1", "我 2", "是 3", "一个 4", "人 5",
    "the 23135851162", "cat 900000", "and 10000000", "dog 800000",
    "a 8000000", "i 3000000", "ai 100000", "catand 1",
]
_WB_GOLDEN = [
    ("catanddog", "cat dog"),
    ("catdogcatdog", "cat dog cat dog"),
    ("你好我是一个人", "你好 我 是 一个 人"),
    ("CatAndDog", "cat dog"),
]


def q_wordbreak_golden(sf_dir: str):
    from ..functions.tokenizers import WordBreakTokenizer

    tok = WordBreakTokenizer(_WB_DICT)
    return pa.table(
        {
            "input": pa.array([i for i, _ in _WB_GOLDEN]),
            "tokens": pa.array([" ".join(tok.tokenize(i)) for i, _ in _WB_GOLDEN]),
        }
    )


# ---------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------

QUERIES = {
    "token_stats": q_token_stats,
    "langid": q_langid,
    "term_stats": q_term_stats,
    "search_keyword": q_search_keyword,
    "search_and": q_search_and,
    "search_or": q_search_or,
    "search_phrase": q_search_phrase,
    "search_phrase3": q_search_phrase3,
    "tfidf_all": q_tfidf_all,
    "term_positions": q_term_positions,
    "code_term_stats": q_code_term_stats,
    "bm25_topk": q_bm25_topk,
    "bm25_all": q_bm25_all,
    "tfidf_topk": q_tfidf_topk,
    "dedup_exact": q_dedup_exact,
    "sha256_docs": q_sha256_docs,
    "token_count_total": q_token_count_total,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "compression_ratio": q_compression_ratio,
    "minhash_signatures": q_minhash_signatures,
    "simhash": q_simhash,
    "fingerprints": q_fingerprints,
    "minhash_near_pairs": q_minhash_near_pairs,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "pagerank": q_pagerank,
    "codec_golden": q_codec_golden,
    "stemmer_golden": q_stemmer_golden,
    "wordbreak_golden": q_wordbreak_golden,
}


def _marker_count(lang_markers: list[str]) -> str:
    inlist = ",".join(f"'{m}'" for m in lang_markers)
    return f"len(list_filter(toks, x -> x IN ({inlist})))::BIGINT"


def _langid_sql() -> str:
    from ..stages.textstats import LANG_MARKERS

    en = _marker_count(LANG_MARKERS["en"])
    de = _marker_count(LANG_MARKERS["de"])
    fr = _marker_count(LANG_MARKERS["fr"])
    es = _marker_count(LANG_MARKERS["es"])
    return f"""
WITH {_BASE_CTE},
c AS (SELECT doc_id, {en} AS en, {de} AS de, {fr} AS fr, {es} AS es FROM tok)
SELECT doc_id,
  CASE WHEN greatest(en,de,fr,es) = 0 THEN 'unknown'
       WHEN en = greatest(en,de,fr,es) THEN 'en'
       WHEN de = greatest(en,de,fr,es) THEN 'de'
       WHEN fr = greatest(en,de,fr,es) THEN 'fr'
       ELSE 'es' END AS pred_lang,
  greatest(en,de,fr,es)::BIGINT AS marker_hits
FROM c
"""


def _bm25_sql(terms: list[str], limit: int | None) -> str:
    qlist = ",".join(f"'{t}'" for t in terms)
    lim = f"LIMIT {limit}" if limit is not None else ""
    return f"""
WITH {_BASE_CTE},
meta AS (SELECT count(*)::DOUBLE AS n,
                sum(len(terms))::DOUBLE / count(*)::DOUBLE AS avgdl FROM base),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM (SELECT doc_id, unnest(terms) AS term FROM base) GROUP BY doc_id, term),
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf
        WHERE term IN ({qlist}) GROUP BY term),
dl AS (SELECT doc_id, len(terms)::DOUBLE AS dl FROM base),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (meta.n - dfq.df + 0.5) / (dfq.df + 0.5))
              * tf.tf * (1.2 + 1.0)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / meta.avgdl)) ) AS score
  FROM tf
  JOIN dfq ON dfq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY tf.doc_id)
SELECT doc_id, {_R4.format(expr="score")} AS score
FROM scores ORDER BY score DESC, doc_id {lim}
"""


def _tfidf_sql(terms: list[str], limit: int | None) -> str:
    qlist = ",".join(f"'{t}'" for t in terms)
    lim = f"LIMIT {limit}" if limit is not None else ""
    return f"""
WITH {_BASE_CTE},
meta AS (SELECT count(*)::DOUBLE AS n FROM base),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM (SELECT doc_id, unnest(terms) AS term FROM base) GROUP BY doc_id, term),
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf
        WHERE term IN ({qlist}) GROUP BY term),
parts AS (
  SELECT tf.doc_id,
         (tf.tf * meta.n / dfq.df) * (meta.n / dfq.df) AS dot_part,
         (tf.tf * meta.n / dfq.df) * (tf.tf * meta.n / dfq.df) AS len_part
  FROM tf JOIN dfq ON dfq.term = tf.term CROSS JOIN meta),
scores AS (
  SELECT doc_id, sum(dot_part) / sqrt(sum(len_part)) AS score
  FROM parts GROUP BY doc_id)
SELECT doc_id, {_R4.format(expr="score")} AS score
FROM scores ORDER BY score DESC, doc_id {lim}
"""


ORACLE_SQL = {
    "token_stats": f"""
WITH {_BASE_CTE}
SELECT doc_id,
  len(toks)::BIGINT AS n_tokens,
  len(terms)::BIGINT AS n_terms,
  {_R4.format(expr="(len(toks) - len(terms))::DOUBLE / greatest(len(toks), 1)")} AS stop_ratio,
  {_R4.format(expr="coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE / greatest(len(toks), 1)")} AS mean_token_len,
  {_R4.format(expr="len(list_distinct(terms))::DOUBLE / greatest(len(terms), 1)")} AS uniq_ratio
FROM base
""",
    "langid": _langid_sql(),
    "term_stats": f"""
WITH {_BASE_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS total_tf
FROM (SELECT doc_id, unnest(terms) AS term FROM base)
GROUP BY term
""",
    "search_keyword": f"""
WITH {_BASE_CTE}
SELECT doc_id FROM base WHERE list_contains(terms, '{KW}') ORDER BY doc_id
""",
    "search_and": f"""
WITH {_BASE_CTE}
SELECT doc_id FROM base
WHERE list_contains(terms, '{AND_TERMS[0]}') AND list_contains(terms, '{AND_TERMS[1]}')
ORDER BY doc_id
""",
    "search_or": f"""
WITH {_BASE_CTE}
SELECT doc_id FROM base
WHERE list_contains(terms, '{OR_TERMS[0]}') OR list_contains(terms, '{OR_TERMS[1]}')
ORDER BY doc_id
""",
    "search_phrase": f"""
WITH {_BASE_CTE}
SELECT doc_id FROM base
WHERE len(terms) >= 2
  AND len(list_filter(range(1, len(terms)),
          i -> terms[i] = '{PHRASE[0]}' AND terms[i+1] = '{PHRASE[1]}')) > 0
ORDER BY doc_id
""",
    "search_phrase3": f"""
WITH {_BASE_CTE}
SELECT doc_id FROM base
WHERE len(terms) >= 3
  AND len(list_filter(range(1, len(terms) - 1),
          i -> terms[i] = '{PHRASE3[0]}' AND terms[i+1] = '{PHRASE3[1]}'
               AND terms[i+2] = '{PHRASE3[2]}')) > 0
ORDER BY doc_id
""",
    "tfidf_all": _tfidf_sql(TFIDF_TERMS, None),
    "term_positions": f"""
WITH {_BASE_CTE}
SELECT doc_id, unnest(list_filter(range(1, len(terms) + 1),
                                  i -> terms[i] = '{KW}')) - 1 AS pos
FROM base
""",
    "code_term_stats": f"""
WITH ctok AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(
             lower(regexp_replace(regexp_replace(text,
                     '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
                   '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')),
             '[^a-z0-9]+'),
           x -> length(x) > 1 AND x NOT IN {_STOP_IN}) AS terms
  FROM documents
)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS total_tf
FROM (SELECT doc_id, unnest(terms) AS term FROM ctok)
GROUP BY term
""",
    "bm25_topk": _bm25_sql(BM25_TERMS, TOPK),
    "bm25_all": _bm25_sql(BM25_TERMS, None),
    "tfidf_topk": _tfidf_sql(TFIDF_TERMS, TOPK),
    "dedup_exact": """
SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_id,
       count(*)::BIGINT AS n_dups
FROM documents GROUP BY md5(text)
""",
    "sha256_docs": "SELECT doc_id, sha256(text) AS sha256 FROM documents",
    "token_count_total": f"""
WITH {_BASE_CTE}
SELECT (SELECT sum(len(toks)) FROM base)::BIGINT AS total_tokens,
       (SELECT sum(len(terms)) FROM base)::BIGINT AS total_terms,
       (SELECT count(DISTINCT term)
        FROM (SELECT unnest(terms) AS term FROM base))::BIGINT AS distinct_terms
""",
    "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < {ANN_QUERY_IDS}),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rn
      FROM s)
SELECT query_id, vec_id, {_R4.format(expr="sim")} AS score
FROM r WHERE rn <= {ANN_K}
""",
    "codec_golden": """
SELECT * FROM (VALUES
  ('six_ones', '010101010101', true),
  ('powers', '81008200840088009000', true),
  ('max_int', '87ffffff7f', true),
  ('empty', '', true),
  ('zero', '00', true)
) AS t(case_id, encoded_hex, roundtrip_ok)
""",
    "stemmer_golden": "SELECT * FROM (VALUES "
    + ", ".join(f"('{w}', '{s}')" for w, s in _STEM_GOLDEN.items())
    + ") AS t(word, stem)",
    "wordbreak_golden": "SELECT * FROM (VALUES "
    + ", ".join(f"('{i}', '{o}')" for i, o in _WB_GOLDEN)
    + ") AS t(input, tokens)",
}
