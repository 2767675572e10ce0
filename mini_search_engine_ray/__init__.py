"""mini_search_engine_ray — a Ray-Data-native full-text index + query engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
`Haixiang6123/mini-search-engine` (see SURVEY.md): text analysis
(punctuation / word-break tokenizers, Porter stemming, stopword
filtering), an inverted index with delta+varint-compressed posting
lists, positional postings, sorted segment merge, keyword/AND/OR/phrase
search, TF-IDF and BM25 top-k ranking, PageRank and score fusion —
re-expressed as `ray.data.Dataset` pipelines: `map_batches` over
zero-copy Arrow batches, salted `groupby` shuffles for posting-list
construction, immutable Parquet index shards with per-block max-score
metadata and resumable per-partition checkpoints, and stateful actor
pools for query serving.

Layout:
  functions/  pure, Ray-free kernels (tokenizers, stemmer, codecs,
              scoring, sketches) — unit-testable in isolation
  sources/    corpus readers / synthesizers / adapters
  stages/     Dataset -> Dataset transforms (ingest, postings, shards,
              merge, dedup, similarity, multimodal)
  state/      stateful serving components (index searcher actors,
              doc store, tombstones)
  pipelines/  end-to-end compositions (index build, query surface,
              pagerank) + the driver-facing query registry
"""

__version__ = "0.1.0"
