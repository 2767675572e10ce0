"""Regression tests for the round-3 core-engine review findings:
tombstone-aware merge fingerprints, merged-index analyzer metadata,
idempotent docstore merges, analyzer index/query parity, dense/sparse
accumulator agreement, and codec range guards."""

from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.pipelines.build import build_index
from mini_search_engine_ray.stages.merge import compact_index, merge_indexes
from mini_search_engine_ray.state.searcher import IndexSearcher, save_tombstones


def _ds(corpus: pa.Table):
    import ray.data as rd

    return rd.from_arrow(corpus)


def _corpus(texts):
    return pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                     "content": pa.array(texts)})


class TestMergeFixes:
    def test_remerge_after_delete_does_not_resurrect(self, ray_session, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dst")
        texts = [f"alpha beta doc{i}" for i in range(20)] + ["zombie gamma"] * 4
        build_index(_ds(_corpus(texts)), src, num_buckets=2, n_docs=24,
                    write_docstore=False, fingerprint="src")
        compact_index(src, dest, merge_docstore=False)
        assert len(IndexSearcher(dest).search_keyword("zombie")) == 4
        # delete (tombstones store ANALYZED terms), then RE-merge into
        # the same dest: the merge fingerprint must change so shards
        # are rewritten (a skipped rewrite + cleared tombstones would
        # resurrect the term)
        IndexSearcher(src).delete_documents("zombie")
        compact_index(src, dest, merge_docstore=False)
        s = IndexSearcher(dest)
        assert len(s.search_keyword("zombie")) == 0
        assert len(s.search_keyword("alpha")) == 20

    def test_merged_wordbreak_index_is_openable(self, ray_session, tmp_path):
        a, m = str(tmp_path / "wa"), str(tmp_path / "wm")
        texts = ["itisatruth"] * 3  # "it is a truth" — fully breakable
        build_index(_ds(_corpus(texts)), a, num_buckets=2, analyzer="wordbreak",
                    n_docs=3, write_docstore=False, fingerprint="a")
        merge_indexes([a], m, merge_docstore=False)
        s = IndexSearcher(m)  # raised KeyError(wordbreak_dict_path) before
        assert s.n_docs == 3

    def test_docstore_remerge_no_duplicates(self, ray_session, tmp_path):
        a, m = str(tmp_path / "da"), str(tmp_path / "dm")
        texts = [f"delta doc number {i}" for i in range(6)]
        build_index(_ds(_corpus(texts)), a, num_buckets=2, n_docs=6,
                    fingerprint="a")
        merge_indexes([a], m)
        merge_indexes([a], m)  # second merge into the SAME dest
        s = IndexSearcher(m)
        docs = s.get_documents(np.arange(6, dtype=np.int64))
        assert len(docs) == 6  # was 12 when write_parquet appended


class TestAnalyzerParity:
    def test_naive_matches_java_whitespace_class(self, ray_session):
        from mini_search_engine_ray.functions.tokenizers import naive_tokenize

        # NBSP is NOT Java \s: must stay inside the token (str.split
        # would split it and diverge from the vectorized index kernel)
        assert naive_tokenize("foo\xa0bar baz") == ["foo\xa0bar", "baz"]
        assert naive_tokenize("a\tb\x0bc\fd\re\nf") == list("abcdef")

    def test_naive_index_query_roundtrip_nbsp(self, ray_session, tmp_path):
        idx = str(tmp_path / "naive")
        texts = ["foo\xa0bar other", "plain words"]
        build_index(_ds(_corpus(texts)), idx, num_buckets=2, analyzer="naive",
                    n_docs=2, write_docstore=False, fingerprint="n")
        s = IndexSearcher(idx)
        assert s.search_keyword("foo\xa0bar").tolist() == [0]


class TestAccumulatorParity:
    def test_dense_keeps_zero_sum_docs(self, ray_session):
        ns = SimpleNamespace(DENSE_ACCUM_MAX_DOCS=10_000_000)
        docs = np.array([3, 3, 7], dtype=np.int64)
        contribs = np.array([1.5, -1.5, 2.0])
        d_u, d_s = IndexSearcher._accumulate(ns, docs, contribs)
        ns.DENSE_ACCUM_MAX_DOCS = 0  # force sparse path
        s_u, s_s = IndexSearcher._accumulate(ns, docs, contribs)
        assert d_u.tolist() == s_u.tolist() == [3, 7]
        assert d_s.tolist() == s_s.tolist() == [0.0, 2.0]


class TestCodecGuards:
    def test_naive_encode_out_of_range_raises(self, ray_session):
        from mini_search_engine_ray.functions.codecs import naive_encode

        with pytest.raises(ValueError):
            naive_encode([2**31])
        assert len(naive_encode([2**31 - 1, 0])) == 8


class TestDocstoreTmpFiles:
    def test_leaked_tmp_file_is_ignored(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        idx = str(tmp_path / "dsidx")
        texts = [f"epsilon doc {i}" for i in range(4)]
        build_index(_ds(_corpus(texts)), idx, num_buckets=2, n_docs=4,
                    fingerprint="d")
        # simulate a killed task's leftover: "_"-prefixed temp files are
        # invisible to Arrow dataset discovery even if fully written
        store = os.path.join(idx, "docstore")
        pq.write_table(pa.table({"doc_id": pa.array([99], pa.int64())}),
                       os.path.join(store, "_tmp.123.part-bogus.parquet"))
        s = IndexSearcher(idx)
        docs = s.get_documents(np.arange(4, dtype=np.int64))
        assert len(docs) == 4


class TestJavaTrimParity:
    def test_punctuation_trim_strips_edge_controls(self, ray_session):
        import pyarrow as _pa

        from mini_search_engine_ray.functions.tokenizers import punctuation_tokenize
        from mini_search_engine_ray.stages.textstats import _split_tokens

        # \x1b (ANSI escape) is <= U+0020 (Java trim) but NOT in the
        # split class: it must be stripped at the ENDS only
        text = "\x1bhello mid\x01dle world\x07"
        toks = punctuation_tokenize(text, stop_words=frozenset())
        assert toks == ["hello", "mid\x01dle", "world"]
        _, values = _split_tokens(_pa.array([text]))
        assert values.to_pylist() == toks

    def test_trimmed_doc_findable_in_index(self, ray_session, tmp_path):
        idx = str(tmp_path / "trimidx")
        texts = ["\x1bneedle in haystack\x07", "other text entirely"]
        build_index(_ds(_corpus(texts)), idx, num_buckets=2,
                    analyzer="punctuation", n_docs=2,
                    write_docstore=False, fingerprint="t")
        s = IndexSearcher(idx)
        assert s.search_keyword("needle").tolist() == [0]
        # query-side trim is symmetric: the raw query finds it too
        assert s.search_keyword("\x1bneedle").tolist() == [0]
        # and the STORED term is the trimmed form
        assert s.postings("needle") is not None
        assert s.postings("\x1bneedle") is None
