"""Merge/compaction equality, tombstone physical drop, and
checkpoint-resume byte-identity (FIXTURES.md F6/F7)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.pipelines.build import build_index
from mini_search_engine_ray.pipelines.oracle import BruteForceOracle
from mini_search_engine_ray.sources.corpus import synth_corpus
from mini_search_engine_ray.stages.merge import compact_index, merge_indexes
from mini_search_engine_ray.stages.shards import list_shards, read_shard_as_dicts, shard_paths
from mini_search_engine_ray.state.searcher import IndexSearcher


def _ds_slice(corpus: pa.Table, lo: int, hi: int):
    import ray.data as rd

    return rd.from_arrow(corpus.select(["doc_id", "content"]).slice(lo, hi - lo))


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(120, seed=5)


class TestMerge:
    def test_merge_two_equals_single_build(self, ray_session, tmp_path, corpus):
        a, b, m, full = (str(tmp_path / x) for x in ("a", "b", "m", "full"))
        build_index(_ds_slice(corpus, 0, 60), a, num_buckets=4, positional=True,
                    n_docs=60, write_docstore=False, fingerprint="a")
        build_index(_ds_slice(corpus, 60, 120), b, num_buckets=4, positional=True,
                    n_docs=60, write_docstore=False, fingerprint="b")
        build_index(_ds_slice(corpus, 0, 120), full, num_buckets=4, positional=True,
                    n_docs=120, write_docstore=False, fingerprint="full")
        merge_indexes([a, b], m, merge_docstore=False)
        pm, tm, posm = read_shard_as_dicts(m, positional=True)
        pf, tf_, posf = read_shard_as_dicts(full, positional=True)
        assert pm == pf and tm == tf_ and posm == posf

    def test_merged_queries_match_oracle(self, ray_session, tmp_path, corpus):
        a, b, m = (str(tmp_path / x) for x in ("qa", "qb", "qm"))
        build_index(_ds_slice(corpus, 0, 60), a, num_buckets=4, n_docs=60,
                    write_docstore=False, fingerprint="a")
        build_index(_ds_slice(corpus, 60, 120), b, num_buckets=4, n_docs=60,
                    write_docstore=False, fingerprint="b")
        merge_indexes([a, b], m, merge_docstore=False)
        s = IndexSearcher(m)
        docs = {i: corpus["content"][i].as_py() for i in range(120)}
        o = BruteForceOracle(docs, "composable")
        for q in (["index", "merge"], ["information", "retrieval"], ["needle"]):
            ids_e, sc_e = s.search_bm25(q, 10)
            ids_o, sc_o = o.search_bm25(q, 10)
            assert ids_e.tolist() == ids_o.tolist(), q
            np.testing.assert_allclose(sc_e, sc_o, rtol=1e-9)

    def test_compaction_folds_salt_and_drops_tombstones(self, ray_session, tmp_path, corpus):
        src, dst = str(tmp_path / "c_src"), str(tmp_path / "c_dst")
        build_index(_ds_slice(corpus, 0, 80), src, num_buckets=4, salt=3,
                    n_docs=80, write_docstore=False, fingerprint="c")
        s = IndexSearcher(src)
        assert len(s.search_keyword("index")) > 0
        s.delete_documents("index")
        compact_index(src, dst, merge_docstore=False)
        s2 = IndexSearcher(dst)
        assert s2.meta["salt"] == 1
        assert len(s2.tombstones) == 0          # cleared after merge
        assert len(s2.search_keyword("index")) == 0   # physically dropped
        postings, _, _ = read_shard_as_dicts(dst)
        assert "index" not in postings
        # everything else identical to the uncompacted index
        p_src, _, _ = read_shard_as_dicts(src)
        p_src.pop("index", None)
        assert postings == p_src


class TestResume:
    def test_rerun_skips_committed_and_is_byte_identical(self, ray_session, tmp_path, corpus):
        d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
        kw = dict(num_buckets=6, positional=True, n_docs=120,
                  write_docstore=False, fingerprint="resume")
        m1 = build_index(_ds_slice(corpus, 0, 120), d1, **kw)
        assert m1["shards_skipped"] == 0
        # simulate a crash that lost two shards (partial build)
        lost = list_shards(d1)[:2]
        for sid in lost:
            fpath, mpath = shard_paths(d1, sid)
            os.remove(fpath)
            os.remove(mpath)
        m1b = build_index(_ds_slice(corpus, 0, 120), d1, **kw)
        assert m1b["shards_skipped"] == m1["n_shards"] - len(lost)
        assert m1b["shards_written"] == len(lost)
        # uninterrupted reference run -> byte-identical shards
        build_index(_ds_slice(corpus, 0, 120), d2, **kw)
        for sid in list_shards(d2):
            f1, _ = shard_paths(d1, sid)
            f2, _ = shard_paths(d2, sid)
            with open(f1, "rb") as a, open(f2, "rb") as b:
                assert a.read() == b.read(), f"shard {sid} differs"

    def test_fingerprint_change_forces_rebuild(self, ray_session, tmp_path, corpus):
        d = str(tmp_path / "fp")
        kw = dict(num_buckets=4, n_docs=60, write_docstore=False)
        m1 = build_index(_ds_slice(corpus, 0, 60), d, fingerprint="v1", **kw)
        m2 = build_index(_ds_slice(corpus, 0, 60), d, fingerprint="v2", **kw)
        assert m2["shards_skipped"] == 0 and m2["shards_written"] == m1["n_shards"]
