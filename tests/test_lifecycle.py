"""Full index lifecycle (L1-L4 story): incremental builds -> merge ->
tombstone delete -> compaction, checked against the brute-force oracle
at every step."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_search_engine_ray.pipelines.build import build_index
from mini_search_engine_ray.pipelines.oracle import BruteForceOracle
from mini_search_engine_ray.sources.corpus import synth_corpus
from mini_search_engine_ray.stages.merge import compact_index, merge_indexes
from mini_search_engine_ray.state.searcher import IndexSearcher


def test_incremental_lifecycle(ray_session, tmp_path):
    import ray.data as rd

    corpus = synth_corpus(90, seed=55)
    docs = {i: corpus["content"][i].as_py() for i in range(90)}
    sl = lambda lo, hi: rd.from_arrow(corpus.select(["doc_id", "content"]).slice(lo, hi - lo))

    # two incremental builds (reference: addDocument batches + flush)
    a, b = str(tmp_path / "inc_a"), str(tmp_path / "inc_b")
    build_index(sl(0, 45), a, num_buckets=4, positional=True, n_docs=45,
                write_docstore=False, fingerprint="a")
    build_index(sl(45, 90), b, num_buckets=4, positional=True, n_docs=45,
                write_docstore=False, fingerprint="b")

    # merge (reference: mergeAllSegments)
    m = str(tmp_path / "merged")
    merge_indexes([a, b], m, merge_docstore=False)
    s = IndexSearcher(m)
    o = BruteForceOracle(docs, "composable")
    ids_e, sc_e = s.search_bm25(["index", "merge"], 10)
    ids_o, sc_o = o.search_bm25(["index", "merge"], 10)
    assert ids_e.tolist() == ids_o.tolist()
    np.testing.assert_allclose(sc_e, sc_o, rtol=1e-9)

    # delete a keyword (reference: deleteDocuments tombstone)
    assert len(s.search_keyword("index")) > 0
    s.delete_documents("index")
    assert len(s.search_keyword("index")) == 0
    # other queries unaffected
    assert s.search_keyword("needle").tolist() == o.search_keyword("needle")

    # compaction drops the term physically and clears tombstones
    c = str(tmp_path / "compacted")
    compact_index(m, c, merge_docstore=False)
    s2 = IndexSearcher(c)
    assert len(s2.tombstones) == 0
    assert len(s2.search_keyword("index")) == 0
    # everything else still oracle-exact after two merges
    for q in (["information", "retrieval"], ["needle"], ["kitten"]):
        ids_e, sc_e = s2.search_bm25(q, 10)
        # oracle over docs minus none (deletion only hides the term, not docs)
        ids_o, sc_o = o.search_bm25(q, 10)
        assert ids_e.tolist() == ids_o.tolist(), q
    # positional queries survive the double merge
    assert s2.search_phrase(["information", "retrieval"]).tolist() == o.search_phrase(
        ["information", "retrieval"]
    )


def test_add_documents_wrapper(ray_session, tmp_path):
    """`add_documents` — THE live-index update path (delta build +
    merge packaged): in-place swap equals one build over the union,
    docstore follows, scratch dirs are cleaned, dest= leaves the live
    index untouched, and live tombstones stay dead through the add."""
    import os

    import ray.data as rd

    from mini_search_engine_ray.pipelines.build import add_documents, load_meta

    corpus = synth_corpus(120, seed=77)
    docs = {i: corpus["content"][i].as_py() for i in range(120)}
    sl = lambda lo, hi: rd.from_arrow(
        corpus.select(["doc_id", "content"]).slice(lo, hi - lo))

    live = str(tmp_path / "live")
    build_index(sl(0, 60), live, num_buckets=4, positional=True, n_docs=60,
                write_docstore=True, fingerprint="live")
    meta = add_documents(live, sl(60, 90), n_new_docs=30)
    assert meta["n_docs"] == 90

    s = IndexSearcher(live)
    o = BruteForceOracle({i: docs[i] for i in range(90)}, "composable")
    for q in (["index", "merge"], ["needle"], ["information", "retrieval"]):
        ids_e, sc_e = s.search_bm25(q, 10)
        ids_o, sc_o = o.search_bm25(q, 10)
        assert ids_e.tolist() == ids_o.tolist(), q
        np.testing.assert_allclose(sc_e, sc_o, rtol=1e-9)
    assert s.search_phrase(["information", "retrieval"]).tolist() == \
        o.search_phrase(["information", "retrieval"])
    # the docstore followed the merge (added doc hydrates)
    got = s.get_documents([75])
    assert got.num_rows == 1 and got["content"][0].as_py() == docs[75]
    # scratch dirs cleaned
    for suffix in (".delta", ".merged", ".old"):
        assert not os.path.exists(live + suffix)

    # delete a term on the live index, then add with dest=: the term
    # stays dead (merge drops the union of tombstones physically) and
    # the live index is untouched
    s.delete_documents("index")
    updated = str(tmp_path / "updated")
    meta2 = add_documents(live, sl(90, 120), n_new_docs=30, dest=updated)
    assert meta2["n_docs"] == 120
    assert load_meta(live)["n_docs"] == 90  # live untouched by dest=
    s2 = IndexSearcher(updated)
    assert s2.search_keyword("index").tolist() == []
    assert len(s2.tombstones) == 0  # dropped physically, not hidden
    o2 = BruteForceOracle(docs, "composable")
    ids_e, _ = s2.search_bm25(["needle"], 10)
    ids_o, _ = o2.search_bm25(["needle"], 10)
    assert ids_e.tolist() == ids_o.tolist()
