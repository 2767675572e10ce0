"""Exact-tie ordering of the pruned BM25 traversals at a scale where
per-doc float-addition order matters.

Regression for a real divergence: summing a doc's term contributions in
UB-sorted (MaxScore) or pivot-sorted (WAND) order can differ from the
exhaustive bincount by 1 ulp, flipping the doc_id tie-break between
docs whose true scores are exactly equal (duplicate (tf, dl) profiles —
common in real corpora). Both traversals now produce scores summed in
ORIGINAL term order (WAND: ti-sorted full evaluation; MaxScore: final
`_exact_rescore` pass), making them bitwise identical to exhaustive.
The 200-doc fixtures in test_build_query.py can't catch this; 3000
docs with a repetitive vocabulary can.
"""

from __future__ import annotations

import numpy as np
import pytest

from mini_search_engine_ray.pipelines.build import build_index
from mini_search_engine_ray.sources.corpus import synth_corpus
from mini_search_engine_ray.state.searcher import IndexSearcher

VOCAB = ["search", "shard", "stream", "reader", "writer", "index", "token",
         "merge", "parse", "request", "handler", "batch", "information",
         "retrieval", "kitten", "needle", "the", "cluster", "segment", "cache"]


@pytest.fixture(scope="module")
def big_searcher(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("bm25x") / "idx")
    corpus = synth_corpus(3000, seed=5)
    build_index(rd.from_arrow(corpus.select(["doc_id", "content"])), d,
                num_buckets=4, n_docs=3000, write_docstore=False,
                fingerprint="bm25x")
    return IndexSearcher(d)


def test_pruned_traversals_bitwise_equal_exhaustive(big_searcher):
    s = big_searcher
    rng = np.random.default_rng(23)
    checked = 0
    for _ in range(120):
        q = list(rng.choice(VOCAB, size=int(rng.integers(2, 6)), replace=False))
        k = int(rng.integers(1, 25))
        ids_e, sc_e = s.search_bm25(q, k, prune=False)
        ids_m, sc_m = s.search_bm25(q, k, prune=True)
        ids_w, sc_w = s.search_bm25(q, k, prune=True, method="wand")
        assert ids_m.tolist() == ids_e.tolist(), (q, k, "maxscore ids")
        assert ids_w.tolist() == ids_e.tolist(), (q, k, "wand ids")
        # bitwise score equality — not approx — is the contract
        assert sc_m.tolist() == sc_e.tolist(), (q, k, "maxscore scores")
        assert sc_w.tolist() == sc_e.tolist(), (q, k, "wand scores")
        checked += 1
    assert checked == 120


def test_reviewer_repro_case(big_searcher):
    """The originally-failing query (1-ulp score divergence flipped two
    exactly-tied docs at ranks 3/4)."""
    s = big_searcher
    q = ["search", "shard", "stream", "the", "reader"]
    ids_e, sc_e = s.search_bm25(q, 12, prune=False)
    ids_w, sc_w = s.search_bm25(q, 12, prune=True, method="wand")
    ids_m, sc_m = s.search_bm25(q, 12, prune=True)
    assert ids_w.tolist() == ids_e.tolist()
    assert ids_m.tolist() == ids_e.tolist()
    assert sc_w.tolist() == sc_e.tolist()
    assert sc_m.tolist() == sc_e.tolist()
