"""Scaled-down analogue of the reference's stress gate
(`Team2StressTest.java:32-114`: 1500 copies of one large doc + two
distinguished docs, exact hit counts asserted, wall-clock bounded)."""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.pipelines.build import build_index
from mini_search_engine_ray.state.searcher import IndexSearcher

N_COPIES = 300
BIG_DOC = (
    "It is a truth universally acknowledged, that a single man in "
    "possession of a good fortune, must be in want of a wife. "
) * 120  # ~11 KB


@pytest.fixture(scope="module")
def stress_index(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("stress") / "idx")
    contents = [BIG_DOC] * N_COPIES + ["qwertyuiop elizabeth", "qwertyuiop"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(contents), dtype=np.int64)),
            "content": pa.array(contents, type=pa.large_string()),
        }
    )
    t0 = time.time()
    build_index(rd.from_arrow(t), d, num_buckets=4, n_docs=len(contents),
                write_docstore=False, fingerprint="stress")
    return d, time.time() - t0


def test_exact_hit_counts(stress_index):
    d, _ = stress_index
    s = IndexSearcher(d)
    # "qwertyuiop" appears in exactly the two distinguished docs
    assert len(s.search_keyword("qwertyuiop")) == 2
    # "elizabeth" only in the first distinguished doc
    assert s.search_keyword("elizabeth").tolist() == [N_COPIES]
    # AND narrows to the single doc with both (reference hit counts 1501/1)
    assert s.search_and(["qwertyuiop", "elizabeth"]).tolist() == [N_COPIES]
    # the repeated corpus term hits every copy
    assert len(s.search_keyword("universally")) == N_COPIES


def test_throughput_floor(stress_index):
    """~3.3 MB indexed; the reference's single-thread gate is 0.9 MB/s,
    so even a badly degraded run must finish far under the analogous
    budget. Asserts a loose wall bound (noisy sandbox)."""
    _, elapsed = stress_index
    mb = len(BIG_DOC) * N_COPIES / 1e6
    assert elapsed < 60, f"indexed {mb:.1f} MB in {elapsed:.1f}s"


def test_identical_docs_identical_postings(stress_index):
    d, _ = stress_index
    s = IndexSearcher(d)
    p = s.postings("truth")
    assert p[0].tolist() == list(range(N_COPIES))
    assert (p[1] == p[1][0]).all()  # same tf for identical copies
    assert (p[2] == p[2][0]).all()  # same doc_len
