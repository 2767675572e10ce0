"""clean_corpus composite vs a brute-force Python oracle, plus the
exact-dedup survivor rule (min doc_id per content hash) under
adversarial row order — the loser sweep must pick the run MINIMUM,
not the first row a block happens to start with."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_search_engine_ray.pipelines.clean import clean_corpus


def _ds(t: pa.Table, parts: int = 4):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


class TestCleanCorpus:
    def test_exact_dedup_survivor_is_min_doc_id(self, ray_session):
        # duplicates arranged so higher doc_ids appear FIRST in row
        # order; bodies DISTINCT across groups (so the near-dup stage
        # is inert) and long enough for the quality gate
        def body(tag):
            return " ".join(f"{tag}tok{i}" for i in range(30))

        texts = [body("a"), body("u1"), body("a"), body("a"),
                 body("u2"), body("b"), body("b")]
        ids = [106, 101, 103, 100, 104, 109, 102]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts)})
        out = clean_corpus(_ds(t, parts=3)).to_pandas()
        survivors = set(out.doc_id)
        # dupA group {106,103,100} -> 100; dupB {109,102} -> 102
        assert survivors == {100, 101, 102, 104}

    def test_quality_gate_drops_short_docs(self, ray_session):
        long = " ".join(f"w{i}" for i in range(25))
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array([long, "too short"])})
        out = clean_corpus(_ds(t, parts=1)).to_pandas()
        assert set(out.doc_id) == {1}
        assert int(out.n_tokens.iloc[0]) == 25
