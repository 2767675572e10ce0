"""Best-window snippet extraction (textstats.best_window_snippets)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.textstats import best_window_snippets


def _brute(texts, terms, window):
    out = {}
    for d, s in enumerate(texts):
        toks = [x for x in re.split(r"[,.;?! \f\n\r\t\v]",
                                    s.strip().lower()) if x]
        hits = [i for i, tk in enumerate(toks) if tk in terms]
        if not hits:
            continue
        best = None
        for p in hits:
            c = sum(1 for h in hits if p <= h < p + window)
            if best is None or c > best[1]:
                best = (p, c)
        p, c = best
        out[d] = (p, c, " ".join(toks[p:p + window]))
    return out


def _run(texts, terms, window, blocks=3):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    rows = best_window_snippets(rd.from_arrow(t).repartition(blocks),
                                terms, window=window).take_all()
    return {r["doc_id"]: (r["start"], r["n_hits"], r["snippet"])
            for r in rows}


def test_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)] + ["hit", "mark"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
             for _ in range(60)] + ["", "no match here at all"]
    got = _run(texts, ["hit", "mark"], 5)
    assert got == _brute(texts, {"hit", "mark"}, 5)


def test_tie_smallest_start_and_clip(ray_session):
    # two windows with 1 hit each -> smallest start wins; hit near the
    # end clips the snippet at the doc boundary
    got = _run(["a hit b c d e f g hit z"], ["hit"], 3, blocks=1)
    assert got[0] == (1, 1, "hit b c")
    got = _run(["a b c hit"], ["hit"], 4, blocks=1)
    assert got[0] == (3, 1, "hit")


def test_dense_window_beats_first(ray_session):
    got = _run(["hit a a a a a a a a a hit hit hit"], ["hit"], 4)
    assert got[0] == (10, 3, "hit hit hit")


def test_validation(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError):
        best_window_snippets(ds, [])
    with pytest.raises(ValueError):
        best_window_snippets(ds, ["x"], window=0)
    assert best_window_snippets(ds, ["x"]).take_all() == []
