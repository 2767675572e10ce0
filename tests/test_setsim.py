"""Exact prefix-filtered set-similarity join (stages/setsim.py)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.setsim import prefix_jaccard_join

_SPLIT = re.compile(r"[,.;?! ^\f\n\r\t\x0b\x85  ]+")


def _tokens(s: str) -> list[str]:
    return [x for x in _SPLIT.split(s.strip().lower()) if x]


def _set(s: str, k: int) -> set:
    toks = _tokens(s)
    if k == 1:
        return set(toks)
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _brute(docs, num, den, k):
    out = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = _set(docs[i], k), _set(docs[j], k)
            u = len(a | b)
            if u and den * len(a & b) >= num * u:
                out[(i, j)] = (len(a & b), u)
    return out


def _run(docs, num, den, k, blocks=5):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    rows = prefix_jaccard_join(rd.from_arrow(t).repartition(blocks),
                               threshold=(num, den),
                               shingle_k=k).take_all()
    return {(r["a"], r["b"]): (r["inter_n"], r["union_n"]) for r in rows}


def _random_corpus(seed=7, n=80, vocab=60):
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(vocab)]
    docs = [" ".join(rng.choice(words, size=int(rng.integers(3, 15)),
                                replace=True)) for _ in range(n)]
    docs[50] = docs[10] + " tok3"   # high-overlap plant
    docs[51] = docs[10]             # exact duplicate
    docs[60] = " ".join(docs[20].split()[:-1])  # one-token prefix dup
    docs.append("")                 # token-less doc never pairs
    return docs


def test_brute_force_parity_token_sets():
    docs = _random_corpus()
    assert _run(docs, 2, 5, 1) == _brute(docs, 2, 5, 1)


def test_brute_force_parity_shingle_sets():
    docs = _random_corpus(seed=11)
    assert _run(docs, 3, 10, 3) == _brute(docs, 3, 10, 3)


def test_threshold_boundary_is_integer_exact():
    # J = 2/5 exactly meets threshold 2/5; J = 1/3 < 2/5 is dropped.
    # pair (0,1): sets {a,b,c,d} vs {c,d,e} -> i=2, u=5, J=0.4 (kept)
    # pair (2,3): sets {p,q} vs {q,r} -> i=1, u=3, J=0.333 (dropped)
    docs = ["a b c d", "c d e", "p q", "q r"]
    got = _run(docs, 2, 5, 1, blocks=2)
    assert got == {(0, 1): (2, 5)}


def test_exact_duplicate_and_tokenless_semantics():
    docs = ["x y z", "x y z", "", "   ", "q r s"]
    got = _run(docs, 9, 10, 1, blocks=3)
    # only the exact-duplicate pair reaches J=1; token-less docs never
    # appear (their rows are empty -> excluded, the SQL join semantics)
    assert got == {(0, 1): (3, 3)}


def test_short_docs_drop_from_shingle_sets():
    # doc shorter than k has no k-grams -> no rows -> never pairs
    docs = ["a b", "a b", "a b c a b c", "a b c a b c"]
    got = _run(docs, 1, 2, 3, blocks=2)
    # "a b c a b c" -> DISTINCT trigrams {a b c, b c a, c a b} (3)
    assert got == {(2, 3): (3, 3)}


def test_validation():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        prefix_jaccard_join(ds, threshold=(0, 5))
    with pytest.raises(ValueError):
        prefix_jaccard_join(ds, threshold=(6, 5))
    with pytest.raises(ValueError):
        prefix_jaccard_join(ds, threshold=(0.4, 1))
    with pytest.raises(ValueError):
        prefix_jaccard_join(ds, threshold=0.4)
    with pytest.raises(ValueError):
        prefix_jaccard_join(ds, shingle_k=0)


def test_large_string_corpus():
    # regression: ngram_strings' separator must match large_string
    # values (Arrow has no (large_string, ..., string) join kernel)
    docs = ["a b c d e", "a b c d e", "q r s t u"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs, pa.large_string())})
    got = _run_tbl(t, 1, 2, 3)
    assert got == {(0, 1): (3, 3)}


def _run_tbl(t, num, den, k, blocks=2):
    import ray.data as rd

    rows = prefix_jaccard_join(rd.from_arrow(t).repartition(blocks),
                               threshold=(num, den),
                               shingle_k=k).take_all()
    return {(r["a"], r["b"]): (r["inter_n"], r["union_n"]) for r in rows}
