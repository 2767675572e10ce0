"""Sparse TF-IDF cosine all-pairs similarity (stages/sparse_sim.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.sparse_sim import (
    term_document_frequencies,
    tfidf_doc_pairs,
)


def _brute_pairs(texts: dict[int, str], df_frac: float):
    """Reference implementation: full TF-IDF vectors, partial cosine
    restricted to terms with df <= floor(df_frac * N)."""
    import re

    toks = {d: [t for t in re.split(r"[,.;?! \f\n\r\t\v]",
                                    s.strip().lower()) if t]
            for d, s in texts.items()}
    n = len(texts)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    cap = math.floor(df_frac * n)
    w = {}
    for d, ts in toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        vec = {t: c * math.log(n / df[t]) for t, c in tf.items()}
        nrm = math.sqrt(sum(v * v for v in vec.values()))
        if nrm > 0:
            w[d] = {t: v / nrm for t, v in vec.items() if df[t] <= cap}
    out = {}
    docs = sorted(w)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            shared = set(w[a]) & set(w[b])
            if shared:
                out[(a, b)] = (len(shared),
                               sum(w[a][t] * w[b][t] for t in shared))
    return out


def _run(ray_texts: dict[int, str], df_frac: float, blocks: int = 4):
    import ray.data as rd

    ids = sorted(ray_texts)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([ray_texts[i] for i in ids])})
    ds = rd.from_arrow(t).repartition(blocks)
    out = tfidf_doc_pairs(ds, df_frac=df_frac).take_all()
    return {(r["a"], r["b"]): (r["n_shared"], r["sim"]) for r in out}


def _synth(n_docs: int, seed: int = 7) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    common = [f"w{i}" for i in range(10)]
    rare = [f"rare{i}" for i in range(6)]
    texts = {}
    for d in range(n_docs):
        words = list(rng.choice(common, size=12))
        # each rare word lands in ~15% of docs
        for r in rare:
            if rng.random() < 0.15:
                words.append(r)
                if rng.random() < 0.5:
                    words.append(r)  # tf > 1 sometimes
        rng.shuffle(words)
        texts[d] = " ".join(words)
    return texts


def test_matches_brute_force(ray_session):
    texts = _synth(60)
    got = _run(texts, 0.2, blocks=5)
    exp = _brute_pairs(texts, 0.2)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-9), k


def test_df_cap_excludes_common_terms(ray_session):
    # every doc shares 'common'; only 0/1 share 'odd'
    texts = {0: "common odd x", 1: "common odd y", 2: "common z",
             3: "common q", 4: "common p", 5: "common r"}
    got = _run(texts, 0.5, blocks=2)
    # 'common' df=6 > cap=3 -> excluded; 'odd' df=2 <= 3 links (0,1);
    # x/y/z/q/p/r have df=1 -> no pair
    assert set(got) == {(0, 1)}
    n_shared, sim = got[(0, 1)]
    assert n_shared == 1 and sim > 0


def test_empty_and_validation(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    assert tfidf_doc_pairs(rd.from_arrow(t)).take_all() == []
    with pytest.raises(ValueError):
        tfidf_doc_pairs(rd.from_arrow(t), df_frac=0.0)
    with pytest.raises(ValueError):
        tfidf_doc_pairs(rd.from_arrow(t), df_frac=1.5)


def test_term_document_frequencies(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b a", "b c", "c c c"])})
    rows = term_document_frequencies(rd.from_arrow(t).repartition(3)) \
        .take_all()
    assert {r["term"]: r["df"] for r in rows} == {"a": 1, "b": 2, "c": 2}
