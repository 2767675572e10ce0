"""Unigram-LM quality scoring (perplexity-style filtering)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.textstats import (
    corpus_token_counts,
    unigram_logprob,
)


def _toks(s: str) -> list[str]:
    return [t for t in re.split(r"[^0-9a-z]+", s.strip().lower()) if t]


def _brute(texts, top_v, oov_count):
    """Row-by-row reference: counts -> top-V by (cnt desc, token asc)
    -> mean ln p per doc."""
    cnt = Counter()
    for s in texts:
        cnt.update(_toks(s))
    n_total = sum(cnt.values())
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    logp = {t: math.log(c / n_total) for t, c in head}
    floor = math.log(oov_count / n_total) if n_total else 0.0
    out = []
    for s in texts:
        ts = _toks(s)
        if not ts:
            out.append((0, 0.0))
        else:
            out.append((len(ts),
                        sum(logp.get(t, floor) for t in ts) / len(ts)))
    return out


class TestCorpusTokenCounts:
    def test_multi_block_vs_counter(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 25)))
                 for _ in range(400)]
        ds = rd.from_arrow(pa.table({"text": texts})).repartition(9)
        got = corpus_token_counts(ds).to_pandas()
        exp = Counter()
        for s in texts:
            exp.update(_toks(s))
        assert dict(zip(got["token"], got["cnt"])) == dict(exp)

    def test_empty_corpus(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
        # ray's sort on a fully empty input yields zero blocks, so the
        # repo convention is to assert emptiness by count()
        assert corpus_token_counts(ds).count() == 0


class TestUnigramLogprob:
    def test_multi_block_vs_brute(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        # Zipf-ish skew so the top-V head actually cuts the vocabulary.
        vocab = [f"tok{i}" for i in range(60)]
        p = 1.0 / np.arange(1, 61)
        p /= p.sum()
        texts = [" ".join(rng.choice(vocab, rng.integers(0, 30), p=p))
                 for _ in range(300)]
        ds = rd.from_arrow(pa.table({
            "doc_id": np.arange(300, dtype=np.int64),
            "text": texts})).repartition(7)
        got = (unigram_logprob(ds, top_v=20, oov_count=0.5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        exp = _brute(texts, top_v=20, oov_count=0.5)
        assert got["n_tokens"].tolist() == [n for n, _ in exp]
        np.testing.assert_allclose(got["logprob"].to_numpy(),
                                   [lp for _, lp in exp], rtol=1e-12)

    def test_top_v_tie_break_is_ascending_token(self, ray_session):
        import ray.data as rd

        # 'a' and 'b' tie on count; with top_v=1 only 'a' is in-vocab.
        texts = ["a b", "a b", "a b"]
        ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
        got = (unigram_logprob(ds, top_v=1, oov_count=0.5)
               .to_pandas().sort_values("doc_id"))
        n = 6.0
        exp = (math.log(3 / n) + math.log(0.5 / n)) / 2
        np.testing.assert_allclose(got["logprob"].to_numpy(), [exp] * 3)

    def test_tokenless_docs_score_zero(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2],
                                     "text": ["", "...!!", "hello hello"]}))
        got = (unigram_logprob(ds, top_v=5, oov_count=0.5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["n_tokens"].tolist() == [0, 0, 2]
        assert got["logprob"][0] == 0.0 and got["logprob"][1] == 0.0
        np.testing.assert_allclose(got["logprob"][2], math.log(1.0))

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError, match="top_v"):
            unigram_logprob(ds, top_v=0)
        with pytest.raises(ValueError, match="oov_count"):
            unigram_logprob(ds, top_v=5, oov_count=0.0)


class TestSourceVocabOverlap:
    def test_vs_brute_force(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.functions.tokenizers import (
            JAVA_TRIM_CHARS)
        from mini_search_engine_ray.stages.textstats import (
            source_vocab_overlap)
        import re

        rng = np.random.default_rng(91)
        words = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(60):
            src = f"s{i % 4}"
            toks = rng.choice(words, size=rng.integers(3, 12))
            rows.append({"doc_id": i, "source": src,
                         "text": " ".join(toks)})
        # brute force: token-type sets per source over the same
        # tokenizer (simple words here, split == whitespace)
        vocab = {}
        for r in rows:
            toks = [w.lower() for w in re.split(r"\W+", r["text"]) if w]
            vocab.setdefault(r["source"], set()).update(toks)
        exp = {}
        ks = sorted(vocab)
        for x in range(len(ks)):
            for y in range(x + 1, len(ks)):
                a, b = ks[x], ks[y]
                i = len(vocab[a] & vocab[b])
                if i:
                    exp[(a, b)] = (i, len(vocab[a]), len(vocab[b]),
                                   i / (len(vocab[a]) + len(vocab[b]) - i))
        ds = rd.from_items(rows).repartition(5)
        got = source_vocab_overlap(ds).to_pandas()
        assert {(r.a, r.b): (r.inter, r.n_a, r.n_b, r.jaccard)
                for r in got.itertuples()} == exp

    def test_disjoint_and_identical(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.textstats import (
            source_vocab_overlap)

        rows = [
            {"doc_id": 0, "source": "a", "text": "apple banana cherry"},
            {"doc_id": 1, "source": "b", "text": "banana apple cherry"},
            {"doc_id": 2, "source": "c", "text": "xylo zulu"},
        ]
        got = source_vocab_overlap(rd.from_items(rows)).to_pandas()
        # (a, b) identical vocab -> jaccard 1.0; c shares nothing ->
        # absent entirely
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["a"], r["b"]) == ("a", "b")
        assert r["inter"] == 3 and r["jaccard"] == 1.0
