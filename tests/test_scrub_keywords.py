"""scrub_text (ordered RE2 redaction) and doc_keywords (per-doc
TF-IDF top-k) vs brute-force python/pandas oracles."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.functions.hashing import md5_low64_str
from mini_search_engine_ray.stages.scrub import PII_RULES, scrub_text
from mini_search_engine_ray.stages.textstats import doc_keywords


def _ds(t: pa.Table, parts: int = 4):
    import ray.data as rd

    step = max(1, t.num_rows // parts)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


class TestScrubText:
    def test_ordered_rules_and_counts(self, ray_session):
        rules = [("[0-9]{3,}", "<NUM>"), ("Customer#", "cust:")]
        t = pa.table({"id": pa.array([0, 1, 2]),
                      "text": pa.array(["Customer#000123", "no digits 12",
                                        "999 Customer#1 Customer#22222"])})
        out = scrub_text(_ds(t, parts=1), rules, out_col="clean",
                         count_col="hits").to_pandas().sort_values("id")
        def oracle(s):
            h = len(re.findall("[0-9]{3,}", s))
            s = re.sub("[0-9]{3,}", "<NUM>", s)
            h += len(re.findall("Customer#", s))
            return re.sub("Customer#", "cust:", s), h
        for _, row in out.iterrows():
            exp_text, exp_hits = oracle(t["text"][row.id].as_py())
            assert row.clean == exp_text
            assert row.hits == exp_hits
        # original column untouched when out_col differs
        assert out.text.tolist() == t["text"].to_pylist()

    def test_default_pii_rules(self, ray_session):
        t = pa.table({"text": pa.array(
            ["mail me at a.b+c@x-corp.io now",
             "see https://ex.com/p?q=1 and http://a.b/c",
             "card 4111111111111111 zip 12345"])})
        out = scrub_text(_ds(t, parts=1)).to_pandas()
        joined = " | ".join(sorted(out.text))
        assert "<EMAIL>" in joined and "@" not in joined
        assert "<URL>" in joined and "http" not in joined
        assert "<NUM>" in joined and "4111111111111111" not in joined
        assert "12345" in joined  # short digit runs survive

    def test_in_place_and_null_text(self, ray_session):
        t = pa.table({"text": pa.array(["a@b.co", None])})
        out = scrub_text(_ds(t, parts=1), count_col="n").to_pandas()
        byv = sorted(out.text.fillna("~"))
        assert byv == ["<EMAIL>", "~"]  # null passes through as null
        assert sorted(out.n.fillna(-1)) in ([0.0, 1.0], [-1.0, 1.0], [0, 1])

    def test_bad_rule_type_raises(self, ray_session):
        t = pa.table({"text": pa.array(["x"])})
        with pytest.raises(TypeError):
            scrub_text(_ds(t, parts=1), [("a", 3)])


def _brute_keywords(docs: list[tuple[int, str]], n_docs: int, k: int):
    rows = []
    for did, text in docs:
        toks = [w for w in re.split(r"[,.;?! ^\f\n\r\t\x0b\x85  ]+",
                                    text.strip().lower()) if w]
        for term in set(toks):
            rows.append((did, term, toks.count(term)))
    df = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    dfx = df.groupby("term").size().rename("df").reset_index()
    df = df.merge(dfx, on="term")
    df["score"] = df.tf.astype(float) * (float(n_docs) / df["df"].astype(float))
    df["tb"] = [md5_low64_str(s) for s in df.term]
    df = df.sort_values(["doc_id", "score", "tb"],
                        ascending=[True, False, True])
    return df.groupby("doc_id").head(k)[["doc_id", "term", "score"]]


class TestDocKeywords:
    def test_vs_brute_force_with_ties(self, ray_session):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(40):
            words = rng.choice(vocab, size=rng.integers(3, 25)).tolist()
            docs.append((d, " ".join(words)))
        docs.append((40, ""))       # empty doc: contributes no rows
        t = pa.table({"doc_id": pa.array([d for d, _ in docs]),
                      "text": pa.array([s for _, s in docs])})
        out = doc_keywords(_ds(t), n_docs=len(docs), k=3).to_pandas()
        exp = _brute_keywords(docs, n_docs=len(docs), k=3)
        a = out.sort_values(["doc_id", "term"]).reset_index(drop=True)
        b = exp.sort_values(["doc_id", "term"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert 40 not in set(a.doc_id)
        # small vocab guarantees score ties; the hash tiebreak decided them
        assert len(a) == len(b)

    def test_k_larger_than_vocab(self, ray_session):
        t = pa.table({"doc_id": pa.array([1]), "text": pa.array(["a b a"])})
        out = doc_keywords(_ds(t, parts=1), n_docs=1, k=10).to_pandas()
        assert sorted(out.term) == ["a", "b"]
        # tf=2 * (1/1) vs tf=1
        assert out.set_index("term").score["a"] == 2.0
