"""Token-window chunking, benchmark decontamination, and n-gram
repetition stats — brute-force parity, edge semantics, multi-block."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.chunking import chunk_batch, chunk_documents
from mini_search_engine_ray.stages.decontam import decontaminate, ngram_set
from mini_search_engine_ray.stages.textstats import (
    doc_repetition_stats,
    ngram_strings,
    repetition_stats_batch,
)

SPLIT = re.compile(r"[,.;?! ^\f\n\r\t\x0b\x85  ]+")


def _toks(s: str) -> list[str]:
    return [t for t in SPLIT.split(s.strip().lower()) if t]


def _brute_chunks(doc_id, text, window, stride):
    toks = _toks(text)
    out = []
    for ci, start in enumerate(range(0, len(toks), stride)):
        sl = toks[start:start + window]
        out.append((doc_id, ci, " ".join(sl), len(sl)))
    return out


def _rand_text(rng, vocab=12, lo=0, hi=30):
    n = rng.integers(lo, hi)
    return " ".join(f"w{rng.integers(vocab)}" for _ in range(n))


class TestChunking:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(7)
        texts = [_rand_text(rng) for _ in range(200)] + ["", "  . , ", "one"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        for window, stride in [(4, 4), (8, 5), (3, 7), (1, 1)]:
            got = chunk_batch(t, window=window, stride=stride).to_pylist()
            exp = [c for i, s in enumerate(texts)
                   for c in _brute_chunks(i, s, window, stride)]
            assert [tuple(r.values()) for r in got] == exp

    def test_dataset_multi_block(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        texts = [_rand_text(rng) for _ in range(97)]
        ds = rd.from_arrow(pa.table({"doc_id": list(range(97)),
                                     "text": texts})).repartition(7)
        got = chunk_documents(ds, window=5, stride=3).to_pandas()
        got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        exp = pd.DataFrame(
            [c for i, s in enumerate(texts) for c in _brute_chunks(i, s, 5, 3)],
            columns=["doc_id", "chunk_id", "chunk_text", "n_tokens"])
        pd.testing.assert_frame_equal(got, exp)

    def test_default_stride_is_window(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c d e"]}))
        out = chunk_documents(ds, window=2).to_pandas()
        assert out["chunk_text"].tolist() == ["a b", "c d", "e"]

    def test_empty_input_schema_stable(self):
        t = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        out = chunk_batch(t, window=4, stride=4)
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "chunk_id", "chunk_text",
                                    "n_tokens"]

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError):
            chunk_documents(ds, window=0)
        with pytest.raises(ValueError):
            chunk_documents(ds, window=4, stride=-1)


class TestNgramStrings:
    def test_boundaries_masked(self):
        t = pa.table({"doc_id": [0, 1], "text": ["a b c", "d e"]})
        from mini_search_engine_ray.stages.textstats import _split_tokens
        parents, values = _split_tokens(t["text"].combine_chunks()
                                        if isinstance(t["text"], pa.ChunkedArray)
                                        else t["text"])
        par, grams = ngram_strings(parents, values, 2)
        assert grams.to_pylist() == ["a b", "b c", "d e"]  # no "c d"
        assert par.tolist() == [0, 0, 1]

    def test_n_longer_than_stream(self):
        par, grams = ngram_strings(np.array([0]), pa.array(["x"]), 3)
        assert len(par) == 0 and len(grams) == 0


class TestDecontaminate:
    def _corpus(self):
        return pa.table({
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["the quick brown fox jumps",
                     "lazy dog sleeps all day",
                     "quick brown fox elsewhere",   # shares "quick brown fox"
                     "tiny",                        # < n tokens: never dropped
                     "the quick red fox jumps"],    # no shared trigram
        })

    def test_drop_and_flag(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._corpus())
        bench = pa.array(["quick brown fox"])
        kept = decontaminate(ds, bench, n=3).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 3, 4]
        flagged = decontaminate(ds, bench, n=3, mode="flag").to_pandas()
        assert flagged.set_index("doc_id")["contaminated"].to_dict() == {
            0: True, 1: False, 2: True, 3: False, 4: False}

    def test_ngram_set_and_self_decontam(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._corpus()).repartition(3)
        grams = ngram_set(ds.filter(lambda r: r["doc_id"] == 0), n=3)
        assert sorted(grams.to_pylist()) == [
            "brown fox jumps", "quick brown fox", "the quick brown"]
        kept = decontaminate(ds, grams, n=3).to_pandas()
        # docs 0 (itself) and 2 share a trigram; 4 shares none
        assert sorted(kept["doc_id"]) == [1, 3, 4]

    def test_empty_benchmark_keeps_everything(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._corpus())
        kept = decontaminate(ds, pa.array([], pa.string()), n=3).to_pandas()
        assert len(kept) == 5

    def test_mode_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._corpus())
        with pytest.raises(ValueError):
            decontaminate(ds, pa.array(["x y z"]), n=3, mode="bogus")


class TestRepetitionStats:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(11)
        texts = [_rand_text(rng, vocab=5) for _ in range(300)]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        for n in (1, 2, 3):
            got = repetition_stats_batch(t, n=n).to_pylist()
            exp = []
            for i, s in enumerate(texts):
                toks = _toks(s)
                grams = [" ".join(toks[j:j + n])
                         for j in range(len(toks) - n + 1)]
                if not grams:
                    continue
                from collections import Counter
                c = Counter(grams)
                tot = len(grams)
                dup = sum(v for v in c.values() if v > 1)
                top = max(c.values())
                r4 = lambda x: np.floor(x * 1e4 + 0.5) / 1e4
                exp.append({"doc_id": i, "n_ngrams": tot,
                            "dup_ngram_frac": r4(dup / tot),
                            "top_ngram_frac": r4(top / tot)})
            assert got == exp

    def test_short_docs_emit_no_row(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2],
                                     "text": ["", "one", "a a a a"]}))
        out = doc_repetition_stats(ds, n=2).to_pandas()
        assert out["doc_id"].tolist() == [2]
        assert out["dup_ngram_frac"].tolist() == [1.0]
        assert out["top_ngram_frac"].tolist() == [1.0]

    def test_empty_input_schema_stable(self):
        t = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        out = repetition_stats_batch(t, n=2)
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "n_ngrams", "dup_ngram_frac",
                                    "top_ngram_frac"]

    def test_validation(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError):
            doc_repetition_stats(ds, n=0)


class TestDupPassageStats:
    def _run(self, ray_session, docs, n=2, parts=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import dup_passage_stats

        t = pa.table({"doc_id": np.arange(len(docs), dtype=np.int64),
                      "text": docs})
        return dup_passage_stats(rd.from_arrow(t).repartition(parts),
                                 n=n).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    def _brute(self, docs, n):
        grams = []
        for i, s in enumerate(docs):
            ts = _toks(s)
            grams.append([" ".join(ts[j:j + n])
                          for j in range(len(ts) - n + 1)])
        out = []
        for i, gs in enumerate(grams):
            dup = sum(1 for g in gs
                      if any(g in o for j, o in enumerate(grams) if j != i))
            out.append((len(gs), dup,
                        dup / len(gs) if gs else 0.0))
        return out

    def test_brute_force_parity(self, ray_session):
        rng = np.random.default_rng(71)
        vocab = [f"w{i}" for i in range(12)]
        docs = [" ".join(rng.choice(vocab, rng.integers(0, 18)))
                for _ in range(120)]
        got = self._run(ray_session, docs, n=2, parts=7)
        exp = self._brute(docs, 2)
        assert got["n_grams"].tolist() == [g for g, _, _ in exp]
        assert got["n_dup"].tolist() == [d for _, d, _ in exp]
        np.testing.assert_allclose(got["dup_frac"].to_numpy(),
                                   [f for _, _, f in exp], rtol=1e-12)

    def test_within_doc_repeat_is_not_cross_doc(self, ray_session):
        # 'a b' repeats INSIDE doc 0 only -> not duplicated; 'c d'
        # appears in docs 1 and 2 -> every occurrence counts
        docs = ["a b a b", "c d x", "y c d"]
        got = self._run(ray_session, docs, n=2, parts=3)
        assert got["n_dup"].tolist() == [0, 1, 1]
        assert got["n_grams"].tolist() == [3, 2, 2]

    def test_short_docs_and_empty(self, ray_session):
        docs = ["", "one", "shared gram here", "shared gram there"]
        got = self._run(ray_session, docs, n=2, parts=2)
        assert got["n_grams"].tolist() == [0, 0, 2, 2]
        assert got["n_dup"].tolist() == [0, 0, 1, 1]
        assert got["dup_frac"][0] == 0.0

    def test_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import dup_passage_stats

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError, match="n must"):
            dup_passage_stats(ds, n=0)


class TestRemoveDupPassages:
    def _run(self, docs, n=2, policy="keep_first", parts=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import remove_dup_passages

        t = pa.table({"doc_id": np.arange(len(docs), dtype=np.int64),
                      "text": docs})
        return remove_dup_passages(rd.from_arrow(t).repartition(parts),
                                   n=n, policy=policy).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    def _brute(self, docs, n, policy):
        from collections import defaultdict

        byg: dict[str, list[tuple[int, int]]] = defaultdict(list)
        toks = [_toks(s) for s in docs]
        for i, ts in enumerate(toks):
            for p in range(len(ts) - n + 1):
                byg[" ".join(ts[p:p + n])].append((i, p))
        rem: dict[int, set[int]] = defaultdict(set)
        for occ in byg.values():
            if len({i for i, _ in occ}) < 2:
                continue
            victims = sorted(occ)[1:] if policy == "keep_first" \
                else occ
            for i, p in victims:
                rem[i].update(range(p, p + n))
        out = []
        for i, ts in enumerate(toks):
            kept = [t for j, t in enumerate(ts) if j not in rem[i]]
            out.append((" ".join(kept), len(ts), len(ts) - len(kept)))
        return out

    @pytest.mark.parametrize("policy", ["keep_first", "drop_all"])
    def test_brute_force_parity(self, ray_session, policy):
        rng = np.random.default_rng(37)
        vocab = [f"w{i}" for i in range(10)]
        docs = [" ".join(rng.choice(vocab, rng.integers(0, 20)))
                for _ in range(100)]
        shared = "p q r s t u"
        docs[4] += " " + shared
        docs[9] = shared + " " + docs[9]
        docs[13] = "zz " + shared
        docs.append("")
        got = self._run(docs, n=2, policy=policy, parts=7)
        exp = self._brute(docs, 2, policy)
        assert got["text_clean"].tolist() == [c for c, _, _ in exp]
        assert got["n_tokens"].tolist() == [t for _, t, _ in exp]
        assert got["n_removed"].tolist() == [r for _, _, r in exp]

    def test_keep_first_keeps_global_min_occurrence(self, ray_session):
        # 'a b c' appears in docs 0, 1, 2: keep_first preserves doc 0's
        # copy, removes the other two; drop_all removes all three
        docs = ["a b c", "x a b c", "a b c y"]
        kf = self._run(docs, n=3, policy="keep_first", parts=3)
        assert kf["text_clean"].tolist() == ["a b c", "x", "y"]
        assert kf["n_removed"].tolist() == [0, 3, 3]
        da = self._run(docs, n=3, policy="drop_all", parts=3)
        assert da["text_clean"].tolist() == ["", "x", "y"]
        assert da["n_removed"].tolist() == [3, 3, 3]

    def test_within_doc_repeat_untouched(self, ray_session):
        # 'a b' repeats only INSIDE doc 0 -> cross-doc signal is absent,
        # nothing removed
        docs = ["a b a b", "c d"]
        got = self._run(docs, n=2, parts=2)
        assert got["text_clean"].tolist() == ["a b a b", "c d"]
        assert got["n_removed"].tolist() == [0, 0]

    def test_overlapping_coverage_union(self, ray_session):
        # doc 1 shares 'a b' with doc 0 and 'b c' with doc 2: coverage
        # of the two removed bigrams overlaps on token 'b' — the union
        # must remove exactly {a, b, c}, not double-count
        docs = ["a b", "a b c z", "b c"]
        got = self._run(docs, n=2, policy="drop_all", parts=3)
        assert got["text_clean"].tolist() == ["", "z", ""]
        assert got["n_removed"].tolist() == [2, 3, 2]

    def test_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import remove_dup_passages

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError, match="n must"):
            remove_dup_passages(ds, n=0)
        with pytest.raises(ValueError, match="policy must"):
            remove_dup_passages(ds, policy="bogus")


class TestContaminationFraction:
    def test_brute_force_and_drop_consistency(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.decontam import (
            contamination_fraction,
            decontaminate,
            ngram_set,
        )

        rng = np.random.default_rng(91)
        vocab = [f"w{i}" for i in range(15)]
        docs = [" ".join(rng.choice(vocab, rng.integers(0, 16)))
                for _ in range(150)]
        t = pa.table({"doc_id": np.arange(150, dtype=np.int64),
                      "text": docs})
        ds = rd.from_arrow(t).repartition(5)
        bench_t = pa.table({"doc_id": [0], "text": [docs[7]]})
        grams = ngram_set(rd.from_arrow(bench_t), n=2)
        out = contamination_fraction(ds, grams, n=2) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        gset = set(grams.to_pylist())
        for i, s in enumerate(docs):
            ts = _toks(s)
            gs = [" ".join(ts[j:j + 2]) for j in range(len(ts) - 1)]
            hits = sum(1 for g in gs if g in gset)
            assert out["n_grams"][i] == len(gs)
            assert out["n_contaminated"][i] == hits
            exp = hits / len(gs) if gs else 0.0
            np.testing.assert_allclose(out["contam_frac"][i], exp)
        # frac == 0 <-> survives decontaminate (any-hit rule)
        survivors = set(decontaminate(ds, grams, n=2)
                        .to_pandas()["doc_id"])
        zero = set(out[out["contam_frac"] == 0.0]["doc_id"])
        assert survivors == zero

    def test_empty_benchmark_all_zero(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.decontam import (
            contamination_fraction,
        )

        t = pa.table({"doc_id": [0, 1], "text": ["a b c", "d e"]})
        out = contamination_fraction(rd.from_arrow(t), [], n=2) \
            .to_pandas()
        assert (out["n_contaminated"] == 0).all()
        assert (out["contam_frac"] == 0.0).all()


class TestCrossSplitSeenStats:
    def _run(self, docs, n=2, split_mod=2, parts=5):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import (
            cross_split_seen_stats,
        )

        t = pa.table({"doc_id": np.arange(len(docs), dtype=np.int64),
                      "text": docs})
        return cross_split_seen_stats(
            rd.from_arrow(t).repartition(parts), n=n,
            split_mod=split_mod).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    def _brute(self, docs, n, split_mod):
        grams = []
        for s in docs:
            ts = _toks(s)
            grams.append([" ".join(ts[j:j + n])
                          for j in range(len(ts) - n + 1)])
        train = set()
        for i, gs in enumerate(grams):
            if i % split_mod == 0:
                train.update(gs)
        out = []
        for i, gs in enumerate(grams):
            if i % split_mod == 0:
                continue
            seen = sum(1 for g in gs if g in train)
            out.append((i, len(gs), seen,
                        seen / len(gs) if gs else 0.0))
        return out

    def test_brute_force_parity(self, ray_session):
        rng = np.random.default_rng(92)
        vocab = [f"w{i}" for i in range(10)]
        docs = [" ".join(rng.choice(vocab, rng.integers(0, 16)))
                for _ in range(150)]
        got = self._run(docs, n=2, parts=7)
        exp = self._brute(docs, 2, 2)
        assert got["doc_id"].tolist() == [i for i, _, _, _ in exp]
        assert got["n_grams"].tolist() == [g for _, g, _, _ in exp]
        assert got["n_seen"].tolist() == [s for _, _, s, _ in exp]
        assert np.allclose(got["seen_frac"],
                           [f for _, _, _, f in exp])

    def test_holdout_only_and_short_docs(self, ray_session):
        # doc 1 short (0 grams), doc 3 entirely seen, doc 5 unseen
        docs = ["a b c d", "x", "c d a b", "a b c", "q r s t",
                "q q q q"]
        got = self._run(docs, n=2, split_mod=2, parts=3)
        assert got["doc_id"].tolist() == [1, 3, 5]
        row1 = got[got.doc_id == 1].iloc[0]
        assert (row1.n_grams, row1.n_seen, row1.seen_frac) == (0, 0, 0.0)
        row3 = got[got.doc_id == 3].iloc[0]  # "a b", "b c" both in train
        assert (row3.n_grams, row3.n_seen) == (2, 2)
        row5 = got[got.doc_id == 5].iloc[0]  # "q q" never in train
        assert (row5.n_grams, row5.n_seen) == (3, 0)

    def test_validation(self, ray_session):
        import ray.data as rd

        from mini_search_engine_ray.stages.dedup import (
            cross_split_seen_stats,
        )

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
        with pytest.raises(ValueError):
            cross_split_seen_stats(ds, n=0)
        with pytest.raises(ValueError):
            cross_split_seen_stats(ds, split_mod=1)
