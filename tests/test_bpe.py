"""BPE-merge training: brute-force parity, greedy-chain semantics,
early stop, and the segment counter replay."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.bpe import bpe_segment_batch, bpe_train


def _brute_bpe(texts, m):
    words = Counter()
    for s in texts:
        for w in re.split(r"[^a-z]+", s.lower()):
            if w:
                words[w] += 1
    vocab = Counter()
    for w, c in words.items():
        vocab[tuple(w)] += c
    merges = []
    for step in range(1, m + 1):
        pc_ = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += c
        if not pc_:
            break
        (left, right), cnt = min(
            pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, left, right, left + right, cnt))
        vocab = _brute_apply(vocab, left, right)
    return merges


def _brute_apply(vocab, left, right):
    new = Counter()
    for syms, c in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        new[tuple(out)] += c
    return new


def _ds(texts, parts=5):
    import ray.data as rd

    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    return rd.from_arrow(t).repartition(parts)


class TestBpeTrain:
    def test_brute_force_parity(self, ray_session):
        rng = np.random.default_rng(11)
        base = ["the quick brown fox jumps over the lazy dog",
                "aaa aaaa aaaaa banana bandana",
                "low lower lowest newer newest wider wide widest",
                "abab ababab abababab", ""]
        texts = [" ".join(rng.choice(base, 3)) for _ in range(50)] + base
        got = bpe_train(_ds(texts, parts=7), num_merges=12).to_pandas()
        exp = _brute_bpe(texts, 12)
        assert [tuple(r) for r in got.itertuples(index=False)] == exp

    def test_greedy_chain_left_to_right(self, ray_session):
        # 'aaaaa' under merge (a,a): round 1 counts all 4 overlapping
        # adjacencies (standard BPE get_stats semantics); greedy apply
        # keeps positions 0 and 2 -> [aa, aa, a]. Round 2 then ties
        # (aa,aa) with (aa,a) at 4 each and the lexicographic
        # tie-break picks (aa, a) -> 'aaa'
        got = bpe_train(_ds(["aaaaa"] * 4, parts=2),
                        num_merges=2).to_pandas()
        assert got["merged"].tolist() == ["aa", "aaa"]
        assert got["cnt"].tolist() == [4 * 4, 4 * 1]

    def test_early_stop_when_no_pairs(self, ray_session):
        # single-char words have no adjacent pairs at all
        got = bpe_train(_ds(["a b c", "a, b! c?"], parts=2),
                        num_merges=5).to_pandas()
        assert len(got) == 0

    def test_tie_break_lexicographic(self, ray_session):
        # 'xy' and 'ab' both occur twice: (a,b) wins the tie
        got = bpe_train(_ds(["xy ab", "ab xy"], parts=2),
                        num_merges=1).to_pandas()
        assert (got["left"][0], got["right"][0]) == ("a", "b")

    def test_validation(self, ray_session):
        with pytest.raises(ValueError, match="num_merges"):
            bpe_train(_ds(["x"]), num_merges=0)


class TestBpeSegment:
    def test_piece_counts_replay_training(self, ray_session):
        texts = ["banana bandana", "an and anna", "cab cabana", ""]
        merges_t = bpe_train(_ds(texts, parts=2), num_merges=6)
        merges = list(zip(merges_t["left"].to_pylist(),
                          merges_t["right"].to_pylist()))
        t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
        got = bpe_segment_batch(t, merges)

        # brute: re-segment each word by replaying merges in order
        def seg(word):
            syms = list(word)
            for left, right in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left \
                            and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return len(syms)

        exp = [sum(seg(w) for w in re.split(r"[^a-z]+", s.lower()) if w)
               for s in texts]
        assert got["n_bpe_pieces"].to_pylist() == exp
