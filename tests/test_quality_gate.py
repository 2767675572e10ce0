"""Composite quality gate (textstats.quality_gate_batch)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_search_engine_ray.stages.textstats import quality_gate_batch


def _gate(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = quality_gate_batch(t)
    return {r["doc_id"]: (r["reasons"], r["keep"])
            for r in out.to_pylist()}


def test_rule_bits():
    # mean token len (5*20 + 10) / 23 = 4.78 -> inside the [4.2, 4.8] band
    good = "the and when " + " ".join(f"wrd{i:02d}" for i in range(20))
    short = "tiny doc"                      # bit 1 (len) + others
    nostop = " ".join(f"unique{i:02d}" for i in range(20))  # bit 2
    repet = "the and for " + "alpha beta " * 12             # rep bits
    got = _gate([good, short, nostop, repet])
    assert got[0] == (0, True)
    assert got[1][0] & 1 and not got[1][1]
    assert got[2][0] & 2 and not got[2][1]
    # 'alpha beta' bigrams massively duplicated -> bits 8 and 16
    assert got[3][0] & 16 and got[3][0] & 8 and not got[3][1]


def test_empty_and_no_bigrams():
    got = _gate(["", "one"])
    # empty doc: len violation (bit 1), stopword floor (n_stop*25 <
    # n_tokens is 0 < 0 false -> no bit 2), no bigrams -> no bit 16
    r0, k0 = got[0]
    assert r0 & 1 and not r0 & 16 and not k0
    r1, _ = got[1]
    assert r1 & 1 and not r1 & 16


def test_empty_batch():
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    assert quality_gate_batch(t).num_rows == 0
