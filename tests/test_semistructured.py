"""JSON field extraction (stages/semistructured.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.semistructured import json_int_field


def _run(vals, **kw):
    import ray.data as rd

    t = pa.table({"id": pa.array(range(len(vals)), pa.int64()),
                  "props": pa.array(vals, pa.string())})
    rows = json_int_field(rd.from_arrow(t).repartition(2),
                          col="props", **kw).take_all()
    return {r["id"]: r[kw.get("out_col") or kw["field"]] for r in rows}


def test_extracts_ints_nulls_and_negatives(ray_session):
    got = _run(['{"k": 87}', '{"k":-3, "j": 1}', '{"j": 5}',
                '{"k": 1.5}', "not json", '{"kk": 9, "k": 0}'],
               field="k")
    assert got == {0: 87, 1: -3, 2: None, 3: None, 4: None, 5: 0}


def test_out_col_and_field_escaping(ray_session):
    got = _run(['{"a.b": 7}'], field="a.b", out_col="v")
    assert got == {0: 7}


def test_empty_and_validation(ray_session):
    import ray.data as rd

    t = pa.table({"props": pa.array([], pa.string())})
    out = json_int_field(rd.from_arrow(t), field="k")
    assert out.take_all() == []
    with pytest.raises(ValueError):
        json_int_field(rd.from_arrow(t), field="")
