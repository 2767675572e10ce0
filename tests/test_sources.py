"""Corpus sources: deterministic doc-id assignment, synth corpus,
fingerprints, documents-table adapter."""

from __future__ import annotations

import numpy as np
import pytest

from mini_search_engine_ray.sources.corpus import (
    adapt_documents_table,
    corpus_fingerprint,
    read_corpus_with_doc_ids,
    synth_corpus,
    write_corpus_parquet,
)


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    t = synth_corpus(300, seed=13).drop_columns(["doc_id"])
    p = str(d / "c.parquet")
    write_corpus_parquet(t, p, rows_per_group=64)  # several row groups
    return p, t


def test_doc_ids_deterministic_any_parallelism(ray_session, corpus_file):
    p, t = corpus_file
    rows1 = read_corpus_with_doc_ids(p).take_all()
    rows2 = read_corpus_with_doc_ids(p, columns=["path"]).take_all()
    by_id1 = {r["doc_id"]: r["path"] for r in rows1}
    by_id2 = {r["doc_id"]: r["path"] for r in rows2}
    assert by_id1 == by_id2
    assert sorted(by_id1) == list(range(300))
    # doc_id i must be row i of the file (row-group offset scheme)
    paths = t["path"].to_pylist()
    assert all(by_id1[i] == paths[i] for i in range(300))


def test_synth_corpus_deterministic_and_edge_cases(ray_session):
    a = synth_corpus(50, seed=42)
    b = synth_corpus(50, seed=42)
    assert a.equals(b)
    contents = a["content"].to_pylist()
    assert contents[3] == ""                 # empty doc
    assert contents[7] == " "                # whitespace-only
    assert contents[11].strip(",.;?!") == ""  # punctuation-only
    assert "needle" in contents[19]


def test_corpus_fingerprint_changes_with_data(tmp_path):
    t1 = synth_corpus(40, seed=1)
    t2 = synth_corpus(41, seed=1)
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    write_corpus_parquet(t1, p1)
    write_corpus_parquet(t2, p2)
    assert corpus_fingerprint([p1]) != corpus_fingerprint([p2])
    assert corpus_fingerprint([p1]) == corpus_fingerprint([p1])


def test_documents_adapter_schema(ray_session):
    ds = adapt_documents_table("/root/testdata/sf0.001")
    rows = ds.take(3)
    assert set(rows[0]) == {"doc_id", "repo", "path", "commit", "lang", "content"}
    assert rows[0]["path"].startswith("doc/")


class TestLineSources:
    def test_read_file_as_string_parity(self, tmp_path):
        """FileUtils.readFileAsString parity: joined content without
        trailing newline; callback per line in order."""
        from mini_search_engine_ray.sources.lines import read_file_as_string

        p = tmp_path / "f.txt"
        p.write_text("alpha\nbeta\r\ngamma\n")
        seen = []
        content = read_file_as_string(str(p), seen.append)
        assert content == "alpha\nbeta\ngamma"
        assert seen == ["alpha", "beta", "gamma"]
        # no callback
        assert read_file_as_string(str(p)) == "alpha\nbeta\ngamma"

    def test_read_lines_dataset(self, ray_session, tmp_path):
        from mini_search_engine_ray.sources.lines import read_lines

        a, b = tmp_path / "a.tsv", tmp_path / "b.tsv"
        a.write_text("1\tx\n2\ty\n")
        b.write_text("3\tz\n")
        rows = sorted(
            read_lines([str(a), str(b)]).take_all(),
            key=lambda r: (r["file"], r["line_no"]),
        )
        assert [r["line"] for r in rows] == ["1\tx", "2\ty", "3\tz"]
        assert [r["line_no"] for r in rows] == [0, 1, 0]
