"""Fuzzy string similarity join (edit distance <= 1) via deletion
neighborhoods.

The SymSpell trick (public-domain spelling-correction literature): two
strings are within edit distance 1 iff they share a member of each
other's single-deletion neighborhood — substitution at position i means
deleting i from BOTH yields the same string; insertion/deletion means
the longer string's deletion at the inserted position IS the shorter
one; equal strings share themselves.  So the join key set of a string
is {itself} ∪ {itself minus one character}, and candidate generation is
an equi-join on that exploded key — never an all-pairs scan.

Scale shape: the neighborhood explode is max_len + 1 VECTORIZED passes
per batch (one Arrow slice+concat per deletion POSITION — no per-row
Python on the data stream); the variant strings never enter the
shuffle — ONE int64 range sort on their vectorized 64-bit polynomial
hashes groups candidates (a collision only creates a false candidate
bucket, discarded by the exact check; runs bounded by the bucket
cap); global pair dedupe is a
pair-sort + first-of-run sweep; the final edit-distance check runs only on the
candidate pairs (output-shaped, like the LSH verify stage — the only
per-pair Python in the plan).  Suited to short keys (names, titles,
codes); for long strings use the MinHash family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.fuzzy_edit import edit1_distance as _edit1  # noqa: E402
# (shared capped edit-distance-1 primitive — also used by the
# did_you_mean suggestion query; semantics match SQL levenshtein <= 1)


def deletion_variants(names: pa.Array):
    """(parent_idx, variant) for every name: itself + each
    single-deletion string — max_len + 1 vectorized Arrow passes."""
    n = len(names)
    lens = pc.utf8_length(names).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    max_len = int(lens.max()) if n else 0
    par = [np.arange(n, dtype=np.int64)]
    var = [names]
    for i in range(max_len):
        m = lens > i
        if not m.any():
            break
        sel = pa.array(np.flatnonzero(m))
        sub = names.take(sel)
        v = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, i),
            pc.utf8_slice_codeunits(sub, i + 1, np.iinfo(np.int32).max),
            "")
        par.append(np.flatnonzero(m))
        var.append(v)
    return np.concatenate(par), pa.concat_arrays(
        [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
         for v in var])


def poly_hash64(strings: pa.Array) -> np.ndarray:
    """Vectorized FNV-style 64-bit polynomial hash of a string array:
    O(max_len) numpy passes over the Arrow data buffer (h = h*0x100000001b3
    + byte per position), length folded in so '' and absent differ.
    NOT cryptographic — callers must tolerate (rare) collisions."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    wide = pa.types.is_large_string(strings.type)
    odt, ow = (np.int64, 8) if wide else (np.int32, 4)
    off = np.frombuffer(strings.buffers()[1], dtype=odt,
                        count=n + 1, offset=strings.offset * ow) \
        .astype(np.int64)
    dbuf = strings.buffers()[2]
    data = np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None \
        else None
    lens = off[1:] - off[:-1]
    h = np.full(n, np.uint64(0xcbf29ce484222325)) \
        + lens.astype(np.uint64)
    prime = np.uint64(0x100000001b3)
    max_len = int(lens.max()) if n else 0
    if max_len == 0 or data is None:
        return h
    with np.errstate(over="ignore"):
        for i in range(max_len):
            m = lens > i
            h[m] = h[m] * prime + data[(off[:-1] + i)[m]]
    return h


def fuzzy_pairs_edit1(ds, *, name_col: str, id_col: str,
                      max_bucket: int = 200):
    """All unordered pairs (a < b by id) whose ``name_col`` values are
    within edit distance 1 (0 = identical).  Returns a Dataset
    (a, b, name_a, name_b, dist).  ``max_bucket`` caps a variant
    bucket (a bucket bigger than that means mass-duplicate keys —
    kept prefix still links members transitively, same contract as
    the LSH pair stage)."""

    def explode(t: pa.Table) -> pa.Table:
        """(vh, id, nm) rows: the variant STRINGS never leave the
        batch — only their 64-bit hashes enter the shuffle (a hash
        collision merely creates a false candidate bucket, which the
        exact verify step discards)."""
        empty = pa.table({"vh": pa.array([], pa.uint64()),
                          "id": pa.array([], pa.int64()),
                          "nm": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        names = t[name_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        par, var = deletion_variants(names)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vh": pa.array(poly_hash64(var)),
                         "id": pa.array(ids[par]),
                         "nm": names.take(pa.array(par))})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "na": pa.array([], pa.string()),
                          "nb": pa.array([], pa.string())})
        if t.num_rows == 0 or "vh" not in t.column_names:
            return empty
        codes = t["vh"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        c_s, i_s = codes[order], ids[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        ends = np.r_[starts[1:], len(c_s)]
        out_a, out_b = [], []
        multi = np.flatnonzero((ends - starts) >= 2)
        for k in multi:
            s, e = starts[k], ends[k]
            # a doc can hit the same variant twice (two deletions
            # collapsing equally) -> unique ids
            members = np.unique(i_s[s:e])[:max_bucket]
            if len(members) < 2:
                continue
            iu, ju = np.triu_indices(len(members), k=1)
            out_a.append(members[iu])
            out_b.append(members[ju])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # attach names via a local id -> name lookup (first occurrence)
        uid, first = np.unique(ids, return_index=True)
        nm = t["nm"]
        if isinstance(nm, pa.ChunkedArray):
            nm = nm.combine_chunks()
        ai = first[np.searchsorted(uid, a)]
        bi = first[np.searchsorted(uid, b)]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "na": nm.take(pa.array(ai)),
                         "nb": nm.take(pa.array(bi))})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.sort("vh").map_batches(
        bucket_pairs, batch_size=None, batch_format="pyarrow")

    def first_of_run(t: pa.Table) -> pa.Table:
        """Global (a, b) dedupe: the pair sort co-locates duplicates
        (one per shared variant), keep the first row of each run with
        its name payload intact."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "na": pa.array([], pa.string()),
                          "nb": pa.array([], pa.string())})
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return t.take(pa.array(np.flatnonzero(keep)))

    deduped = pairs.sort(["a", "b"]).map_batches(
        first_of_run, batch_size=None, batch_format="pyarrow") \
        .rename_columns(["a", "b", "name_a", "name_b"])

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "name_a": pa.array([], pa.string()),
                          "name_b": pa.array([], pa.string()),
                          "dist": pa.array([], pa.int64())})
        if t.num_rows == 0 or "a" not in t.column_names:
            return empty
        na = t["name_a"].to_pylist()
        nb = t["name_b"].to_pylist()
        # candidate pairs only (output-shaped) — the one per-pair loop
        dist = np.fromiter((_edit1(x, y) for x, y in zip(na, nb)),
                           dtype=np.int64, count=len(na))
        keep = dist <= 1
        out = t.filter(pa.array(keep))
        return pa.table({"a": out["a"], "b": out["b"],
                         "name_a": out["name_a"],
                         "name_b": out["name_b"],
                         "dist": pa.array(dist[keep])})

    return deduped.map_batches(verify, batch_size=None,
                               batch_format="pyarrow")
