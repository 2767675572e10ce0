"""CDC merge — the lakehouse ``MERGE INTO`` / upsert-apply pattern.

``apply_changes`` folds a change log into a base table: per key, the
row with the highest version wins (a change beats the base row at an
equal version — the change is the newer fact), and a winning change
flagged as a delete removes the key from the output entirely (a
later, higher-version re-insert resurrects it).  This is the
compaction step every incremental pipeline runs between a nightly
base snapshot and its CDC stream.

Winner selection is ONE integer decision: each row carries
``enc = version_µs · 2 + priority`` (base 0, change 1 — the
lexicographic (version, priority) max in one int64), one grouped max
per key, and one (keys…, enc) sort-merge SEMI join re-attaches the
winning row.  Every decision replays exactly in SQL as
``row_number() OVER (PARTITION BY key ORDER BY version DESC,
pri DESC)``.

Contract: at most ONE row per (key, version, source) — the standard
CDC-log shape (one change per key per version).  A violation (two
rows tying on the winning ``enc``) is detected in the final sweep —
equal (keys, enc) rows always land in one sorted block — and raises
loudly rather than emitting a nondeterministic survivor.

Scale shape: the union is scanned once; the grouped max carries
(keys, int64) only; the semi join is the single data-sized exchange.
Nothing collects on the driver.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def apply_changes(base, changes, *, key_cols: list[str],
                  version_col: str, delete_col: str | None = None,
                  partitions: int | None = None):
    """Apply a CDC change log to a base table (see module docstring).
    ``changes`` must carry every base column (same names/types) plus
    optionally ``delete_col`` (bool: this change deletes the key).
    ``version_col`` is int64 or timestamp[us].  Returns the merged
    table with the base schema."""
    import pyarrow.compute as pc

    from .aggregates import sorted_groupby_agg, static_schema
    from .join import sort_merge_join

    b_schema = static_schema(base)
    if b_schema is None:
        b_schema = base.schema().base_schema
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    for c in list(key_cols) + [version_col]:
        if c not in b_schema.names:
            raise ValueError(f"apply_changes: unknown column {c!r}")
    cols = list(b_schema.names)

    def tag(pri: int, is_change: bool):
        def fn(t: pa.Table) -> pa.Table:
            tagged_schema = pa.schema(
                [(n, b_schema.field(n).type) for n in cols]
                + [("_enc", pa.int64()), ("_del", pa.bool_())])
            if t.num_rows == 0:
                return tagged_schema.empty_table()
            v = t[version_col]
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            if pa.types.is_timestamp(v.type):
                v = v.cast(pa.int64())
            if v.null_count:
                raise ValueError("apply_changes: NULL version")
            vn = v.to_numpy(zero_copy_only=False).astype(np.int64)
            enc = vn * 2 + pri
            if is_change and delete_col is not None:
                dl = t[delete_col]
                dl = dl.combine_chunks() \
                    if isinstance(dl, pa.ChunkedArray) else dl
                dl = pc.fill_null(dl, False)
            else:
                dl = pa.array(np.zeros(t.num_rows, bool))
            return t.select(cols).append_column(
                "_enc", pa.array(enc)).append_column("_del", dl)
        return fn

    rows = base.map_batches(tag(0, False), batch_format="pyarrow").union(
        changes.map_batches(tag(1, True), batch_format="pyarrow"))

    tagged_schema = pa.schema(
        [(n, b_schema.field(n).type) for n in cols]
        + [("_enc", pa.int64()), ("_del", pa.bool_())])

    key_schema = pa.schema(
        [(n, b_schema.field(n).type) for n in key_cols]
        + [("_enc", pa.int64())])

    def keys_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return key_schema.empty_table()
        return t.select(list(key_cols) + ["_enc"])

    winners = sorted_groupby_agg(
        rows.map_batches(keys_only, batch_format="pyarrow"),
        list(key_cols), [("_enc", "max", "_enc")],
        in_schema=key_schema)

    merged = sort_merge_join(
        rows, winners, on=list(key_cols) + ["_enc"], how="semi",
        left_schema=tagged_schema, right_schema=key_schema,
        partitions=partitions)

    out_schema = pa.schema([(n, b_schema.field(n).type) for n in cols])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_enc" not in t.column_names:
            return out_schema.empty_table()
        # contract check: equal (keys, enc) rows land in ONE sorted
        # block; a duplicate means two sources tied on the winning
        # version — refuse to pick one arbitrarily
        arrs = [t[c] for c in key_cols]
        nps = [a.combine_chunks().to_numpy(zero_copy_only=False)
               if isinstance(a, pa.ChunkedArray)
               else a.to_numpy(zero_copy_only=False) for a in arrs]
        order = np.lexsort(tuple(reversed(nps)))
        dup = np.zeros(0, bool)
        if len(order) > 1:
            eq = np.ones(len(order) - 1, bool)
            for a in nps:
                s = a[order]
                eq &= s[1:] == s[:-1]
            dup = eq
        if dup.any():
            raise ValueError(
                "apply_changes: two rows tie on the winning (key, "
                "version, source) — the one-change-per-key-per-version "
                "CDC contract is violated")
        dl = t["_del"]
        dl = dl.combine_chunks() if isinstance(dl, pa.ChunkedArray) else dl
        keep = pc.invert(pc.fill_null(dl, False))
        return t.filter(keep).select(cols)

    return merged.map_batches(finish, batch_size=None,
                              batch_format="pyarrow")
