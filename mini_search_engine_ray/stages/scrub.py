"""Vectorized regex scrub / redaction over text columns.

Training-data curation constantly rewrites text in place — PII
redaction (emails, phone numbers, long digit runs), URL stripping,
whitespace normalization — and at corpus scale that must be a pure
streaming map: no shuffle, no state, no per-row Python.

``scrub_text`` applies an ORDERED rule list of (RE2 pattern,
replacement) pairs with ``pyarrow.compute.replace_substring_regex``
(global replace, Arrow C++ RE2).  DuckDB's ``regexp_replace(...,
'g')`` is the same RE2 dialect, so every rule an engine pipeline uses
is replayable verbatim by the SQL oracle — that equivalence is what
the driver query checks.  Rules run in list order against the
PREVIOUS rule's output, exactly like chained ``regexp_replace`` calls.

Replacement strings are literal here AND in the oracle contract: RE2
``\\1`` group references work in both engines but are deliberately
out of contract (DuckDB uses ``\\1``, Arrow uses ``\\1`` too — still,
keeping replacements literal keeps the oracle trivially faithful).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A sensible default redaction set for the classic PII sweep. Patterns
# are standard public idioms (RE2-safe: no lookaround, no backrefs).
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]{7,}", "<NUM>"),
]


def scrub_batch(t: pa.Table, rules, *, text_col: str, out_col: str,
                count_col: str | None = None) -> pa.Table:
    """One batch of ``scrub_text`` (exposed for composition into other
    per-batch pipelines): ordered global regex replaces, optional
    total match count (counted on each rule's INPUT, i.e. before that
    rule rewrites it)."""
    s = t[text_col]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    total = np.zeros(t.num_rows, dtype=np.int64) if count_col else None
    for pat, repl in rules:
        if count_col is not None:
            total += pc.count_substring_regex(s, pattern=pat) \
                .fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    cols = {c: t[c] for c in t.column_names}
    cols[out_col] = s
    if count_col is not None:
        cols[count_col] = pa.array(total)
    return pa.table(cols)


def scrub_text(ds, rules=None, *, text_col: str = "text",
               out_col: str | None = None, count_col: str | None = None):
    """Streaming regex scrub: every input column passes through, the
    scrubbed text lands in ``out_col`` (default: in place over
    ``text_col``), and ``count_col`` (optional) counts total pattern
    hits across all rules per row.  ``rules`` defaults to
    ``PII_RULES``.  Pure map — no shuffle, no driver materialization;
    regexes are RE2, compiled once per worker inside Arrow."""
    from functools import partial

    rules = list(PII_RULES if rules is None else rules)
    for pat, repl in rules:
        if not isinstance(pat, str) or not isinstance(repl, str):
            raise TypeError("rules must be (pattern str, replacement str)")
    return ds.map_batches(
        partial(scrub_batch, rules=rules, text_col=text_col,
                out_col=out_col or text_col, count_col=count_col),
        batch_format="pyarrow")
