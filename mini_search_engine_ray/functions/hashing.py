"""The ONE definition of the md5-low-64 hash family every
content-addressed operator keys off (dedup sketches, hash splits,
per-group caps): the low 64 bits of md5, read little-endian from the
last 8 digest bytes — chosen because it equals DuckDB's
``md5_number_lower(s)``, which lets the driver oracle replicate every
derived operator in pure SQL.  Keep this in one place: two drifting
copies of an oracle-critical hash definition is a silent-corruption
hazard."""

from __future__ import annotations

import hashlib

import numpy as np


def md5_low64_str(s: str | None) -> int:
    """md5-low-64 of one string; None hashes like '' (SQL side must
    coalesce(col, '') if null inputs are possible)."""
    return int.from_bytes(hashlib.md5((s or "").encode()).digest()[8:], "little")


def md5_low64_batch(strings) -> np.ndarray:
    """md5-low-64 per element, as uint64 (crypto per row is inherent;
    the loop body is C-speed hashlib)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = md5_low64_str(s)
    return out


def md5_hex_batch(strings) -> list[str]:
    """Full md5 hexdigest per element (== DuckDB ``md5(s)``); None
    hashes like ''.  The content-identity hash exact dedup and the
    clean_corpus loser sweep both key off — one definition, like
    md5-low-64 above."""
    return [hashlib.md5((s or "").encode()).hexdigest() for s in strings]
