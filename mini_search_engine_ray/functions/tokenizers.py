"""Tokenizers: punctuation, naive, code-aware, and DP word-break.

Per-string reference implementations with behavioral parity to the
reference engine's analysis chain (`analysis/PunctuationTokenizer.java`,
`analysis/WordBreakTokenizer.java`, `analysis/NaiveAnalyzer.java`); the
vectorized Arrow batch kernels in `stages/ingest.py` are built from the
same regex constants and are tested equal to these.
"""

from __future__ import annotations

import math
import re

from .stopwords import STOP_WORDS

# The reference splits on "[,.;?! ^\f\n\r\t\v]" (a Java regex —
# `analysis/PunctuationTokenizer.java:21`). Note the literal '^' inside
# the class, and that Java 8's \v is the *vertical whitespace class*
# [\n\x0B\f\r\x85  ], not just vertical tab. The expanded,
# engine-portable character class (also valid RE2 for pyarrow/DuckDB):
PUNCT_CLASS = ",.;?! ^\\f\\n\\r\\t\\x0b\\x85\\u2028\\u2029"
PUNCT_SPLIT_RE = re.compile(f"[{PUNCT_CLASS}]+")
# RE2 spelling for pyarrow.compute / DuckDB regexp_split_to_array
# (DuckDB uses RE2 too — pipelines/driver_queries.py embeds this
# constant directly in the oracle SQL):
PUNCT_SPLIT_RE2 = "[,.;?! ^\\f\\n\\r\\t\\x0B\\x85\\x{2028}\\x{2029}]+"

# Java String.trim() removes every char <= U+0020 from both ends
# (`PunctuationTokenizer.java:46` trims before splitting). Most of that
# range is in the split class anyway, but the control chars
# \x00-\x08 / \x0e-\x1f are NOT — a doc starting with e.g. \x1b (ANSI
# escape, realistic in source code) must index 'hello', not
# '\x1bhello'. Applied identically by this function, the vectorized
# ingest kernel, the textstats kernel and the SQL oracle CTE.
JAVA_TRIM_CHARS = "".join(chr(i) for i in range(0x21))


def punctuation_tokenize(text: str | None, *, stop_words: frozenset[str] = STOP_WORDS) -> list[str]:
    """Java-trim -> lowercase -> split on punctuation/whitespace ->
    drop empties and stopwords (no stemming) — token-identical to the
    reference chain and to the vectorized Arrow kernel in
    `stages/ingest.py`."""
    if not text:
        return []
    toks = PUNCT_SPLIT_RE.split(text.strip(JAVA_TRIM_CHARS).lower())
    return [t for t in toks if t and t not in stop_words]


_NAIVE_SPLIT_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def naive_tokenize(text: str | None) -> list[str]:
    """Lowercase + whitespace split (the reference's debug NaiveAnalyzer,
    `analysis/NaiveAnalyzer.java:10-16`). No stopword filtering.

    Splits on Java's ``\\s`` class ``[ \\t\\n\\x0B\\f\\r]`` — NOT
    Python ``str.split()``, whose Unicode-whitespace set (NBSP, NEL,
    U+2028…) diverges from both the reference and the vectorized Arrow
    kernel in `stages/ingest.py`, which would make index-time and
    query-time analysis disagree on such documents."""
    if not text:
        return []
    return [t for t in _NAIVE_SPLIT_RE.split(text.lower()) if t]


# -- code-aware tokenizer (north-rule extension) -----------------------
#
# Splits source code on non-identifier characters, then splits
# identifiers on snake_case and camelCase boundaries (acronym-aware:
# "HTMLParser" -> html, parser). Implemented with two RE2-compatible
# substitutions (no lookahead) so the DuckDB oracle can reproduce it:
#   1. ([a-z0-9])([A-Z])      -> \1 \2     fooBar   -> foo Bar
#   2. ([A-Z]+)([A-Z][a-z])   -> \1 \2     XMLHttp  -> XML Http
# then lowercase and split on [^a-z0-9]+, dropping stopwords and
# single-character tokens.
CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
NON_IDENT_RE = re.compile(r"[^a-z0-9]+")
CAMEL_1_RE2 = "([a-z0-9])([A-Z])"
CAMEL_2_RE2 = "([A-Z]+)([A-Z][a-z])"
NON_IDENT_RE2 = "[^a-z0-9]+"


def code_tokenize(text: str | None, *, stop_words: frozenset[str] = STOP_WORDS) -> list[str]:
    if not text:
        return []
    text = CAMEL_1.sub(r"\1 \2", text)
    text = CAMEL_2.sub(r"\1 \2", text)
    toks = NON_IDENT_RE.split(text.lower())
    return [t for t in toks if len(t) > 1 and t not in stop_words]


# -- DP word-break tokenizer -------------------------------------------


def default_dict_path(lang: str = "en") -> str:
    """Path of the shipped public frequency dictionary (the reference's
    `src/main/resources/cs221_frequency_dictionary_{en,jp}.txt`,
    loaded at `analysis/WordBreakTokenizer.java:51-89` /
    `JapaneseTokenizer.java:9-21`)."""
    import os

    if lang not in ("en", "jp"):
        raise ValueError(f"no dictionary for lang {lang!r} (en, jp)")
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources",
        f"cs221_frequency_dictionary_{lang}.txt",
    )


class UnbreakableTextError(ValueError):
    """Raised when the input cannot be segmented with the dictionary
    (reference: RuntimeException "Can't break this word",
    `analysis/WordBreakTokenizer.java:...tokenize`)."""


def load_frequency_dict(lines: list[str]) -> dict[str, float]:
    """Parse `word freq` lines into a probability map.

    Parity with `WordBreakTokenizer.initDict` (`WordBreakTokenizer.java`):
    lines are trimmed and split on a single space; lines that don't
    split into exactly two fields (the BOM line, multi-number Japanese
    lines) are skipped; duplicate words keep the last frequency but
    every valid line's frequency still contributes to the total.
    """
    freqs: dict[str, float] = {}
    total = 0.0
    for line in lines:
        parts = line.strip().split(" ")
        if len(parts) != 2:
            continue
        try:
            f = float(parts[1])
        except ValueError:
            continue
        freqs[parts[0]] = f
        total += f
    if total > 0:
        for w in freqs:
            freqs[w] /= total
    return freqs


class WordBreakTokenizer:
    """DP word-break: segment un-spaced text into the dictionary-word
    sequence maximizing the product of unigram probabilities; stopwords
    filtered AFTER the break; unbreakable input raises.

    Interval DP with the reference's tie-breaking (a whole-substring
    dictionary word is preferred over any equal-probability split; among
    splits, the leftmost split point wins ties — `comparePrevSubText`
    uses strict `>`, `WordBreakTokenizer.java:150-161`) but O(n^2)
    memory via split-point backtracking instead of materialized token
    lists, and a numpy-vectorized inner loop so the reference's ~900-
    char long-test goldens run in seconds rather than hours of pure-
    Python O(n^3).

    `max_len` caps the O(n^3) DP; longer input raises ValueError (the
    word-break path is for short un-spaced strings, never the flagship
    code-corpus path).
    """

    def __init__(self, dict_lines: list[str], *, max_len: int = 2048) -> None:
        self.probs = load_frequency_dict(dict_lines)
        self.logp = {w: math.log(p) for w, p in self.probs.items() if p > 0}
        self.max_len = max_len
        self._max_word = max((len(w) for w in self.logp), default=0)

    @classmethod
    def from_file(cls, path: str, **kw) -> "WordBreakTokenizer":
        with open(path, encoding="utf-8") as f:
            return cls(f.read().splitlines(), **kw)

    _default_cache: dict[str, "WordBreakTokenizer"] = {}

    @classmethod
    def default(cls, lang: str = "en") -> "WordBreakTokenizer":
        """Tokenizer over the shipped frequency dictionary ('en' or
        'jp' — the same public resource files the reference loads,
        `resources/cs221_frequency_dictionary_{en,jp}.txt`). Cached per
        process (ST1: the 83k-entry dict parses once per Ray worker)."""
        tok = cls._default_cache.get(lang)
        if tok is None:
            tok = cls.from_file(default_dict_path(lang))
            cls._default_cache[lang] = tok
        return tok

    def tokenize(self, text: str | None, *, stop_words: frozenset[str] = STOP_WORDS) -> list[str]:
        import numpy as np

        if not text:
            return []
        text = text.strip().lower()
        n = len(text)
        if n == 0:
            return []
        if n > self.max_len:
            raise ValueError(f"word-break input longer than max_len={self.max_len}")
        logp = self.logp
        NEG = float("-inf")
        # lp[s, e] = best log-prob of text[s:e+1]; split[s, e]: -1 whole
        # word, >=0 leftmost argmax split point, -2 unbreakable
        lp = np.full((n, n), NEG)
        split = np.full((n, n), -2, dtype=np.int64)
        maxw = self._max_word
        for window in range(1, n + 1):
            for start in range(0, n - window + 1):
                end = start + window - 1
                best_lp, best_split = NEG, -2
                if window <= maxw:
                    w_lp = logp.get(text[start : end + 1])
                    if w_lp is not None:
                        best_lp, best_split = w_lp, -1
                if window > 1:
                    cand = lp[start, start:end] + lp[start + 1 : end + 1, end]
                    m = int(cand.argmax())  # first max -> leftmost split
                    if cand[m] > best_lp:
                        best_lp, best_split = float(cand[m]), start + m
                lp[start, end] = best_lp
                split[start, end] = best_split
        if lp[0, n - 1] == NEG:
            raise UnbreakableTextError("Can't break this word")
        out: list[str] = []
        stack = [(0, n - 1)]
        while stack:
            s, e = stack.pop()
            sp = int(split[s, e])
            if sp == -1:
                out.append(text[s : e + 1])
            else:
                stack.append((sp + 1, e))  # right pushed first -> left emitted first
                stack.append((s, sp))
        return [t for t in out if t not in stop_words]
