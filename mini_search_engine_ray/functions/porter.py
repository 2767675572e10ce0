"""Porter stemmer — the classic 1980 algorithm, Lucene-variant behavior.

The reference engine stems with the Porter stemmer vendored from Lucene
(`analysis/PorterStemmer.java:16-333`, itself a port of Martin Porter's
original C implementation of the published algorithm, *An algorithm for
suffix stripping*, Program 14(3) 1980). This module re-implements that
published algorithm in Python with the same observable behavior,
including the original-variant quirks the reference's golden tests pin
down (`analysis/stemmer/PorterStemmerTest.java`):

  * words of length <= 2 are returned unchanged;
  * if no rule fires, the ORIGINAL token (original casing) is returned;
  * the "y -> i" rule and measure() operate over the Lucene state
    machine's `j` marker exactly (e.g. final-e removal computes m()
    against the pre-decrement end);
  * step-5 "-ion" requires a preceding s/t within the stem.

Only ASCII lowercase letters participate in vowel/consonant decisions;
uppercase letters count as consonants, which reproduces the reference's
behavior on mixed-case tokens (the analyzer lowercases first anyway).

`stem()` is memoized because corpus token streams are highly repetitive;
the cache is per-process (fine inside Ray actors — build once, reuse
per batch).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _Stem:
    """Mutable stemming state over a char list b[k0..k] with marker j."""

    __slots__ = ("b", "k", "k0", "j", "dirty")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.k0 = 0
        self.j = 0
        self.dirty = False

    # -- predicates over the buffer ------------------------------------
    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == self.k0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of consonant-vowel sequences in b[k0..j]."""
        n = 0
        i = self.k0
        while True:
            if i > self.j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.k0, self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < self.k0 + 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < self.k0 + 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < self.k0:
            return False
        if self.b[o : self.k + 1] != list(s):
            return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)
        self.dirty = True

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- the six steps (Lucene numbering) ------------------------------
    def step1(self) -> None:
        # plurals and -ed / -ing
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self) -> None:
        # terminal y -> i when there is another vowel in the stem
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"
            self.dirty = True

    def step3(self) -> None:
        # double-suffix mappings, e.g. -ization -> -ize
        if self.k == self.k0:
            return  # guard for single-char buffers (Lucene "Bug 1")
        ch = self.b[self.k - 1]
        if ch == "a":
            if self.ends("ational"):
                self.r("ate")
            elif self.ends("tional"):
                self.r("tion")
        elif ch == "c":
            if self.ends("enci"):
                self.r("ence")
            elif self.ends("anci"):
                self.r("ance")
        elif ch == "e":
            if self.ends("izer"):
                self.r("ize")
        elif ch == "l":
            if self.ends("bli"):
                self.r("ble")
            elif self.ends("alli"):
                self.r("al")
            elif self.ends("entli"):
                self.r("ent")
            elif self.ends("eli"):
                self.r("e")
            elif self.ends("ousli"):
                self.r("ous")
        elif ch == "o":
            if self.ends("ization"):
                self.r("ize")
            elif self.ends("ation"):
                self.r("ate")
            elif self.ends("ator"):
                self.r("ate")
        elif ch == "s":
            if self.ends("alism"):
                self.r("al")
            elif self.ends("iveness"):
                self.r("ive")
            elif self.ends("fulness"):
                self.r("ful")
            elif self.ends("ousness"):
                self.r("ous")
        elif ch == "t":
            if self.ends("aliti"):
                self.r("al")
            elif self.ends("iviti"):
                self.r("ive")
            elif self.ends("biliti"):
                self.r("ble")
        elif ch == "g":
            if self.ends("logi"):
                self.r("log")

    def step4(self) -> None:
        # -ic-ate / -ative / -alize / -iciti / -ical / -ful / -ness
        ch = self.b[self.k]
        if ch == "e":
            if self.ends("icate"):
                self.r("ic")
            elif self.ends("ative"):
                self.r("")
            elif self.ends("alize"):
                self.r("al")
        elif ch == "i":
            if self.ends("iciti"):
                self.r("ic")
        elif ch == "l":
            if self.ends("ical"):
                self.r("ic")
            elif self.ends("ful"):
                self.r("")
        elif ch == "s":
            if self.ends("ness"):
                self.r("")

    def step5(self) -> None:
        # drop -ant, -ence, etc. when m() > 1
        if self.k == self.k0:
            return
        ch = self.b[self.k - 1]
        if ch == "a":
            if not self.ends("al"):
                return
        elif ch == "c":
            if not self.ends("ance") and not self.ends("ence"):
                return
        elif ch == "e":
            if not self.ends("er"):
                return
        elif ch == "i":
            if not self.ends("ic"):
                return
        elif ch == "l":
            if not self.ends("able") and not self.ends("ible"):
                return
        elif ch == "n":
            if (
                not self.ends("ant")
                and not self.ends("ement")
                and not self.ends("ment")
                and not self.ends("ent")
            ):
                return
        elif ch == "o":
            # -ion only after s/t; j >= 0 guard (Lucene "Bug 2")
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif not self.ends("ou"):
                return
        elif ch == "s":
            if not self.ends("ism"):
                return
        elif ch == "t":
            if not self.ends("ate") and not self.ends("iti"):
                return
        elif ch == "u":
            if not self.ends("ous"):
                return
        elif ch == "v":
            if not self.ends("ive"):
                return
        elif ch == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    def step6(self) -> None:
        # final -e removal and -ll -> -l; m() here measures against the
        # pre-step end marker (j = entry k), mirroring the reference.
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def _stem_uncached(token: str) -> str:
    st = _Stem(token)
    if st.k > st.k0 + 1:
        st.step1()
        st.step2()
        st.step3()
        st.step4()
        st.step5()
        st.step6()
    if st.k + 1 != len(token):
        st.dirty = True
    if not st.dirty:
        return token
    return "".join(st.b[: st.k + 1])


class PorterStemmer:
    """Memoizing Porter stemmer with the reference's exact behavior."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, token: str) -> str:
        out = self._cache.get(token)
        if out is None:
            out = _stem_uncached(token)
            # bound the cache so adversarial corpora can't OOM an actor
            if len(self._cache) < 1_000_000:
                self._cache[token] = out
        return out


def porter_stem(token: str) -> str:
    """One-shot convenience wrapper (uncached)."""
    return _stem_uncached(token)
