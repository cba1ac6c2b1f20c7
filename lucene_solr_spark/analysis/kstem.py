"""KStem: Krovetz's dictionary-driven English stemmer.

Re-implements the algorithm of the reference's KStemFilter
(lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
KStemmer.java — itself a port of Bob Krovetz's kstem, "Viewing
morphology as an inference process", SIGIR 1993).  Unlike the
suffix-stripping Porter family, KStem strips an inflectional or
derivational ending only when the resulting form is attested in a
~28k-entry head-word dictionary, which keeps stems readable words
("memorial" stays "memorial", "memorizing" -> "memorize").

The dictionary tables are frozen data extracted from the reference
(scripts/make_kstem_tables.py -> fixtures_data/kstem_tables.json.gz):
  - head_words: KStemData1..8 + supplementDict + properNouns
  - conflations: directConflations + countryNationality (word -> root)
  - exception_words: in-dictionary words whose final -e must never be
    re-derived (KStemmer.java:74-80)

Semantics pinned by the reference and verified against its full
published vocabulary (kstemTestData.zip, 12,130 pairs, exact):
  - words of length <= 2 or >= 50, or containing non [a-z], are left
    unchanged (KStemmer.java stem():1396-1400)
  - the ending cascade runs at most once per word, stopping at the
    first dictionary match: plural, past tense, aspect (-ing), -ity,
    -ness, -ion family, -er/-or, -ly, -al, -ive, -ize, -ment, -ble,
    -ism, -ic, -ncy, -nce (KStemmer.java:1448-1484)
  - the buffer semantics of OpenStringBuilder are load-bearing:
    setLength() truncates without clearing, so later writes can
    re-expose previously written characters (e.g. the -er restore
    path).  _Buf reproduces exactly that.

Requires lowercase input (the reference documents the same
requirement for KStemFilter).
"""

from __future__ import annotations

import gzip
import json
import os
from functools import lru_cache

_TABLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures_data", "kstem_tables.json.gz")

_MAX_WORD_LEN = 50
_VOWELS = frozenset("aeiou")


@lru_cache(maxsize=1)
def _dict_ht() -> dict:
    """word -> (root|None, is_exception); None root means the word
    itself is the stem."""
    with gzip.open(_TABLES, "rt", encoding="utf-8") as f:
        t = json.load(f)
    d: dict[str, tuple] = {}
    for w in t["exception_words"]:
        d[w] = (w, True)
    for w, root in t["conflations"].items():
        d[w] = (root, False)
    default = (None, False)
    for w in t["head_words"]:
        if w not in d:
            d[w] = default
    return d


class _Buf:
    """OpenStringBuilder analog: logical length over a buffer that
    setLength() never clears."""

    __slots__ = ("a", "n")

    def __init__(self, s: str):
        # reserve: an expansion beyond len+10 never happens (the
        # cascade only ever appends restored suffixes)
        self.a = list(s) + [""] * 10
        self.n = len(s)

    def char(self, i: int) -> str:
        return self.a[i]

    def set_char(self, i: int, c: str) -> None:
        self.a[i] = c

    def set_len(self, n: int) -> None:
        self.n = n

    def write(self, c: str) -> None:
        if self.n == len(self.a):
            self.a.append(c)
        else:
            self.a[self.n] = c
        self.n += 1

    def append(self, s: str) -> None:
        for c in s:
            self.write(c)

    def value(self) -> str:
        return "".join(self.a[:self.n])


class _KStem:
    """One stemming pass; instances are single-use."""

    def __init__(self, word: str):
        self.w = _Buf(word)
        self.k = len(word) - 1  # index of final letter in word
        self.j = 0              # index of final letter in stem
        self.matched: tuple | None = None  # last dict hit

    # --- predicates -------------------------------------------------
    def _is_cons(self, i: int) -> bool:
        ch = self.w.char(i)
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _double_c(self, i: int) -> bool:
        return (i >= 1 and self.w.char(i) == self.w.char(i - 1)
                and self._is_cons(i))

    def _vowel_in_stem(self) -> bool:
        return any(not self._is_cons(i) for i in range(self.j + 1))

    def _ends(self, s: str) -> bool:
        """endsIn: on success j = index before the suffix; the
        multi-char string form also sets j=k on failure."""
        n = len(s)
        if n > self.k:
            return False
        if n > 4:
            r = self.w.n - n
            self.j = self.k
            for i in range(n):
                if s[i] != self.w.char(r + i):
                    return False
            self.j = r - 1
            return True
        for i in range(n):
            if self.w.char(self.k - n + 1 + i) != s[i]:
                return False
        self.j = self.k - n
        return True

    # --- dictionary -------------------------------------------------
    def _lookup(self) -> bool:
        self.matched = _dict_ht().get(self.w.value())
        return self.matched is not None

    def _word_in_dict(self) -> tuple | None:
        if self.matched is not None:
            return self.matched
        e = _dict_ht().get(self.w.value())
        if e is not None and not e[1]:
            self.matched = e  # cache only non-exceptions
        return e

    def _set_suffix(self, s: str) -> None:
        self.w.set_len(self.j + 1)
        self.w.append(s)
        self.k = self.j + len(s)

    # --- ending routines (order and fallbacks pinned by the
    # --- reference; see module docstring) ---------------------------
    def _plural(self) -> None:
        w, j = self.w, None
        if w.char(self.k) != "s":
            return
        if self._ends("ies"):
            j = self.j
            w.set_len(j + 3)
            self.k -= 1
            if self._lookup():  # calories -> calorie
                return
            self.k += 1
            w.write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends("es"):
            j = self.j
            w.set_len(j + 2)
            self.k -= 1
            # aides -> aide but aided -> aid; the double-s guard stops
            # crosses -> crosse
            try_e = j > 0 and not (w.char(j) == "s" and w.char(j - 1) == "s")
            if try_e and self._lookup():
                return
            w.set_len(j + 1)
            self.k -= 1
            if self._lookup():
                return
            w.write("e")  # default: retain the e
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if (self.w.n > 3 and self.w.char(self.k - 1) != "s"
                    and not self._ends("ous")):
                # unless -ous or double s, drop the final s
                w.set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:
        w = self.w
        if w.n <= 4:  # fled -> fl guard
            return
        if self._ends("ied"):
            j = self.j
            w.set_len(j + 3)
            self.k -= 1
            if self._lookup():  # died -> die for short words
                return
            self.k += 1
            w.write("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends("ed") and self._vowel_in_stem():
            j = self.j
            w.set_len(j + 2)
            self.k = j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return  # root ends in e
            w.set_len(j + 1)
            self.k = j
            if self._lookup():
                return
            if self._double_c(self.k):
                # backfilled -> backfill, not backfille
                w.set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                w.write(w.char(self.k))
                self.k += 1
                self._lookup()
                return
            if w.char(0) == "u" and w.char(1) == "n":
                # un- prefix: restore and leave alone
                w.write("e")
                w.write("d")
                self.k += 2
                return
            w.set_len(j + 1)
            w.write("e")  # microcoded -> microcode
            self.k = j + 1

    def _aspect(self) -> None:
        w = self.w
        if w.n <= 5:  # thing -> the guard
            return
        if self._ends("ing") and self._vowel_in_stem():
            j = self.j
            w.set_char(j + 1, "e")
            w.set_len(j + 2)
            self.k = j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            w.set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                w.set_len(self.k + 1)
                if self._lookup():
                    return
                w.write(w.char(self.k))  # leave doubled (fingerspell)
                self.k += 1
                self._lookup()
                return
            if j > 0 and self._is_cons(j) and self._is_cons(j - 1):
                # two consonants: no e (footstamping -> footstamp)
                self.k = j
                w.set_len(self.k + 1)
                return
            w.set_len(j + 1)
            w.write("e")  # microcoding -> microcode
            self.k = j + 1

    def _ity(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ity"):
            return
        j = self.j
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        w.write("e")
        self.k = j + 1
        if self._lookup():
            return
        w.set_char(j + 1, "i")
        w.append("ty")
        self.k = old_k
        # -ability/-ibility -> -ble, productive, accept blind
        if j > 0 and w.char(j - 1) == "i" and w.char(j) == "l":
            w.set_len(j - 1)
            w.append("le")
            self.k = j
            self._lookup()
            return
        if j > 0 and w.char(j - 1) == "i" and w.char(j) == "v":
            w.set_len(j + 1)
            w.write("e")  # -ivity -> -ive
            self.k = j + 1
            self._lookup()
            return
        if j > 0 and w.char(j - 1) == "a" and w.char(j) == "l":
            w.set_len(j + 1)  # -ality: drop ity
            self.k = j
            self._lookup()
            return
        if self._lookup():  # immunity stays if the -ity form is listed
            return
        w.set_len(j + 1)  # default: drop -ity
        self.k = j

    def _ness(self) -> None:
        if self._ends("ness"):
            j = self.j
            self.w.set_len(j + 1)
            self.k = j
            if self.w.char(j) == "i":
                self.w.set_char(j, "y")  # happiness -> happy
            self._lookup()

    def _ion(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ion"):
            return
        if self._ends("ization"):  # -ize is productive, accept
            j = self.j
            w.set_len(j + 3)
            w.write("e")
            self.k = j + 3
            self._lookup()
            return
        if self._ends("ition"):
            j = self.j
            w.set_len(j + 1)
            w.write("e")
            self.k = j + 1
            if self._lookup():  # definition -> define
                return
            w.set_len(j + 1)
            w.append("ition")
            self.k = old_k
        elif self._ends("ation"):
            j = self.j
            w.set_len(j + 3)
            w.write("e")
            self.k = j + 3
            if self._lookup():  # elimination -> eliminate
                return
            w.set_len(j + 1)
            w.write("e")
            self.k = j + 1
            if self._lookup():
                return
            w.set_len(j + 1)  # resignation -> resign
            self.k = j
            if self._lookup():
                return
            w.set_len(j + 1)
            w.append("ation")
            self.k = old_k
        # -ication after -ation: complication -> complicate, not comply
        if self._ends("ication"):
            j = self.j
            w.set_len(j + 1)
            w.write("y")
            self.k = j + 1
            if self._lookup():  # amplification -> amplify
                return
            w.set_len(j + 1)
            w.append("ication")
            self.k = old_k
        # plain -ion
        j = self.k - 3
        self.j = j
        w.set_len(j + 1)
        w.write("e")
        self.k = j + 1
        if self._lookup():
            return
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        w.set_len(j + 1)
        w.append("ion")
        self.k = old_k

    def _er_or(self) -> None:
        w, old_k = self.w, self.k
        if w.char(self.k) != "r":
            return
        if self._ends("izer"):  # -ize productive
            j = self.j
            w.set_len(j + 4)
            self.k = j + 3
            self._lookup()
            return
        if self._ends("er") or self._ends("or"):
            j = self.j
            word_char = w.char(j + 1)
            if self._double_c(j):
                w.set_len(j)
                self.k = j - 1
                if self._lookup():
                    return
                w.write(w.char(j - 1))
            if w.char(j) == "i":  # -ier -> -y
                w.set_char(j, "y")
                w.set_len(j + 1)
                self.k = j
                if self._lookup():
                    return
                w.set_char(j, "i")
                w.write("e")
            if w.char(j) == "e":  # -eer
                w.set_len(j)
                self.k = j - 1
                if self._lookup():
                    return
                w.write("e")
            w.set_len(j + 2)  # drop the r
            self.k = j + 1
            if self._lookup():
                return
            w.set_len(j + 1)  # drop -er/-or
            self.k = j
            if self._lookup():
                return
            w.write("e")  # -or + e
            self.k = j + 1
            if self._lookup():
                return
            w.set_len(j + 1)
            w.write(word_char)
            w.write("r")  # restore
            self.k = old_k

    def _ly(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ly"):
            return
        j = self.j
        w.set_char(j + 2, "e")  # -ly -> -le
        if self._lookup():
            return
        w.set_char(j + 2, "y")
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        if j > 0 and w.char(j - 1) == "a" and w.char(j) == "l":
            return  # -ally -> -al always
        w.append("ly")
        self.k = old_k
        if j > 0 and w.char(j - 1) == "a" and w.char(j) == "b":
            w.set_char(j + 2, "e")  # -ably -> -able always
            self.k = j + 2
            return
        if w.char(j) == "i":  # militarily -> military
            w.set_len(j)
            w.write("y")
            self.k = j
            if self._lookup():
                return
            w.set_len(j)
            w.append("ily")
            self.k = old_k
        w.set_len(j + 1)  # default: drop -ly
        self.k = j

    def _al(self) -> None:
        w, old_k = self.w, self.k
        if w.n < 4:
            return
        if not self._ends("al"):
            return
        j = self.j
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        if self._double_c(j):
            w.set_len(j)
            self.k = j - 1
            if self._lookup():
                return
            w.write(w.char(j - 1))
        w.set_len(j + 1)
        w.write("e")
        self.k = j + 1
        if self._lookup():
            return
        w.set_len(j + 1)
        w.append("um")  # optimal -> optimum
        self.k = j + 2
        if self._lookup():
            return
        w.set_len(j + 1)
        w.append("al")
        self.k = old_k
        if j > 0 and w.char(j - 1) == "i" and w.char(j) == "c":
            w.set_len(j - 1)  # drop -ical
            self.k = j - 2
            if self._lookup():
                return
            w.set_len(j - 1)
            w.write("y")  # bibliographical -> bibliography
            self.k = j - 1
            if self._lookup():
                return
            w.set_len(j - 1)
            w.append("ic")  # default: -ical -> -ic
            self.k = j
            self._lookup()
            return
        if w.char(j) == "i":  # -ial removal
            w.set_len(j)
            self.k = j - 1
            if self._lookup():
                return
            w.append("ial")
            self.k = old_k
            self._lookup()

    def _ive(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ive"):
            return
        j = self.j
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        w.write("e")
        self.k = j + 1
        if self._lookup():
            return
        w.set_len(j + 1)
        w.append("ive")
        if j > 0 and w.char(j - 1) == "a" and w.char(j) == "t":
            w.set_char(j - 1, "e")  # determinative -> determine
            w.set_len(j)
            self.k = j - 1
            if self._lookup():
                return
            w.set_len(j - 1)  # drop -ative
            if self._lookup():
                return
            w.append("ative")
            self.k = old_k
        # -ive -> -ion (injunctive -> injunction)
        w.set_char(j + 2, "o")
        w.set_char(j + 3, "n")
        if self._lookup():
            return
        w.set_char(j + 2, "v")
        w.set_char(j + 3, "e")
        self.k = old_k

    def _ize(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ize"):
            return
        j = self.j
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        w.write("i")
        if self._double_c(j):
            w.set_len(j)
            self.k = j - 1
            if self._lookup():
                return
            w.write(w.char(j - 1))
        w.set_len(j + 1)
        w.write("e")
        self.k = j + 1
        if self._lookup():
            return
        w.set_len(j + 1)
        w.append("ize")
        self.k = old_k

    def _ment(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ment"):
            j = self.j
            w.set_len(j + 1)
            self.k = j
            if self._lookup():
                return
            w.append("ment")
            self.k = old_k

    def _ble(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ble"):
            return
        j = self.j
        if w.char(j) not in ("a", "i"):
            return
        word_char = w.char(j)
        w.set_len(j)
        self.k = j - 1
        if self._lookup():
            return
        if self._double_c(self.k):
            w.set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.write(w.char(self.k - 1))
        w.set_len(j)
        w.write("e")
        self.k = j
        if self._lookup():
            return
        w.set_len(j)
        w.append("ate")  # compensable -> compensate
        self.k = j + 2
        if self._lookup():
            return
        w.set_len(j)
        w.write(word_char)
        w.append("ble")
        self.k = old_k

    def _ism(self) -> None:
        if self._ends("ism"):  # productive, accept
            self.w.set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ic(self) -> None:
        w = self.w
        if not self._ends("ic"):
            return
        j = self.j
        w.set_len(j + 3)
        w.append("al")  # canonic -> canonical (the one expansion)
        self.k = j + 4
        if self._lookup():
            return
        w.set_char(j + 1, "y")
        w.set_len(j + 2)
        self.k = j + 1
        if self._lookup():
            return
        w.set_char(j + 1, "e")
        if self._lookup():
            return
        w.set_len(j + 1)
        self.k = j
        if self._lookup():
            return
        w.append("ic")
        self.k = j + 2

    def _ncy(self) -> None:
        w = self.w
        if not self._ends("ncy"):
            return
        j = self.j
        if w.char(j) not in ("e", "a"):
            return
        w.set_char(j + 2, "t")  # -ncy -> -nt
        w.set_len(j + 3)
        self.k = j + 2
        if self._lookup():
            return
        w.set_char(j + 2, "c")  # default -> -nce
        w.write("e")
        self.k = j + 3
        self._lookup()

    def _nce(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("nce"):
            return
        j = self.j
        word_char = w.char(j)
        if word_char not in ("e", "a"):
            return
        w.set_len(j)
        w.write("e")  # adherance -> adhere
        self.k = j
        if self._lookup():
            return
        w.set_len(j)  # disappearance -> disappear
        self.k = j - 1
        if self._lookup():
            return
        w.write(word_char)
        w.append("nce")
        self.k = old_k

    def run(self) -> str | None:
        """The cascade; returns the stem, or None meaning 'unchanged'."""
        cascade = (
            self._plural, self._past_tense, self._aspect, self._ity,
            self._ness, self._ion, self._er_or, self._ly, self._al,
        )
        for step in cascade:
            step()
            if self.matched is not None:
                break
        else:
            self._word_in_dict()  # pre-cache before -ive, as pinned
            for step in (self._ive, self._ize, self._ment, self._ble,
                         self._ism, self._ic, self._ncy, self._nce):
                step()
                if self.matched is not None:
                    break
        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]  # direct conflation root
        return self.w.value()


def kstem_stem(term: str) -> str:
    """Stem one lowercase token; non-candidate tokens pass through."""
    n = len(term)
    if n <= 2 or n >= _MAX_WORD_LEN:
        return term
    entry = _dict_ht().get(term)
    if entry is not None:
        return entry[0] if entry[0] is not None else term
    for ch in term:
        if not ("a" <= ch <= "z"):
            return term
    return _KStem(term).run()
