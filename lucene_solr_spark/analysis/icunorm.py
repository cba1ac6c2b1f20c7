"""ICU Normalizer2 engine + ICUFoldingFilter (utr30) rebuild.

Reference: lucene/analysis/icu/.../ICUFoldingFilter.java loads a custom
Normalizer2 in COMPOSE mode from ``utr30.nrm``, which the module's own
build compiles (build.xml ``gennorm2`` target) from the SHIPPED source
data files ``src/data/utr30/{nfc,nfkc,nfkc_cf,BasicFoldings,
DiacriticFolding,DingbatFolding,HanRadicalFolding,NativeDigitFolding}
.txt`` in that order. This module re-implements the gennorm2 runtime —
recursive decomposition over the merged mapping set, canonical
reordering by ccc, UAX#15 canonical composition over the data's
two-way mappings plus algorithmic Hangul — directly over those same
source files (frozen to fixtures_data/icu_utr30.parquet by
scripts/make_icu_fixture.py; the shipped nfc.txt is the
utr30-specialized variant whose diacritic compositions are already
one-way, so folding never re-composes removed accents).

Verification: the generic engine is validated against CPython's own
``unicodedata`` by rebuilding NFC/NFKC gennorm2 tables from it and
requiring equality over every code point and randomized combining
sequences (tests/test_icunorm.py — engine test with zero
Unicode-version skew), and the utr30 instantiation reproduces every
TestICUFoldingFilter JUnit vector.

ICUNormalizer2Filter's default ``nfkc_cf`` ICU data is NOT shipped in
the reference tree (it lives inside ICU4J); ``nfkc_cf_analog`` is the
documented approximation via unicodedata NFKC + str.casefold iterated
to fixpoint — a declared divergence, not reference-pinned.

Scale: the fold table (~12k mapped code points) ships with the package
and loads lazily once per executor; folding runs as an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = ["Gennorm2", "parse_gennorm2_lines", "utr30_normalizer",
           "icu_fold", "icu_fold_udf", "nfkc_cf_analog"]

_FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")
_UTR30_FIXTURE = os.path.join(_FIX_DIR, "icu_utr30.parquet")

# Hangul algorithmic constants (UAX#15 / Normalizer2 built-in)
_SBASE, _LBASE, _VBASE, _TBASE = 0xAC00, 0x1100, 0x1161, 0x11A7
_LCOUNT, _VCOUNT, _TCOUNT = 19, 21, 28
_NCOUNT = _VCOUNT * _TCOUNT
_SCOUNT = _LCOUNT * _NCOUNT


def parse_gennorm2_lines(lines, state=None):
    """Parse gennorm2 source syntax into (ccc, mappings) dicts.

    Grammar (as used by the shipped files): ``cp[..cp]:ccc`` assigns a
    combining class; ``cp=seq`` a two-way (round-trip) mapping;
    ``cp[..cp]>seq`` a one-way mapping (empty seq = removal). ``#``
    starts a comment, ``*`` lines are directives. A later line for the
    same code point overrides an earlier one (gennorm2 multi-file
    override semantics, which the build relies on across its 8 files).
    """
    if state is None:
        ccc: Dict[int, int] = {}
        mappings: Dict[int, Tuple[Optional[Tuple[int, ...]], bool]] = {}
    else:
        ccc, mappings = state
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line or line.startswith("*"):
            continue
        if "=" in line:
            lhs, rhs = line.split("=", 1)
            cps = [int(lhs, 16)]
            seq = tuple(int(t, 16) for t in rhs.split())
            for cp in cps:
                mappings[cp] = (seq, True)
        elif ">" in line:
            lhs, rhs = line.split(">", 1)
            if ".." in lhs:
                a, b = lhs.split("..")
                cps = range(int(a, 16), int(b, 16) + 1)
            else:
                cps = [int(lhs, 16)]
            seq = tuple(int(t, 16) for t in rhs.split())
            for cp in cps:
                mappings[cp] = (seq, False)
        elif ":" in line:
            lhs, rhs = line.split(":", 1)
            if ".." in lhs:
                a, b = lhs.split("..")
                cps = range(int(a, 16), int(b, 16) + 1)
            else:
                cps = [int(lhs, 16)]
            v = int(rhs)
            for cp in cps:
                ccc[cp] = v
        else:
            raise ValueError(f"unparseable gennorm2 line: {raw!r}")
    return ccc, mappings


class Gennorm2:
    """COMPOSE-mode Normalizer2 over parsed gennorm2 tables."""

    def __init__(self, ccc: Dict[int, int],
                 mappings: Dict[int, Tuple[Optional[Tuple[int, ...]], bool]]):
        self.ccc = ccc
        self.decomp = {cp: seq for cp, (seq, _) in mappings.items()}
        # composition pairs: two-way mappings of length 2 recompose
        self.pairs = {
            (seq[0], seq[1]): cp
            for cp, (seq, twoway) in mappings.items()
            if twoway and len(seq) == 2
        }

    # -- decomposition ----------------------------------------------
    def _decompose_cp(self, cp: int, out: List[int]) -> None:
        seq = self.decomp.get(cp)
        if seq is not None:
            for c in seq:
                self._decompose_cp(c, out)
            return
        if _SBASE <= cp < _SBASE + _SCOUNT:
            sindex = cp - _SBASE
            out.append(_LBASE + sindex // _NCOUNT)
            out.append(_VBASE + (sindex % _NCOUNT) // _TCOUNT)
            t = sindex % _TCOUNT
            if t:
                out.append(_TBASE + t)
            return
        out.append(cp)

    # -- canonical ordering (UAX#15 stable bubble) -------------------
    def _reorder(self, cps: List[int]) -> None:
        ccc = self.ccc
        n = len(cps)
        i = 1
        while i < n:
            c = ccc.get(cps[i], 0)
            if c:
                j = i
                while j > 0 and ccc.get(cps[j - 1], 0) > c:
                    cps[j - 1], cps[j] = cps[j], cps[j - 1]
                    j -= 1
            i += 1

    # -- canonical composition ---------------------------------------
    def _pair_compose(self, a: int, b: int) -> Optional[int]:
        if _LBASE <= a < _LBASE + _LCOUNT and _VBASE <= b < _VBASE + _VCOUNT:
            return (_SBASE + ((a - _LBASE) * _VCOUNT + (b - _VBASE))
                    * _TCOUNT)
        if (_SBASE <= a < _SBASE + _SCOUNT
                and (a - _SBASE) % _TCOUNT == 0
                and _TBASE < b < _TBASE + _TCOUNT):
            return a + (b - _TBASE)
        return self.pairs.get((a, b))

    def _compose(self, cps: List[int]) -> List[int]:
        out: List[int] = []
        starter = -1
        prev_cc = 0
        for cp in cps:
            cc = self.ccc.get(cp, 0)
            if starter >= 0 and (prev_cc < cc or starter == len(out) - 1):
                p = self._pair_compose(out[starter], cp)
                if p is not None:
                    out[starter] = p
                    continue
            out.append(cp)
            if cc == 0:
                starter = len(out) - 1
            prev_cc = cc
        return out

    def normalize(self, s: str) -> str:
        cps: List[int] = []
        for ch in s:
            self._decompose_cp(ord(ch), cps)
        self._reorder(cps)
        return "".join(map(chr, self._compose(cps)))


_utr30_cache: Optional[Gennorm2] = None


def utr30_normalizer() -> Gennorm2:
    """The ICUFoldingFilter normalizer, from the frozen shipped data."""
    global _utr30_cache
    if _utr30_cache is None:
        import pyarrow.parquet as pq

        t = pq.read_table(_UTR30_FIXTURE).to_pydict()
        ccc: Dict[int, int] = {}
        mappings: Dict[int, Tuple[Optional[Tuple[int, ...]], bool]] = {}
        for cp, kind, val, two in zip(t["cp"], t["kind"], t["val"],
                                      t["twoway"]):
            if kind == "ccc":
                ccc[cp] = int(val)
            else:
                seq = tuple(int(x, 16) for x in val.split()) if val else ()
                mappings[cp] = (seq, bool(two))
        _utr30_cache = Gennorm2(ccc, mappings)
    return _utr30_cache


def icu_fold(s: str) -> str:
    """ICUFoldingFilter.normalize: utr30 COMPOSE normalization."""
    return utr30_normalizer().normalize(s)


@F.pandas_udf(StringType())
def _icu_fold_pd(texts: pd.Series) -> pd.Series:
    n = utr30_normalizer()
    return texts.map(lambda s: n.normalize(s) if s is not None else None)


def icu_fold_udf(col) -> Column:
    """Arrow-batched utr30 folding of a string column."""
    return _icu_fold_pd(col)


def nfkc_cf_analog(s: str) -> str:
    """ICUNormalizer2Filter default-mode analog. The real nfkc_cf data
    ships inside ICU4J, not in the reference tree; this is unicodedata
    NFKC + casefold iterated to fixpoint — a DECLARED approximation."""
    import unicodedata

    prev = None
    while s != prev:
        prev = s
        s = unicodedata.normalize("NFKC", s.casefold())
    return s
