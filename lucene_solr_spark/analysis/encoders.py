"""Phonetic encoders: the PhoneticFilterFactory registry, rebuilt.

The reference's phonetic module wraps commons-codec encoders
(lucene/analysis/phonetic/src/java/.../PhoneticFilterFactory.java
registry — Metaphone, DoubleMetaphone, Soundex, RefinedSoundex,
Caverphone 2.0, ColognePhonetic, Nysiis — plus
DaitchMokotoffSoundexFilter.java).  Soundex lives in
analysis/phonetic.py (it doubles as Spark's built-in F.soundex); this
module carries the other seven, each implemented fresh from the
published algorithm (Philips 1990 Metaphone / Philips 2000 Double
Metaphone / Hood 2004 Caverphone 2.0 / Postel 1969 Kölner Phonetik /
Taft 1970 NYSIIS / the Daitch-Mokotoff coding chart) to commons-codec
semantics, and verified word-for-word against the real commons-codec
library running in PySpark's own JVM over the full 27.8k-word KStem
vocabulary plus branch-probe names
(scripts/make_phonetic_fixture.py; zero mismatches required at
fixture build).

All encoders expect a single token; they uppercase/clean internally
(matching the commons-codec contract the reference's filters rely on).
"""

from __future__ import annotations

__all__ = [
    "metaphone", "double_metaphone", "double_metaphone_alternate",
    "refined_soundex", "caverphone2", "cologne_phonetic", "nysiis",
    "daitch_mokotoff",
]


def _letters_upper(s: str) -> str:
    return "".join(c for c in s.upper() if "A" <= c <= "Z")


# --------------------------------------------------------------- refined
# Refined Soundex: first letter + per-letter digit, adjacent duplicate
# digits collapsed, no length cap.
_REFINED = {}
for _c, _d in zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                  "01360240043788015936020505"):
    _REFINED[_c] = _d


def refined_soundex(term: str) -> str:
    t = _letters_upper(term)
    if not t:
        return ""
    out = [t[0]]
    last = None
    for ch in t:
        d = _REFINED[ch]
        if d != last:
            out.append(d)
        last = d
    return "".join(out)


# ---------------------------------------------------------------- nysiis
_NY_VOWELS = frozenset("AEIOU")


def nysiis(term: str, strict: bool = True) -> str:
    t = _letters_upper(term)
    if not t:
        return ""
    # first-character translations
    if t.startswith("MAC"):
        t = "MCC" + t[3:]
    elif t.startswith("KN"):
        t = "NN" + t[2:]
    elif t.startswith("K"):
        t = "C" + t[1:]
    elif t.startswith(("PH", "PF")):
        t = "FF" + t[2:]
    elif t.startswith("SCH"):
        t = "SSS" + t[3:]
    # last-character translations
    if t.endswith(("EE", "IE")):
        t = t[:-2] + "Y"
    elif t.endswith(("DT", "RT", "RD", "NT", "ND")):
        t = t[:-2] + "D"

    chars = list(t)
    key = [chars[0]]
    n = len(chars)
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        anext = chars[i + 2] if i < n - 2 else " "
        prev, cur = chars[i - 1], chars[i]
        if cur == "E" and nxt == "V":
            repl = "AF"
        elif cur in _NY_VOWELS:
            repl = "A"
        elif cur == "Q":
            repl = "G"
        elif cur == "Z":
            repl = "S"
        elif cur == "M":
            repl = "N"
        elif cur == "K":
            repl = "NN" if nxt == "N" else "C"
        elif cur == "S" and nxt == "C" and anext == "H":
            repl = "SSS"
        elif cur == "P" and nxt == "H":
            repl = "FF"
        elif cur == "H" and (prev not in _NY_VOWELS
                             or nxt not in _NY_VOWELS):
            repl = prev
        elif cur == "W" and prev in _NY_VOWELS:
            repl = prev
        else:
            repl = cur
        # the transcoded chars overwrite the working array in place,
        # feeding later iterations (commons-codec Nysiis semantics)
        for k, c in enumerate(repl):
            if i + k < n:
                chars[i + k] = c
        if chars[i] != key[-1]:
            key.append(chars[i])

    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if key and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ----------------------------------------------------------- caverphone2
import re as _re

_CV2_STEPS: list[tuple] = []  # built lazily below


def caverphone2(term: str) -> str:
    """Caverphone 2.0 (Hood 2004), commons-codec step order."""
    txt = _re.sub(r"[^a-z]", "", term.lower())
    for pat, rep in _cv2_steps():
        txt = pat.sub(rep, txt)
    return (txt + "1111111111")[:10]


def _cv2_steps():
    if _CV2_STEPS:
        return _CV2_STEPS
    steps = [
        (r"e$", ""),
        (r"^cough", "cou2f"), (r"^rough", "rou2f"), (r"^tough", "tou2f"),
        (r"^enough", "enou2f"), (r"^trough", "trou2f"),
        (r"^gn", "2n"), (r"mb$", "m2"),
        (r"cq", "2q"), (r"ci", "si"), (r"ce", "se"), (r"cy", "sy"),
        (r"tch", "2ch"), (r"c", "k"), (r"q", "k"), (r"x", "k"),
        (r"v", "f"), (r"dg", "2g"), (r"tio", "sio"), (r"tia", "sia"),
        (r"d", "t"), (r"ph", "fh"), (r"b", "p"), (r"sh", "s2"),
        (r"z", "s"),
        (r"^[aeiou]", "A"), (r"[aeiou]", "3"),
        (r"j", "y"), (r"^y3", "Y3"), (r"^y", "A"), (r"y", "3"),
        (r"3gh3", "3kh3"), (r"gh", "22"), (r"g", "k"),
        (r"s+", "S"), (r"t+", "T"), (r"p+", "P"), (r"k+", "K"),
        (r"f+", "F"), (r"m+", "M"), (r"n+", "N"),
        (r"w3", "W3"), (r"wh3", "Wh3"), (r"w$", "3"), (r"w", "2"),
        (r"^h", "A"), (r"h", "2"),
        (r"r3", "R3"), (r"r$", "3"), (r"r", "2"),
        (r"l3", "L3"), (r"l$", "3"), (r"l", "2"),
        (r"2", ""), (r"3$", "A"), (r"3", ""),
    ]
    _CV2_STEPS.extend((_re.compile(p), r) for p, r in steps)
    return _CV2_STEPS


# --------------------------------------------------------------- cologne
def cologne_phonetic(term: str) -> str:
    """Kölner Phonetik (Postel 1969), commons-codec semantics."""
    t = _letters_upper(term)
    n = len(t)
    codes: list[str] = []
    for i, ch in enumerate(t):
        prev = t[i - 1] if i > 0 else ""
        nxt = t[i + 1] if i < n - 1 else ""
        if ch in "AEIJOUY":
            code = "0"
        elif ch == "B":
            code = "1"
        elif ch == "P":
            code = "3" if nxt == "H" else "1"
        elif ch in "DT":
            code = "8" if (nxt and nxt in "CSZ") else "2"
        elif ch in "FVW":
            code = "3"
        elif ch in "GKQ":
            code = "4"
        elif ch == "X":
            code = "8" if (prev and prev in "CKQ") else "48"
        elif ch == "S" or ch == "Z":
            code = "8"
        elif ch == "C":
            if i == 0:
                code = "4" if (nxt and nxt in "AHKLOQRUX") else "8"
            elif prev and prev in "SZ":
                code = "8"
            else:
                code = "4" if (nxt and nxt in "AHKOQUX") else "8"
        elif ch == "H":
            code = "-"
        elif ch == "L":
            code = "5"
        elif ch in "MN":
            code = "6"
        elif ch == "R":
            code = "7"
        else:
            code = "-"
        codes.append(code)
    # collapse adjacent duplicates ('-' breaks nothing: it is dropped
    # after dedup, commons-codec keeps lastCode across it)
    out: list[str] = []
    last = ""
    for code in codes:
        for c in code:
            if c != last:
                out.append(c)
            last = c
    res = "".join(c for c in out if c != "-")
    if not res:
        return ""
    return res[0] + res[1:].replace("0", "")


# ------------------------------------------------------------- metaphone
_FRONTV = "EIY"


def metaphone(term: str, max_code_len: int = 4) -> str:
    """Metaphone (Philips 1990), commons-codec variant."""
    txt = _letters_upper(term)
    if not txt:
        return ""
    if len(txt) == 1:
        return txt
    # initial-pair exceptions
    c0, c1 = txt[0], txt[1]
    if c0 in "KGP" and c1 == "N":
        local = txt[1:]
    elif c0 == "A" and c1 == "E":
        local = txt[1:]
    elif c0 == "W" and c1 == "R":
        local = txt[1:]
    elif c0 == "W" and c1 == "H":
        local = "W" + txt[2:]
    elif c0 == "X":
        local = "S" + txt[1:]
    else:
        local = txt
    wdsz = len(local)
    code: list[str] = []
    n = 0

    def vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in "AEIOU"

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, s: str) -> bool:
        return local[i:i + len(s)] == s

    while len(code) < max_code_len and n < wdsz:
        sym = local[n]
        if sym != "C" and prev_is(n, sym):
            n += 1
            continue
        if sym in "AEIOU":
            if n == 0:
                code.append(sym)
        elif sym == "B":
            if not (prev_is(n, "M") and n == wdsz - 1):
                code.append("B")
        elif sym == "C":
            if (prev_is(n, "S") and n + 1 < wdsz
                    and local[n + 1] in _FRONTV):
                pass  # SCE/SCI/SCY: silent C
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and vowel(2):
                    code.append("K")  # initial CH + vowel: hard K
                else:
                    code.append("X")
            else:
                code.append("K")
        elif sym == "D":
            if (n + 2 < wdsz and next_is(n, "G")
                    and local[n + 2] in _FRONTV):
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif sym == "G":
            silent = False
            if n + 2 == wdsz and next_is(n, "H"):
                silent = True  # -GH
            elif (n + 2 < wdsz and next_is(n, "H")
                    and not vowel(n + 2)):
                silent = True  # GH + consonant
            if (n > 0 and (region(n, "GN")
                           or (n + 4 == wdsz and region(n, "GNED")))):
                silent = True
            hard = prev_is(n, "G")
            if not silent:
                if (n + 1 < wdsz and local[n + 1] in _FRONTV
                        and not hard):
                    code.append("J")
                else:
                    code.append("K")
        elif sym == "H":
            if n + 1 == wdsz:
                pass  # terminal H
            elif n > 0 and local[n - 1] in "CSPTG":
                pass
            elif vowel(n + 1):
                code.append("H")
        elif sym in "FJLMNR":
            code.append(sym)
        elif sym == "K":
            if n > 0:
                if not prev_is(n, "C"):
                    code.append("K")
            else:
                code.append("K")
        elif sym == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif sym == "Q":
            code.append("K")
        elif sym == "S":
            if (region(n, "SH") or region(n, "SIO")
                    or region(n, "SIA")):
                code.append("X")
            else:
                code.append("S")
        elif sym == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in TCH
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif sym == "V":
            code.append("F")
        elif sym in "WY":
            if n + 1 < wdsz and vowel(n + 1):
                code.append(sym)
        elif sym == "X":
            code.append("K")
            code.append("S")
        elif sym == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_code_len])


# ------------------------------------------------- double metaphone
# Philips, "The Double Metaphone Search Algorithm", C/C++ Users
# Journal 2000; branch conditions follow the commons-codec variant the
# reference's DoubleMetaphoneFilter wraps.
_DM_VOW = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SP = ("L", "R", "N", "M", "B", "H", "F", "V", "W",
                         " ")
_ES_EP_EB = ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE",
             "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    __slots__ = ("p", "a", "cap")

    def __init__(self, cap: int):
        self.p: list[str] = []
        self.a: list[str] = []
        self.cap = cap

    def add(self, prim: str, alt: str | None = None) -> None:
        if alt is None:
            alt = prim
        self.add_p(prim)
        self.add_a(alt)

    def add_p(self, s: str) -> None:
        for c in s:
            if len(self.p) < self.cap:
                self.p.append(c)

    def add_a(self, s: str) -> None:
        # a literal ' ' can land in the code (terminal-J alternate),
        # matching the reference byte-for-byte
        for c in s:
            if len(self.a) < self.cap:
                self.a.append(c)

    def complete(self) -> bool:
        return len(self.p) >= self.cap and len(self.a) >= self.cap


def _dm_encode(term: str, max_code_len: int) -> tuple[str, str]:
    v = term.strip().upper()
    if not v:
        return "", ""
    slavo = ("W" in v or "K" in v or "CZ" in v or "WITZ" in v)
    n = len(v)

    def cat(i: int) -> str:
        return v[i] if 0 <= i < n else ""

    def vow(i: int) -> bool:
        return 0 <= i < n and v[i] in _DM_VOW

    def has(start: int, length: int, *crit: str) -> bool:
        if start < 0 or start + length > n:
            return False
        return v[start:start + length] in crit

    r = _DMResult(max_code_len)
    i = 1 if v[:2] in _SILENT_START else 0

    # condition helpers --------------------------------------------
    def cond_c0(i: int) -> bool:
        if has(i, 4, "CHIA"):
            return True
        if i <= 1 or vow(i - 2) or not has(i - 1, 3, "ACH"):
            return False
        c = cat(i + 2)
        return (c not in ("I", "E")) or has(i - 2, 6, "BACHER", "MACHER")

    def cond_ch0(i: int) -> bool:
        if i != 0:
            return False
        if not (has(i + 1, 5, "HARAC", "HARIS")
                or has(i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
            return False
        return not has(0, 5, "CHORE")

    def cond_ch1(i: int) -> bool:
        return (has(0, 4, "VAN ", "VON ") or has(0, 3, "SCH")
                or has(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                or has(i + 2, 1, "T", "S")
                or ((has(i - 1, 1, "A", "O", "U", "E") or i == 0)
                    and (has(i + 2, 1, *_L_R_N_M_B_H_F_V_W_SP)
                         or i + 1 == n - 1)))

    def cond_l0(i: int) -> bool:
        if i == n - 3 and has(i - 1, 4, "ILLO", "ILLA", "ALLE"):
            return True
        return ((has(n - 2, 2, "AS", "OS") or has(n - 1, 1, "A", "O"))
                and has(i - 1, 4, "ALLE"))

    def cond_m0(i: int) -> bool:
        if cat(i + 1) == "M":
            return True
        return (has(i - 1, 3, "UMB")
                and (i + 1 == n - 1 or has(i + 2, 2, "ER")))

    # handlers ------------------------------------------------------
    def h_ch(i: int) -> int:
        if i > 0 and has(i, 4, "CHAE"):
            r.add("K", "X")  # Michael
            return i + 2
        if cond_ch0(i) or cond_ch1(i):
            r.add("K")  # Greek/Germanic kh-sound
            return i + 2
        if i > 0:
            if has(0, 2, "MC"):
                r.add("K")
            else:
                r.add("X", "K")
        else:
            r.add("X")
        return i + 2

    def h_cc(i: int) -> int:
        if has(i + 2, 1, "I", "E", "H") and not has(i + 2, 2, "HU"):
            if ((i == 1 and cat(i - 1) == "A")
                    or has(i - 1, 5, "UCCEE", "UCCES")):
                r.add("KS")  # accident, succeed
            else:
                r.add("X")  # bacci, bertucci
            return i + 3
        r.add("K")  # Pierce's rule
        return i + 2

    def h_c(i: int) -> int:
        if cond_c0(i):
            r.add("K")
            return i + 2
        if i == 0 and has(i, 6, "CAESAR"):
            r.add("S")
            return i + 2
        if has(i, 2, "CH"):
            return h_ch(i)
        if has(i, 2, "CZ") and not has(i - 2, 4, "WICZ"):
            r.add("S", "X")  # Czerny
            return i + 2
        if has(i + 1, 3, "CIA"):
            r.add("X")  # focaccia
            return i + 3
        if has(i, 2, "CC") and not (i == 1 and cat(0) == "M"):
            return h_cc(i)
        if has(i, 2, "CK", "CG", "CQ"):
            r.add("K")
            return i + 2
        if has(i, 2, "CI", "CE", "CY"):
            if has(i, 3, "CIO", "CIE", "CIA"):
                r.add("S", "X")
            else:
                r.add("S")
            return i + 2
        r.add("K")
        if has(i + 1, 2, " C", " Q", " G"):
            return i + 3  # Mac Caffrey
        if has(i + 1, 1, "C", "K", "Q") and not has(i + 1, 2, "CE", "CI"):
            return i + 2
        return i + 1

    def h_d(i: int) -> int:
        if has(i, 2, "DG"):
            if has(i + 2, 1, "I", "E", "Y"):
                r.add("J")  # edge
                return i + 3
            r.add("TK")  # Edgar
            return i + 2
        if has(i, 2, "DT", "DD"):
            r.add("T")
            return i + 2
        r.add("T")
        return i + 1

    def h_gh(i: int) -> int:
        if i > 0 and not vow(i - 1):
            r.add("K")
            return i + 2
        if i == 0:
            if cat(i + 2) == "I":
                r.add("J")  # ghislane
            else:
                r.add("K")  # ghent
            return i + 2
        if ((i > 1 and has(i - 2, 1, "B", "H", "D"))
                or (i > 2 and has(i - 3, 1, "B", "H", "D"))
                or (i > 3 and has(i - 4, 1, "B", "H"))):
            return i + 2  # Parker's rule: hugh
        if (i > 2 and cat(i - 1) == "U"
                and has(i - 3, 1, "C", "G", "L", "R", "T")):
            r.add("F")  # laugh, cough, rough
        elif i > 0 and cat(i - 1) != "I":
            r.add("K")
        return i + 2

    def h_g(i: int) -> int:
        if cat(i + 1) == "H":
            return h_gh(i)
        if cat(i + 1) == "N":
            if i == 1 and vow(0) and not slavo:
                r.add("KN", "N")
            elif not has(i + 2, 2, "EY") and cat(i + 1) != "Y" \
                    and not slavo:
                r.add("N", "KN")
            else:
                r.add("KN")
            return i + 2
        if has(i + 1, 2, "LI") and not slavo:
            r.add("KL", "L")
            return i + 2
        if i == 0 and (cat(i + 1) == "Y" or has(i + 1, 2, *_ES_EP_EB)):
            r.add("K", "J")  # ges-, gy-
            return i + 2
        if ((has(i + 1, 2, "ER") or cat(i + 1) == "Y")
                and not has(0, 6, "DANGER", "RANGER", "MANGER")
                and not has(i - 1, 1, "E", "I")
                and not has(i - 1, 3, "RGY", "OGY")):
            r.add("K", "J")  # -ger-, -gy-
            return i + 2
        if has(i + 1, 1, "E", "I", "Y") or has(i - 1, 4, "AGGI", "OGGI"):
            if (has(0, 4, "VAN ", "VON ") or has(0, 3, "SCH")
                    or has(i + 1, 2, "ET")):
                r.add("K")  # germanic
            elif has(i + 1, 3, "IER"):
                r.add("J")
            else:
                r.add("J", "K")
            return i + 2
        if cat(i + 1) == "G":
            r.add("K")
            return i + 2
        r.add("K")
        return i + 1

    def h_h(i: int) -> int:
        if (i == 0 or vow(i - 1)) and vow(i + 1):
            r.add("H")  # keep between vowels / leading before vowel
            return i + 2
        return i + 1

    def h_j(i: int) -> int:
        if has(i, 4, "JOSE") or has(0, 4, "SAN "):
            if (i == 0 and cat(i + 4) == " ") or n == 4 \
                    or has(0, 4, "SAN "):
                r.add("H")  # Jose, San Jacinto
            else:
                r.add("J", "H")
            return i + 1
        if i == 0:
            r.add("J", "A")  # Yankelovich/Jankelowicz
        elif (vow(i - 1) and not slavo
                and cat(i + 1) in ("A", "O")):
            r.add("J", "H")  # bajador
        elif i == n - 1:
            r.add("J", " ")
        elif (not has(i + 1, 1, *_L_T_K_S_N_M_B_Z)
                and not has(i - 1, 1, "S", "K", "L")):
            r.add("J")
        return i + 2 if cat(i + 1) == "J" else i + 1

    def h_l(i: int) -> int:
        if cat(i + 1) == "L":
            if cond_l0(i):
                r.add_p("L")  # spanish ll: alternate drops it
            else:
                r.add("L")
            return i + 2
        r.add("L")
        return i + 1

    def h_p(i: int) -> int:
        if cat(i + 1) == "H":
            r.add("F")
            return i + 2
        r.add("P")
        return i + 2 if has(i + 1, 1, "P", "B") else i + 1

    def h_r(i: int) -> int:
        if (i == n - 1 and not slavo and has(i - 2, 2, "IE")
                and not has(i - 4, 2, "ME", "MA")):
            r.add_a("R")  # french rogier
        else:
            r.add("R")
        return i + 2 if cat(i + 1) == "R" else i + 1

    def h_sc(i: int) -> int:
        if cat(i + 2) == "H":
            # Schlesinger's rule
            if has(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                if has(i + 3, 2, "ER", "EN"):
                    r.add("X", "SK")  # schermerhorn, schenker
                else:
                    r.add("SK")  # school, schooner
            elif i == 0 and not vow(3) and cat(3) != "W":
                r.add("X", "S")
            else:
                r.add("X")
        elif has(i + 2, 1, "I", "E", "Y"):
            r.add("S")
        else:
            r.add("SK")
        return i + 3

    def h_s(i: int) -> int:
        if has(i - 1, 3, "ISL", "YSL"):
            return i + 1  # island, isle: silent s
        if i == 0 and has(i, 5, "SUGAR"):
            r.add("X", "S")
            return i + 1
        if has(i, 2, "SH"):
            if has(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                r.add("S")  # germanic
            else:
                r.add("X")
            return i + 2
        if has(i, 3, "SIO", "SIA") or has(i, 4, "SIAN"):
            if slavo:
                r.add("S")
            else:
                r.add("S", "X")
            return i + 3
        if (i == 0 and has(i + 1, 1, "M", "N", "L", "W")) \
                or has(i + 1, 1, "Z"):
            r.add("S", "X")  # smith ~ schmidt
            return i + 2 if has(i + 1, 1, "Z") else i + 1
        if has(i, 2, "SC"):
            return h_sc(i)
        if i == n - 1 and has(i - 2, 2, "AI", "OI"):
            r.add_a("S")  # resnais, artois
        else:
            r.add("S")
        return i + 2 if has(i + 1, 1, "S", "Z") else i + 1

    def h_t(i: int) -> int:
        if has(i, 4, "TION"):
            r.add("X")
            return i + 3
        if has(i, 3, "TIA", "TCH"):
            r.add("X")
            return i + 3
        if has(i, 2, "TH") or has(i, 3, "TTH"):
            if (has(i + 2, 2, "OM", "AM") or has(0, 4, "VAN ", "VON ")
                    or has(0, 3, "SCH")):
                r.add("T")  # thomas, thames
            else:
                r.add("0", "T")
            return i + 2
        r.add("T")
        return i + 2 if has(i + 1, 1, "T", "D") else i + 1

    def h_w(i: int) -> int:
        if has(i, 2, "WR"):
            r.add("R")
            return i + 2
        if i == 0 and (vow(i + 1) or has(i, 2, "WH")):
            if vow(i + 1):
                r.add("A", "F")  # Wasserman ~ Vasserman
            else:
                r.add("A")  # Uomo ~ Womo
            return i + 1
        if ((i == n - 1 and vow(i - 1))
                or has(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or has(0, 3, "SCH")):
            r.add_a("F")  # Arnow ~ Arnoff
            return i + 1
        if has(i, 4, "WICZ", "WITZ"):
            r.add("TS", "FX")  # filipowicz
            return i + 4
        return i + 1

    def h_x(i: int) -> int:
        if i == 0:
            r.add("S")
            return i + 1
        if not (i == n - 1 and (has(i - 3, 3, "IAU", "EAU")
                                or has(i - 2, 2, "AU", "OU"))):
            r.add("KS")  # breaux keeps silent
        return i + 2 if has(i + 1, 1, "C", "X") else i + 1

    def h_z(i: int) -> int:
        if cat(i + 1) == "H":
            r.add("J")  # zhao
            return i + 2
        if has(i + 1, 2, "ZO", "ZI", "ZA") \
                or (slavo and i > 0 and cat(i - 1) != "T"):
            r.add("S", "TS")
        else:
            r.add("S")
        return i + 2 if cat(i + 1) == "Z" else i + 1

    while not r.complete() and i < n:
        ch = v[i]
        if ch in _DM_VOW:
            if i == 0:
                r.add("A")
            i += 1
        elif ch == "B":
            r.add("P")
            i += 2 if cat(i + 1) == "B" else 1
        elif ch == "C":
            i = h_c(i)
        elif ch == "D":
            i = h_d(i)
        elif ch == "F":
            r.add("F")
            i += 2 if cat(i + 1) == "F" else 1
        elif ch == "G":
            i = h_g(i)
        elif ch == "H":
            i = h_h(i)
        elif ch == "J":
            i = h_j(i)
        elif ch == "K":
            r.add("K")
            i += 2 if cat(i + 1) == "K" else 1
        elif ch == "L":
            i = h_l(i)
        elif ch == "M":
            r.add("M")
            i += 2 if cond_m0(i) else 1
        elif ch == "N":
            r.add("N")
            i += 2 if cat(i + 1) == "N" else 1
        elif ch == "P":
            i = h_p(i)
        elif ch == "Q":
            r.add("K")
            i += 2 if cat(i + 1) == "Q" else 1
        elif ch == "R":
            i = h_r(i)
        elif ch == "S":
            i = h_s(i)
        elif ch == "T":
            i = h_t(i)
        elif ch == "V":
            r.add("F")
            i += 2 if cat(i + 1) == "V" else 1
        elif ch == "W":
            i = h_w(i)
        elif ch == "X":
            i = h_x(i)
        elif ch == "Z":
            i = h_z(i)
        else:
            i += 1
    return "".join(r.p), "".join(r.a)


def double_metaphone(term: str, max_code_len: int = 4) -> str:
    return _dm_encode(term, max_code_len)[0]


def double_metaphone_alternate(term: str, max_code_len: int = 4) -> str:
    return _dm_encode(term, max_code_len)[1]


# ------------------------------------------------------ daitch-mokotoff
# The published Daitch-Mokotoff coding chart (Avotaynu 1985;
# https://www.jewishgen.org/InfoFiles/Soundex.html), in the
# (at-start, before-vowel, otherwise) form commons-codec's
# DaitchMokotoffSoundex uses; "|" marks alternate branch codes.
_DM_CHART = {
    "a": ("0", "", ""), "e": ("0", "", ""), "i": ("0", "", ""),
    "o": ("0", "", ""), "u": ("0", "", ""), "y": ("1", "", ""),
    "b": ("7", "7", "7"), "d": ("3", "3", "3"), "f": ("7", "7", "7"),
    "g": ("5", "5", "5"), "h": ("5", "5", ""), "k": ("5", "5", "5"),
    "l": ("8", "8", "8"), "m": ("6", "6", "6"), "n": ("6", "6", "6"),
    "p": ("7", "7", "7"), "q": ("5", "5", "5"), "r": ("9", "9", "9"),
    "s": ("4", "4", "4"), "t": ("3", "3", "3"), "v": ("7", "7", "7"),
    "w": ("7", "7", "7"), "x": ("5", "54", "54"), "z": ("4", "4", "4"),
    "schtsch": ("2", "4", "4"), "schtsh": ("2", "4", "4"),
    "schtch": ("2", "4", "4"), "shtch": ("2", "4", "4"),
    "shtsh": ("2", "4", "4"), "stsch": ("2", "4", "4"),
    "ttsch": ("4", "4", "4"), "zhdzh": ("2", "4", "4"),
    "shch": ("2", "4", "4"), "scht": ("2", "43", "43"),
    "schd": ("2", "43", "43"), "stch": ("2", "4", "4"),
    "strz": ("2", "4", "4"), "strs": ("2", "4", "4"),
    "stsh": ("2", "4", "4"), "szcz": ("2", "4", "4"),
    "szcs": ("2", "4", "4"), "ttch": ("4", "4", "4"),
    "tsch": ("4", "4", "4"), "ttsz": ("4", "4", "4"),
    "zdzh": ("2", "4", "4"), "zsch": ("4", "4", "4"),
    "chs": ("5", "54", "54"), "csz": ("4", "4", "4"),
    "czs": ("4", "4", "4"), "drz": ("4", "4", "4"),
    "drs": ("4", "4", "4"), "dsh": ("4", "4", "4"),
    "dsz": ("4", "4", "4"), "dzh": ("4", "4", "4"),
    "dzs": ("4", "4", "4"), "sch": ("4", "4", "4"),
    "sht": ("2", "43", "43"), "szt": ("2", "43", "43"),
    "shd": ("2", "43", "43"), "szd": ("2", "43", "43"),
    "tch": ("4", "4", "4"), "trz": ("4", "4", "4"),
    "trs": ("4", "4", "4"), "tsh": ("4", "4", "4"),
    "tts": ("4", "4", "4"), "ttz": ("4", "4", "4"),
    "tzs": ("4", "4", "4"), "tsz": ("4", "4", "4"),
    "zdz": ("2", "4", "4"), "zhd": ("2", "43", "43"),
    "zsh": ("4", "4", "4"),
    "ai": ("0", "1", ""), "aj": ("0", "1", ""), "ay": ("0", "1", ""),
    "au": ("0", "7", ""), "cz": ("4", "4", "4"), "cs": ("4", "4", "4"),
    "ds": ("4", "4", "4"), "dz": ("4", "4", "4"), "dt": ("3", "3", "3"),
    "ei": ("0", "1", ""), "ej": ("0", "1", ""), "ey": ("0", "1", ""),
    "eu": ("1", "1", ""), "fb": ("7", "7", "7"),
    "ia": ("1", "", ""), "ie": ("1", "", ""), "io": ("1", "", ""),
    "iu": ("1", "", ""), "ks": ("5", "54", "54"), "kh": ("5", "5", "5"),
    "mn": ("66", "66", "66"), "nm": ("66", "66", "66"),
    "oi": ("0", "1", ""), "oj": ("0", "1", ""), "oy": ("0", "1", ""),
    "pf": ("7", "7", "7"), "ph": ("7", "7", "7"), "sh": ("4", "4", "4"),
    "sc": ("2", "4", "4"), "st": ("2", "43", "43"),
    "sd": ("2", "43", "43"), "sz": ("4", "4", "4"), "th": ("3", "3", "3"),
    "ts": ("4", "4", "4"), "tc": ("4", "4", "4"), "tz": ("4", "4", "4"),
    "ui": ("0", "1", ""), "uj": ("0", "1", ""), "uy": ("0", "1", ""),
    "ue": ("0", "1", ""), "zd": ("2", "43", "43"), "zh": ("4", "4", "4"),
    "zs": ("4", "4", "4"),
    # ambiguous sounds: alternate branches
    "c": ("4|5", "4|5", "4|5"), "ch": ("4|5", "4|5", "4|5"),
    "ck": ("5|45", "5|45", "5|45"), "rs": ("4|94", "4|94", "4|94"),
    "rz": ("4|94", "4|94", "4|94"), "j": ("1|4", "|4", "|4"),
}
_DM_RULES: dict[str, list] = {}
for _p, _r in _DM_CHART.items():
    _DM_RULES.setdefault(_p[0], []).append((_p, _r))
for _lst in _DM_RULES.values():
    _lst.sort(key=lambda pr: -len(pr[0]))
_DM_LEN = 6
_DM_VOWELS = frozenset("aeiou")


def daitch_mokotoff(term: str) -> list[str]:
    """All Daitch-Mokotoff branch codes (6 digits each), first-seen
    order, deduplicated — DaitchMokotoffSoundexFilter emits one token
    per branch."""
    t = "".join(ch for ch in term.lower() if not ch.isspace())
    # branches: (code, last_replacement); dedup on code, keep order
    branches: list[list] = [["", None]]
    last_char = ""
    i = 0
    n = len(t)
    while i < n:
        ch = t[i]
        rules = _DM_RULES.get(ch)
        if rules is None:
            i += 1
            last_char = ch
            continue
        for pattern, (at_start, before_vowel, other) in rules:
            if t.startswith(pattern, i):
                if last_char == "":
                    repl = at_start
                elif (i + len(pattern) < n
                        and t[i + len(pattern)] in _DM_VOWELS):
                    repl = before_vowel
                else:
                    repl = other
                replacements = repl.split("|")
                force = (last_char == "m" and ch == "n") or \
                        (last_char == "n" and ch == "m")
                nxt: list[list] = []
                seen = set()
                for code, last_repl in branches:
                    for r in replacements:
                        c, lr = code, last_repl
                        if (lr is None or not lr.endswith(r) or force) \
                                and len(c) < _DM_LEN:
                            c = (c + r)[:_DM_LEN]
                        lr = r
                        if c not in seen:
                            seen.add(c)
                            nxt.append([c, lr])
                branches = nxt
                i += len(pattern) - 1
                break
        last_char = ch
        i += 1
    out, seen2 = [], set()
    for code, _ in branches:
        code = (code + "000000")[:_DM_LEN]
        if code not in seen2:
            seen2.add(code)
            out.append(code)
    return out
