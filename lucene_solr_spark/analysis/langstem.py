"""Per-language stemmers/normalizers from the reference's
lucene/analysis/common language packages (beyond the Snowball and
UniNE-light families in lightstem.py / snowball_*.py).

Covered (each verified against the reference's own JUnit pair sets,
frozen into the light_stems fixture by scripts/make_lightstem_fixture
.py → tests/test_lightstem.py → the fts_light_stemmers driver gate):

  cs          — CzechStemmer (cz/CzechStemmer.java): case +
                possessive removal, palatalization normalize.
  bg          — BulgarianStemmer (bg/BulgarianStemmer.java): the
                light algorithm of Nakov/Savoy — article, plural,
                trailing-vowel, ен/ъN rewrites.
  lv          — LatvianStemmer (lv/LatvianStemmer.java): light
                stemmer with vowel-count-gated affix table +
                unpalatalization repair.
  hi / hi_norm — HindiStemmer/HindiNormalizer (hi/*.java): the
                Ramanathan-Rao light stemmer; nukta/matra folding.
  bn / bn_norm — BengaliStemmer/BengaliNormalizer (bn/*.java).
  ar_light / ar_norm — ArabicStemmer/ArabicNormalizer (ar/*.java):
                the Larkey light-10 stemmer; harakat/alef folding.
  fa_norm     — PersianNormalizer (fa/PersianNormalizer.java).
  sr_norm     — SerbianNormalizationFilter (sr/*.java): Cyrillic +
                digraph → bald latin.
  ga_lower    — IrishLowerCaseFilter (ga/*.java): n-/t-prothesis
                hyphenation + lowercase.
  id          — IndonesianStemmer (id/IndonesianStemmer.java):
                particle/possessive + first/second-order prefix and
                suffix interplay with REMOVED_* flag gating.
  id_inflectional — same, stemDerivational=false.

Hindi/Bengali suffix cascades and the Latvian affix table are frozen
from the reference data by scripts/make_langstem_tables.py. All pure
str→str, registered in lightstem.STEMMERS.
"""

from __future__ import annotations

import json
import os

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "langstem_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)


def _cascade(table):
    def stem(word: str, _t=table) -> str:
        n = len(word)
        for floor, strip, sufs in _t:
            if n > floor and word.endswith(tuple(sufs)):
                return word[:n - strip]
        return word
    return stem


hindi_stem = _cascade(_T["hindi"])
bengali_stem = _cascade(_T["bengali"])


# --------------------------------------------------------------- Czech

_CS_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CS_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")
_CS_1 = set("aeiouůyáéíýě")


def czech_stem(word: str) -> str:
    s = word
    n = len(s)
    # removeCase
    if n > 7 and s.endswith("atech"):
        s = s[:n - 5]
    elif n > 6 and s.endswith(("ětem", "etem", "atům")):
        s = s[:n - 4]
    elif n > 5 and s.endswith(_CS_3):
        s = s[:n - 3]
    elif n > 4 and s.endswith(_CS_2):
        s = s[:n - 2]
    elif n > 3 and s[-1] in _CS_1:
        s = s[:n - 1]
    # removePossessives
    n = len(s)
    if n > 5 and s.endswith(("ov", "in", "ův")):
        s = s[:n - 2]
    # normalize (palatalization repair)
    if not s:
        return s
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


# ----------------------------------------------------------- Bulgarian

def _bg_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:n - 3]
    if n > 5 and s.endswith(("ът", "то", "те", "та", "ия")):
        return s[:n - 2]
    if n > 4 and s.endswith("ят"):
        return s[:n - 2]
    return s


def _bg_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:n - 3]
        if s.endswith("ове"):
            return s[:n - 3]
        if s.endswith("еве"):
            return s[:n - 3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:n - 3]
        if s.endswith("та"):
            return s[:n - 2]
        if s.endswith("ци"):
            return s[:n - 2] + "к"
        if s.endswith("зи"):
            return s[:n - 2] + "г"
        if s[n - 3] == "е" and s[n - 1] == "и":
            return s[:n - 3] + "я" + s[n - 2]
    if n > 4:
        if s.endswith("си"):
            return s[:n - 2] + "х"
        if s.endswith("и"):
            return s[:n - 1]
    return s


def bulgarian_stem(word: str) -> str:
    s = word
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_article(s)
    s = _bg_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s.endswith(("а", "о", "е")):
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


# ------------------------------------------------------------- Latvian

_LV_AFFIXES = tuple((a, vc, p) for a, vc, p in _T["latvian"])
_LV_VOWELS = set("aeiouāīēū")
_LV_UNPAL = (("pj", None), ("bj", None), ("mj", None), ("vj", None),
             ("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"), ("žļ", "zl"),
             ("ļņ", "ln"), ("ļļ", "ll"))


def _lv_unpalatalize(s: str, removed: str) -> str:
    if removed == "u":
        if s.endswith("kš"):
            return s[:-2] + "kst"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    for pat, rep in _LV_UNPAL:
        if s.endswith(pat):
            return s[:-1] if rep is None else s[:-2] + rep
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_stem(word: str) -> str:
    nv = sum(ch in _LV_VOWELS for ch in word)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(word) >= len(affix) + 3 \
                and word.endswith(affix):
            s = word[:len(word) - len(affix)]
            return _lv_unpalatalize(s, affix[0]) if palatalizes else s
    return word


# -------------------------------------------------- Hindi normalizer

_HI_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}
_HI_DEL = {"़", "‍", "‌", "्"}


def hindi_normalize(word: str) -> str:
    out = []
    i, n = 0, len(word)
    while i < n:
        ch = word[i]
        if ch == "न" and i + 1 < n and word[i + 1] == "्":
            out.append("ं")        # dead n -> bindu
            i += 2
            continue
        if ch in _HI_DEL:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


# ------------------------------------------------ Bengali normalizer

def bengali_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "ঁ":                      # chandrabindu: delete
            del s[i]
            continue
        if ch == "ী":
            s[i] = "ি"
        elif ch == "ূ":
            s[i] = "ু"
        elif ch == "ক":                    # khio
            if i + 2 < len(s) and s[i + 1] == "্" \
                    and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif ch == "ঙ":
            s[i] = "ং"
        elif ch == "য":                    # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue
            if i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif ch == "ব":                    # ba phalaa
            if i == 0 or s[i - 1] != "্":
                i += 1
                continue
            if i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            if i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            if i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif ch == "ঃ":                    # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif ch in ("শ", "ষ"):
            s[i] = "স"
        elif ch == "ণ":
            s[i] = "ন"
        elif ch in ("ড়", "ঢ়"):
            s[i] = "র"
        elif ch == "ৎ":
            s[i] = "ত"
        i += 1
    return "".join(s)


# ------------------------------------------------------ Arabic light

_AR_FOLD = {
    "آ": "ا", "أ": "ا", "إ": "ا",
    "ى": "ي", "ة": "ه",
}
_AR_DEL = set("ـًٌٍَُِّْ")
_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_normalize(word: str) -> str:
    return "".join(
        _AR_FOLD.get(ch, ch) for ch in word if ch not in _AR_DEL)


def arabic_light_stem(word: str) -> str:
    """Larkey light-10: one prefix (wa- needs len>=4, others suffix+2
    remaining), then every listed suffix iteratively (2+ chars left)."""
    s = word
    for p in _AR_PREFIXES:
        if s.startswith(p):
            if len(p) == 1:
                if len(s) >= 4:
                    s = s[len(p):]
                    break
            elif len(s) >= len(p) + 2:
                s = s[len(p):]
                break
    for suf in _AR_SUFFIXES:
        if s.endswith(suf) and len(s) >= len(suf) + 2:
            s = s[:len(s) - len(suf)]
    return s


# --------------------------------------------------- fa / sr / ga

_FA_MAP = {
    "ی": "ي", "ے": "ي", "ک": "ك",
    "ۀ": "ه", "ہ": "ه",
}


def persian_normalize(word: str) -> str:
    return "".join(
        _FA_MAP.get(ch, ch) for ch in word if ch != "ٔ")


_SR_DIGRAPH = {"ђ": "dj", "đ": "dj", "љ": "lj", "њ": "nj", "џ": "dz"}
_SR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h", "ш": "s", "š": "s",
}


def serbian_normalize(word: str) -> str:
    out = []
    for ch in word:
        if ch in _SR_DIGRAPH:
            out.append(_SR_DIGRAPH[ch])
        else:
            out.append(_SR_MAP.get(ch, ch))
    return "".join(out)


_GA_UPPER_VOWELS = set("AEIOUÁÉÍÓÚ")


def irish_lowercase(word: str) -> str:
    """IrishLowerCaseFilter: hyphenate n-/t- prothesis before an upper
    vowel, then lowercase."""
    if len(word) > 1 and word[0] in "nt" \
            and word[1] in _GA_UPPER_VOWELS:
        return word[0] + "-" + word[1:].lower()
    return word.lower()


# ---------------------------------------------------- Indonesian

_ID_VOWELS = set("aeiou")


def _id_stem(word: str, derivational: bool) -> str:
    s = word
    syl = sum(ch in _ID_VOWELS for ch in s)
    flags = 0
    K_KE, K_PENG, K_DI, K_MENG, K_TER, K_BER, K_PE = (
        1, 2, 4, 8, 16, 32, 64)

    def particle(s, syl):
        if syl > 2 and s.endswith(("kah", "lah", "pun")):
            return s[:-3], syl - 1
        return s, syl

    def possessive(s, syl):
        if syl > 2:
            if s.endswith(("ku", "mu")):
                return s[:-2], syl - 1
            if s.endswith("nya"):
                return s[:-3], syl - 1
        return s, syl

    s, syl = particle(s, syl)
    s, syl = possessive(s, syl)
    if not derivational:
        return s

    def first_order(s, syl, flags):
        if s.startswith("meng"):
            return s[4:], syl - 1, flags | K_MENG
        if s.startswith("meny") and len(s) > 4 and s[4] in _ID_VOWELS:
            return "s" + s[4:], syl - 1, flags | K_MENG
        if s.startswith(("men", "mem")):
            return s[3:], syl - 1, flags | K_MENG
        if s.startswith("me"):
            return s[2:], syl - 1, flags | K_MENG
        if s.startswith("peng"):
            return s[4:], syl - 1, flags | K_PENG
        if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
            return "s" + s[4:], syl - 1, flags | K_PENG
        if s.startswith("peny"):
            return s[4:], syl - 1, flags | K_PENG
        if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
            return "t" + s[3:], syl - 1, flags | K_PENG
        if s.startswith(("pen", "pem")):
            return s[3:], syl - 1, flags | K_PENG
        if s.startswith("di"):
            return s[2:], syl - 1, flags | K_DI
        if s.startswith("ter"):
            return s[3:], syl - 1, flags | K_TER
        if s.startswith("ke"):
            return s[2:], syl - 1, flags | K_KE
        return s, syl, flags

    def second_order(s, syl, flags):
        if s.startswith("ber"):
            return s[3:], syl - 1, flags | K_BER
        if s == "belajar":
            return s[3:], syl - 1, flags | K_BER
        if s.startswith("be") and len(s) > 4 \
                and s[2] not in _ID_VOWELS and s[3] == "e" and s[4] == "r":
            return s[2:], syl - 1, flags | K_BER
        if s.startswith("per"):
            return s[3:], syl - 1, flags
        if s == "pelajar":
            return s[3:], syl - 1, flags
        if s.startswith("pe"):
            return s[2:], syl - 1, flags | K_PE
        return s, syl, flags

    def suffix(s, syl, flags):
        if s.endswith("kan") and not flags & (K_KE | K_PENG | K_PE):
            return s[:-3], syl - 1
        if s.endswith("an") and not flags & (K_DI | K_MENG | K_TER):
            return s[:-2], syl - 1
        if s.endswith("i") and not s.endswith("si") \
                and not flags & (K_BER | K_KE | K_PENG):
            return s[:-1], syl - 1
        return s, syl

    old = s
    if syl > 2:
        s, syl, flags = first_order(s, syl, flags)
    if s != old:
        old = s
        if syl > 2:
            s, syl = suffix(s, syl, flags)
        if s != old:
            if syl > 2:
                s, syl, flags = second_order(s, syl, flags)
    else:
        if syl > 2:
            s, syl, flags = second_order(s, syl, flags)
        if syl > 2:
            s, syl = suffix(s, syl, flags)
    return s


def indonesian_stem(word: str) -> str:
    return _id_stem(word, True)


def indonesian_inflectional_stem(word: str) -> str:
    return _id_stem(word, False)
