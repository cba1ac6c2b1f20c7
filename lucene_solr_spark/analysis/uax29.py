"""UAX29URLEmailTokenizer — UAX#29 word breaks + RFC URL/EMAIL tokens.

Re-implements the reference JFlex grammar (lucene/analysis/common/src/
java/org/apache/lucene/analysis/standard/UAX29URLEmailTokenizerImpl
.jflex — the word-break rules WB1-WB999 of Unicode 9.0, the TR#51
emoji_sequence rule, and the RFC 952/1035/1123/1738/3986/5321/5322
URL/EMAIL recognizers with the IANA TLD registry) as longest-match
scanning with JFlex semantics: maximal total match including trailing
context, ties to the earliest rule, a two-state machine (YYINITIAL /
AVOID_BAD_URL with yypushback for LUCENE-5391 bad no-scheme URLs), and
the 255-char buffer window that SPLITS overlong runs
(UAX29URLEmailTokenizer.java:139-163 — the buffer is sized to
maxTokenLength, so a match never exceeds it and tokens are split, not
skipped).

Character classes are DATA, not guesses: fixtures_data/
uax29_props.json holds the Unicode 9.0 word-break property ranges
derived from the generated scanner's own ZZ_CMAP equivalence classes
by behavioral probing (scripts/make_uax29_fixture.py), and
fixtures_data/uax29_tld.json holds the IANA TLD lists parsed from
ASCIITLD.jflex-macro plus the emoji-data ranges from
UnicodeEmojiProperties.jflex.  The EMAILatomText class includes
',' '.' '/' because the reference's JFlex class [...'*+-/=...] parses
+-/ as a character RANGE (verified against the compiled scanner:
"a,b@example.com" is one <EMAIL>).
"""

from __future__ import annotations

import json
import os
import re
from typing import List, NamedTuple, Optional, Tuple

ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
SOUTHEAST_ASIAN = "<SOUTHEAST_ASIAN>"
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"
URL = "<URL>"
EMAIL = "<EMAIL>"
EMOJI = "<EMOJI>"

DEFAULT_MAX_TOKEN_LENGTH = 255

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "fixtures_data")


class UAX29Token(NamedTuple):
    term: str
    type: str
    start: int      # UTF-16 offsets, as the JVM reports
    end: int
    pos_inc: int


def _esc(cp: int) -> str:
    return "\\U%08x" % cp if cp > 0xFFFF else "\\u%04x" % cp


def _cc(ranges, negate=False) -> str:
    parts = []
    for lo, hi in ranges:
        parts.append(_esc(lo) if lo == hi
                     else _esc(lo) + "-" + _esc(hi))
    return "[%s%s]" % ("^" if negate else "", "".join(parts))


def _sub(ranges, remove) -> list:
    """range-list minus a set of single code points / (lo,hi) pairs."""
    cut = []
    for r in remove:
        cut.append((r, r) if isinstance(r, int) else tuple(r))
    out = []
    for lo, hi in ranges:
        segs = [(lo, hi)]
        for clo, chi in cut:
            nxt = []
            for slo, shi in segs:
                if chi < slo or clo > shi:
                    nxt.append((slo, shi))
                    continue
                if slo < clo:
                    nxt.append((slo, clo - 1))
                if chi < shi:
                    nxt.append((chi + 1, shi))
            segs = nxt
        out.extend(segs)
    return sorted(out)


def _union(*rangelists) -> list:
    pts = sorted(tuple(r) for rl in rangelists for r in rl)
    out = []
    for lo, hi in pts:
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


class _Rule(NamedTuple):
    rx: "re.Pattern"
    ttype: Optional[str]     # None => pushback action
    initial_only: bool
    has_la: bool             # lookahead captured as group "la"


_RULES: Optional[List[_Rule]] = None


def _build_rules() -> List[_Rule]:
    with open(os.path.join(_FIX, "uax29_props.json")) as f:
        P = json.load(f)
    with open(os.path.join(_FIX, "uax29_tld.json")) as f:
        T = json.load(f)

    # ---- word-break character classes (Unicode 9.0, via ZZ_CMAP) ----
    AHL = _union(P["aletter"], P["hebrew"], P["hangul"])
    X = _union(P["extend"], P["zwj"])           # WB4 Extend|Format|ZWJ
    Xq = _cc(X) + "*+"   # possessive: X chars never start another atom
    A_ = _cc(AHL) + Xq
    K_ = _cc(P["katakana"]) + Xq
    N_ = _cc(P["numeric"]) + Xq
    HEB_ = _cc(P["hebrew"]) + Xq
    ML_ = _cc(_union(P["midletter"], P["midnumlet"],
                     P["single_quote"])) + Xq
    MN_ = _cc(_union(P["midnum"], P["midnumlet"],
                     P["single_quote"])) + Xq
    E_ = _cc(P["extendnumlet"]) + Xq
    SQ_ = _cc(P["single_quote"]) + Xq
    DQ_ = _cc(P["double_quote"]) + Xq

    inner = (f"(?:{K_}(?:(?:{E_})*{K_})*"
             f"|(?:{HEB_}(?:{SQ_}|{DQ_}{HEB_})"
             f"|{N_}(?:(?:(?:{E_})*|{MN_}){N_})*"
             f"|{A_}(?:(?:(?:{E_})*|{ML_}){A_})*"
             f")+)")
    word = (f"(?:{E_})*{inner}"
            f"(?:(?:{E_})+{inner})*"
            f"(?:{E_})*")
    numeric = f"(?:{E_})*{N_}(?:(?:(?:{E_})*|{MN_}){N_})*(?:{E_})*"
    hangul = f"(?:{_cc(P['hangul'])}{Xq})+"
    katakana = f"(?:{K_})+"
    sea = f"(?:{_cc(P['sea'])}{Xq})+"
    han = f"{_cc(P['han'])}{Xq}"
    hira = f"{_cc(P['hiragana'])}{Xq}"

    # ---- emoji (TR#51 emoji_sequence; sets from emoji-data 11.0) ----
    EM = T["emoji"]
    RI_RANGE = [[0x1F1E6, 0x1F1FF]]      # \p{WB:Regional_Indicator}
    KEYCAP_BASE = [[0x23, 0x23], [0x2A, 0x2A], [0x30, 0x39]]
    ACCIDENTAL = [[0xA9, 0xA9], [0xAE, 0xAE], [0x2122, 0x2122],
                  [0x3030, 0x3030], [0x303D, 0x303D]]
    # EmojiChar = Extended_Pictographic | (Emoji - (RI|KeyCap|Acc|Mod))
    emoji_rkam = _union(RI_RANGE, KEYCAP_BASE, ACCIDENTAL,
                        EM["Emoji_Modifier"])
    emoji_sans = _sub([tuple(r) for r in EM["Emoji"]],
                      [tuple(r) for r in emoji_rkam])
    EC = _union(EM["Extended_Pictographic"], emoji_sans)
    sansX = _sub([tuple(r) for r in X], [0xFE0E, 0xFE0F])
    # the extend-absorber must NOT swallow a ZWJ that glues the next
    # emoji atom (JFlex longest-match keeps U+1F9D1 ZWJ U+1F680 whole;
    # a greedy absorber here would stop the chain at the first atom) —
    # guard ZWJ with a lookahead for a following atom start
    ec_start = _union(EM["Extended_Pictographic"], EM["Emoji"],
                      EM["Emoji_Modifier_Base"], EM["Emoji_Modifier"])
    sansXZ = _sub(sansX, [0x200D])
    SXq = (f"(?:{_cc(sansXZ)}"
           "|‍(?!‍*" + _cc(ec_start) + "))*")
    ZWJ = "\u200D"
    ec_ex = _cc(EC) + SXq
    emb_ex = _cc(EM["Emoji_Modifier_Base"]) + SXq
    emod_ex = _cc(EM["Emoji_Modifier"]) + SXq
    # modifier-sequence alternative FIRST: JFlex is longest-match, and
    # Python's alternation is first-success \u2014 base+modifier (len 2 cps)
    # must beat the bare EC-char alternative (len 1) for U+1F44D U+1F3FB
    ecpms = (f"(?:(?:{ZWJ}*{emb_ex})?{emod_ex}"
             f"|{ZWJ}*{ec_ex}\uFE0F?)")
    keycap_base_ex = _cc(KEYCAP_BASE) + SXq
    keycap_ex = "\u20E3" + SXq
    ri_ex = _cc(RI_RANGE) + Xq
    tag_spec = "[\\U000E0020-\\U000E007E]"
    tag_term = "\\U000E007F"
    emoji = (f"(?:{ecpms}(?:(?:{ZWJ}{ecpms})*|(?:{tag_spec})+{tag_term})"
             f"|{keycap_base_ex}\uFE0F?{keycap_ex}"
             f"|(?:{ri_ex}){{2}})")

    # ---- URL / EMAIL (ASCII, RFC grammars + IANA TLD data) ----
    def tld_alt(names):
        return "(?:" + "|".join(
            sorted((re.escape(t) for t in names), key=len,
                   reverse=True)) + ")"

    tld_main = "\\.(?i:%s)\\.?" % tld_alt(T["tld"]["ASCIITLD"])[3:-1]
    tld_1c = "\\.(?i:%s)\\.?" % tld_alt(
        T["tld"]["ASCIITLDprefix_1CharSuffix"])[3:-1]
    tld_2c = "\\.(?i:%s)\\.?" % tld_alt(
        T["tld"]["ASCIITLDprefix_2CharSuffix"])[3:-1]

    label = "[A-Za-z0-9](?:[-A-Za-z0-9]*[A-Za-z0-9])?"
    labelseq = f"{label}(?:\\.{label})*"
    dns_no = f"{labelseq}{tld_main}"
    dns_1c = f"{labelseq}{tld_1c}"
    dns_2c = f"{labelseq}{tld_2c}"
    dns_strict = f"{labelseq}(?:{tld_main}|{tld_1c}|{tld_2c})"
    dns_loose = labelseq

    # longest alternative first: Python regex returns the FIRST
    # successful alternative, not the longest (JFlex is longest-match),
    # so "235" must not stop at octet "2"
    octet = ("(?:2(?:5[0-5]|[0-4][0-9])|1[0-9][0-9]|0?[1-9][0-9]"
             "|0{0,2}[0-9])")
    ipv4 = f"{octet}(?:\\.{octet}){{3}}"
    h16 = "[0-9A-Fa-f]{1,4}"
    ls32 = f"(?:{ipv4}|{h16}:{h16})"
    ipv6 = ("(?:" + "|".join([
        f"(?:{h16}:){{6}}{ls32}",
        f"::(?:{h16}:){{5}}{ls32}",
        f"(?:{h16})?::(?:{h16}:){{4}}{ls32}",
        f"(?:(?:{h16}:)?{h16})?::(?:{h16}:){{3}}{ls32}",
        f"(?:(?:{h16}:){{0,2}}{h16})?::(?:{h16}:){{2}}{ls32}",
        f"(?:(?:{h16}:){{0,3}}{h16})?::{h16}:{ls32}",
        f"(?:(?:{h16}:){{0,4}}{h16})?::{ls32}",
        f"(?:(?:{h16}:){{0,5}}{h16})?::{h16}",
        f"(?:(?:{h16}:){{0,6}}{h16})?::",
    ]) + ")")

    unres = "[-._~A-Za-z0-9]"
    pct = "%[0-9A-Fa-f]{2}"
    sub = "[!$&'()*+,;=]"
    loginseg = f"(?:{unres}|{pct}|{sub})*"
    login = f"{loginseg}(?::{loginseg})?@"
    query = f"\\?(?:{unres}|{pct}|{sub}|[:@/?])*"
    frag = f"#(?:{unres}|{pct}|{sub}|[:@/?])*"
    port = ":[0-9]{1,5}"

    def host(dns):
        return f"(?:\\[{ipv6}\\]|{ipv4}|{dns})"

    host_strict = host(dns_strict)
    host_no = host(dns_no)
    host_1c = host(dns_1c)
    host_2c = host(dns_2c)
    host_loose = host(dns_loose)
    auth_loose = f"(?:{login})?{host_loose}(?:{port})?"

    httpseg = f"(?:{unres}|{pct}|[;:@&=])*"
    httppath = f"(?:/{httpseg})+"
    httpscheme = "(?i:http)(?i:s)?://"
    http_full = (f"{httpscheme}(?:{login})?{host_loose}(?:{port})?"
                 f"(?:{httppath})?(?:{query})?(?:{frag})?")
    port_req = f"{port}(?:{httppath})?(?:{query})?(?:{frag})?"
    path_req = f"(?:{port})?{httppath}(?:{query})?(?:{frag})?"
    query_req = f"(?:{port})?(?:{httppath})?{query}(?:{frag})?"
    frag_req = f"(?:{port})?(?:{httppath})?(?:{query})?{frag}"
    http_nos = (f"{host_strict}"
                f"(?:{port_req}|{path_req}|{query_req}|{frag_req})")
    httpurl = f"(?:{http_full}|{http_nos})"

    ftpseg = f"(?:{unres}|{pct}|[?:@&=])*"
    ftppath = f"/{ftpseg}(?:/{ftpseg})*"
    ftptype = ";(?i:type)=[aAiIdD]"
    ftpurl = (f"(?i:ftp)://{auth_loose}{ftppath}"
              f"(?:{ftptype})?(?:{frag})?")
    fileurl = (f"(?i:file)://(?:{host_loose})?{ftppath}(?:{frag})?")
    url = f"(?:{httpurl}|{ftpurl}|{fileurl})"

    # EMAILatomText: the reference class parses +-/ as a RANGE, so
    # ',' '.' '/' are atom chars (see module docstring)
    atom = "[A-Za-z0-9!#$%&'*+,\\-./=?^_`{|}~]"
    qs = "\"(?:[\\x01-\\x08\\x0B\\x0C\\x0E-\\x21\\x23-\\x5B\\x5D-\\x7E]" \
         "|\\\\[\\x00-\\x7F])*\""
    email_label = f"(?:{atom}+|{qs})"
    local = f"{email_label}(?:\\.{email_label})*"
    dlt = "(?:[\\x01-\\x08\\x0B\\x0C\\x0E-\\x5A\\x5E-\\x7F]" \
          "|\\\\[\\x00-\\x7F])"
    bracketed = (f"\\[(?:{dlt}*|{ipv4}|(?i:ipv)6:{ipv6})\\]")
    email = f"{local}@(?:{dns_strict}|{bracketed})"

    follower = _cc(P["host_follower"])           # JFlex [-\w]
    not_follower = _cc(P["host_follower"], negate=True)

    C = re.compile

    def la(body, look):
        return C(f"(?:{body})(?=(?P<la>{look}))", re.S)

    # rule order = JFlex file order (jflex:276-432)
    return [
        _Rule(C(url, re.S), URL, False, False),                    # 1
        _Rule(la(host_strict, not_follower), URL, False, True),    # 2
        _Rule(la(host_no, follower), None, True, True),            # 3
        _Rule(C(host_no, re.S), URL, True, False),                 # 4
        _Rule(la(host_1c, follower), None, True, True),            # 5
        _Rule(C(host_1c, re.S), URL, True, False),                 # 6
        _Rule(la(host_2c, follower), None, True, True),            # 7
        _Rule(C(host_2c, re.S), URL, True, False),                 # 8
        _Rule(la("(?i:mailto)", ":" + email), ALPHANUM,
              False, True),                                        # 9
        _Rule(C(email, re.S), EMAIL, False, False),                # 10
        _Rule(C(emoji, re.S), EMOJI, False, False),                # 11
        _Rule(C(numeric, re.S), NUM, False, False),                # 12
        _Rule(C(hangul, re.S), HANGUL, False, False),              # 13
        _Rule(C(katakana, re.S), KATAKANA, False, False),          # 14
        _Rule(C(word, re.S), ALPHANUM, False, False),              # 15
        _Rule(C(sea, re.S), SOUTHEAST_ASIAN, False, False),        # 16
        _Rule(C(han, re.S), IDEOGRAPHIC, False, False),            # 17
        _Rule(C(hira, re.S), HIRAGANA, False, False),              # 18
    ]


def _rules() -> List[_Rule]:
    global _RULES
    if _RULES is None:
        _RULES = _build_rules()
    return _RULES


def _window_end(text: str, start: int, max_units: int) -> int:
    """Code-point index bounding the scanner buffer: at most max_units
    UTF-16 units from start, never splitting a surrogate pair
    (zzFinalHighSurrogate drops a trailing lone high surrogate)."""
    units = 0
    i = start
    n = len(text)
    while i < n:
        w = 2 if ord(text[i]) > 0xFFFF else 1
        if units + w > max_units:
            break
        units += w
        i += 1
    return i


def uax29_tokenize(text: str,
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
                   ) -> List[UAX29Token]:
    rules = _rules()
    wide = [j for j, ch in enumerate(text) if ord(ch) > 0xFFFF]
    if wide:
        import bisect

        def off(j):
            return j + bisect.bisect_right(wide, j - 1)
    else:
        def off(j):
            return j
    out: List[UAX29Token] = []
    skipped = 0
    i = 0
    n = len(text)
    avoid_bad_url = False
    while i < n:
        wend = _window_end(text, i, max_token_length)
        window = text[i:wend]
        best: Optional[Tuple[int, int, int, _Rule]] = None
        for order, rule in enumerate(rules):
            if rule.initial_only and avoid_bad_url:
                continue
            m = rule.rx.match(window)
            if m is None:
                continue
            body = m.end()
            total = body + (len(m.group("la")) if rule.has_la else 0)
            if best is None or total > best[0]:
                best = (total, order, body, rule)
        if best is None:
            i += 1          # [^] ignore — state is preserved
            continue
        _, _, body, rule = best
        if rule.ttype is None:
            avoid_bad_url = True     # yypushback + yybegin(AVOID)
            continue
        avoid_bad_url = False
        if body > max_token_length:  # unreachable: window == mtl
            skipped += 1
        else:
            out.append(UAX29Token(window[:body], rule.ttype,
                                  off(i), off(i + body), skipped + 1))
            skipped = 0
        i += body
    return out


_SEP = "\x1f"
_FS = "\x1e"

MODES = {"m255": 255, "m20": 20}


def uax29_serialize(text: str, mode: str) -> str:
    toks = uax29_tokenize(text, max_token_length=MODES[mode])
    return _SEP.join(
        _FS.join((t.term, t.type, str(t.start), str(t.end),
                  str(t.pos_inc))) for t in toks)


def uax29_udf(mode_col, text_col):
    """Arrow-batched (mode, text) -> serialized token stream column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(modes, texts):
        return pd.Series([
            uax29_serialize(t if t is not None else "", m)
            for m, t in zip(modes, texts)])

    return pandas_udf(_run, "string")(mode_col, text_col)
