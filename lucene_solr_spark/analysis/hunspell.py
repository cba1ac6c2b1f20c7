"""Hunspell dictionary stemming — the hunspell analysis module analog.

Re-implements the reference's affix-rule stemmer
(lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java + Stemmer.java): .aff/.dic parsing with FLAG
long/num/UTF-8 strategies, AF/AM aliases, PFX/SFX rules with strip +
condition + continuation classes, two-stage affix stripping
(prefix+suffix cross products, twofold suffixes, COMPLEXPREFIXES),
CIRCUMFIX / KEEPCASE / NEEDAFFIX / ONLYINCOMPOUND flags, FULLSTRIP,
IGNORE, ICONV/OCONV longest-match conversions, morphological st:
stem exceptions, homonyms, and the UPPER/TITLE case-variant union
(Stemmer.java:100-121).

Differences from the reference are representational only: affix tries
are plain dicts keyed by the append string (the reference uses FSTs),
and conditions are Python regexes compiled from the same
"%s.*"/".*%s" templates (Dictionary.java:104-105).  Semantics are
pinned by the reference's own 34 .aff/.dic unit fixtures — every
assertStemsTo vector in the hunspell test suite is extracted
mechanically and replayed (scripts/make_hunspell_fixture.py,
tests/test_hunspell.py), all exact.
"""

from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "hunspell_stem_tokens"]

_FLAG_SEP = "\x1f"
_MORPH_SEP = "\x1e"


def _index_space_tab(text: str, start: int) -> int:
    p1 = text.find("\t", start)
    p2 = text.find(" ", start)
    if p1 >= 0 and p2 >= 0:
        return min(p1, p2)
    return max(p1, p2)


def _morph_boundary(line: str) -> int:
    """End of the word/flags part; morph fields look like 'xx:'
    (Dictionary.java morphBoundary)."""
    end = _index_space_tab(line, 0)
    if end == -1:
        return len(line)
    while 0 <= end < len(line):
        if (line[end] == "\t"
                or (end + 3 < len(line) and line[end + 1].isalpha()
                    and line[end + 2].isalpha()
                    and line[end + 3] == ":")):
            break
        end = _index_space_tab(line, end + 1)
    if end == -1:
        return len(line)
    return end


class _Flags:
    """FLAG parsing strategies (single char, long = double ASCII,
    num = comma-separated integers)."""

    def __init__(self, mode: str = "simple"):
        self.mode = mode

    def parse(self, raw: str) -> tuple:
        if self.mode == "num":
            out = []
            for part in raw.strip().split(","):
                digits = re.sub(r"[^0-9]", "", part)
                if digits:
                    out.append(int(digits))
            return tuple(sorted(out))
        if self.mode == "long":
            if len(raw) % 2 == 1:
                raise ValueError(f"invalid LONG flags: {raw!r}")
            return tuple(sorted(
                (ord(raw[i]) << 8) | ord(raw[i + 1])
                for i in range(0, len(raw), 2)))
        return tuple(sorted(ord(c) for c in raw))

    def parse_one(self, raw: str) -> int:
        flags = self.parse(raw)
        if len(flags) != 1:
            raise ValueError(f"expected one flag: {raw!r}")
        return flags[0]


class _Affix:
    __slots__ = ("flag", "strip", "cond", "cross", "append_flags",
                 "is_prefix")

    def __init__(self, flag, strip, cond, cross, append_flags,
                 is_prefix):
        self.flag = flag
        self.strip = strip
        self.cond = cond  # compiled regex or None
        self.cross = cross
        self.append_flags = append_flags  # tuple of continuation flags
        self.is_prefix = is_prefix


class HunspellDictionary:
    """Parsed .aff + .dic pair; ``stem``/``unique_stems`` mirror the
    reference Stemmer."""

    def __init__(self, aff_text: str, dic_texts, ignore_case=False):
        if isinstance(dic_texts, str):
            dic_texts = [dic_texts]
        self.ignore_case = ignore_case
        self.flags = _Flags()
        self.aliases: list[str] = []
        self.morph_aliases: list[str] = []
        self.keepcase = self.needaffix = self.onlyincompound = None
        self.circumfix = None
        self.ignore: set[str] = set()
        self.iconv: dict[str, str] = {}
        self.oconv: dict[str, str] = {}
        self.full_strip = False
        self.complex_prefixes = False
        self.two_stage = False
        self.alternate_casing = False
        self.affixes: list[_Affix] = []
        self.prefixes: dict[str, list[int]] = {}
        self.suffixes: dict[str, list[int]] = {}
        self._needs_input_cleaning = ignore_case
        self._parse_aff(aff_text)
        # word -> list of (flags tuple, stem exception or None)
        self.words: dict[str, list] = {}
        for t in dic_texts:
            self._parse_dic(t)

    # ------------------------------------------------------- parsing
    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        alias_n = morph_alias_n = 0
        while i < len(lines):
            line = lines[i].lstrip("﻿")
            i += 1
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            parts = s.split()
            key = parts[0]
            if key == "FLAG":
                v = parts[1]
                if v == "long":
                    self.flags = _Flags("long")
                elif v == "num":
                    self.flags = _Flags("num")
                # UTF-8 uses the simple strategy (Dictionary.java:100)
            elif key == "AF":
                if alias_n == 0 and not self.aliases:
                    alias_n = int(parts[1])
                else:
                    self.aliases.append(parts[1] if len(parts) > 1
                                        else "")
            elif key == "AM":
                if morph_alias_n == 0 and not self.morph_aliases:
                    morph_alias_n = int(parts[1])
                else:
                    # keep the leading space: the " st:" scan relies
                    # on it (Dictionary.parseMorphAlias "leave the
                    # space")
                    self.morph_aliases.append(line[2:])
            elif key in ("PFX", "SFX"):
                n = int(parts[3])
                block = []
                for _ in range(n):
                    block.append(lines[i])
                    i += 1
                self._parse_affix_block(key == "PFX", parts, block)
            elif key == "KEEPCASE":
                self.keepcase = self.flags.parse_one(parts[1])
            elif key in ("NEEDAFFIX", "PSEUDOROOT"):
                self.needaffix = self.flags.parse_one(parts[1])
            elif key == "ONLYINCOMPOUND":
                self.onlyincompound = self.flags.parse_one(parts[1])
            elif key == "CIRCUMFIX":
                self.circumfix = self.flags.parse_one(parts[1])
            elif key == "IGNORE":
                self.ignore = set(parts[1])
                self._needs_input_cleaning = True
            elif key in ("ICONV", "OCONV"):
                n = int(parts[1])
                mapping = {}
                for _ in range(n):
                    p = lines[i].split()
                    i += 1
                    mapping[p[1]] = p[2]
                if key == "ICONV":
                    self.iconv = mapping
                    self._needs_input_cleaning = True
                else:
                    self.oconv = mapping
            elif key == "FULLSTRIP":
                self.full_strip = True
            elif key == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif key == "LANG":
                lang = s[len("LANG"):].strip()
                self.alternate_casing = lang in ("tr_TR", "az_AZ")

    def _parse_affix_block(self, is_prefix, header, block) -> None:
        cross = header[2] == "Y"
        for line in block:
            args = re.split(r"\s+", line.strip())
            flag = self.flags.parse_one(args[1])
            strip = "" if args[2] == "0" else args[2]
            affix_arg = args[3]
            append_flags = ()
            slash = affix_arg.rfind("/")
            if slash != -1:
                flag_part = affix_arg[slash + 1:]
                affix_arg = affix_arg[:slash]
                if self.aliases:
                    flag_part = self.aliases[int(flag_part) - 1]
                append_flags = self.flags.parse(flag_part)
                self.two_stage = True
            if affix_arg == "0":
                affix_arg = ""
            condition = args[4] if len(args) > 4 else "."
            if condition.startswith("[") and "]" not in condition:
                condition += "]"
            if condition == ".":
                cond = None
            elif condition == strip:
                cond = None
            else:
                cond = re.compile(
                    (condition + ".*") if is_prefix
                    else (".*" + condition), re.DOTALL)
            if self._needs_input_cleaning:
                affix_arg = self._clean_input(affix_arg)
            aff = _Affix(flag, strip, cond, cross, append_flags,
                         is_prefix)
            self.affixes.append(aff)
            table = self.prefixes if is_prefix else self.suffixes
            table.setdefault(affix_arg, []).append(len(self.affixes) - 1)

    def _unescape_entry(self, entry: str) -> str:
        out = []
        end = _morph_boundary(entry)
        i = 0
        while i < end:
            ch = entry[i]
            if ch == "\\" and i + 1 < len(entry):
                out.append(entry[i + 1])
                i += 1
            elif ch == "/":
                out.append(_FLAG_SEP)
            elif ch not in (_FLAG_SEP, _MORPH_SEP):
                out.append(ch)
            i += 1
        out.append(_MORPH_SEP)
        for ch in entry[end:]:
            if ch not in (_FLAG_SEP, _MORPH_SEP):
                out.append(ch)
        return "".join(out)

    def _parse_stem_exception(self, morph: str) -> str | None:
        if self.morph_aliases:
            try:
                morph = self.morph_aliases[int(morph.strip()) - 1]
            except ValueError:
                pass
        m = re.search(r"[ \t]st:", morph)
        if m:
            end = _index_space_tab(morph, m.start() + 1)
            if end < 0:
                end = len(morph)
            return morph[m.start() + 4:end]
        return None

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for raw in lines[1:]:  # first line is the word count
            raw = raw.strip("\r")
            if not raw.strip() or raw.strip().startswith("#"):
                continue
            line = self._unescape_entry(raw)
            flag_sep = line.find(_FLAG_SEP)
            end = line.find(_MORPH_SEP)
            if flag_sep == -1:
                flags: tuple = ()
                entry = line[:end]
            else:
                flag_part = line[flag_sep + 1:end]
                if self.aliases:
                    flag_part = self.aliases[int(flag_part) - 1]
                flags = self.flags.parse(flag_part)
                entry = line[:flag_sep]
            exception = None
            if end + 1 < len(line):
                exception = self._parse_stem_exception(line[end + 1:])
            if self._needs_input_cleaning:
                entry = self._clean_input(entry)
            self.words.setdefault(entry, []).append((flags, exception))

    # ------------------------------------------------------ cleaning
    def _case_fold(self, c: str) -> str:
        if self.alternate_casing:
            if c == "I":
                return "ı"
            if c == "İ":
                return "i"
        return c.lower()

    def _clean_input(self, s: str) -> str:
        out = []
        for ch in s:
            if ch in self.ignore:
                continue
            if self.ignore_case and not self.iconv:
                ch = self._case_fold(ch)
            out.append(ch)
        t = "".join(out)
        if self.iconv:
            t = _apply_mappings(self.iconv, t)
            if self.ignore_case:
                t = "".join(self._case_fold(c) for c in t)
        return t

    # ------------------------------------------------------ stemming
    def stem(self, word: str) -> list[str]:
        if self._needs_input_cleaning:
            word = self._clean_input(word)
        case = self._case_of(word)
        if case == "upper":
            title = word[0] + "".join(
                self._case_fold(c) for c in word[1:])
            lower = self._case_fold(title[0]) + title[1:] if title else ""
            return (self._do_stem(word, False)
                    + self._do_stem(title, True)
                    + self._do_stem(lower, True))
        if case == "title":
            lower = self._case_fold(word[0]) + word[1:]
            return (self._do_stem(word, False)
                    + self._do_stem(lower, True))
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        seen = set()
        out = []
        for s in self.stem(word):
            k = s.lower() if self.ignore_case else s
            if k not in seen:
                seen.add(k)
                out.append(s)
        return out

    def _case_of(self, word: str) -> str:
        if self.ignore_case or not word or not word[0].isupper():
            return "exact"
        seen_upper = seen_lower = False
        for c in word[1:]:
            if c.isupper():
                seen_upper = True
            else:
                seen_lower = True
        if not seen_lower:
            return "upper"
        if not seen_upper:
            return "title"
        return "exact"

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        stems = []
        for flags, exception in self.words.get(word, ()):
            if (case_variant and self.keepcase is not None
                    and self.keepcase in flags):
                continue
            if self.needaffix is not None and self.needaffix in flags:
                continue
            if (self.onlyincompound is not None
                    and self.onlyincompound in flags):
                continue
            stems.append(self._new_stem(word, exception))
        stems.extend(self._stem(word, -1, -1, -1, 0, True, True,
                                False, False, case_variant))
        return stems

    def _new_stem(self, word: str, exception: str | None) -> str:
        s = exception if exception is not None else word
        if self.oconv:
            s = _apply_mappings(self.oconv, s)
        return s

    def _stem(self, word, previous, prev_flag, prefix_flag, depth,
              do_prefix, do_suffix, prev_was_prefix, circumfix,
              case_variant) -> list[str]:
        stems: list[str] = []
        n = len(word)
        if do_prefix and self.prefixes:
            limit = n if self.full_strip else n - 1
            for i in range(0, max(limit, 0)):
                for pid in self.prefixes.get(word[:i], ()):
                    aff = self.affixes[pid]
                    if pid == previous:
                        continue
                    if not self._compatible(aff, depth, prev_flag,
                                            False):
                        continue
                    stripped = aff.strip + word[i:]
                    if aff.cond is not None and not aff.cond.fullmatch(
                            stripped):
                        continue
                    stems.extend(self._apply_affix(
                        stripped, pid, -1, depth, True, circumfix,
                        case_variant))
        if do_suffix and self.suffixes:
            limit = 0 if self.full_strip else 1
            for i in range(n, limit - 1, -1):
                for sid in self.suffixes.get(word[i:], ()):
                    aff = self.affixes[sid]
                    if sid == previous:
                        continue
                    if not self._compatible(aff, depth, prev_flag,
                                            prev_was_prefix):
                        continue
                    stripped = word[:i] + aff.strip
                    if aff.cond is not None and not aff.cond.fullmatch(
                            stripped):
                        continue
                    stems.extend(self._apply_affix(
                        stripped, sid, prefix_flag, depth, False,
                        circumfix, case_variant))
        return stems

    def _compatible(self, aff: _Affix, depth: int, prev_flag: int,
                    match_empty: bool) -> bool:
        if depth == 0:
            if self.onlyincompound is None:
                return True
            return self.onlyincompound not in aff.append_flags
        if aff.cross:
            allowed = (self.onlyincompound is None
                       or self.onlyincompound not in aff.append_flags)
            return allowed and (
                (not aff.append_flags and match_empty)
                or prev_flag in aff.append_flags)
        return False

    def _apply_affix(self, stripped, affix_id, prefix_flag, depth,
                     is_prefix, circumfix, case_variant) -> list[str]:
        aff = self.affixes[affix_id]
        stems = []
        for flags, exception in self.words.get(stripped, ()):
            if aff.flag not in flags:
                continue
            # a removed prefix must be allowed by the word too, unless
            # chained through the suffix continuation classes
            chained_prefix = (self.complex_prefixes and depth == 1
                              and is_prefix)
            if (not chained_prefix and prefix_flag >= 0
                    and prefix_flag not in flags):
                if prefix_flag not in aff.append_flags:
                    continue
            if self.circumfix is not None:
                suffix_circumfix = self.circumfix in aff.append_flags
                if circumfix != suffix_circumfix:
                    continue
            if (case_variant and self.keepcase is not None
                    and self.keepcase in flags):
                continue
            if (self.onlyincompound is not None
                    and self.onlyincompound in flags):
                continue
            stems.append(self._new_stem(stripped, exception))
        if (self.circumfix is not None and not circumfix
                and is_prefix):
            circumfix = self.circumfix in aff.append_flags
        if aff.cross:
            if depth == 0:
                if is_prefix:
                    stems.extend(self._stem(
                        stripped, affix_id, aff.flag, aff.flag, 1,
                        self.complex_prefixes and self.two_stage,
                        True, True, circumfix, case_variant))
                elif not self.complex_prefixes and self.two_stage:
                    stems.extend(self._stem(
                        stripped, affix_id, aff.flag, prefix_flag, 1,
                        False, True, False, circumfix, case_variant))
            elif depth == 1:
                if is_prefix and self.complex_prefixes:
                    stems.extend(self._stem(
                        stripped, affix_id, aff.flag, aff.flag, 2,
                        False, True, True, circumfix, case_variant))
                elif (not is_prefix and not self.complex_prefixes
                        and self.two_stage):
                    stems.extend(self._stem(
                        stripped, affix_id, aff.flag, prefix_flag, 2,
                        False, True, False, circumfix, case_variant))
        return stems


def _apply_mappings(mapping: dict, s: str) -> str:
    """ICONV/OCONV: longest-match replacement at each position
    (Dictionary.applyMappings)."""
    out = []
    i = 0
    max_len = max(map(len, mapping), default=0)
    while i < len(s):
        best = None
        for j in range(min(len(s), i + max_len), i, -1):
            if s[i:j] in mapping:
                best = s[i:j]
                break
        if best is not None:
            out.append(mapping[best])
            i += len(best)
        else:
            out.append(s[i])
            i += 1
    return out and "".join(out) or ""


def hunspell_stem_tokens(dictionary: HunspellDictionary, tokens: list,
                         dedup: bool = True,
                         longest_only: bool = False) -> list:
    """HunspellStemFilter semantics: each token is replaced by its
    stem set (original kept when no stems); longestOnly keeps only
    the longest stems (HunspellStemFilter.java:121-133)."""
    out = []
    for t in tokens:
        stems = (dictionary.unique_stems(t) if dedup
                 else dictionary.stem(t))
        if not stems:
            out.append(t)
            continue
        if longest_only and len(stems) > 1:
            best = max(len(s) for s in stems)
            stems = [s for s in stems if len(s) == best]
        out.extend(stems)
    return out
