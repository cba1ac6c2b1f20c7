"""Freeze the RSLP stemming rule tables as a JSON fixture.

The reference ships the published RSLP rule tables (Orengo et al.,
"A Stemming Algorithm for the Portuguese Language", plus the Galician
adaptation from the same research line) as resource files
(lucene/analysis/common/src/resources/.../{pt/portuguese,gl/galician}
.rslp). This script parses that format — the grammar documented in
RSLPStemmerBase.java:49-84 (step header {name, minlen, exc-type,
{conds}}, rules {suffix, minstem, "replacement", {exceptions}}) — and
writes the parsed tables to
lucene_solr_spark/fixtures_data/rslp_rules.json, which
analysis/rslp.py loads at import. The rule DATA is published
algorithm content (same provenance class as the stemmer test
vocabularies already frozen under fixtures_data/); the ENGINE that
applies it is implemented from scratch in analysis/rslp.py.

Usage: python scripts/make_rslp_fixture.py
"""

import json
import os
import re

REF = "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "rslp_rules.json",
)

HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


def read_lines(path):
    """Non-empty, comment-stripped lines (RSLPStemmerBase.readLine)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip() if "#" in raw else raw.strip()
            if line:
                out.append(line)
    return out


def parse_list(s):
    if not s.strip():
        return []
    return [p.strip().strip('"') for p in s.split(",")]


def parse_file(path):
    lines = read_lines(path)
    steps = {}
    i = 0
    while i < len(lines):
        m = HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header at {path}: {lines[i]!r}")
        name, minlen, exc_type = m.group(1), int(m.group(2)), int(m.group(3))
        conds = parse_list(m.group(4))
        rules = []
        i += 1
        while i < len(lines):
            line = lines[i]
            for pat, repl_idx in ((STRIP, None), (REP, 3), (EXC, 3)):
                mm = pat.match(line)
                if mm:
                    suffix, minstem = mm.group(1), int(mm.group(2))
                    repl = mm.group(3) if repl_idx else ""
                    exceptions = (
                        parse_list(mm.group(4)) if pat is EXC else []
                    )
                    for e in exceptions:
                        assert e.endswith(suffix), (e, suffix)
                    rules.append([suffix, minstem, repl, exceptions])
                    break
            else:
                raise ValueError(f"bad rule at {path}: {line!r}")
            done = line.rstrip().endswith(";")
            i += 1
            if done:
                break
        steps[name] = {
            "min": minlen, "whole_word_exceptions": bool(exc_type),
            "conds": conds, "rules": rules,
        }
    return steps


def main():
    data = {
        "pt": parse_file(f"{REF}/pt/portuguese.rslp"),
        "gl": parse_file(f"{REF}/gl/galician.rslp"),
    }
    for lang, steps in data.items():
        n = sum(len(s["rules"]) for s in steps.values())
        print(f"{lang}: {len(steps)} steps, {n} rules")
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
