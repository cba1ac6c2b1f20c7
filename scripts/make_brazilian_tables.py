"""Extract the BrazilianStemmer step1/step2 rule tables from the
reference source into fixtures_data/brazilian_rules.json (data, not
code — the snowball_tables.json provenance class).

Each rule records: the matched suffix, the region condition (CT+R1 /
CT+R2 / CT+RV+preceded / RV), the group length guard, the action
(remove / replace / noop — the reference's `logias` branch discards
its replaceSuffix result, which must be preserved), and the
replacement string.

Usage: python scripts/make_brazilian_tables.py
"""

import json
import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
       "lucene/analysis/br/BrazilianStemmer.java")
OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "brazilian_rules.json")


def extract(body: str):
    rules = []
    guard = 0
    guard_on = None
    i = 0
    lines = body.splitlines()
    while i < len(lines):
        line = lines[i]
        m = re.search(r"if \((CT|RV)\.length\(\) >= (\d+)\)", line)
        if m:
            guard_on, guard = m.group(1), int(m.group(2))
            i += 1
            continue
        m = re.search(r"if \(suffix\((CT|RV),\"([^\"]+)\"\)", line)
        if m:
            region1, suf = m.group(1), m.group(2)
            # pull the full condition + action (may span lines)
            blk = line
            j = i
            while "return" not in blk and "}" not in blk and j + 1 < len(lines):
                j += 1
                blk += " " + lines[j]
            cond2 = re.search(r"&&\s*suffix\((R1|R2|RV),\"[^\"]+\"\)", blk)
            prec = re.search(
                r"suffixPreceded\((CT|RV),\"[^\"]+\",\"([^\"]+)\"\)", blk)
            assign = "CT = " in blk or "CT=" in blk
            rep = re.search(
                r"replaceSuffix\(CT,\"[^\"]+\",\"([^\"]*)\"\)", blk)
            rem = re.search(r"removeSuffix\(CT,\"([^\"]+)\"\)", blk)
            rules.append({
                "suffix": suf,
                "region1": region1,
                "region2": cond2.group(1) if cond2 else None,
                "preceded": prec.group(2) if prec else None,
                "guard_on": guard_on,
                "guard": guard,
                "action": ("replace" if rep and assign
                           else "noop" if rep else "remove"),
                "replace": rep.group(1) if rep else None,
                "remove": rem.group(1) if rem else suf,
            })
            i = j + 1
            continue
        i += 1
    return rules


def main():
    src = open(SRC, encoding="utf-8").read()

    def body(name):
        s = src.index("private boolean %s()" % name)
        e = src.index("\n  }", s)
        return src[s:e]

    step1 = extract(body("step1"))
    step2 = extract(body("step2"))
    assert step1[0]["suffix"] == "uciones" and step1[0]["action"] == "replace"
    noop = [r for r in step1 if r["action"] == "noop"]
    assert len(noop) == 1 and noop[0]["suffix"] == "logias"
    iras = [r for r in step1 if r["preceded"]]
    assert {r["suffix"] for r in iras} == {"iras", "ira"}
    assert all(r["region1"] == "RV" and r["region2"] is None
               and r["action"] == "remove" for r in step2)
    odd = [r for r in step2 if r["remove"] != r["suffix"]]
    # the reference's preserved bug: the first "ira" verb rule removes
    # "ava" (a no-op on an ira-final term) yet still reports altered
    assert [(r["suffix"], r["remove"]) for r in odd] == [("ira", "ava")]
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"step1": step1, "step2": step2}, f, indent=0,
                  sort_keys=True)
    print("step1: %d rules, step2: %d rules -> %s"
          % (len(step1), len(step2), OUT))


if __name__ == "__main__":
    main()
