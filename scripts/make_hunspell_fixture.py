"""Freeze the reference hunspell test suite as a fixture + verify.

The reference ships 34 micro .aff/.dic dictionaries and a JUnit test
per feature (lucene/analysis/common/src/test/org/apache/lucene/
analysis/hunspell/Test*.java), each asserting exact stem multisets
via StemmerTestBase.assertStemsTo.  This script mechanically extracts
every (dictionary-config, word, expected-stems) vector plus the
aff/dic file TEXTS (data, same provenance class as the frozen
Snowball vocabularies) into
lucene_solr_spark/fixtures_data/hunspell_tests.json.gz, then replays
all vectors against the repo's own implementation
(lucene_solr_spark/analysis/hunspell.py), aborting on any mismatch.

Usage: python scripts/make_hunspell_fixture.py
"""

import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_DIR = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/hunspell")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "hunspell_tests.json.gz")

_INIT = re.compile(
    r"init\(\s*(?:(true|false)\s*,\s*)?\"([^\"]+)\"((?:\s*,\s*\"[^\"]+\")*)\s*\)")
_STR = re.compile(r'"((?:[^"\\]|\\.)*)"')
_ASSERT = re.compile(r"assertStemsTo\(([^;]*?)\);", re.DOTALL)


def _java_str(s: str) -> str:
    """Decode Java escapes without mangling literal UTF-8 chars."""
    def repl(m):
        g = m.group(0)
        if g.startswith("\\u"):
            return chr(int(g[2:], 16))
        return {"n": "\n", "t": "\t", "r": "\r"}.get(g[1], g[1])

    return re.sub(r"\\u[0-9a-fA-F]{4}|\\.", repl, s)


def main() -> None:
    suites = {}
    for fname in sorted(os.listdir(TEST_DIR)):
        if not (fname.startswith("Test") and fname.endswith(".java")):
            continue
        src = open(os.path.join(TEST_DIR, fname), encoding="utf-8").read()
        if "extends StemmerTestBase" not in src:
            continue
        m = _INIT.search(src)
        if not m:
            continue
        ignore_case = m.group(1) == "true"
        files = [m.group(2)] + _STR.findall(m.group(3) or "")
        aff, dics = files[0], files[1:]
        cases = []
        for am in _ASSERT.finditer(src):
            strings = [_java_str(x) for x in _STR.findall(am.group(1))]
            if strings:
                cases.append({"word": strings[0],
                              "stems": sorted(strings[1:])})
        if not cases:
            continue
        name = fname[len("Test"):-len(".java")]
        try:
            aff_text = open(os.path.join(TEST_DIR, aff),
                            encoding="utf-8").read()
            dic_texts = [open(os.path.join(TEST_DIR, d),
                              encoding="utf-8").read() for d in dics]
        except FileNotFoundError as e:
            print(f"skip {name}: {e}")
            continue
        suites[name] = {
            "aff": aff_text, "dics": dic_texts,
            "ignore_case": ignore_case, "cases": cases,
        }

    # verify the live implementation against every vector
    from lucene_solr_spark.analysis.hunspell import HunspellDictionary

    total = bad_total = 0
    for name, suite in sorted(suites.items()):
        try:
            d = HunspellDictionary(suite["aff"], suite["dics"],
                                   suite["ignore_case"])
        except Exception as e:
            print(f"FAIL {name}: parse error {type(e).__name__}: {e}")
            bad_total += len(suite["cases"])
            continue
        bad = []
        for case in suite["cases"]:
            got = sorted(d.stem(case["word"]))
            if got != case["stems"]:
                bad.append((case["word"], case["stems"], got))
        total += len(suite["cases"])
        bad_total += len(bad)
        status = "ok" if not bad else f"{len(bad)} BAD e.g. {bad[:3]}"
        print(f"{name}: {len(suite['cases'])} vectors, {status}")
    print(f"total: {total} vectors, {bad_total} mismatches, "
          f"{len(suites)} suites")
    if bad_total:
        sys.exit(1)

    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(suites, f, separators=(",", ":"))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")

    # flat parquet twin for the DuckDB gate oracle
    import pandas as pd

    rows = [
        {"suite": name, "word": c["word"],
         "stems": "|".join(c["stems"])}
        for name, suite in sorted(suites.items())
        for c in suite["cases"]
    ]
    pq = OUT.replace("hunspell_tests.json.gz", "hunspell_cases.parquet")
    pd.DataFrame(rows).to_parquet(pq, index=False)
    print(f"wrote {len(rows)} rows -> {pq}")


if __name__ == "__main__":
    main()
