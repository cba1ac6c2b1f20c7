"""Freeze Snowball suffix tables (Among arrays) as a JSON fixture.

The generated org/tartarus/snowball/ext/*Stemmer.java files in the
reference carry the published Snowball algorithms' suffix tables as
`new Among("suffix", parent, action, ...)` arrays. This script
extracts those DATA tables (suffix string + action id, \\uXXXX
unescaped) for the languages whose engines analysis/snowball_*.py
implement from the published specs, writing
lucene_solr_spark/fixtures_data/snowball_tables.json. Same provenance
class as the frozen test vocabularies: published algorithm data, not
code.

Usage: python scripts/make_snowball_tables.py
"""

import json
import os
import re

REF = ("/root/reference/lucene/analysis/common/src/java/org/tartarus/"
       "snowball/ext")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "snowball_tables.json",
)

ARRAY = re.compile(
    r"private final static Among (a_\d+)\[\] = \{(.*?)\};", re.S
)
ENTRY = re.compile(r'new Among\s*\(\s*"((?:[^"\\]|\\.)*)", -?\d+, (-?\d+), "([^"]*)"')


def unescape(s: str) -> str:
    return re.sub(
        r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s
    )


def extract(java_file: str, with_conds: bool = False) -> dict:
    src = open(java_file, encoding="utf-8").read()
    tables = {}
    for name, body in ARRAY.findall(src):
        tables[name] = [
            [unescape(t), int(a), cond]
            if (with_conds and cond) else [unescape(t), int(a)]
            for t, a, cond in ENTRY.findall(body)
        ]
    return tables


def main():
    data = {
        "russian": extract(f"{REF}/RussianStemmer.java"),
        "spanish": extract(f"{REF}/SpanishStemmer.java"),
        "italian": extract(f"{REF}/ItalianStemmer.java"),
        "french": extract(f"{REF}/FrenchStemmer.java"),
        "dutch": extract(f"{REF}/DutchStemmer.java"),
        "romanian": extract(f"{REF}/RomanianStemmer.java"),
        "hungarian": extract(f"{REF}/HungarianStemmer.java"),
        "finnish": extract(f"{REF}/FinnishStemmer.java"),
        "lovins": extract(f"{REF}/LovinsStemmer.java", with_conds=True),
        "arabic": extract(f"{REF}/ArabicStemmer.java"),
        "turkish": extract(f"{REF}/TurkishStemmer.java"),
        "kp": extract(f"{REF}/KpStemmer.java"),
        "portuguese": extract(f"{REF}/PortugueseStemmer.java"),
        "armenian": extract(f"{REF}/ArmenianStemmer.java"),
        "basque": extract(f"{REF}/BasqueStemmer.java"),
        "catalan": extract(f"{REF}/CatalanStemmer.java"),
        "irish": extract(f"{REF}/IrishStemmer.java"),
        "lithuanian": extract(f"{REF}/LithuanianStemmer.java"),
    }
    for lang, tabs in data.items():
        print(lang, {k: len(v) for k, v in sorted(tabs.items())})
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
