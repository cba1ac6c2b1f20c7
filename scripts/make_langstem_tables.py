"""Extract per-language stemmer suffix tables from the reference.

Parses the endsWith-cascade data out of the reference's
lucene/analysis/common per-language stemmers (Hindi/Bengali suffix
lists, the Latvian affix table) into
lucene_solr_spark/fixtures_data/langstem_tables.json — data, not
code; the same provenance class as the frozen test vocabularies.

Usage: python scripts/make_langstem_tables.py
"""

import json
import os
import re

REF = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
       "lucene/analysis")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "langstem_tables.json",
)

BLOCK = re.compile(
    r"if \(+len > (\d+)\)?\s*(?:&&)?\s*\(*(.*?)\)+\s*return len - (\d+);",
    re.S,
)
SUF = re.compile(r'endsWith\(\w+, len, "([^"]+)"\)')


def cascade(path):
    """[(min_len_exclusive, strip, [suffixes])] in source order."""
    src = open(path, encoding="utf-8").read()
    out = []
    for m in BLOCK.finditer(src):
        sufs = SUF.findall(m.group(2))
        if sufs:
            out.append([int(m.group(1)), int(m.group(3)), sufs])
    return out


AFFIX = re.compile(r'new Affix\("([^"]+)",\s*(\d+),\s*(true|false)\)')


def latvian(path):
    src = open(path, encoding="utf-8").read()
    return [[a, int(vc), p == "true"] for a, vc, p in AFFIX.findall(src)]


def main():
    data = {
        "hindi": cascade(f"{REF}/hi/HindiStemmer.java"),
        "bengali": cascade(f"{REF}/bn/BengaliStemmer.java"),
        "latvian": latvian(f"{REF}/lv/LatvianStemmer.java"),
    }
    for lang, tab in data.items():
        n = sum(len(b[2]) for b in tab) if lang != "latvian" else len(tab)
        print(lang, n, "entries")
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
