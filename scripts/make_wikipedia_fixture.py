"""Freeze the WikipediaTokenizer fixture for the driver gate.

Semantics are pinned by the reference JUnit vectors
(tests/test_wikipedia.py — incl. the 97-token handwritten corpus and
the BOTH-mode offsets/posInc/flags table); this script replays the
three output modes over a deterministic generated wiki-markup corpus
and freezes (mode, input_s, output_s) to
fixtures_data/wikipedia_cases.parquet so the driver gate verifies the
DISTRIBUTED pipeline (Arrow dispatcher on Spark) reproduces the
pinned contract — the cjk/porter/morefilters pattern.

Usage: python scripts/make_wikipedia_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

MODES = {
    "tokens_only": (0, ()),
    "untokenized_only": (1, ("c", "i", "b", "il")),
    "both": (2, ("c", "i", "h")),
}


def gen_corpus():
    rng = random.Random(20260819)
    docs = [
        "This is a [[Category:foo]]",
        ("click [[link here again]] click "
         "[http://lucene.apache.org here again] [[Category:a b c d]]"),
        ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
         "[[link there]] ''italics here'' something ''more italics'' "
         "[[Category:h   i   j]]"),
        "Here is ''italics'' and '''bold''' and '''''five quotes'''''",
        "==heading== ===sub head=== tail [[link|display info]]",
        "{{Infobox_person | name = X}} {{cite web|url=y}} <ref>Cit</ref>",
        "AT&T U.S.A. O'Reilly's wiki@example.com foo.bar.com 1.2.3 $3.25",
        "日本語 テスト 한국어 text",
        "a [[never closed category",
        "''unclosed italics [[Category:foo]] rest",
        "<sup>martian</sup> <span class=\"glue\">code</span> <br>",
    ]
    words = ["alpha", "beta", "Gamma", "delta42", "3.14", "AT&T",
             "O'Neil", "web.site.org", "x", "日本", "한국"]
    for _ in range(400):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            r = rng.random()
            w = " ".join(rng.choice(words)
                         for _ in range(rng.randrange(1, 4)))
            if r < 0.15:
                parts.append("[[%s]]" % w)
            elif r < 0.3:
                parts.append("[[Category:%s]]" % w)
            elif r < 0.4:
                parts.append("[http://ex%d.org/p%d %s"
                             % (rng.randrange(9), rng.randrange(9), w)
                             + ("]" if rng.random() < 0.8 else ""))
            elif r < 0.5:
                q = rng.choice(("''", "'''", "'''''"))
                parts.append(q + w + (q if rng.random() < 0.8 else ""))
            elif r < 0.58:
                e = rng.choice(("==", "==="))
                parts.append(e + w + e)
            elif r < 0.66:
                parts.append("{{%s}}" % w)
            elif r < 0.72:
                parts.append("<ref>%s</ref>" % w)
            else:
                parts.append(w)
        docs.append(" ".join(parts))
    return docs


def main():
    from lucene_solr_spark.analysis.wikipedia import wikipedia_tokenize

    rows = []
    for mode_name, (mode, untok) in sorted(MODES.items()):
        for d in gen_corpus():
            toks = wikipedia_tokenize(d, mode, untok)
            out = SEP.join(
                FS.join((t.term, t.type, str(t.start), str(t.pos_inc),
                         str(t.flags))) for t in toks)
            rows.append((mode_name, d, out))
    df = pd.DataFrame(rows, columns=["mode", "input_s", "output_s"])
    df = df.drop_duplicates(["mode", "input_s"])
    out_pq = os.path.join(FIX_DIR, "wikipedia_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d wikipedia vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    main()
