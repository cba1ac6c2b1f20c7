"""Verify + freeze the five Snowball stemmers that have no published
test vocabulary in the reference tree (Armenian, Basque, Catalan,
Irish, Lithuanian — the reference's TestSnowballVocabData.zip covers
only the other 20 algorithms).

Oracle = the reference's OWN generated stemmers compiled as a JVM
test oracle (the established make_stempel_fixture.py pattern —
nothing compiled enters the repo): org/tartarus/snowball/{Among,
SnowballProgram} + the five ext/*Stemmer.java, driven by an original
StemDump main over a deterministic ~60k-word pseudo-vocabulary per
language (seeded roots x the algorithm's own suffix/prefix grid +
random alphabet strings + boundary shapes). The Python rebuilds in
analysis/snowball_{armenian,basque,catalan,irish,lithuanian}.py must
match word-for-word; every-Nth verified pair is then appended to
fixtures_data/light_stems.parquet, which the fts_light_stemmers
driver gate replays LIVE vs the frozen stems.

Usage: python scripts/make_snowball5_fixture.py
"""

import json
import os
import random
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF_SB = ("/root/reference/lucene/analysis/common/src/java/org/tartarus/"
          "snowball")
ORACLE = "/tmp/snowball5_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
TABLES = os.path.join(FIX_DIR, "snowball_tables.json")
STEMS_OUT = os.path.join(FIX_DIR, "light_stems.parquet")
STRIDE = 40

ARRAYUTIL = """package org.apache.lucene.util;
public final class ArrayUtil {
  public static int oversize(int minTargetSize, int bytesPerElement) {
    return Math.max(minTargetSize, minTargetSize + (minTargetSize >> 3) + 8);
  }
}
"""

STEMDUMP = """import java.io.*;
import java.nio.charset.StandardCharsets;
import org.tartarus.snowball.SnowballProgram;

public class StemDump {
  public static void main(String[] args) throws Exception {
    SnowballProgram st = (SnowballProgram)
        Class.forName("org.tartarus.snowball.ext." + args[0] + "Stemmer")
             .getDeclaredConstructor().newInstance();
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = in.readLine()) != null) {
      st.setCurrent(line);
      st.stem();
      out.println(st.getCurrent());
    }
    out.flush();
  }
}
"""

LANGS = {
    # lang key -> (JVM class prefix, table key, alphabet)
    "hy_snowball": ("Armenian", "armenian",
                    "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ"),
    "eu_snowball": ("Basque", "basque",
                    "abdefghijklmnoprstuxz"),
    "ca_snowball": ("Catalan", "catalan",
                    "abcdefghijlmnopqrstuvxyz·àáèéíïòóúüç"),
    "ga_snowball": ("Irish", "irish",
                    "abcdefghilmnoprstuáéíóú'-"),
    "lt_snowball": ("Lithuanian", "lithuanian",
                    "abcdefghijklmnoprstuvyzęąėįūųšžč"),
}


def compile_oracle():
    if os.path.exists(ORACLE):
        shutil.rmtree(ORACLE)
    src = os.path.join(ORACLE, "src")
    os.makedirs(os.path.join(src, "org/tartarus/snowball/ext"))
    os.makedirs(os.path.join(src, "org/apache/lucene/util"))
    for f in ("Among.java", "SnowballProgram.java"):
        shutil.copy(os.path.join(REF_SB, f),
                    os.path.join(src, "org/tartarus/snowball", f))
    for cls, _, _ in LANGS.values():
        shutil.copy(os.path.join(REF_SB, "ext", f"{cls}Stemmer.java"),
                    os.path.join(src, "org/tartarus/snowball/ext"))
    with open(os.path.join(src, "org/apache/lucene/util/ArrayUtil.java"),
              "w") as f:
        f.write(ARRAYUTIL)
    with open(os.path.join(src, "StemDump.java"), "w") as f:
        f.write(STEMDUMP)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-d", f"{ORACLE}/classes",
         f"{src}/org/apache/lucene/util/ArrayUtil.java",
         f"{src}/org/tartarus/snowball/Among.java",
         f"{src}/org/tartarus/snowball/SnowballProgram.java",
         *[f"{src}/org/tartarus/snowball/ext/{c}Stemmer.java"
           for c, _, _ in LANGS.values()],
         f"{src}/StemDump.java"],
        check=True)


def vocabulary(table_key: str, alphabet: str) -> list:
    """Deterministic pseudo-vocabulary: roots x the algorithm's own
    suffix grid (the shapes the control flow dispatches on) + random
    strings + boundary shapes."""
    rng = random.Random(f"snowball5:{table_key}")
    tables = json.load(open(TABLES, encoding="utf-8"))[table_key]
    suffixes = sorted({e[0] for tab in tables.values() for e in tab if e[0]})
    letters = [c for c in alphabet if c not in "'-·"]
    words = set()
    roots = []
    for _ in range(180):
        n = rng.randint(1, 6)
        roots.append("".join(rng.choice(letters) for _ in range(n)))
    # every table suffix on a rotating sample of roots (and bare)
    for i, suf in enumerate(suffixes):
        words.add(suf)
        for r in rng.sample(roots, 12):
            words.add(r + suf)
        # stacked pairs exercise repeat-loops and fix-up steps
        words.add(roots[i % len(roots)] + suffixes[(i * 7) % len(suffixes)]
                  + suf)
    # random strings + boundary shapes
    for _ in range(18000):
        n = rng.randint(1, 12)
        words.add("".join(rng.choice(letters) for _ in range(n)))
    for c in letters:
        words.add(c)
        words.add(c * 2)
        words.add(c * 3)
    return sorted(words)


def oracle_stems(cls: str, words: list) -> list:
    out = subprocess.run(
        ["java", "-cp", f"{ORACLE}/classes", "StemDump", cls],
        input="\n".join(words).encode("utf-8"),
        stdout=subprocess.PIPE, check=True)
    stems = out.stdout.decode("utf-8").splitlines()
    assert len(stems) == len(words)
    return stems


def main():
    compile_oracle()
    from lucene_solr_spark.analysis.lightstem import STEMMERS

    all_rows = []
    for lang, (cls, tkey, alphabet) in sorted(LANGS.items()):
        words = vocabulary(tkey, alphabet)
        expected = oracle_stems(cls, words)
        fn = STEMMERS[lang]
        bad = [(w, e, fn(w)) for w, e in zip(words, expected)
               if fn(w) != e]
        assert not bad, (
            f"{lang}: {len(bad)}/{len(words)} mismatches, "
            f"e.g. {bad[:5]}")
        sample = list(zip(words, expected))[::STRIDE]
        all_rows.extend(
            {"lang": lang, "term": w, "stem": s} for w, s in sample)
        print(f"{lang}: verified {len(words)} words vs JVM oracle, "
              f"sampled {len(sample)}")

    df = pd.read_parquet(STEMS_OUT)
    df = df[~df["lang"].isin(list(LANGS))]
    df = pd.concat([df, pd.DataFrame(all_rows)], ignore_index=True)
    df.to_parquet(STEMS_OUT, index=False)
    print(f"fixture: +{len(all_rows)} rows -> {STEMS_OUT} ({len(df)} total)")


if __name__ == "__main__":
    main()
