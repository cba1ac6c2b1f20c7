"""Verify the BrazilianStemmer + classic GermanStemmer rebuilds
against the reference's own classes compiled as a JVM test oracle
(the make_snowball5_fixture.py pattern — both classes are standalone,
nothing compiled enters the repo), then append every-Nth verified
pair to fixtures_data/light_stems.parquet for the
fts_light_stemmers driver gate.

The oracle applies the FILTER contract: BrazilianStemFilter keeps the
original token when stem() returns null; GermanStemFilter emits
stem() of the raw token.

Usage: python scripts/make_brazilian_fixture.py
"""

import os
import random
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis"
WORK = "/tmp/brde_oracle"
FIX = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "light_stems.parquet")
STRIDE = 40

DUMP = """import java.io.*;
import java.lang.reflect.Method;
import java.nio.charset.StandardCharsets;

public class StemDump2 {
  public static void main(String[] args) throws Exception {
    Object st;
    Method m;
    if (args[0].equals("br")) {
      Class<?> c = Class.forName(
          "org.apache.lucene.analysis.br.BrazilianStemmer");
      st = c.getDeclaredConstructor().newInstance();
      m = c.getDeclaredMethod("stem", String.class);
    } else {
      Class<?> c = Class.forName(
          "org.apache.lucene.analysis.de.GermanStemmer");
      st = c.getDeclaredConstructor().newInstance();
      m = c.getDeclaredMethod("stem", String.class);
    }
    m.setAccessible(true);
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = in.readLine()) != null) {
      String s = (String) m.invoke(st, line);
      if (args[0].equals("br")) {
        out.println(s == null ? line : s);  // filter contract
      } else {
        out.println(s);
      }
    }
    out.flush();
  }
}
"""


def build_oracle():
    shutil.rmtree(WORK, ignore_errors=True)
    br = os.path.join(WORK, "org/apache/lucene/analysis/br")
    de = os.path.join(WORK, "org/apache/lucene/analysis/de")
    os.makedirs(br)
    os.makedirs(de)
    shutil.copy(os.path.join(REF, "br/BrazilianStemmer.java"), br)
    shutil.copy(os.path.join(REF, "de/GermanStemmer.java"), de)
    with open(os.path.join(WORK, "StemDump2.java"), "w") as f:
        f.write(DUMP)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-d", WORK,
         os.path.join(WORK, "StemDump2.java"),
         os.path.join(br, "BrazilianStemmer.java"),
         os.path.join(de, "GermanStemmer.java")],
        check=True)


def gen_words(lang: str):
    rng = random.Random(20260819 + hash(lang) % 1000)
    words = []
    if lang == "br":
        roots = ["cas", "falar", "bol", "menin", "cant", "govern",
                 "beb", "propos", "log", "soluc", "grand", "quilomet",
                 "garc", "sa", "ge", "x"]
        sufs = ["a", "as", "o", "os", "uciones", "imentos", "amentos",
                "adores", "logias", "encias", "amente", "idades",
                "acoes", "icos", "ista", "oso", "iva", "eiras", "iras",
                "ira", "issemos", "aremos", "avamos", "aria", "endo",
                "ando", "indo", "aram", "asse", "ei", "ou", "e", "i",
                "gue", "cie", "ara", "era", "ia", "armos", "eis",
                "adas", "idas", "ajes", "emos", "amos", "", "s"]
        alphabet = "abcdefghijlmnopqrstuvxzãõçáéíóúâêô"
    else:
        roots = ["haus", "kind", "lauf", "geh", "schön", "müll",
                 "weiß", "matriz", "lehrerin", "geben", "gege", "st",
                 "ei", "ie", "sch", "x"]
        sufs = ["", "e", "en", "er", "em", "nd", "s", "n", "t", "est",
                "ern", "erinnen", "chen", "ig", "isch", "lich", "ung",
                "heit", "keit", "innen"]
        alphabet = "abcdefghijklmnopqrstuvwxyzäöüß"
    for r in roots:
        for s in sufs:
            words.append(r + s)
            words.append((r + s).capitalize())
    for _ in range(25000):
        words.append("".join(rng.choice(alphabet)
                             for _ in range(rng.randrange(1, 14))))
    # non-letter / boundary shapes
    words += ["", "a", "ab", "abc", "x" * 29, "x" * 30, "x" * 31,
              "casa-", "-casa", "'casa'", "ca sa", "casa9", "über",
              '"quote"', "?!x!?"]
    return [w for w in words if w]


def main():
    from lucene_solr_spark.analysis.brazilian import (
        brazilian_stem, german_classic_stem,
    )

    build_oracle()
    rows = []
    for lang, fn in (("br", brazilian_stem),
                     ("de_classic", german_classic_stem)):
        words = gen_words("br" if lang == "br" else "de")
        proc = subprocess.run(
            ["java", "-cp", WORK, "StemDump2",
             "br" if lang == "br" else "de"],
            input="\n".join(words).encode(), capture_output=True,
            check=True)
        got = proc.stdout.decode().splitlines()
        assert len(got) == len(words)
        bad = 0
        for k, (w, want) in enumerate(zip(words, got)):
            mine = fn(w)
            if mine != want:
                bad += 1
                if bad <= 10:
                    print("MISMATCH %s %r: py=%r jvm=%r"
                          % (lang, w, mine, want))
            elif k % STRIDE == 0:
                rows.append((lang, w, want))
        print("%s: verified %d words vs JVM oracle, %d mismatches"
              % (lang, len(words), bad))
        if bad:
            sys.exit(1)

    df = pd.read_parquet(FIX)
    df = df[~df["lang"].isin(("br", "de_classic"))]
    add = pd.DataFrame(rows, columns=["lang", "term", "stem"])
    out = pd.concat([df, add], ignore_index=True)
    out.to_parquet(FIX, index=False)
    print("fixture: +%d rows -> %s (%d total)" % (len(add), FIX, len(out)))


if __name__ == "__main__":
    main()
