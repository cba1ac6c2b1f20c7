"""Verify the Python Liang hyphenator against the reference's own
hyphenation engine compiled as a JVM test oracle (the established
make_snowball5_fixture.py pattern — nothing compiled enters the repo).

The reference package org/apache/lucene/analysis/compound/hyphenation
is self-contained (java.* + org.xml.sax only), so it compiles without
stubs. A HyphDump main loads da_UTF8.xml and prints the hyphenation
points (remain=1, push=1 — the HyphenationCompoundWordTokenFilter
call) for every stdin word; the Python hyphenate() must agree
exactly, including None for unbreakable words.

Usage: python scripts/verify_hyphenation_jvm.py
"""

import os
import random
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_HYPH = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
            "lucene/analysis/compound/hyphenation")
REF_XML = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
           "lucene/analysis/compound/da_UTF8.xml")
WORK = "/tmp/hyph_oracle"

HYPHDUMP = """import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.lucene.analysis.compound.hyphenation.*;
import org.xml.sax.InputSource;

public class HyphDump {
  public static void main(String[] args) throws Exception {
    HyphenationTree tree = new HyphenationTree();
    tree.loadPatterns(new InputSource(new File(args[0]).toURI().toString()));
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = in.readLine()) != null) {
      char[] w = line.toCharArray();
      Hyphenation h = tree.hyphenate(w, 0, w.length, 1, 1);
      if (h == null) {
        out.println("-");
      } else {
        StringBuilder sb = new StringBuilder();
        for (int p : h.getHyphenationPoints()) {
          if (sb.length() > 0) sb.append(',');
          sb.append(p);
        }
        out.println(sb);
      }
    }
    out.flush();
  }
}
"""


def main():
    from lucene_solr_spark.analysis.compound import (
        hyphenate, load_hyphenation_fixture,
    )

    shutil.rmtree(WORK, ignore_errors=True)
    pkg = os.path.join(
        WORK, "org/apache/lucene/analysis/compound/hyphenation")
    os.makedirs(pkg)
    for f in os.listdir(REF_HYPH):
        if f.endswith(".java"):
            shutil.copy(os.path.join(REF_HYPH, f), pkg)
    # PatternParser.resolveEntity serves hyphenation.dtd from the
    # classpath package (PatternParser.java:250)
    dtd = ("/root/reference/lucene/analysis/common/src/resources/org/"
           "apache/lucene/analysis/compound/hyphenation/hyphenation.dtd")
    if not os.path.exists(dtd):
        dtd = os.path.join(os.path.dirname(REF_XML), "hyphenation.dtd")
    shutil.copy(dtd, pkg)
    with open(os.path.join(WORK, "HyphDump.java"), "w") as f:
        f.write(HYPHDUMP)
    subprocess.run(
        ["javac", "-d", WORK, os.path.join(WORK, "HyphDump.java")]
        + [os.path.join(pkg, f) for f in os.listdir(pkg)
           if f.endswith(".java")],
        check=True, cwd=WORK)

    rng = random.Random(20260819)
    words = ["basketballkurv", "læsehest", "min", "veninde",
             "Vindrutetorkarblad", "x", "", "læse-hest", "99læse",
             "læse99", "LÆSEHEST", "Basfiolsfodralmakaregesäll"]
    parts = ["læse", "hest", "basket", "ball", "kurv", "bog", "hus",
             "vand", "mølle", "bil", "dörr", "makare", "sko"]
    alpha = "abcdefghijklmnopqrstuvwxyzæøåé"
    for _ in range(30000):
        r = rng.random()
        if r < 0.5:
            w = "".join(rng.choice(parts)
                        for _ in range(rng.randrange(1, 5)))
        else:
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(1, 16)))
        if rng.random() < 0.2:
            w = w.capitalize()
        if rng.random() < 0.05:
            w += "s"
        words.append(w)
    words = [w for w in words if w]

    proc = subprocess.run(
        ["java", "-cp", WORK, "HyphDump", REF_XML],
        input="\n".join(words).encode(), capture_output=True, check=True)
    jvm_lines = proc.stdout.decode().splitlines()
    assert len(jvm_lines) == len(words)

    pats = load_hyphenation_fixture("hyphenation_da")
    bad = 0
    for w, jline in zip(words, jvm_lines):
        mine = hyphenate(w, pats, 1, 1)
        mine_s = "-" if mine is None else ",".join(map(str, mine))
        if mine_s != jline:
            bad += 1
            if bad <= 10:
                print(f"MISMATCH {w!r}: py={mine_s} jvm={jline}")
    print(f"verified {len(words)} words vs JVM oracle, {bad} mismatches")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
