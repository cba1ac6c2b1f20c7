"""Build + verify the Stempel Polish stemmer table and fixture.

Three steps, mirroring the established fixture-oracle pattern
(make_lightstem_fixture.py / make_phonetic_fixture.py):

1. Convert the reference's serialized Egothor MultiTrie2 table
   (lucene/analysis/stempel/src/resources/.../stemmer_20000.tbl —
   Java DataOutput wire format: readUTF header, per-trie rows of
   {char -> (cmd, cnt, ref, skip)} cells) into the repo's compact
   ``fixtures_data/stempel_trie.json.gz``.  This is a DATA
   transformation — the table is the trained Polish stemmer model the
   reference itself ships as a resource.

2. Oracle-verify: compile the reference's own Trie/MultiTrie2/Diff/
   StempelStemmer sources (test oracle only — nothing enters the
   repo) plus a tiny original StempelDump driver, stem the full JUnit
   vectors + a deterministic 90k-word pseudo-Polish vocabulary
   (seeded stems x Polish inflectional suffix grid + random strings)
   through the JVM, and require lucene_solr_spark.analysis.stempel to
   reproduce every output EXACTLY (StempelFilter gating included).

3. Freeze an every-Nth sample of the verified pairs as lang ``pl``
   rows appended to fixtures_data/light_stems.parquet, which the
   fts_light_stemmers driver gate already replays LIVE vs the frozen
   stems (non-circular: frozen side is the JVM reference output).

Usage: python scripts/make_stempel_fixture.py
"""

import gzip
import json
import os
import random
import struct
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF = "/root/reference/lucene/analysis/stempel/src"
TBL = os.path.join(
    REF, "resources/org/apache/lucene/analysis/pl/stemmer_20000.tbl")
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
TRIE_OUT = os.path.join(FIX_DIR, "stempel_trie.json.gz")
STEMS_OUT = os.path.join(FIX_DIR, "light_stems.parquet")
ORACLE_DIR = "/tmp/stempel_oracle"
STRIDE = 120


# ------------------------------------------------ 1. table conversion

def read_tbl(path):
    buf = open(path, "rb").read()
    pos = [0]

    def rbool():
        v = buf[pos[0]] != 0
        pos[0] += 1
        return v

    def rint():
        v = struct.unpack_from(">i", buf, pos[0])[0]
        pos[0] += 4
        return v

    def rchar():
        v = struct.unpack_from(">H", buf, pos[0])[0]
        pos[0] += 2
        return chr(v)

    def rutf():
        n = struct.unpack_from(">H", buf, pos[0])[0]
        pos[0] += 2
        raw = buf[pos[0]:pos[0] + n]
        pos[0] += n
        out = []
        i = 0
        while i < n:  # modified UTF-8 (no 4-byte form; CESU-8 pairs ok)
            b = raw[i]
            if b < 0x80:
                out.append(chr(b))
                i += 1
            elif b >> 5 == 0b110:
                out.append(chr(((b & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            else:
                out.append(chr(((b & 0x0F) << 12)
                               | ((raw[i + 1] & 0x3F) << 6)
                               | (raw[i + 2] & 0x3F)))
                i += 3
        return "".join(out)

    method = rutf()
    assert "M" in method.upper(), f"not a MultiTrie table: {method!r}"
    forward = rbool()
    by = rint()
    tries = []
    for _ in range(rint()):
        tf = rbool()
        root = rint()
        cmds = [rutf() for _ in range(rint())]
        rows = []
        for _ in range(rint()):
            row = {}
            for _ in range(rint()):
                ch = rchar()
                cmd, _cnt, ref, _skip = rint(), rint(), rint(), rint()
                row[ch] = [cmd, ref]
            rows.append(row)
        assert not tf, "expected backward trie"
        tries.append({"root": root, "cmds": cmds, "rows": rows})
    assert pos[0] == len(buf), "trailing bytes in table"
    return {"method": method, "forward": forward, "BY": by,
            "tries": tries}


# ------------------------------------------------ 2. vocabulary

# inflectional endings a Polish noun/adjective/verb paradigm hits
# (declension cases, plurals, verb conjugation, participles,
# diminutives, comparatives) — breadth, not linguistics: the point is
# to exercise every trie level and patch-command family.
SUFFIXES = [
    "", "a", "i", "y", "u", "e", "o", "ą", "ę", "em", "om", "ie",
    "ach", "ami", "owi", "ów", "owie", "ego", "emu", "ych", "ymi",
    "ym", "im", "ich", "imi", "ej", "ą", "ość", "ości", "ościach",
    "ować", "uje", "ujesz", "ował", "owała", "owali", "owanie",
    "anie", "enie", "ienie", "ka", "ki", "ek", "ko", "kiem", "ny",
    "na", "ne", "nego", "nej", "nych", "szy", "ejszy", "ejsza",
    "ami", "ach", "cie", "my", "sz", "ł", "ła", "ło", "li", "ły",
    "ć", "ąc", "ący", "ące", "eń", "ień", "arz", "erz", "acz",
    "owy", "owa", "owe", "owych", "ista", "isty", "izm", "izmu",
]

ONSETS = ["b", "c", "ch", "cz", "d", "dz", "dź", "f", "g", "h", "j",
          "k", "l", "ł", "m", "n", "p", "pr", "r", "rz", "s", "sk",
          "st", "sz", "szcz", "t", "tr", "w", "wr", "z", "ź", "ż"]
VOWELS = ["a", "ą", "e", "ę", "i", "o", "ó", "u", "y"]
CODAS = ["", "b", "c", "ch", "cz", "d", "g", "j", "k", "l", "ł", "m",
         "n", "ń", "r", "rz", "s", "st", "sz", "t", "w", "z", "ż"]

REAL_WORDS = [
    # TestPolishAnalyzer vectors + everyday Polish
    "studenta", "studenci", "student", "studentami", "studentów",
    "był", "była", "było", "byli", "jest", "będzie",
    "książka", "książki", "książek", "książkami", "domy", "domów",
    "domami", "kobieta", "kobiety", "kobiet", "mężczyzna",
    "mężczyźni", "dziecko", "dzieci", "dziećmi", "miasto", "miasta",
    "miastach", "polski", "polska", "polskie", "polskiego",
    "wielki", "większy", "największy", "dobry", "lepszy",
    "najlepszy", "robić", "robię", "robisz", "robił", "zrobiony",
    "pisać", "piszę", "pisał", "napisany", "czytać", "czytanie",
    "mówić", "mówienie", "widzieć", "widziany", "nowoczesność",
    "uniwersytet", "uniwersytetu", "komputerowy", "komputerami",
    "analiza", "analizy", "analizować", "systemów", "systemami",
    "pracować", "pracownik", "pracownicy", "pracowników",
    "nauczyciel", "nauczyciele", "nauczycielka", "szkoła", "szkoły",
    "szkołami", "wydarzenie", "wydarzenia", "wydarzeniach",
]


def build_vocab():
    rng = random.Random(20000)
    vocab = set(REAL_WORDS)
    # stem x suffix grid
    for _ in range(1400):
        stem = rng.choice(ONSETS) + rng.choice(VOWELS)
        if rng.random() < 0.8:
            stem += rng.choice(CODAS) + rng.choice(VOWELS)
        stem += rng.choice(CODAS)
        for suf in SUFFIXES:
            vocab.add(stem + suf)
    # short + odd tokens: length gates, non-alphabet chars, case
    alpha = "aąbcćdeęfghijklłmnńoóprsśtuwyzźż"
    for _ in range(6000):
        n = rng.randint(1, 7)
        vocab.add("".join(rng.choice(alpha) for _ in range(n)))
    for _ in range(800):
        w = "".join(rng.choice(alpha + "XQ9-") for _ in range(rng.randint(2, 9)))
        vocab.add(w)
    return sorted(vocab)


# ------------------------------------------------ 3. JVM oracle

DRIVER = r'''
import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.lucene.analysis.stempel.StempelStemmer;

public class StempelDump {
  public static void main(String[] args) throws Exception {
    StempelStemmer st = new StempelStemmer(new FileInputStream(args[0]));
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = in.readLine()) != null) {
      StringBuilder s = st.stem(line);
      out.println(line + "\t" + (s == null ? " " : s.toString()));
    }
    out.flush();
  }
}
'''


def jvm_stems(vocab):
    src = os.path.join(ORACLE_DIR, "src")
    classes = os.path.join(ORACLE_DIR, "classes")
    os.makedirs(src, exist_ok=True)
    os.makedirs(classes, exist_ok=True)
    import glob
    import shutil
    for f in glob.glob(os.path.join(
            REF, "java/org/egothor/stemmer/*.java")):
        base = os.path.basename(f)
        # CLI tools pull in lucene-core's SuppressForbidden; skip them
        if base in ("package-info.java", "Compile.java", "DiffIt.java"):
            continue
        shutil.copy(f, src)
    shutil.copy(os.path.join(
        REF, "java/org/apache/lucene/analysis/stempel/StempelStemmer.java"),
        src)
    with open(os.path.join(src, "StempelDump.java"), "w") as f:
        f.write(DRIVER)
    subprocess.run(
        ["javac", "-d", classes, "-nowarn"]
        + glob.glob(os.path.join(src, "*.java")),
        check=True)
    inp = "\n".join(vocab) + "\n"
    out = subprocess.run(
        ["java", "-cp", classes, "StempelDump", TBL],
        input=inp.encode(), capture_output=True, check=True)
    pairs = {}
    for line in out.stdout.decode().splitlines():
        word, stem = line.split("\t")
        pairs[word] = None if stem == " " else stem
    return pairs


def main():
    table = read_tbl(TBL)
    with gzip.open(TRIE_OUT, "wt", encoding="utf-8") as f:
        json.dump(table, f, ensure_ascii=False,
                  separators=(",", ":"))
    print(f"table: {len(table['tries'])} tries -> {TRIE_OUT} "
          f"({os.path.getsize(TRIE_OUT)} bytes)")

    vocab = build_vocab()
    print(f"vocab: {len(vocab)} words")
    golden = jvm_stems(vocab)
    assert len(golden) == len(vocab)

    from lucene_solr_spark.analysis.stempel import (
        stempel_polish_stem, stempel_stem_raw)

    bad = []
    for w in vocab:
        mine = stempel_stem_raw(w)
        if mine != golden[w]:
            bad.append((w, golden[w], mine))
    if bad:
        print(f"MISMATCHES: {len(bad)}")
        for w, g, m in bad[:20]:
            print(f"  {w!r}: jvm={g!r} py={m!r}")
        sys.exit(1)
    print(f"verified {len(vocab)} words, 0 mismatches")

    # filter-level pairs (len<=3 passthrough, null keeps original)
    def filt(w, raw):
        return w if (len(w) <= 3 or not raw) else raw

    sample = [w for w in vocab[::STRIDE]]
    # always include the JUnit + real words
    sample = sorted(set(sample) | set(REAL_WORDS))
    rows = [{"lang": "pl", "term": w, "stem": filt(w, golden[w])}
            for w in sample]
    # sanity: live function agrees on the sample
    for r in rows:
        assert stempel_polish_stem(r["term"]) == r["stem"]

    df = pd.read_parquet(STEMS_OUT)
    df = df[df["lang"] != "pl"]
    df = pd.concat([df, pd.DataFrame(rows)], ignore_index=True)
    df.to_parquet(STEMS_OUT, index=False)
    print(f"fixture: +{len(rows)} pl rows -> {STEMS_OUT} "
          f"({len(df)} total)")


if __name__ == "__main__":
    main()
