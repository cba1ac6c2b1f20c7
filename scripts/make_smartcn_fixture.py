"""Build + verify the smartcn HHMM segmentation fixtures.

Mirrors the established fixture-oracle pattern (make_stempel_fixture.py):

1. Compile the reference's own smartcn sources (test oracle ONLY —
   nothing enters the repo) plus two tiny original drivers, and dump
   the WordDictionary the reference itself loads from its shipped
   ``coredict.mem`` into ``fixtures_data/smartcn_coredict.parquet``
   (head, rank, suffix, freq), along with the Java-computed Viterbi
   edge weight for every distinct frequency
   (``fixtures_data/smartcn_weights.parquet``). NOTE: the reference
   tree ships NO bigram table (``bigramdict.mem``/``.dct`` absent from
   src/resources), so the oracle runs the reference loader over an
   empty bigram file — every word-pair frequency is 0, which the
   weight table reflects exactly.

2. Oracle-verify: run the reference WordSegmenter.segmentSentence over
   the JUnit sentences plus a deterministic mixed-script stress corpus,
   and require lucene_solr_spark.analysis.smartcn.segment_tokens to
   reproduce every (start, end, wordType, text) EXACTLY.

3. Freeze the ZH_PHRASES -> token list contract as
   ``fixtures_data/smartcn_segments.parquet`` for the driver gate
   (Spark segments LIVE, DuckDB joins the frozen oracle output).

Usage: python scripts/make_smartcn_fixture.py
"""

import os
import random
import shutil
import struct
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF = "/root/reference/lucene/analysis/smartcn/src"
WORK = "/tmp/smartcn_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
CORE_OUT = os.path.join(FIX_DIR, "smartcn_coredict.parquet")
WEIGHTS_OUT = os.path.join(FIX_DIR, "smartcn_weights.parquet")
SEGMENTS_OUT = os.path.join(FIX_DIR, "smartcn_segments.parquet")

DUMP_MAIN = "org.apache.lucene.analysis.cn.smart.hhmm.SmartcnDump"
ORACLE_MAIN = "org.apache.lucene.analysis.cn.smart.SmartcnOracle"

DUMP_JAVA = r'''
package org.apache.lucene.analysis.cn.smart.hhmm;

import java.io.PrintWriter;
import java.lang.reflect.Field;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.TreeSet;

import org.apache.lucene.analysis.cn.smart.Utility;

public class SmartcnDump {
  public static void main(String[] args) throws Exception {
    WordDictionary dict = WordDictionary.getInstance();
    Field fIdx = WordDictionary.class.getDeclaredField("wordIndexTable");
    Field fChar = WordDictionary.class.getDeclaredField("charIndexTable");
    Field fWords = WordDictionary.class.getDeclaredField("wordItem_charArrayTable");
    Field fFreq = WordDictionary.class.getDeclaredField("wordItem_frequencyTable");
    fIdx.setAccessible(true);
    fChar.setAccessible(true);
    fWords.setAccessible(true);
    fFreq.setAccessible(true);
    short[] wordIndexTable = (short[]) fIdx.get(dict);
    char[] charIndexTable = (char[]) fChar.get(dict);
    char[][][] words = (char[][][]) fWords.get(dict);
    int[][] freqs = (int[][]) fFreq.get(dict);

    TreeSet<Integer> distinctFreqs = new TreeSet<>();
    distinctFreqs.add(0);
    distinctFreqs.add(Utility.MAX_FREQUENCE);

    try (PrintWriter out = new PrintWriter(Files.newBufferedWriter(
        Paths.get(args[0]), StandardCharsets.UTF_8))) {
      for (int i = 0; i < charIndexTable.length; i++) {
        char head = charIndexTable[i];
        if (head == 0) continue;
        int row = wordIndexTable[i];
        if (row < 0 || words[row] == null) continue;
        char[][] items = words[row];
        int[] fr = freqs[row];
        for (int j = 0; j < items.length; j++) {
          String suffix = items[j] == null ? "" : new String(items[j]);
          out.print(hex(String.valueOf(head)));
          out.print('\t');
          out.print(j);
          out.print('\t');
          out.print(hex(suffix));
          out.print('\t');
          out.println(fr[j]);
          distinctFreqs.add(fr[j]);
        }
      }
    }

    double smooth = 0.1;
    double tinyDouble = 1.0 / Utility.MAX_FREQUENCE;
    try (PrintWriter out = new PrintWriter(Files.newBufferedWriter(
        Paths.get(args[1]), StandardCharsets.UTF_8))) {
      for (int f : distinctFreqs) {
        double oneWordFreq = f;
        int wordPairFreq = 0;
        double weight = -Math.log(smooth * (1.0 + oneWordFreq)
            / (Utility.MAX_FREQUENCE + 0.0)
            + (1.0 - smooth)
            * ((1.0 - tinyDouble) * wordPairFreq / (1.0 + oneWordFreq) + tinyDouble));
        out.println(f + "\t" + Long.toUnsignedString(Double.doubleToRawLongBits(weight)));
      }
    }
  }

  static String hex(String s) {
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < s.length(); i++) {
      sb.append(String.format("%04x", (int) s.charAt(i)));
    }
    return sb.toString();
  }
}
'''

ORACLE_JAVA = r'''
package org.apache.lucene.analysis.cn.smart;

import java.io.BufferedReader;
import java.io.PrintWriter;
import java.lang.reflect.Constructor;
import java.lang.reflect.Field;
import java.lang.reflect.Method;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.List;

import org.apache.lucene.analysis.cn.smart.hhmm.SegToken;

public class SmartcnOracle {
  /**
   * The reference tree ships no bigramdict.mem resource, and the
   * getInstance() resource path NPEs before reaching the documented
   * analysis.data.dir fallback. Pre-build the singleton through the
   * reference's OWN load(String) -> loadFromFile path over the empty
   * bigramdict.dct (all word-pair frequencies 0), which is exactly the
   * data state this source tree ships.
   */
  static void initBigram(String dictRoot) throws Exception {
    Class<?> cls = Class.forName(
        "org.apache.lucene.analysis.cn.smart.hhmm.BigramDictionary");
    Constructor<?> c = cls.getDeclaredConstructor();
    c.setAccessible(true);
    Object bd = c.newInstance();
    Method m = cls.getDeclaredMethod("load", String.class);
    m.setAccessible(true);
    m.invoke(bd, dictRoot);
    Field f = cls.getDeclaredField("singleInstance");
    f.setAccessible(true);
    f.set(null, bd);
  }

  public static void main(String[] args) throws Exception {
    initBigram(System.getProperty("analysis.data.dir"));
    WordSegmenter seg = new WordSegmenter();
    try (BufferedReader in = Files.newBufferedReader(
            Paths.get(args[0]), StandardCharsets.UTF_8);
         PrintWriter out = new PrintWriter(Files.newBufferedWriter(
            Paths.get(args[1]), StandardCharsets.UTF_8))) {
      String line;
      while ((line = in.readLine()) != null) {
        String sentence = unhex(line.trim());
        List<SegToken> tokens = seg.segmentSentence(sentence, 0);
        for (SegToken t : tokens) {
          out.print(t.startOffset);
          out.print(',');
          out.print(t.endOffset);
          out.print(',');
          out.print(t.wordType);
          out.print(',');
          out.println(hex(new String(t.charArray)));
        }
        out.println("=");
      }
    }
  }

  static String unhex(String h) {
    int n = h.length() / 4;
    char[] c = new char[n];
    for (int i = 0; i < n; i++) {
      c[i] = (char) Integer.parseInt(h.substring(i * 4, i * 4 + 4), 16);
    }
    return new String(c);
  }

  static String hex(String s) {
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < s.length(); i++) {
      sb.append(String.format("%04x", (int) s.charAt(i)));
    }
    return sb.toString();
  }
}
'''

ORACLE_SOURCES = [
    "Utility.java", "CharType.java", "WordType.java",
    "AnalyzerProfile.java", "WordSegmenter.java",
]
ORACLE_HHMM = [
    "AbstractDictionary.java", "WordDictionary.java",
    "BigramDictionary.java", "HHMMSegmenter.java", "SegGraph.java",
    "BiSegGraph.java", "SegToken.java", "SegTokenPair.java",
    "SegTokenFilter.java", "PathNode.java",
]


def hexu(s):
    b = s.encode("utf-16-be", "surrogatepass")
    return b.hex()


def unhexu(h):
    return bytes.fromhex(h).decode("utf-16-be", "surrogatepass")


def build_oracle():
    src = os.path.join(WORK, "src/org/apache/lucene/analysis/cn/smart")
    os.makedirs(os.path.join(src, "hhmm"), exist_ok=True)
    os.makedirs(os.path.join(WORK, "data"), exist_ok=True)
    for f in ORACLE_SOURCES:
        shutil.copy(os.path.join(REF, "java/org/apache/lucene/analysis/cn/smart", f), src)
    for f in ORACLE_HHMM:
        shutil.copy(os.path.join(REF, "java/org/apache/lucene/analysis/cn/smart/hhmm", f),
                    os.path.join(src, "hhmm"))
    with open(os.path.join(src, "hhmm/SmartcnDump.java"), "w") as f:
        f.write(DUMP_JAVA)
    with open(os.path.join(src, "SmartcnOracle.java"), "w") as f:
        f.write(ORACLE_JAVA)
    # The reference ships no bigram table: provide the empty .dct its
    # loader expects (6768 zero int32 block counts, little-endian).
    with open(os.path.join(WORK, "data/bigramdict.dct"), "wb") as f:
        f.write(b"\x00" * 4 * 6768)
    mem = os.path.join(WORK, "data/bigramdict.mem")
    if os.path.exists(mem):
        os.remove(mem)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-d", os.path.join(WORK, "classes")]
        + [os.path.join(dp, fn) for dp, _, fns in os.walk(os.path.join(WORK, "src"))
           for fn in fns if fn.endswith(".java")],
        check=True)


def run_java(main, *args):
    cp = os.path.join(WORK, "classes") + ":" + os.path.join(REF, "resources")
    subprocess.run(
        ["java", "-cp", cp, "-Danalysis.data.dir=" + os.path.join(WORK, "data"),
         main] + list(args),
        check=True, cwd=WORK)


def dump_dictionary():
    core_tsv = os.path.join(WORK, "coredict.tsv")
    w_tsv = os.path.join(WORK, "weights.tsv")
    run_java(DUMP_MAIN, core_tsv, w_tsv)

    rows = []
    with open(core_tsv, encoding="utf-8") as f:
        for line in f:
            head_h, rank, suffix_h, freq = line.rstrip("\n").split("\t")
            rows.append((unhexu(head_h), int(rank), unhexu(suffix_h),
                         int(freq)))
    core = pd.DataFrame(rows, columns=["head", "rank", "suffix", "freq"])
    # The reference stores each head's items in compareArray order; the
    # Python bisect walk needs plain lexicographic order — assert they
    # coincide (true for BMP text compared as UTF-16 units).
    for _, g in core.groupby("head"):
        g = g.sort_values("rank")
        sfx = list(g["suffix"])
        assert sfx == sorted(sfx), "reference item order != lexicographic"
    core.to_parquet(CORE_OUT, index=False)

    wrows = []
    with open(w_tsv, encoding="utf-8") as f:
        for line in f:
            freq, bits = line.split("\t")
            wrows.append((int(freq),
                          struct.unpack("<d", struct.pack("<Q", int(bits)))[0]))
    pd.DataFrame(wrows, columns=["freq", "weight"]).to_parquet(
        WEIGHTS_OUT, index=False)
    print(f"coredict: {len(core)} words, {len(wrows)} distinct freqs")
    return core


def make_corpus(core):
    """JUnit sentences + deterministic mixed-script stress corpus."""
    from lucene_solr_spark.analysis.smartcn import ZH_PHRASES

    sentences = list(ZH_PHRASES)
    # reference TestSmartChineseAnalyzer vectors
    sentences += [
        "我购买了道具和服装。",
        "我购买了道具和服装。 我购买了道具和服装。",
        # testSurrogatePairCharacter (exact escapes from the JUnit source)
        "\U0002CB3B\U0002CB4A\U0002CB73\U0002CB5B鿏\U0002B7FC"
        "\U0002CB2D鿔",
        "我购买了道具和服装　我购买了道具和服装。",
        "Title:San",
        "我购买 Tests 了道具和服装",
    ]
    rng = random.Random(20260818)
    words = list(core["head"] + core["suffix"])
    multi = [w for w in words if len(w) > 1]
    heads = sorted(set(core["head"]))
    hanzi_all = [chr(c) for c in range(0x4E00, 0x9FA6)]
    oov = [c for c in hanzi_all[::37] if c not in set(heads)][:200]
    latin = ["data", "Spark", "HMM", "ok", "X"]
    punct = list(",.!?;:()【】《》、。！？")
    fw = ["ＡＢＣ", "ｘｙｚ", "１２３", "４５"]
    other = ["é", "Ω", "∑", "中"]  # OTHER-class + hanzi mix
    emoji = ["😀", "🚀", "\U00020B9B"]
    spaces = [" ", "　", "\t"]

    def pick():
        r = rng.random()
        if r < 0.45:
            return rng.choice(multi)
        if r < 0.62:
            return rng.choice(heads)
        if r < 0.68:
            return rng.choice(oov)
        if r < 0.76:
            return rng.choice(latin)
        if r < 0.82:
            return str(rng.randrange(10000))
        if r < 0.88:
            return rng.choice(punct)
        if r < 0.92:
            return rng.choice(fw)
        if r < 0.95:
            return rng.choice(other)
        if r < 0.97:
            return rng.choice(emoji)
        return rng.choice(spaces)

    for _ in range(60000):
        n = rng.randrange(1, 12)
        joiner = "" if rng.random() < 0.7 else " "
        sentences.append(joiner.join(pick() for _ in range(n)))
    return sentences


def verify(sentences):
    from lucene_solr_spark.analysis.smartcn import segment_tokens

    inp = os.path.join(WORK, "sentences.hex")
    outp = os.path.join(WORK, "oracle.out")
    with open(inp, "w") as f:
        for s in sentences:
            f.write(hexu(s) + "\n")
    run_java(ORACLE_MAIN, inp, outp)

    oracle = []
    cur = []
    with open(outp, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line == "=":
                oracle.append(cur)
                cur = []
            else:
                s, e, w, h = line.split(",")
                cur.append((int(s), int(e), int(w), unhexu(h)))
    assert len(oracle) == len(sentences), (len(oracle), len(sentences))

    mismatches = 0
    for sent, expect in zip(sentences, oracle):
        got = segment_tokens(sent)
        if got != expect:
            mismatches += 1
            if mismatches <= 5:
                print("MISMATCH:", repr(sent))
                print("  java  :", expect)
                print("  python:", got)
    print(f"verified {len(sentences)} sentences, {mismatches} mismatches")
    return mismatches


def freeze_gate_fixture():
    from lucene_solr_spark.analysis.smartcn import ZH_PHRASES, segment_smartcn

    rows = []
    for pid, phrase in enumerate(ZH_PHRASES):
        toks = segment_smartcn(phrase)
        rows.append((pid, len(toks), "|".join(toks)))
    pd.DataFrame(rows, columns=["phrase_id", "n_tokens", "tokens_s"]) \
        .to_parquet(SEGMENTS_OUT, index=False)
    print(f"froze {len(rows)} phrase segmentations -> {SEGMENTS_OUT}")


def main():
    build_oracle()
    core = dump_dictionary()
    sentences = make_corpus(core)
    n = verify(sentences)
    if n:
        sys.exit(f"{n} mismatches — NOT freezing gate fixture")
    freeze_gate_fixture()


if __name__ == "__main__":
    main()
