"""Verify + freeze the CharTokenizer/NGram/Keyword tokenizer fixtures.

Oracle = the reference's OWN tokenizer classes (CharTokenizer,
Letter/Whitespace/UnicodeWhitespace/KeywordTokenizer, NGramTokenizer,
EdgeNGramTokenizer, UnicodeProps, CharacterUtils — copied verbatim
from /root/reference into /tmp) compiled against minimal attribute /
Tokenizer stubs (the same pattern that oracled the UAX29 and Classic
scanners — nothing compiled enters the repo), driven by a Dump main.

Frozen artifacts:
  fixtures_data/chartok_props.json — Character.isLetter /
      Character.isWhitespace code-point ranges dumped from the JVM
      (the predicates CharTokenizer subclasses bind), DATA like a
      stemmer rule table.
  fixtures_data/chartok_cases.parquet — (mode, input_s, output_s)
      gate vectors, frozen only after word-for-word verification.

Usage:
  python scripts/make_chartok_fixture.py probe   # build oracle+props
  python scripts/make_chartok_fixture.py verify  # compare + freeze
"""

import json
import os
import random
import shutil
import subprocess
import sys
from base64 import b64decode, b64encode

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_AN = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
          "lucene/analysis")
REF_CU = ("/root/reference/lucene/core/src/java/org/apache/lucene/"
          "analysis/CharacterUtils.java")
WORK = "/tmp/chartok_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

STUBS = {
    "org/apache/lucene/util/AttributeFactory.java": """
package org.apache.lucene.util;
public class AttributeFactory {}
""",
    "org/apache/lucene/util/Bits.java": """
package org.apache.lucene.util;
public interface Bits {
  boolean get(int index);
  int length();
}
""",
    "org/apache/lucene/util/SparseFixedBitSet.java": """
package org.apache.lucene.util;
public class SparseFixedBitSet {
  private final java.util.BitSet bits;
  public SparseFixedBitSet(int length) { bits = new java.util.BitSet(length); }
  public void set(int i) { bits.set(i); }
  public boolean get(int i) { return bits.get(i); }
}
""",
    "org/apache/lucene/analysis/standard/StandardTokenizer.java": """
package org.apache.lucene.analysis.standard;
public final class StandardTokenizer {
  public static final int MAX_TOKEN_LENGTH_LIMIT = 1024 * 1024;
  private StandardTokenizer() {}
}
""",
    "org/apache/lucene/analysis/tokenattributes/CharTermAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class CharTermAttribute {
  public char[] buf = new char[16];
  public int len = 0;
  public char[] buffer() { return buf; }
  public char[] resizeBuffer(int newSize) {
    if (buf.length < newSize) {
      char[] n = new char[Math.max(newSize, buf.length * 2)];
      System.arraycopy(buf, 0, n, 0, buf.length);
      buf = n;
    }
    return buf;
  }
  public void setLength(int l) { len = l; }
  public String term() { return new String(buf, 0, len); }
}
""",
    "org/apache/lucene/analysis/tokenattributes/OffsetAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class OffsetAttribute {
  public int start, end;
  public void setOffset(int s, int e) { start = s; end = e; }
}
""",
    "org/apache/lucene/analysis/tokenattributes/"
    "PositionIncrementAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class PositionIncrementAttribute {
  public int posInc = 1;
  public void setPositionIncrement(int p) { posInc = p; }
}
""",
    "org/apache/lucene/analysis/tokenattributes/"
    "PositionLengthAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class PositionLengthAttribute {
  public int posLen = 1;
  public void setPositionLength(int p) { posLen = p; }
}
""",
    "org/apache/lucene/analysis/Tokenizer.java": """
package org.apache.lucene.analysis;
import java.io.IOException;
import java.io.Reader;
import org.apache.lucene.analysis.tokenattributes.*;
import org.apache.lucene.util.AttributeFactory;
public abstract class Tokenizer {
  public static final AttributeFactory DEFAULT_TOKEN_ATTRIBUTE_FACTORY =
      new AttributeFactory();
  protected Reader input;
  public final CharTermAttribute termAttStub = new CharTermAttribute();
  public final OffsetAttribute offsetAttStub = new OffsetAttribute();
  public final PositionIncrementAttribute posIncAttStub =
      new PositionIncrementAttribute();
  public final PositionLengthAttribute posLenAttStub =
      new PositionLengthAttribute();
  protected Tokenizer() {}
  protected Tokenizer(AttributeFactory factory) {}
  @SuppressWarnings("unchecked")
  protected <T> T addAttribute(Class<T> cls) {
    if (cls == CharTermAttribute.class) return (T) termAttStub;
    if (cls == OffsetAttribute.class) return (T) offsetAttStub;
    if (cls == PositionIncrementAttribute.class) return (T) posIncAttStub;
    if (cls == PositionLengthAttribute.class) return (T) posLenAttStub;
    throw new IllegalArgumentException(cls.getName());
  }
  protected void clearAttributes() {}
  protected final int correctOffset(int currentOff) { return currentOff; }
  public void setReader(Reader r) { this.input = r; }
  public abstract boolean incrementToken() throws IOException;
  public void end() throws IOException {}
  public void reset() throws IOException {}
  public void close() throws IOException {}
}
""",
}

DUMP = r"""package org.apache.lucene.analysis;
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.core.*;
import org.apache.lucene.analysis.ngram.*;
import org.apache.lucene.analysis.util.CharTokenizer;
import org.apache.lucene.util.AttributeFactory;

public class CharTokDump {
  static final AttributeFactory F = Tokenizer.DEFAULT_TOKEN_ATTRIBUTE_FACTORY;

  static Tokenizer make(String mode) {
    String[] p = mode.split(":");
    switch (p[0]) {
      case "letter":
        return new LetterTokenizer(F, Integer.parseInt(p[1]));
      case "ws":
        return new WhitespaceTokenizer(F, Integer.parseInt(p[1]));
      case "uws":
        return new UnicodeWhitespaceTokenizer(F, Integer.parseInt(p[1]));
      case "keyword":
        return new KeywordTokenizer();
      case "ngram":
        return new NGramTokenizer(
            Integer.parseInt(p[1]), Integer.parseInt(p[2]));
      case "edge":
        return new EdgeNGramTokenizer(
            Integer.parseInt(p[1]), Integer.parseInt(p[2]));
      default:
        throw new IllegalArgumentException(mode);
    }
  }

  public static void main(String[] args) throws Exception {
    if (args.length > 0 && args[0].equals("props")) {
      StringBuilder sb = new StringBuilder();
      for (String prop : new String[] {"letter", "space"}) {
        sb.append(prop).append('\n');
        int runStart = -1;
        for (int cp = 0; cp <= 0x110000; cp++) {
          boolean v = cp <= 0x10FFFF
              && (prop.equals("letter") ? Character.isLetter(cp)
                                        : Character.isWhitespace(cp));
          if (v && runStart < 0) runStart = cp;
          if (!v && runStart >= 0) {
            sb.append(runStart).append(' ').append(cp - 1).append('\n');
            runStart = -1;
          }
        }
        sb.append("end\n");
      }
      System.out.print(sb);
      return;
    }
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new BufferedWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8)));
    Base64.Decoder dec = Base64.getDecoder();
    Base64.Encoder enc = Base64.getEncoder();
    String line;
    while ((line = in.readLine()) != null) {
      int bar = line.indexOf('|');
      String mode = line.substring(0, bar);
      String doc = new String(dec.decode(line.substring(bar + 1)),
                              StandardCharsets.UTF_8);
      Tokenizer t = make(mode);
      t.setReader(new StringReader(doc));
      t.reset();
      StringBuilder sb = new StringBuilder();
      boolean first = true;
      while (t.incrementToken()) {
        if (!first) sb.append('');
        first = false;
        sb.append(t.termAttStub.term()).append('')
          .append(t.offsetAttStub.start).append('')
          .append(t.offsetAttStub.end);
      }
      out.println(enc.encodeToString(
          sb.toString().getBytes(StandardCharsets.UTF_8)));
    }
    out.flush();
  }
}
"""

REAL = [
    (REF_AN + "/util/CharTokenizer.java",
     "org/apache/lucene/analysis/util/CharTokenizer.java"),
    (REF_AN + "/util/UnicodeProps.java",
     "org/apache/lucene/analysis/util/UnicodeProps.java"),
    (REF_AN + "/core/LetterTokenizer.java",
     "org/apache/lucene/analysis/core/LetterTokenizer.java"),
    (REF_AN + "/core/WhitespaceTokenizer.java",
     "org/apache/lucene/analysis/core/WhitespaceTokenizer.java"),
    (REF_AN + "/core/UnicodeWhitespaceTokenizer.java",
     "org/apache/lucene/analysis/core/UnicodeWhitespaceTokenizer.java"),
    (REF_AN + "/core/KeywordTokenizer.java",
     "org/apache/lucene/analysis/core/KeywordTokenizer.java"),
    (REF_AN + "/ngram/NGramTokenizer.java",
     "org/apache/lucene/analysis/ngram/NGramTokenizer.java"),
    (REF_AN + "/ngram/EdgeNGramTokenizer.java",
     "org/apache/lucene/analysis/ngram/EdgeNGramTokenizer.java"),
    (REF_CU, "org/apache/lucene/analysis/CharacterUtils.java"),
]


def build_oracle():
    shutil.rmtree(WORK, ignore_errors=True)
    for rel, src in [(rel, None) for rel in STUBS] + \
                    [(rel, src) for src, rel in REAL]:
        path = os.path.join(WORK, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if src is None:
            with open(path, "w") as f:
                f.write(STUBS[rel])
        else:
            shutil.copy(src, path)
    dump = os.path.join(WORK, "org/apache/lucene/analysis/CharTokDump.java")
    with open(dump, "w") as f:
        f.write(DUMP)
    srcs = []
    for root, _, files in os.walk(WORK):
        srcs.extend(os.path.join(root, fn)
                    for fn in files if fn.endswith(".java"))
    subprocess.run(["javac", "-encoding", "UTF-8", "-cp", WORK] + srcs,
                   check=True, cwd=WORK)


def run_jvm(lines):
    proc = subprocess.run(
        ["java", "-cp", WORK, "org.apache.lucene.analysis.CharTokDump"],
        input="\n".join(lines) + "\n", capture_output=True,
        text=True, check=True, cwd=WORK)
    return proc.stdout.splitlines()


def cmd_probe():
    build_oracle()
    res = subprocess.run(
        ["java", "-cp", WORK, "org.apache.lucene.analysis.CharTokDump",
         "props"], check=True, capture_output=True, text=True, cwd=WORK)
    props = {}
    cur = None
    for ln in res.stdout.splitlines():
        if ln in ("letter", "space"):
            cur = props.setdefault(ln, [])
        elif ln == "end":
            cur = None
        else:
            lo, hi = (int(x) for x in ln.split())
            cur.append([lo, hi])
    for name, rngs in props.items():
        n = sum(hi - lo + 1 for lo, hi in rngs)
        print("  %-8s %6d cps in %4d ranges" % (name, n, len(rngs)))
    os.makedirs(FIX_DIR, exist_ok=True)
    with open(os.path.join(FIX_DIR, "chartok_props.json"), "w") as f:
        json.dump(props, f, sort_keys=True)
    print("wrote chartok_props.json")


def gen_corpus():
    rng = random.Random(20260819)
    docs = [
        "",
        "a",
        " ",
        "foo bar FOO BAR",
        "A2B 12.5 can't x-ray foo_bar",
        "the\tquick\nbrown fox jumps　over",
        " ogham space mark ",
        "abc" * 100 + " tail",
        "日本語のテキスト mixed ascii",
        "emoji 😀 pair 𝔘𝔫𝔦 math",
        "ab\U0001D400\U0001D401cd ef",
        " leading and trailing ",
        "xx" + "́" * 5 + " combining",
    ]
    words = ["alpha", "Beta2", "x", "can't", "3.14", "日本", "한국",
             "\U0001D400b", "a" * 30, "_u_", "hy-phen"]
    seps = [" ", "  ", "\t", "\n", " ", " ", ".", ",", ""]
    for _ in range(800):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            parts.append(rng.choice(words))
            parts.append(rng.choice(seps))
        docs.append("".join(parts))
    return docs


def gen_sweeps():
    docs = []
    cps = [cp for cp in range(0x00, 0x10000)
           if not 0xD800 <= cp <= 0xDFFF]
    astral = (list(range(0x10000, 0x10200))
              + list(range(0x1D400, 0x1D500))
              + list(range(0x1F600, 0x1F700))
              + [0x2F800, 0xE0001, 0x10FFFD])
    for ctx in ("a%sb", " %s "):
        for block in (cps, astral):
            for i in range(0, len(block), 64):
                chunk = block[i:i + 64]
                docs.append("|".join(ctx % chr(cp) for cp in chunk))
    return docs


def cmd_verify():
    import pandas as pd

    from lucene_solr_spark.analysis import chartokenizers as ct

    if not os.path.isdir(WORK):
        build_oracle()
    corpus = gen_corpus()
    sweeps = gen_sweeps()
    cases = ([(m, d) for m in sorted(ct.MODES) for d in corpus]
             + [(m, d) for m in ("letter:255", "uws:255", "ngram:2:3")
                for d in sweeps])
    print("%d cases (%d corpus docs, %d sweep docs)"
          % (len(cases), len(corpus), len(sweeps)))
    lines = ["%s|%s" % (m, b64encode(d.encode("utf-8")).decode("ascii"))
             for m, d in cases]
    jvm = run_jvm(lines)
    assert len(jvm) == len(cases)

    bad = 0
    rows = []
    for (mode, doc), enc_line in zip(cases, jvm):
        want = b64decode(enc_line).decode("utf-8")
        got = ct.chartok_serialize(doc, mode)
        if got != want:
            bad += 1
            if bad <= 10:
                print("MISMATCH mode=%s doc=%r" % (mode, doc[:120]))
                wt = want.split(SEP) if want else []
                gt = got.split(SEP) if got else []
                shown = 0
                for k in range(max(len(wt), len(gt))):
                    w = wt[k] if k < len(wt) else "<none>"
                    g = gt[k] if k < len(gt) else "<none>"
                    if w != g and shown < 5:
                        print("  tok[%d] jvm=%r py=%r" % (k, w, g))
                        shown += 1
            continue
        rows.append((mode, doc, got))
    total = len(cases)
    print("verified %d/%d cases match the JVM tokenizers"
          % (total - bad, total))
    if bad:
        raise SystemExit("%d mismatches — NOT freezing" % bad)

    n_corpus = len(ct.MODES) * len(corpus)
    keep = rows[:n_corpus] + rows[n_corpus::6]
    df = pd.DataFrame(keep, columns=["mode", "input_s", "output_s"])
    df = df.drop_duplicates(["mode", "input_s"])
    out_pq = os.path.join(FIX_DIR, "chartok_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d chartok vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if cmd == "probe":
        cmd_probe()
    elif cmd == "verify":
        cmd_verify()
    else:
        raise SystemExit("usage: make_chartok_fixture.py [probe|verify]")
