"""Verify + freeze the FULL WordDelimiterGraphFilter fixtures.

Oracle = the reference's OWN WordDelimiterGraphFilter +
WordDelimiterIterator + WhitespaceTokenizer/CharTokenizer (real files
copied into /tmp) compiled against minimal TokenStream/attribute
stubs with working captureState/restoreState (the established oracle
pattern; nothing compiled enters the repo), driven by a Dump main
that chains WhitespaceTokenizer -> WDGF across 8 flag combinations.

Frozen artifacts:
  fixtures_data/wdgf_types.json — the character-type table
      (LOWER/UPPER/DIGIT/ALPHA/ALPHA|DIGIT/SUBWORD_DELIM) over the
      full UTF-16 unit range, dumped from the JVM: the <256 default
      table plus WordDelimiterIterator.getType's Character.getType
      switch (surrogate units -> ALPHA|DIGIT, "prevent splitting").
  fixtures_data/wdgf_cases.parquet — (mode, input_s, output_s) gate
      vectors, frozen only after word-for-word verification.

Usage:
  python scripts/make_wdgf_fixture.py probe   # build oracle + types
  python scripts/make_wdgf_fixture.py verify  # compare + freeze
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
REF_CORE = "/root/reference/lucene/core/src/java/org/apache/lucene"
WORK = "/tmp/wdgf_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

UTIL = [
    "ArrayUtil", "RamUsageEstimator", "Accountable", "BytesRef",
    "Constants", "ArrayIntroSorter", "ArrayTimSorter", "IntroSorter",
    "TimSorter", "MathUtil", "IntroSelector", "Selector", "Sorter",
    "InPlaceMergeSorter", "UnicodeUtil", "StringHelper", "CharsRef",
    "IntsRef",
]

REAL = [
    (REF_AN + "/util/CharTokenizer.java",
     "org/apache/lucene/analysis/util/CharTokenizer.java"),
    (REF_AN + "/core/LetterTokenizer.java",
     "org/apache/lucene/analysis/core/LetterTokenizer.java"),
    (REF_AN + "/core/WhitespaceTokenizer.java",
     "org/apache/lucene/analysis/core/WhitespaceTokenizer.java"),
    (REF_AN + "/miscellaneous/WordDelimiterGraphFilter.java",
     "org/apache/lucene/analysis/miscellaneous/"
     "WordDelimiterGraphFilter.java"),
    (REF_AN + "/miscellaneous/WordDelimiterIterator.java",
     "org/apache/lucene/analysis/miscellaneous/"
     "WordDelimiterIterator.java"),
    (REF_CORE + "/analysis/CharacterUtils.java",
     "org/apache/lucene/analysis/CharacterUtils.java"),
    (REF_AN + "/core/FlattenGraphFilter.java",
     "org/apache/lucene/analysis/core/FlattenGraphFilter.java"),
    (REF_CORE + "/util/RollingBuffer.java",
     "org/apache/lucene/util/RollingBuffer.java"),
]

STUBS = {
    "org/apache/lucene/util/AttributeFactory.java": """
package org.apache.lucene.util;
public class AttributeFactory {}
""",
    "org/apache/lucene/util/AttributeSource.java": """
package org.apache.lucene.util;
public class AttributeSource {
  public static class State {
    public char[] term;
    public int len, so, eo, pi, pl;
    public boolean kw;
  }
}
""",
    "org/apache/lucene/search/PhraseQuery.java": """
package org.apache.lucene.search;
public final class PhraseQuery {}
""",
    "org/apache/lucene/analysis/CharArraySet.java": """
package org.apache.lucene.analysis;
import java.util.HashSet;
import java.util.Set;
public class CharArraySet {
  private final Set<String> words = new HashSet<>();
  public void add(String w) { words.add(w); }
  public boolean contains(char[] buf, int off, int len) {
    return words.contains(new String(buf, off, len));
  }
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
  public int length() { return len; }
  public void copyBuffer(char[] b, int off, int l) {
    resizeBuffer(l);
    System.arraycopy(b, off, buf, 0, l);
    len = l;
  }
  public String term() { return new String(buf, 0, len); }
}
""",
    "org/apache/lucene/analysis/tokenattributes/OffsetAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class OffsetAttribute {
  public int start, end;
  public void setOffset(int s, int e) { start = s; end = e; }
  public int startOffset() { return start; }
  public int endOffset() { return end; }
}
""",
    "org/apache/lucene/analysis/tokenattributes/"
    "PositionIncrementAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class PositionIncrementAttribute {
  public int posInc = 1;
  public void setPositionIncrement(int p) { posInc = p; }
  public int getPositionIncrement() { return posInc; }
}
""",
    "org/apache/lucene/analysis/tokenattributes/"
    "PositionLengthAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class PositionLengthAttribute {
  public int posLen = 1;
  public void setPositionLength(int p) { posLen = p; }
  public int getPositionLength() { return posLen; }
}
""",
    "org/apache/lucene/analysis/tokenattributes/KeywordAttribute.java": """
package org.apache.lucene.analysis.tokenattributes;
public class KeywordAttribute {
  public boolean kw = false;
  public boolean isKeyword() { return kw; }
  public void setKeyword(boolean k) { kw = k; }
}
""",
    "org/apache/lucene/analysis/TokenStream.java": """
package org.apache.lucene.analysis;
import java.io.IOException;
import org.apache.lucene.analysis.tokenattributes.*;
import org.apache.lucene.util.AttributeSource;
public abstract class TokenStream {
  public CharTermAttribute termAttStub = new CharTermAttribute();
  public OffsetAttribute offsetAttStub = new OffsetAttribute();
  public PositionIncrementAttribute posIncAttStub =
      new PositionIncrementAttribute();
  public PositionLengthAttribute posLenAttStub =
      new PositionLengthAttribute();
  public KeywordAttribute keywordAttStub = new KeywordAttribute();
  @SuppressWarnings("unchecked")
  protected <T> T addAttribute(Class<T> cls) {
    if (cls == CharTermAttribute.class) return (T) termAttStub;
    if (cls == OffsetAttribute.class) return (T) offsetAttStub;
    if (cls == PositionIncrementAttribute.class) return (T) posIncAttStub;
    if (cls == PositionLengthAttribute.class) return (T) posLenAttStub;
    if (cls == KeywordAttribute.class) return (T) keywordAttStub;
    throw new IllegalArgumentException(cls.getName());
  }
  protected void clearAttributes() {
    termAttStub.len = 0;
    offsetAttStub.setOffset(0, 0);
    posIncAttStub.posInc = 1;
    posLenAttStub.posLen = 1;
    keywordAttStub.kw = false;
  }
  public AttributeSource.State captureState() {
    AttributeSource.State s = new AttributeSource.State();
    s.term = new char[termAttStub.len];
    System.arraycopy(termAttStub.buf, 0, s.term, 0, termAttStub.len);
    s.len = termAttStub.len;
    s.so = offsetAttStub.start;
    s.eo = offsetAttStub.end;
    s.pi = posIncAttStub.posInc;
    s.pl = posLenAttStub.posLen;
    s.kw = keywordAttStub.kw;
    return s;
  }
  public void restoreState(AttributeSource.State s) {
    termAttStub.copyBuffer(s.term, 0, s.len);
    offsetAttStub.setOffset(s.so, s.eo);
    posIncAttStub.posInc = s.pi;
    posLenAttStub.posLen = s.pl;
    keywordAttStub.kw = s.kw;
  }
  public abstract boolean incrementToken() throws IOException;
  public void end() throws IOException {}
  public void reset() throws IOException {}
  public void close() throws IOException {}
}
""",
    "org/apache/lucene/analysis/Tokenizer.java": """
package org.apache.lucene.analysis;
import java.io.Reader;
import org.apache.lucene.util.AttributeFactory;
public abstract class Tokenizer extends TokenStream {
  public static final AttributeFactory DEFAULT_TOKEN_ATTRIBUTE_FACTORY =
      new AttributeFactory();
  protected Reader input;
  protected Tokenizer() {}
  protected Tokenizer(AttributeFactory factory) {}
  protected final int correctOffset(int currentOff) { return currentOff; }
  public void setReader(Reader r) { this.input = r; }
}
""",
    "org/apache/lucene/analysis/TokenFilter.java": """
package org.apache.lucene.analysis;
import java.io.IOException;
public abstract class TokenFilter extends TokenStream {
  protected final TokenStream input;
  protected TokenFilter(TokenStream input) {
    this.input = input;
    // a TokenFilter SHARES the source's attribute instances
    this.termAttStub = input.termAttStub;
    this.offsetAttStub = input.offsetAttStub;
    this.posIncAttStub = input.posIncAttStub;
    this.posLenAttStub = input.posLenAttStub;
    this.keywordAttStub = input.keywordAttStub;
  }
  @Override
  public void reset() throws IOException { input.reset(); }
}
""",
    "org/apache/lucene/analysis/standard/StandardTokenizer.java": """
package org.apache.lucene.analysis.standard;
public final class StandardTokenizer {
  public static final int MAX_TOKEN_LENGTH_LIMIT = 1024 * 1024;
  private StandardTokenizer() {}
}
""",
    "org/apache/lucene/analysis/synonym/SynonymGraphFilter.java": """
package org.apache.lucene.analysis.synonym;
public final class SynonymGraphFilter {
  private SynonymGraphFilter() {}
}
""",
}

DUMP = r"""package org.apache.lucene.analysis.miscellaneous;
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.CharArraySet;
import org.apache.lucene.analysis.core.WhitespaceTokenizer;

public class WDGFDump {
  static final int GW = WordDelimiterGraphFilter.GENERATE_WORD_PARTS;
  static final int GN = WordDelimiterGraphFilter.GENERATE_NUMBER_PARTS;
  static final int CW = WordDelimiterGraphFilter.CATENATE_WORDS;
  static final int CN = WordDelimiterGraphFilter.CATENATE_NUMBERS;
  static final int CA = WordDelimiterGraphFilter.CATENATE_ALL;
  static final int PO = WordDelimiterGraphFilter.PRESERVE_ORIGINAL;
  static final int SC = WordDelimiterGraphFilter.SPLIT_ON_CASE_CHANGE;
  static final int SN = WordDelimiterGraphFilter.SPLIT_ON_NUMERICS;
  static final int SP = WordDelimiterGraphFilter.STEM_ENGLISH_POSSESSIVE;

  static int[] modeOf(String name) {
    // {flags, adjustInternalOffsets, protwords?}
    switch (name) {
      case "full":       return new int[] {GW|GN|CW|CN|SC|SN|SP, 1, 0};
      case "catall":     return new int[] {GW|GN|CA|PO|SC|SN, 1, 0};
      case "minimal":    return new int[] {GW|GN, 1, 0};
      case "preserve":   return new int[] {PO|SC|SN, 1, 0};
      case "noadjust":   return new int[] {GW|GN|CW|CN|SC|SN|SP, 0, 0};
      case "protected":  return new int[] {GW|GN|SC|SN, 1, 1};
      case "possessive": return new int[] {GW|SC|SP, 1, 0};
      case "catnum":     return new int[] {GN|CN|SN, 1, 0};
      default: throw new IllegalArgumentException(name);
    }
  }

  static String baseOf(String name) {
    return name.startsWith("flat_") ? name.substring(5) : name;
  }

  public static void main(String[] args) throws Exception {
    if (args.length > 0 && args[0].equals("types")) {
      StringBuilder sb = new StringBuilder();
      int runStart = 0;
      int prev = -1;
      for (int ch = 0; ch <= 0x10000; ch++) {
        int t;
        if (ch == 0x10000) t = -2;
        else if (ch < 256) t = WordDelimiterIterator
            .DEFAULT_WORD_DELIM_TABLE[ch];
        else t = WordDelimiterIterator.getType(ch);
        if (prev == -1) { prev = t; runStart = ch; continue; }
        if (t != prev) {
          sb.append(runStart).append(' ').append(ch - 1).append(' ')
            .append(prev).append('\n');
          runStart = ch;
          prev = t;
        }
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
      int[] m = modeOf(baseOf(mode));
      CharArraySet prot = null;
      if (m[2] == 1) {
        prot = new CharArraySet();
        prot.add("NASA");
        prot.add("mp3");
      }
      WhitespaceTokenizer tok = new WhitespaceTokenizer();
      tok.setReader(new StringReader(doc));
      org.apache.lucene.analysis.TokenStream f =
          new WordDelimiterGraphFilter(
              tok, m[1] == 1,
              WordDelimiterIterator.DEFAULT_WORD_DELIM_TABLE, m[0],
              prot);
      if (mode.startsWith("flat_")) {
        f = new org.apache.lucene.analysis.core.FlattenGraphFilter(f);
      }
      f.reset();
      StringBuilder sb = new StringBuilder();
      boolean first = true;
      while (f.incrementToken()) {
        if (!first) sb.append('');
        first = false;
        sb.append(f.termAttStub.term()).append('')
          .append(f.posIncAttStub.posInc).append('')
          .append(f.posLenAttStub.posLen).append('')
          .append(f.offsetAttStub.start).append('')
          .append(f.offsetAttStub.end);
      }
      out.println(enc.encodeToString(
          sb.toString().getBytes(StandardCharsets.UTF_8)));
    }
    out.flush();
  }
}
"""


def build_oracle():
    shutil.rmtree(WORK, ignore_errors=True)
    for rel, body in STUBS.items():
        path = os.path.join(WORK, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(body)
    udir = os.path.join(WORK, "org/apache/lucene/util")
    os.makedirs(udir, exist_ok=True)
    for n in UTIL:
        shutil.copy(os.path.join(REF_CORE, "util", n + ".java"), udir)
    cpath = os.path.join(udir, "Constants.java")
    with open(cpath) as f:
        s = f.read()
    with open(cpath, "w") as f:
        f.write(s.replace("Version.LATEST.toString()", '"9.0.0"'))
    for src, rel in REAL:
        path = os.path.join(WORK, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.copy(src, path)
    dpath = os.path.join(
        WORK, "org/apache/lucene/analysis/miscellaneous/WDGFDump.java")
    with open(dpath, "w") as f:
        f.write(DUMP)
    srcs = []
    for root, _, files in os.walk(WORK):
        srcs.extend(os.path.join(root, fn)
                    for fn in files if fn.endswith(".java"))
    subprocess.run(["javac", "-encoding", "UTF-8", "-cp", WORK] + srcs,
                   check=True, cwd=WORK)


def run_jvm(lines):
    proc = subprocess.run(
        ["java", "-cp", WORK,
         "org.apache.lucene.analysis.miscellaneous.WDGFDump"],
        input="\n".join(lines) + "\n", capture_output=True,
        text=True, check=True, cwd=WORK)
    return proc.stdout.splitlines()


def cmd_probe():
    build_oracle()
    res = subprocess.run(
        ["java", "-cp", WORK,
         "org.apache.lucene.analysis.miscellaneous.WDGFDump", "types"],
        check=True, capture_output=True, text=True, cwd=WORK)
    ranges = []
    for ln in res.stdout.splitlines():
        lo, hi, t = (int(x) for x in ln.split())
        ranges.append([lo, hi, t])
    print("%d type ranges" % len(ranges))
    os.makedirs(FIX_DIR, exist_ok=True)
    with open(os.path.join(FIX_DIR, "wdgf_types.json"), "w") as f:
        json.dump(ranges, f)
    print("wrote wdgf_types.json")


def gen_corpus():
    rng = random.Random(20260819)
    docs = [
        "",
        "PowerShot",
        "PowerShot500-42 SD500 wi-fi wi-fi-4000",
        "O'Neil's j2se ISO8601 XML2HTTP",
        "super-duper-XL500-42-AutoCoder's TransAM",
        "NASA mp3 NASAx mp3s",
        "---- a ---- b --",
        "'''' 'stop' ' s",
        "can't O'Reilly O'Reilly's 'Neil's",
        "42 -42 $500 33% 1,000.5",
        "lowerUPPER UPPERlower McKinley ABCDef",
        "foo_bar foo__bar__baz _start end_",
        "a+b=c a/b/c a\\b",
        "été Aé日本2Z ΑΒΓαβγ42",
        "𝐀ab 𝐀-42 a𝐀b",
        "x" * 300 + "-y",
        "trailing' s'",
        "5's 's 'sX s'5",
    ]
    words = ["PowerShot", "wi-fi", "A1-B2", "x", "500-42", "NASA",
             "mp3", "O'Neil's", "----", "j2se", "McIntosh", "_",
             "a'sb", "ΑΒγ", "𝐀1", "Zé2"]
    seps = [" ", "  ", "\t", " ", " "]
    for _ in range(700):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            parts.append(rng.choice(words))
            parts.append(rng.choice(seps))
        docs.append("".join(parts))
    return docs


def cmd_verify():
    import pandas as pd

    from lucene_solr_spark.analysis import worddelim as wd

    if not os.path.isdir(WORK):
        build_oracle()
    docs = gen_corpus()
    cases = [(m, d) for m in sorted(wd.MODES) for d in docs]
    print("%d cases (%d modes x %d docs)"
          % (len(cases), len(wd.MODES), len(docs)))
    lines = ["%s|%s" % (m, b64encode(d.encode("utf-8")).decode("ascii"))
             for m, d in cases]
    jvm = run_jvm(lines)
    assert len(jvm) == len(cases)

    bad = 0
    rows = []
    for (mode, doc), enc_line in zip(cases, jvm):
        want = b64decode(enc_line).decode("utf-8")
        got = wd.wdgf_serialize(doc, mode)
        if got != want:
            bad += 1
            if bad <= 10:
                print("MISMATCH mode=%s doc=%r" % (mode, doc[:100]))
                wt = want.split(SEP) if want else []
                gt = got.split(SEP) if got else []
                shown = 0
                for k in range(max(len(wt), len(gt))):
                    w = wt[k] if k < len(wt) else "<none>"
                    g = gt[k] if k < len(gt) else "<none>"
                    if w != g and shown < 6:
                        print("  tok[%d] jvm=%r py=%r" % (k, w, g))
                        shown += 1
            continue
        rows.append((mode, doc, got))
    total = len(cases)
    print("verified %d/%d cases match the JVM filter"
          % (total - bad, total))
    if bad:
        raise SystemExit("%d mismatches — NOT freezing" % bad)

    keep = rows[::2]
    df = pd.DataFrame(keep, columns=["mode", "input_s", "output_s"])
    df = df.drop_duplicates(["mode", "input_s"])
    out_pq = os.path.join(FIX_DIR, "wdgf_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d wdgf vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if cmd == "probe":
        cmd_probe()
    elif cmd == "verify":
        cmd_verify()
    else:
        raise SystemExit("usage: make_wdgf_fixture.py [probe|verify]")
