"""Verify + freeze SimplePattern{,Split}Tokenizer fixtures.

Oracle = the reference's OWN classes compiled into /tmp: the FULL
util/automaton package (RegExp parser, Automata/Operations/
MinimizationOperations, CharacterRunAutomaton) plus its util deps
(ArrayUtil, sorters, refs — real files), the two SimplePattern
tokenizers, and minimal Tokenizer/attribute stubs (the same pattern
that oracled the UAX29/Classic/CharTokenizer families; nothing
compiled enters the repo).

This pins BOTH layers at once: the Lucene RegExp->DFA engine
(analysis/luceneregex.py — parser precedence, char classes,
complement/intersection, decimal intervals, repeat ranges) and the
greedy/pushback scanner loops (analysis/simplepattern.py), compared
word-for-word over a pattern x document grid including surrogate
splits, false-alarm pushbacks and EOF-no-accept termination.

Usage:
  python scripts/make_simplepattern_fixture.py build   # compile oracle
  python scripts/make_simplepattern_fixture.py verify  # compare+freeze
"""

import os
import random
import shutil
import subprocess
import sys
from base64 import b64decode, b64encode

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_CORE = "/root/reference/lucene/core/src/java/org/apache/lucene/util"
REF_PAT = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
           "lucene/analysis/pattern")
WORK = "/tmp/spt_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

AUTOMATON = [
    "RegExp", "Automaton", "Automata", "Operations",
    "MinimizationOperations", "CharacterRunAutomaton", "RunAutomaton",
    "Transition", "StatePair", "SortedIntSet",
    "TooComplexToDeterminizeException", "FiniteStringsIterator",
    "LimitedFiniteStringsIterator", "DaciukMihovAutomatonBuilder",
    "AutomatonProvider", "UTF32ToUTF8",
]
UTIL = [
    "ArrayUtil", "RamUsageEstimator", "Accountable", "BytesRef",
    "BytesRefBuilder", "IntsRef", "IntsRefBuilder", "InPlaceMergeSorter",
    "Sorter", "StringHelper", "CharsRef", "UnicodeUtil", "Constants",
    "ArrayIntroSorter", "ArrayTimSorter", "IntroSorter", "TimSorter",
    "MathUtil", "IntroSelector", "Selector",
]

STUBS = {
    "org/apache/lucene/util/AttributeFactory.java": """
package org.apache.lucene.util;
public class AttributeFactory {}
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
  protected Tokenizer() {}
  protected Tokenizer(AttributeFactory factory) {}
  @SuppressWarnings("unchecked")
  protected <T> T addAttribute(Class<T> cls) {
    if (cls == CharTermAttribute.class) return (T) termAttStub;
    if (cls == OffsetAttribute.class) return (T) offsetAttStub;
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

DUMP = r"""package org.apache.lucene.analysis.pattern;
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.Tokenizer;

public class SPTDump {
  // manual UTF-16LE codec: the charset decoder/encoder replaces lone
  // surrogates, but the tokenizers must see them verbatim
  static String charsOf(byte[] b) {
    char[] c = new char[b.length / 2];
    for (int i = 0; i < c.length; i++) {
      c[i] = (char) ((b[2 * i] & 0xFF) | ((b[2 * i + 1] & 0xFF) << 8));
    }
    return new String(c);
  }

  static byte[] bytesOf(String s) {
    byte[] b = new byte[s.length() * 2];
    for (int i = 0; i < s.length(); i++) {
      char c = s.charAt(i);
      b[2 * i] = (byte) (c & 0xFF);
      b[2 * i + 1] = (byte) (c >> 8);
    }
    return b;
  }

  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new BufferedWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8)));
    Base64.Decoder dec = Base64.getDecoder();
    Base64.Encoder enc = Base64.getEncoder();
    String line;
    while ((line = in.readLine()) != null) {
      String[] f = line.split("\\|");
      boolean split = f[0].equals("split");
      String pattern = new String(dec.decode(f[1]),
                                  StandardCharsets.UTF_8);
      String doc = f.length > 2 ? charsOf(dec.decode(f[2])) : "";
      Tokenizer t = split
          ? new SimplePatternSplitTokenizer(pattern)
          : new SimplePatternTokenizer(pattern);
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
      out.println(enc.encodeToString(bytesOf(sb.toString())));
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
    adir = os.path.join(WORK, "org/apache/lucene/util/automaton")
    udir = os.path.join(WORK, "org/apache/lucene/util")
    pdir = os.path.join(WORK, "org/apache/lucene/analysis/pattern")
    os.makedirs(adir, exist_ok=True)
    os.makedirs(pdir, exist_ok=True)
    for n in AUTOMATON:
        shutil.copy(os.path.join(REF_CORE, "automaton", n + ".java"), adir)
    for n in UTIL:
        shutil.copy(os.path.join(REF_CORE, n + ".java"), udir)
    # Constants references Version (not needed): inline the string
    cpath = os.path.join(udir, "Constants.java")
    with open(cpath) as f:
        s = f.read()
    with open(cpath, "w") as f:
        f.write(s.replace("Version.LATEST.toString()", '"9.0.0"'))
    for n in ("SimplePatternTokenizer", "SimplePatternSplitTokenizer"):
        shutil.copy(os.path.join(REF_PAT, n + ".java"), pdir)
    with open(os.path.join(pdir, "SPTDump.java"), "w") as f:
        f.write(DUMP)
    srcs = []
    for root, _, files in os.walk(WORK):
        srcs.extend(os.path.join(root, fn)
                    for fn in files if fn.endswith(".java"))
    subprocess.run(["javac", "-encoding", "UTF-8", "-cp", WORK] + srcs,
                   check=True, cwd=WORK,
                   stderr=subprocess.DEVNULL)


def run_jvm(lines):
    proc = subprocess.run(
        ["java", "-cp", WORK,
         "org.apache.lucene.analysis.pattern.SPTDump"],
        input="\n".join(lines) + "\n", capture_output=True,
        text=True, check=True, cwd=WORK)
    return proc.stdout.splitlines()


def gen_docs():
    rng = random.Random(20260819)
    docs = [
        "",
        "a",
        "foo bar 123 baz-qux",
        "one,two;three. four , ; .",
        "a-b--c---d",
        'she said "hi there" and left',
        "ip 10.2.3.44 and 255.255.255.255 not 256.1.1.1 or 007.8.9.10",
        "xx123 yy zz xxab cd 12 12345",
        "tabs\tand\nnewlines\r\nmixed   spaces",
        "unicode 日本 ひらがな mixed",
        "emoji 😀 pair \U0001D400\U0001D401 astral",
        "edge,",
        ",edge",
        ",,",
        "trailing-",
        "--",
        "a" * 300 + " long",
        "no match at all!!",
        "123",
        "9",
    ]
    words = ["abc", "XY", "12", "345", "a1b2", ",", ";", ".", "-", "--",
             '"q"', "😀", "\U0001D400", "日本", " ", "  ", "\t", "xx9",
             "0.1.2.3", "44.55.66.77"]
    for _ in range(600):
        k = rng.randrange(1, 10)
        docs.append("".join(rng.choice(words) for _ in range(k)))
    # lone surrogates: the reference pairs a high surrogate with the
    # next unit blindly — pin that path
    docs.append("a\ud83d b")
    docs.append("a\udc00b")
    docs.append("x\ud83d")
    return docs


def gen_patterns():
    from lucene_solr_spark.analysis.simplepattern import CASES

    pats = [(name.split(":")[0] == "split", pat, name)
            for name, (pat, split) in
            [(n, (p, s)) for n, (p, s) in CASES.items()]]
    # independent syntax coverage beyond the gate cases
    extra = [
        (False, "[a-z]+"),
        (False, "[^ ]+"),
        (False, "a(b|c)*d?"),
        (False, "[0-9]{1,3}"),
        (False, "a<1-255>"),
        (False, "<001-100>"),
        (False, "~([ \\t]+)&.{1,5}"),
        (False, '"--"'),
        (False, ".."),
        (False, "x+y{2}"),
        (False, "(abc)+"),
        (False, "\\,|\\."),
        (True, ","),
        (True, "[,.; \\-]+"),
        (True, "(--)|-"),
        (True, "[0-9]"),
        (True, '" "|","'),
    ]
    out = [(split, pat) for split, pat, _ in pats]
    out.extend(extra)
    return out


def cmd_verify():
    import pandas as pd

    from lucene_solr_spark.analysis.luceneregex import compile_regexp
    from lucene_solr_spark.analysis import simplepattern as sp

    if not os.path.isdir(WORK):
        build_oracle()
    docs = gen_docs()
    pats = gen_patterns()
    cases = [(split, pat, d) for split, pat in pats for d in docs]
    print("%d cases (%d patterns x %d docs)"
          % (len(cases), len(pats), len(docs)))
    lines = ["%s|%s|%s" % (
        "split" if split else "tok",
        b64encode(p.encode("utf-8")).decode("ascii"),
        b64encode(d.encode("utf-16-le", "surrogatepass")).decode("ascii"))
        for split, p, d in cases]
    jvm = run_jvm(lines)
    assert len(jvm) == len(cases)

    dfas = {}
    bad = 0
    rows = []
    for (split, pat, doc), enc_line in zip(cases, jvm):
        want = b64decode(enc_line).decode("utf-16-le",
                                          errors="surrogatepass")
        if pat not in dfas:
            dfas[pat] = compile_regexp(pat)
        toks = (sp.simplepattern_split_tokenize(doc, dfas[pat]) if split
                else sp.simplepattern_tokenize(doc, dfas[pat]))
        got = SEP.join(FS.join((t.term, str(t.start), str(t.end)))
                       for t in toks)
        if got != want:
            bad += 1
            if bad <= 10:
                print("MISMATCH split=%s pat=%r doc=%r"
                      % (split, pat, doc[:80]))
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
        rows.append(("split:" if split else "tok:", pat, doc, got))
    total = len(cases)
    print("verified %d/%d cases match the JVM tokenizers"
          % (total - bad, total))
    if bad:
        raise SystemExit("%d mismatches — NOT freezing" % bad)

    # freeze only the gate's pinned CASES (the extra syntax coverage
    # is re-verified by tests/test_simplepattern.py replay)
    from lucene_solr_spark.analysis.simplepattern import CASES

    def utf8able(x):
        try:
            x.encode("utf-8")
            return True
        except UnicodeEncodeError:
            return False     # lone surrogates: pinned by pytest, not
                             # representable in parquet/Spark/DuckDB

    byname = []
    for name, (pat, split) in CASES.items():
        for kind, p, doc, got in rows:
            if (p == pat and (kind == "split:") == split
                    and utf8able(doc) and utf8able(got)):
                byname.append((name, doc, got))
    df = pd.DataFrame(byname, columns=["case", "input_s", "output_s"])
    df = df.drop_duplicates(["case", "input_s"])
    out_pq = os.path.join(FIX_DIR, "simplepattern_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d simplepattern vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build_oracle()
        print("oracle built at", WORK)
    elif cmd == "verify":
        cmd_verify()
    else:
        raise SystemExit("usage: make_simplepattern_fixture.py "
                         "[build|verify]")
