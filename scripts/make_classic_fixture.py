"""Verify + freeze the ClassicTokenizer fixtures for the driver gate.

Oracle = the reference's OWN generated JFlex scanner
(standard/ClassicTokenizerImpl.java) compiled into /tmp with two tiny
stubs (the CharTermAttribute interface and the ClassicTokenizer
constants class — nothing compiled enters the repo), driven by a
ClassicDump main that replays the ClassicTokenizer.incrementToken
wrapper loop (maxTokenLength skip + ACRONYM_DEP->HOST retype,
ClassicTokenizer.java:131-159) and optionally ClassicFilter
(ClassicFilter.java:46-71).

Two artifacts are frozen:
  fixtures_data/classic_cmap.json   — the scanner's character classes
      (ZZ_CMAP, i.e. Unicode 3.0 letter/digit plus the grammar's THAI/
      CJ/separator ranges) re-expressed as symbol ranges; this is DATA
      the Python grammar engine dispatches on, like a stemmer table.
  fixtures_data/classic_cases.parquet — (mode, input_s, output_s)
      vectors for the fts_classic driver gate.

Verification: analysis/classic.py must agree token-for-token
(term, type, start, end, posInc) with the JVM scanner over a FULL BMP
per-character sweep in three contexts (a_1 / x_y / 1_2) plus a
structured corpus of emails, hosts, acronyms, serials, apostrophes,
company names, CJ/Thai text and overlong tokens, in all three modes
(raw255 / filtered255 / raw10).

Usage: python scripts/make_classic_fixture.py
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

import pandas as pd

REF_IMPL = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
            "lucene/analysis/standard/ClassicTokenizerImpl.java")
WORK = "/tmp/classic_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

ATTR_STUB = """package org.apache.lucene.analysis.tokenattributes;
public interface CharTermAttribute {
  void copyBuffer(char[] buffer, int offset, int length);
}
"""

CONST_STUB = """package org.apache.lucene.analysis.standard;
public final class ClassicTokenizer {
  public static final int ALPHANUM = 0;
  public static final int APOSTROPHE = 1;
  public static final int ACRONYM = 2;
  public static final int COMPANY = 3;
  public static final int EMAIL = 4;
  public static final int HOST = 5;
  public static final int NUM = 6;
  public static final int CJ = 7;
  public static final int ACRONYM_DEP = 8;
  public static final String[] TOKEN_TYPES = new String[] {
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "<ACRONYM_DEP>" };
  private ClassicTokenizer() {}
}
"""

DUMP = r"""package org.apache.lucene.analysis.standard;
import java.io.*;
import java.lang.reflect.Field;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;

public class ClassicDump {
  static final class TermSink implements CharTermAttribute {
    String term = "";
    public void copyBuffer(char[] buffer, int offset, int length) {
      term = new String(buffer, offset, length);
    }
  }

  public static void main(String[] args) throws Exception {
    if (args.length > 0 && args[0].equals("cmap")) {
      Field f = ClassicTokenizerImpl.class.getDeclaredField("ZZ_CMAP");
      f.setAccessible(true);
      char[] cmap = (char[]) f.get(null);
      StringBuilder sb = new StringBuilder();
      int runStart = 0;
      for (int i = 1; i <= cmap.length; i++) {
        if (i == cmap.length || cmap[i] != cmap[runStart]) {
          sb.append(runStart).append(' ').append(i - 1).append(' ')
            .append((int) cmap[runStart]).append('\n');
          runStart = i;
        }
      }
      System.out.print(sb);
      return;
    }
    // stdin: "mode|" + base64(UTF-8 doc); stdout: base64(stream)
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new BufferedWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8)));
    Base64.Decoder dec = Base64.getDecoder();
    Base64.Encoder enc = Base64.getEncoder();
    TermSink sink = new TermSink();
    String line;
    while ((line = in.readLine()) != null) {
      int bar = line.indexOf('|');
      String mode = line.substring(0, bar);
      String doc = new String(dec.decode(line.substring(bar + 1)),
                              StandardCharsets.UTF_8);
      int mtl = mode.equals("raw10") ? 10 : 255;
      boolean filtered = mode.equals("filtered255");
      ClassicTokenizerImpl sc =
          new ClassicTokenizerImpl(new StringReader(doc));
      StringBuilder sb = new StringBuilder();
      int skipped = 0;
      boolean first = true;
      while (true) {
        int tt = sc.getNextToken();
        if (tt == ClassicTokenizerImpl.YYEOF) break;
        if (sc.yylength() <= mtl) {
          sc.getText(sink);
          String term = sink.term;
          int start = sc.yychar();
          int end = start + term.length();
          String type;
          if (tt == ClassicTokenizer.ACRONYM_DEP) {
            type = "<HOST>";
            term = term.substring(0, term.length() - 1);
          } else {
            type = ClassicTokenizer.TOKEN_TYPES[tt];
          }
          if (filtered) {
            int n = term.length();
            if (type.equals("<APOSTROPHE>") && n >= 2
                && term.charAt(n - 2) == '\''
                && (term.charAt(n - 1) == 's'
                    || term.charAt(n - 1) == 'S')) {
              term = term.substring(0, n - 2);
            } else if (type.equals("<ACRONYM>")) {
              term = term.replace(".", "");
            }
          }
          if (!first) sb.append('');
          first = false;
          sb.append(term).append('').append(type).append('')
            .append(start).append('').append(end)
            .append('').append(skipped + 1);
          skipped = 0;
        } else {
          skipped++;
        }
      }
      out.println(enc.encodeToString(
          sb.toString().getBytes(StandardCharsets.UTF_8)));
    }
    out.flush();
  }
}
"""

# representative code points -> grammar class symbol (classic.py docs)
REPS = [
    # Thai LETTERS merge with plain letters and Thai DIGITS with plain
    # digits in ZZ_CMAP: LETTER/ALPHA/HAS_DIGIT all admit them and the
    # extra THAI membership only re-grants ALPHANUM, which letter/digit
    # already have.  Only THAI-range chars that are neither letter nor
    # digit (e.g. the baht sign, Thai combining marks) behave
    # distinctly — ALPHANUM-only via the raw [฀-๙] range.
    (0x61, "l"),      # 'a' plain letter
    (0x30, "d"),      # '0' plain digit
    (0x0E01, "l"),    # Thai letter KO KAI (merged with letters)
    (0x0E50, "d"),    # Thai digit zero (merged with digits)
    (0x0E3F, "e"),    # Thai baht sign (THAI range, not letter/digit)
    (0x4E00, "J"),    # CJK ideograph
    (0x27, "'"),
    (0x2E, "."),
    (0x26, "&"),
    (0x40, "@"),
    (0x2D, "-"),
    (0x5F, "_"),
    # '/' and ',' appear only in {P} — identical behavior, one class
    (0x2F, ","),
    (0x2C, ","),
]


def build_oracle():
    shutil.rmtree(WORK, ignore_errors=True)
    pkg_attr = os.path.join(
        WORK, "org", "apache", "lucene", "analysis", "tokenattributes")
    pkg_std = os.path.join(
        WORK, "org", "apache", "lucene", "analysis", "standard")
    os.makedirs(pkg_attr)
    os.makedirs(pkg_std)
    with open(os.path.join(pkg_attr, "CharTermAttribute.java"), "w") as f:
        f.write(ATTR_STUB)
    with open(os.path.join(pkg_std, "ClassicTokenizer.java"), "w") as f:
        f.write(CONST_STUB)
    shutil.copy(REF_IMPL, pkg_std)
    with open(os.path.join(pkg_std, "ClassicDump.java"), "w") as f:
        f.write(DUMP)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", WORK,
         os.path.join(pkg_attr, "CharTermAttribute.java"),
         os.path.join(pkg_std, "ClassicTokenizer.java"),
         os.path.join(pkg_std, "ClassicTokenizerImpl.java"),
         os.path.join(pkg_std, "ClassicDump.java")],
        check=True, cwd=WORK)


def extract_cmap():
    """ZZ_CMAP -> {symbol: [[lo, hi], ...]} covering the full BMP."""
    res = subprocess.run(
        ["java", "-cp", WORK + ":" + os.path.join(WORK, "."), "org.apache.lucene.analysis.standard.ClassicDump",
         "cmap"],
        check=True, capture_output=True, text=True, cwd=WORK)
    cmap = [0] * 65536
    for ln in res.stdout.splitlines():
        lo, hi, cls = (int(x) for x in ln.split())
        if lo > 0xFFFF:
            # the scanner consumes code points; everything
            # supplementary must be filler (class of U+0020)
            assert cls == 0, (lo, hi, cls)
            continue
        for cp in range(lo, min(hi, 0xFFFF) + 1):
            cmap[cp] = cls
    cls2sym = {}
    for cp, sym in REPS:
        cls = cmap[cp]
        if cls in cls2sym and cls2sym[cls] != sym:
            raise SystemExit(
                "cmap class %d claimed by both %r and %r — grammar "
                "classes are not separable" % (cls, cls2sym[cls], sym))
        cls2sym[cls] = sym
    syms = [cls2sym.get(c, " ") for c in cmap]
    ranges = {}
    run_start = 0
    for i in range(1, 65537):
        if i == 65536 or syms[i] != syms[run_start]:
            ranges.setdefault(syms[run_start], []).append(
                [run_start, i - 1])
            run_start = i
    n_spans = sum(len(v) for v in ranges.values())
    print("cmap: %d distinct JFlex classes -> %d symbols, %d spans"
          % (len(set(cmap)), len(ranges), n_spans))
    return ranges


def gen_structured():
    rng = random.Random(20260819)
    docs = [
        "AT&T Excite@Home U.S.A. I.B.M. etc.",
        "O'Reilly you're O'Reilly's don't",
        "bob@example.com first.last-x_1@sub.example.co.uk",
        "lucene.apache.org www.example.com 1.2.3.4",
        "3.14 2.4 v2.0.1 R2D2 C3PO QUESTION-42 21-35 1-800-FLOWERS",
        "a/b/c 2006/05/01 12,345.67 serial_9-x/7",
        "日本語のテキスト ひらがな カタカナ 한국어 조각",
        "ภาษาไทย ๑๒๓ ทดสอบ",
        "mixed日本text และไทย",
        "x" * 300 + " after",
        "prefix " + "y" * 256 + " " + "z" * 255 + " tail",
        "longish-token12 and superlongword here",
        "quick brown fox 1 2 3",
        "\"quoted\" (paren) [brack] {brace} semi; colon: bang!",
        "dots... commas,, dashes-- under__ slash// amp&& at@@",
        "'leading apostrophe trailing' s' 's alone ' x",
        "a.b.c.d.e a.1.b.2 1.a.2.b A&B's AT&T's",
        "U.S.A I.B.M I. B. single.",
        "emoji \U0001F600 astral \U00010300 pair",
        "",
    ]
    letters = ["alpha", "Beta", "GAMMA", "d", "X", "mot", "café",
               "αβ", "яз", "กข",
               "straße"]
    digity = ["1", "42", "2024", "3x", "x3", "007", "๑๒"]
    seps = ["-", "_", "/", ".", ",", "'", "&", "@", " ", "  ", ". ",
            " .", "?", "\t"]
    for _ in range(1500):
        parts = []
        for _ in range(rng.randrange(1, 10)):
            pool = letters if rng.random() < 0.6 else digity
            parts.append(rng.choice(pool))
            parts.append(rng.choice(seps))
        docs.append("".join(parts))
    return docs


def gen_sweeps():
    """Full-BMP per-char probes in three contexts, 64 probes per doc."""
    docs = []
    cps = [cp for cp in range(0x20, 0x10000)
           if not 0xD800 <= cp <= 0xDFFF]
    cps = [0x09, 0x0A, 0x0D] + cps
    for ctx in ("a%s1", "x%sy", "1%s2"):
        for i in range(0, len(cps), 64):
            chunk = cps[i:i + 64]
            docs.append(" ".join(ctx % chr(cp) for cp in chunk))
    return docs


def run_jvm(lines):
    proc = subprocess.run(
        ["java", "-cp", WORK,
         "org.apache.lucene.analysis.standard.ClassicDump"],
        input="\n".join(lines) + "\n", capture_output=True,
        text=True, check=True, cwd=WORK)
    return proc.stdout.splitlines()


def main():
    build_oracle()
    ranges = extract_cmap()
    os.makedirs(FIX_DIR, exist_ok=True)
    cmap_path = os.path.join(FIX_DIR, "classic_cmap.json")
    with open(cmap_path, "w", encoding="utf-8") as f:
        json.dump(ranges, f, sort_keys=True)
    print("wrote", cmap_path)

    # (re)load the Python engine against the fresh table
    import lucene_solr_spark.analysis.classic as classic
    classic._TABLE = None

    structured = gen_structured()
    sweeps = gen_sweeps()
    cases = ([(m, d) for m in sorted(classic.MODES) for d in structured]
             + [("raw255", d) for d in sweeps])
    lines = ["%s|%s" % (m, b64encode(d.encode("utf-8")).decode("ascii"))
             for m, d in cases]
    jvm = run_jvm(lines)
    assert len(jvm) == len(cases), (len(jvm), len(cases))

    bad = 0
    rows = []
    for (mode, doc), enc_line in zip(cases, jvm):
        want = b64decode(enc_line).decode("utf-8")
        got = classic.classic_serialize(doc, mode)
        if got != want:
            bad += 1
            if bad <= 10:
                print("MISMATCH mode=%s doc=%r" % (mode, doc[:120]))
                wt, gt = want.split(SEP), got.split(SEP)
                for k in range(max(len(wt), len(gt))):
                    w = wt[k] if k < len(wt) else "<none>"
                    g = gt[k] if k < len(gt) else "<none>"
                    if w != g:
                        print("  tok[%d] jvm=%r py=%r" % (k, w, g))
            continue
        rows.append((mode, doc, got))
    total = len(cases)
    print("verified %d/%d cases match the JVM scanner"
          % (total - bad, total))
    if bad:
        raise SystemExit("%d mismatches — NOT freezing" % bad)

    # freeze: all structured cases + every 4th sweep doc
    n_struct = 3 * len(structured)
    keep = rows[:n_struct] + rows[n_struct::4]
    df = pd.DataFrame(keep, columns=["mode", "input_s", "output_s"])
    df = df.drop_duplicates(["mode", "input_s"])
    out_pq = os.path.join(FIX_DIR, "classic_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d classic vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    main()
