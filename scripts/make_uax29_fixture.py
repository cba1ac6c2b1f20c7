"""Verify + freeze the UAX29URLEmailTokenizer fixtures for the driver gate.

Oracle = the reference's OWN generated JFlex scanner
(standard/UAX29URLEmailTokenizerImpl.java, %unicode 9.0) compiled into
/tmp with two tiny stubs (CharTermAttribute interface + the
UAX29URLEmailTokenizer constants class — nothing compiled enters the
repo), driven by a UAXDump main that replays the
UAX29URLEmailTokenizer.incrementToken wrapper loop
(UAX29URLEmailTokenizer.java:139-163, buffer capped at maxTokenLength
so overlong runs SPLIT at the window).

Three artifacts are frozen:
  fixtures_data/uax29_props.json — Unicode 9.0 word-break property
      ranges (ALetter, Hebrew_Letter, Numeric, Katakana, Han,
      Hiragana, Hangul, Mid*, Single/Double_Quote, ExtendNumLet,
      Extend+Format absorb set, ZWJ, Complex_Context, the [-\\w] URL
      follower set), derived from the scanner's own ZZ_CMAP
      equivalence classes by BEHAVIORAL PROBES against the compiled
      oracle — this is DATA, like a stemmer rule table.
  fixtures_data/uax29_tld.json — the three IANA TLD alternation lists
      parsed from ASCIITLD.jflex-macro, plus the emoji property
      ranges parsed from UnicodeEmojiProperties.jflex.
  fixtures_data/uax29_cases.parquet — (mode, input_s, output_s)
      gate vectors, frozen only after word-for-word verification.

Verification corpus: the reference's own random URL/email test
resources (random.text.with.{urls,email.addresses}.txt), a structured
generated corpus, and full BMP + astral per-char sweeps.

Usage:
  python scripts/make_uax29_fixture.py probe   # build oracle + props
  python scripts/make_uax29_fixture.py verify  # compare + freeze
"""

import json
import os
import random
import re
import shutil
import subprocess
import sys
from base64 import b64decode, b64encode

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REF_STD = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
           "lucene/analysis/standard")
REF_TEST = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/standard")
WORK = "/tmp/uax29_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"
FS = "\x1e"

ATTR_STUB = """package org.apache.lucene.analysis.tokenattributes;
public interface CharTermAttribute {
  void copyBuffer(char[] buffer, int offset, int length);
}
"""

CONST_STUB = """package org.apache.lucene.analysis.standard;
public final class UAX29URLEmailTokenizer {
  public static final int ALPHANUM = 0;
  public static final int NUM = 1;
  public static final int SOUTHEAST_ASIAN = 2;
  public static final int IDEOGRAPHIC = 3;
  public static final int HIRAGANA = 4;
  public static final int KATAKANA = 5;
  public static final int HANGUL = 6;
  public static final int URL = 7;
  public static final int EMAIL = 8;
  public static final int EMOJI = 9;
  public static final String[] TOKEN_TYPES = new String[] {
    "<ALPHANUM>", "<NUM>", "<SOUTHEAST_ASIAN>", "<IDEOGRAPHIC>",
    "<HIRAGANA>", "<KATAKANA>", "<HANGUL>", "<URL>", "<EMAIL>",
    "<EMOJI>" };
  private UAX29URLEmailTokenizer() {}
}
"""

DUMP = r"""package org.apache.lucene.analysis.standard;
import java.io.*;
import java.lang.reflect.Field;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;

public class UAXDump {
  static final class TermSink implements CharTermAttribute {
    String term = "";
    public void copyBuffer(char[] buffer, int offset, int length) {
      term = new String(buffer, offset, length);
    }
  }

  public static void main(String[] args) throws Exception {
    if (args.length > 0 && args[0].equals("cmap")) {
      Field f = UAX29URLEmailTokenizerImpl.class
          .getDeclaredField("ZZ_CMAP");
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
    // stdin: "mtl|" + base64(UTF-8 doc); stdout: base64(stream)
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
      int mtl = Integer.parseInt(line.substring(0, bar));
      String doc = new String(dec.decode(line.substring(bar + 1)),
                              StandardCharsets.UTF_8);
      UAX29URLEmailTokenizerImpl sc =
          new UAX29URLEmailTokenizerImpl(new StringReader(doc));
      if (mtl != 255) sc.setBufferSize(mtl);
      StringBuilder sb = new StringBuilder();
      int skipped = 0;
      boolean first = true;
      while (true) {
        int tt = sc.getNextToken();
        if (tt == UAX29URLEmailTokenizerImpl.YYEOF) break;
        if (sc.yylength() <= mtl) {
          sc.getText(sink);
          String term = sink.term;
          int start = sc.yychar();
          int end = start + term.length();
          String type = UAX29URLEmailTokenizer.TOKEN_TYPES[tt];
          if (!first) sb.append('\u001F');
          first = false;
          sb.append(term).append('\u001E').append(type)
            .append('\u001E').append(start).append('\u001E')
            .append(end).append('\u001E').append(skipped + 1);
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
    with open(os.path.join(pkg_std, "UAX29URLEmailTokenizer.java"),
              "w") as f:
        f.write(CONST_STUB)
    shutil.copy(os.path.join(REF_STD, "UAX29URLEmailTokenizerImpl.java"),
                pkg_std)
    with open(os.path.join(pkg_std, "UAXDump.java"), "w") as f:
        f.write(DUMP)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", WORK,
         os.path.join(pkg_attr, "CharTermAttribute.java"),
         os.path.join(pkg_std, "UAX29URLEmailTokenizer.java"),
         os.path.join(pkg_std, "UAX29URLEmailTokenizerImpl.java"),
         os.path.join(pkg_std, "UAXDump.java")],
        check=True, cwd=WORK)


def run_jvm(lines):
    proc = subprocess.run(
        ["java", "-cp", WORK, "org.apache.lucene.analysis.standard.UAXDump"],
        input="\n".join(lines) + "\n", capture_output=True,
        text=True, check=True, cwd=WORK)
    return proc.stdout.splitlines()


def jvm_tokens(docs, mtl=255):
    lines = ["%d|%s" % (mtl, b64encode(d.encode("utf-8")).decode("ascii"))
             for d in docs]
    out = run_jvm(lines)
    assert len(out) == len(docs)
    res = []
    for enc_line in out:
        s = b64decode(enc_line).decode("utf-8")
        toks = []
        if s:
            for row in s.split(SEP):
                term, typ, start, end, pinc = row.split(FS)
                toks.append((term, typ, int(start), int(end), int(pinc)))
        res.append(toks)
    return res


def extract_cmap():
    res = subprocess.run(
        ["java", "-cp", WORK,
         "org.apache.lucene.analysis.standard.UAXDump", "cmap"],
        check=True, capture_output=True, text=True, cwd=WORK)
    spans = []
    for ln in res.stdout.splitlines():
        lo, hi, cls = (int(x) for x in ln.split())
        spans.append((lo, hi, cls))
    return spans


def class_reps(spans):
    """One representative code point per cmap class (prefer the lowest
    non-surrogate member)."""
    reps = {}
    members = {}
    for lo, hi, cls in spans:
        members.setdefault(cls, []).append((lo, hi))
        if cls in reps:
            continue
        cp = lo
        while 0xD800 <= cp <= 0xDFFF and cp <= hi:
            cp += 1
        if not 0xD800 <= cp <= 0xDFFF:
            reps[cls] = cp
    return reps, members


HEB = "\u05D0"


def probe_classes():
    """Assign word-break/URL property sets per cmap class via
    behavioral probes of the compiled oracle."""
    spans = extract_cmap()
    reps, members = class_reps(spans)
    classes = sorted(reps)
    print("%d cmap classes" % len(classes))

    probes = []
    for cls in classes:
        r = chr(reps[cls])
        probes.extend([
            r,                      # 0 standalone
            "x" + r,                # 1 absorb-after-letter
            r + "x",                # 2 leading
            "x" + r + "x",          # 3 mid-letter
            "7" + r + "7",          # 4 mid-num
            HEB + r,                # 5 WB7a single-quote
            HEB + r + HEB,          # 6 WB7b/c double-quote
            "xy.com" + r,           # 7 URL follower
        ])
    NP = 8
    res = jvm_tokens(probes)

    props = {k: set() for k in [
        "aletter", "hebrew", "numeric", "katakana", "hiragana", "han",
        "hangul", "sea", "midletter", "midnum", "midnumlet",
        "single_quote", "double_quote", "extendnumlet", "extend",
        "zwj", "host_follower", "emoji_standalone"]}

    for idx, cls in enumerate(classes):
        r = chr(reps[cls])
        p = res[idx * NP:(idx + 1) * NP]
        t0 = p[0]
        one = len(t0) == 1
        typ0 = t0[0][1] if one else None
        if reps[cls] == 0x200D:
            props["zwj"].add(cls)
        if one and typ0 == "<NUM>":
            props["numeric"].add(cls)
        elif one and typ0 == "<ALPHANUM>":
            props["aletter"].add(cls)
            # Hebrew iff a following single quote is kept (WB7a):
            # probe 5 is HEB+r which doesn't work here; use r+"x"? no —
            # dedicated probe below via heb detection: r IS the letter;
            # HEB+r+HEB (probe 6) one token only if r is DQ — instead
            # detect Hebrew by: standalone WORD and probe1 ("x"+r) one
            # token (any AHLetter joins) — need r+"'" probe; handled in
            # a second pass below.
        elif one and typ0 == "<KATAKANA>":
            props["katakana"].add(cls)
        elif one and typ0 == "<HIRAGANA>":
            props["hiragana"].add(cls)
        elif one and typ0 == "<IDEOGRAPHIC>":
            props["han"].add(cls)
        elif one and typ0 == "<HANGUL>":
            props["hangul"].add(cls)
        elif one and typ0 == "<SOUTHEAST_ASIAN>":
            props["sea"].add(cls)
            # dual membership: Complex_Context marks that are ALSO
            # WB:Extend (Thai/Lao/Myanmar/Khmer vowel signs etc.)
            # absorb after a letter ("x"+r one ALPHANUM) — safe test
            # because a SEA char is never AHLetter/Numeric, so the
            # only way "x"+r fuses is WB4 absorption
            ax = p[1]
            if (len(ax) == 1 and ax[0][0] == "x" + r
                    and ax[0][1] == "<ALPHANUM>"):
                props["extend"].add(cls)
        elif one and typ0 == "<EMOJI>":
            props["emoji_standalone"].add(cls)
            # dual membership: Emoji chars that are ALSO WB:ALetter
            # (circled/squared letters, info symbol…) — standalone the
            # earlier emoji rule wins the length tie, but mid-word the
            # longer word match fuses them ("x"+r+"x" one ALPHANUM)
            xx = p[3]
            if (len(xx) == 1 and xx[0][0] == "x" + r + "x"
                    and xx[0][1] == "<ALPHANUM>"):
                props["aletter"].add(cls)
        elif not t0:
            # ignored standalone: absorb / ENL / mid / quote dispatch
            ax = p[1]   # "x"+r
            xa = p[2]   # r+"x"
            xx = p[3]   # "x r x"
            nn = p[4]   # "7 r 7"
            hr = p[5]   # HEB+r
            hh = p[6]   # HEB r HEB
            absorb_after = (len(ax) == 1 and ax[0][0] == "x" + r
                            and ax[0][1] == "<ALPHANUM>")
            leads = (len(xa) == 1 and xa[0][0] == r + "x")
            if absorb_after and not leads:
                if reps[cls] != 0x200D:
                    props["extend"].add(cls)
                continue
            if absorb_after and leads:
                props["extendnumlet"].add(cls)
                continue
            mid_l = len(xx) == 1 and xx[0][1] == "<ALPHANUM>"
            mid_n = len(nn) == 1 and nn[0][1] == "<NUM>"
            heb_sq = len(hr) == 1 and hr[0][0] == HEB + r
            heb_dq = len(hh) == 1 and hh[0][0] == HEB + r + HEB
            if mid_l and mid_n:
                if heb_sq:
                    props["single_quote"].add(cls)
                else:
                    props["midnumlet"].add(cls)
            elif mid_l:
                props["midletter"].add(cls)
            elif mid_n:
                props["midnum"].add(cls)
            elif heb_dq:
                props["double_quote"].add(cls)
        # URL follower: first token of "xy.com"+r is URL iff r is NOT
        # in [-\w] (and not an absorbing char — checked independently)
        u = p[7]
        if u and u[0][1] == "<URL>":
            pass
        else:
            props["host_follower"].add(cls)

    # second pass: Hebrew letters among aletter classes (WB7a: letter
    # followed by single quote stays one token only for Hebrew)
    al_classes = sorted(props["aletter"])
    probes2 = [chr(reps[c]) + "'" for c in al_classes]
    res2 = jvm_tokens(probes2)
    for c, toks in zip(al_classes, res2):
        if len(toks) == 1 and toks[0][0] == chr(reps[c]) + "'":
            props["hebrew"].add(c)

    # materialize class sets -> code point ranges
    out = {}
    for name, clsset in props.items():
        rngs = []
        for cls in sorted(clsset):
            rngs.extend(members[cls])
        rngs.sort()
        merged = []
        for lo, hi in rngs:
            if merged and lo == merged[-1][1] + 1:
                merged[-1][1] = hi
            else:
                merged.append([lo, hi])
        out[name] = merged
    for name in sorted(out):
        n = sum(hi - lo + 1 for lo, hi in out[name])
        print("  %-16s %6d cps in %4d ranges"
              % (name, n, len(out[name])))
    return out


def parse_tlds():
    """ASCIITLD.jflex-macro -> three lowercase TLD lists (data)."""
    path = os.path.join(REF_STD, "ASCIITLD.jflex-macro")
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    lists = {}
    for name in ("ASCIITLD", "ASCIITLDprefix_1CharSuffix",
                 "ASCIITLDprefix_2CharSuffix"):
        m = re.search(re.escape(name) + r'\s*=\s*"\."\s*\((.*?)\)\s*"\."\?',
                      text, re.S)
        assert m, name
        body = m.group(1)
        tlds = []
        for alt in body.split("|"):
            alt = alt.strip()
            if not alt:
                continue
            # an alternative is a concatenation of [lL] case pairs and
            # literal chars (punycode TLDs contain literal "--")
            tld = []
            for m2 in re.finditer(r"\[(.)(.)\]|(\S)", alt):
                if m2.group(3) is not None:
                    tld.append(m2.group(3))
                else:
                    lo, up = m2.group(1), m2.group(2)
                    assert lo.upper() == up, alt
                    tld.append(lo)
            assert tld, alt
            tlds.append("".join(tld))
        lists[name] = sorted(tlds)
    return lists


def parse_emoji_props():
    """UnicodeEmojiProperties.jflex -> {prop: [[lo,hi],...]} (data)."""
    path = ("/root/reference/lucene/core/src/data/jflex/"
            "UnicodeEmojiProperties.jflex")
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    out = {}
    for m in re.finditer(r"^(\w+)\s*=\s*\[(.*)\]\s*$", text, re.M):
        name, body = m.group(1), m.group(2)
        rngs = []
        for mm in re.finditer(
                r"\\u\{([0-9A-Fa-f]+)\}(?:-\\u\{([0-9A-Fa-f]+)\})?", body):
            lo = int(mm.group(1), 16)
            hi = int(mm.group(2), 16) if mm.group(2) else lo
            rngs.append([lo, hi])
        out[name] = rngs
    assert set(out) == {"Emoji", "Emoji_Modifier", "Emoji_Modifier_Base",
                        "Extended_Pictographic"}, set(out)
    return out


def cmd_probe():
    build_oracle()
    props = probe_classes()
    os.makedirs(FIX_DIR, exist_ok=True)
    with open(os.path.join(FIX_DIR, "uax29_props.json"), "w") as f:
        json.dump(props, f, sort_keys=True)
    tld = {"tld": parse_tlds(), "emoji": parse_emoji_props()}
    with open(os.path.join(FIX_DIR, "uax29_tld.json"), "w") as f:
        json.dump(tld, f, sort_keys=True)
    print("wrote uax29_props.json + uax29_tld.json")


def gen_structured():
    rng = random.Random(20260819)
    docs = [
        "bob@example.com first.last-x_1@sub.example.co.uk",
        "visit http://lucene.apache.org/core/ or https://s.apache.org?x=1",
        "ftp://ftp.gnu.org/pub/gnu/;type=d file://host.name/p%20ath#f",
        "no-scheme hosts: example.com example.com. xyz.ai xyz.aique",
        "ips 1.2.3.4 216.239.63.104:8080/path [2001:db8::1] me@[1.2.3.4]",
        "mailto:test@example.org MAILTO:X@Y.COM mailto:notanemail",
        "\"quoted local\"@example.com a,b@c.org a..b@d.museum",
        "mixed text www.example.com/a(b)c?d=e&f=g#h plus words",
        "O'Reilly can't 3.14 1,234.56 a1-b2 foo_bar _tail head_",
        "日本語のテキスト ひらがな カタカナ 한국어 조각 中文测试",
        "ภาษาไทย ๑๒๓ ລາວ မြန်မာ ខ្មែរ",
        "עברית geresh' and ״gershayim״ ℵ'x",
        "emoji 😀 👍🏻 👩‍👩‍👧‍👦 #️⃣ 5⃣ 🇺🇸🇫🇷 ©®™ 🏴󠁧󠁢󠁥󠁮󠁧󠁿",
        "zwj mix a‍b 1‍2 🧑‍🚀",
        "x" * 300 + " tail " + "7" * 260,
        "long url http://example.com/" + "a/" * 200 + " end",
        "",
    ]
    words = ["alpha", "Beta2", "x", "can't", "3.14", "7,000",
             "foo_bar", "example.com", "a@b.co", "http://e.org/p",
             "日本", "한국", "ไทย", "😀", "ℵ", "α7", "ब्"]
    seps = [" ", "  ", ". ", " -", "\t", "\n", ", ", "; ", ":", "/"]
    for _ in range(1200):
        parts = []
        for _ in range(rng.randrange(1, 9)):
            parts.append(rng.choice(words))
            parts.append(rng.choice(seps))
        docs.append("".join(parts))
    # reference test resources: realistic random URL/email text
    for name in ("random.text.with.urls.txt",
                 "random.text.with.email.addresses.txt",
                 "urls.from.random.text.with.urls.txt",
                 "email.addresses.from.random.text.with.email."
                 "addresses.txt"):
        path = os.path.join(REF_TEST, name)
        with open(path, "r", encoding="utf-8") as f:
            blob = f.read()
        # chunk into ~2000-char docs on line boundaries
        cur = []
        size = 0
        for ln in blob.splitlines():
            cur.append(ln)
            size += len(ln) + 1
            if size > 2000:
                docs.append("\n".join(cur))
                cur = []
                size = 0
        if cur:
            docs.append("\n".join(cur))
    return docs


def gen_sweeps():
    """Per-char probes over the full BMP + astral sample, 64/doc."""
    docs = []
    cps = [cp for cp in range(0x20, 0x10000)
           if not 0xD800 <= cp <= 0xDFFF]
    cps = [0x09, 0x0A, 0x0D] + cps
    astral = (list(range(0x10000, 0x10400))
              + list(range(0x1D400, 0x1D800))
              + list(range(0x1F000, 0x20000))
              + list(range(0x20000, 0x20100))
              + list(range(0xE0000, 0xE0100))
              + [0x2F800, 0x10FFFD])
    for ctx in ("a%s1", "x%sy", "1%s2"):
        for block in (cps, astral):
            for i in range(0, len(block), 64):
                chunk = block[i:i + 64]
                docs.append(" ".join(ctx % chr(cp) for cp in chunk))
    return docs


def cmd_verify():
    import pandas as pd

    import lucene_solr_spark.analysis.uax29 as uax29

    if not os.path.isdir(WORK):
        build_oracle()
    structured = gen_structured()
    sweeps = gen_sweeps()
    cases = ([(m, d) for m in sorted(uax29.MODES) for d in structured]
             + [("m255", d) for d in sweeps])
    print("%d cases (%d structured docs, %d sweep docs)"
          % (len(cases), len(structured), len(sweeps)))
    lines = ["%d|%s" % (uax29.MODES[m],
                        b64encode(d.encode("utf-8")).decode("ascii"))
             for m, d in cases]
    jvm = run_jvm(lines)
    assert len(jvm) == len(cases)

    bad = 0
    rows = []
    for (mode, doc), enc_line in zip(cases, jvm):
        want = b64decode(enc_line).decode("utf-8")
        got = uax29.uax29_serialize(doc, mode)
        if got != want:
            bad += 1
            if bad <= 12:
                print("MISMATCH mode=%s doc=%r" % (mode, doc[:160]))
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
    print("verified %d/%d cases match the JVM scanner"
          % (total - bad, total))
    if bad:
        raise SystemExit("%d mismatches — NOT freezing" % bad)

    n_struct = len(uax29.MODES) * len(structured)
    keep = rows[:n_struct] + rows[n_struct::4]
    df = pd.DataFrame(keep, columns=["mode", "input_s", "output_s"])
    df = df.drop_duplicates(["mode", "input_s"])
    out_pq = os.path.join(FIX_DIR, "uax29_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d uax29 vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if cmd == "probe":
        cmd_probe()
    elif cmd == "verify":
        cmd_verify()
    else:
        raise SystemExit("usage: make_uax29_fixture.py [probe|verify]")
