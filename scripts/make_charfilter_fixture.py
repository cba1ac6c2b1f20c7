"""Verify + freeze the charfilter fixtures for the driver gate.

Oracle = the reference's OWN generated HTMLStripCharFilter scanner
compiled as a JVM test oracle (charfilter/{HTMLStripCharFilter,
BaseCharFilter}.java + core CharArray{Map,Set}/CharFilter +
util/OpenStringBuilder — the make_snowball5_fixture.py pattern;
nothing compiled enters the repo), driven by a StripDump main over:
the JUnit vectors, the two HTML resource files from the reference
test tree, and a deterministic ~6k-document corpus of generated messy
HTML (nested tags, malformed attributes, entities, surrogate pairs,
scripts/styles/comments/SSI/CDATA, random '<&>' noise). The Python
html_strip must agree byte-for-byte on every (doc, escaped-tags)
combination; MappingCharFilter cases are frozen from the (JUnit-
pinned) Python implementation. Every-Nth verified pair is frozen to
fixtures_data/charfilter_cases.parquet, which the fts_charfilter
driver gate replays LIVE vs the frozen outputs.

Usage: python scripts/make_charfilter_fixture.py
"""

import os
import random
import shutil
import subprocess
import sys
from base64 import b64decode, b64encode

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF = "/root/reference/lucene"
REF_CF = (REF + "/analysis/common/src/java/org/apache/lucene/analysis/"
          "charfilter")
REF_TEST = (REF + "/analysis/common/src/test/org/apache/lucene/analysis/"
            "charfilter")
WORK = "/tmp/htmlstrip_oracle"
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
STRIDE = 12

ARRAYUTIL = """package org.apache.lucene.util;
public final class ArrayUtil {
  public static int oversize(int minTargetSize, int bytesPerElement) {
    return Math.max(minTargetSize, minTargetSize + (minTargetSize >> 3) + 8);
  }
  public static int[] grow(int[] array) {
    return grow(array, array.length + 1);
  }
  public static int[] grow(int[] array, int minSize) {
    if (array.length < minSize) {
      int[] newArray = new int[oversize(minSize, 4)];
      System.arraycopy(array, 0, newArray, 0, array.length);
      return newArray;
    }
    return array;
  }
}
"""

STRIPDUMP = """import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.charfilter.HTMLStripCharFilter;

public class StripDump {
  // stdin: "tags,csv|" + base64(UTF-8 doc) per line (tags may be
  // empty); stdout: base64(stripped) per line
  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new BufferedWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8)));
    Base64.Decoder dec = Base64.getDecoder();
    Base64.Encoder enc = Base64.getEncoder();
    String line;
    while ((line = in.readLine()) != null) {
      int bar = line.indexOf('|');
      String spec = line.substring(0, bar);
      String payload = line.substring(bar + 1);
      Set<String> esc = spec.isEmpty()
          ? null : new HashSet<>(Arrays.asList(spec.split(",")));
      String html = new String(dec.decode(payload), StandardCharsets.UTF_8);
      Reader r = esc == null
          ? new HTMLStripCharFilter(new StringReader(html))
          : new HTMLStripCharFilter(new StringReader(html), esc);
      StringBuilder sb = new StringBuilder();
      int ch;
      while ((ch = r.read()) != -1) sb.append((char) ch);
      out.println(enc.encodeToString(
          sb.toString().getBytes(StandardCharsets.UTF_8)));
    }
    out.flush();
  }
}
"""

# the escaped-tags configurations of the gate's CHARFILTER_CASES
CONFIGS = {
    "html_strip": "",
    "html_strip_escbr": "BR",
    "html_strip_escaped": "reserved,escaped,SCRIPT,STYLE",
}


def build_oracle():
    shutil.rmtree(WORK, ignore_errors=True)
    cf = os.path.join(WORK, "org/apache/lucene/analysis/charfilter")
    ut = os.path.join(WORK, "org/apache/lucene/analysis/util")
    an = os.path.join(WORK, "org/apache/lucene/analysis")
    lu = os.path.join(WORK, "org/apache/lucene/util")
    for d in (cf, ut, lu):
        os.makedirs(d)
    for f in ("HTMLStripCharFilter.java", "BaseCharFilter.java"):
        shutil.copy(os.path.join(REF_CF, f), cf)
    shutil.copy(REF + "/analysis/common/src/java/org/apache/lucene/"
                "analysis/util/OpenStringBuilder.java", ut)
    for f in ("CharArrayMap.java", "CharArraySet.java", "CharFilter.java",
              "CharacterUtils.java"):
        shutil.copy(REF + "/core/src/java/org/apache/lucene/analysis/" + f,
                    an)
    with open(os.path.join(lu, "ArrayUtil.java"), "w") as f:
        f.write(ARRAYUTIL)
    with open(os.path.join(WORK, "StripDump.java"), "w") as f:
        f.write(STRIPDUMP)
    srcs = []
    for root, _, files in os.walk(WORK):
        srcs += [os.path.join(root, f) for f in files
                 if f.endswith(".java")]
    subprocess.run(["javac", "-d", WORK] + srcs, check=True)


def gen_corpus():
    rng = random.Random(20260819)
    docs = []
    for fn in ("htmlStripReaderTest.html", "MS-Word 14 generated.htm"):
        with open(os.path.join(REF_TEST, fn), encoding="utf-8",
                  errors="replace") as f:
            docs.append(f.read())

    # the malformed-HTML JUnit vectors (TestHTMLStripCharFilter
    # testMalformedHTML and friends)
    docs += [
        "a <a hr<ef=aa<a>> </close</a>",
        "<a href=http://dmoz.org/cgi-bin/add.cgi?where=/arts/\" class=lu "
        "style=\"font-size: 9px\" target=dmoz>Submit a Site</a>",
        "<a href=javascript:ioSwitch('p8','http://www.csmonitor.com/') "
        "title=expand id=e8 class=expanded "
        "rel=http://www.csmonitor.com/>Christian Science",
        "<link rel=\"alternate\" type=\"application/rss+xml\" "
        "title=\"San Francisco \" 2008 RSS Feed\" "
        "href=\"http://2008.sf.wordcamp.org/feed/\" />",
        "<a href=\" http://www.surgery4was.happyhost.org/video-of-"
        "arthroscopic-knee-surgery symptoms.html, heat congestive heart "
        "failure <a href=\" http://www.symptoms1bad.happyhost.org/canine",
        "<a href=\"http://ucblibraries.colorado.edu/how/index.htm\""
        "class=\"pageNavAreaText\">",
        "<link title=\"^\\\" 21Sta's Blog\" rel=\"search\"  "
        "type=\"application/opensearchdescription+xml\"  "
        "href=\"http://21sta.com/blog/inc/opensearch.php\" />",
        "<a href=\"#postcomment\" title=\"\"Leave a comment\";\">?",
        "<a href='/modern-furniture'   ' id='21txt' class='offtab'   "
        "onMouseout=\"this.className='offtab';  return true;\" "
        "onMouseover=\"this.className='ontab';  return true;\">",
        "The <a href=<a href=\"http://www.advancedmd.com>medical\">"
        "http://www.advancedmd.com>medical</a> practice software</a>",
        "<a href=\"node/21426\" class=\"clipTitle2\" title=\"Levi.com/BMX "
        "2008 Clip of the Week 29 \"Morgan Wade Leftover Clips\"\">"
        "Levi.com/BMX 2008 Clip of the Week 29...",
        "<a href=#\" ondragstart=\"return false\" onclick=\"window."
        "external.AddFavorite('http://www.amazingtextures.com', 'Amazing "
        "Textures');return false\" onmouseover=\"window.status='Add to "
        "Favorites';return true\">Add to Favorites",
        "E-mail: <a href=\"\"mailto:XXXXXX@example.com\" \">"
        "XXXXXX@example.com </a>",
        "<li><a href=\"#28\" title=\"Hubert \"Geese\" Ausby\">Hubert "
        "\"Geese\" Ausby</a></li>",
        "<href=\"http://anbportal.com/mms/login.asp\">",
        "<a href=\"",
        "<a href=\">",
        "<a rel=\"nofollow\" href=\"http://anissanina31.skyrock.com/"
        "1895039493-Hi-tout-le-monde.html\" title=\" Hi, tout le monde !>"
        "#</a>",
        "<a href=#Services & Support>",
        "<input type=\"image\" src=\"images/afbe.gif\" width=\"22\" "
        "height=\"22\"  hspace=\"4\" title=\"Add to Favorite\" "
        "alt=\"Add to Favorite\"onClick=\" if(window.sidebar){ "
        "window.sidebar.addPanel(document.title,location.href,''); }else "
        "if(window.external){ window.external.AddFavorite(location.href,"
        "document.title); }else if(window.opera&&window.print) { return "
        "true; }\">",
        "<!--- several dashes -> and -- inside --->tail",
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0\">body",
        "<![CDATA[ keep <this> & that ]]> after",
        "<![CDATA[ unterminated <cdata",
        "<script type=\"text/javascript\">var x = '<div>' + \"</scr\" + "
        "\"ipt>\";</script>visible",
        "<script><!-- document.write('</script>'); --></script>after",
        "<style>body { color: 'red'; } /* <b> */</style>styled",
        "<style><!-- .cls { content: \"</style>\" } --></style>x",
        "<!--#include virtual=\"/footer.html\" -->tail",
        "<!--#exec cmd=\"ls '-->' \" -->quoted ssi",
        "text <!--#config errmsg=\"<oops>\"--> more",
        "a<br>b<br />c< br>d</br>e</ br>f",
        "&#xD83D;&#xDE00; pair &#55357;&#56832; mixed &#xD83D;&#56832; "
        "and &#55357;&#xDE00; lone &#xD800; dec &#55296;",
        "&#x41;&#65;&#x26;&#38;&#x10FFFF;&#1114111;&#x110000;&#1114112;",
        "&amp &lt &gt &quot &unknown; &GAMMA; &Gamma &;",
        "&fnof;&hellip;&trade;&euro;&permil;&thetasym;&upsih;&piv;",
        "<?xml version=\"1.0\" encoding=\"utf-8\"?>pi<?php echo '>' ?>end",
        "<? incomplete",
        "<reserved attr=\"x\">kept</reserved><escaped>also</escaped>"
        "<other>gone</other>",
        "<BR><SCRIPT>s</SCRIPT><STYLE>c</STYLE>",
        "< div><  span>< p attr='v'>",
        "</ div></  span></p >",
        "<div\nclass='a'\n>nl</div\n>",
        "<b<b>bold</b>",
        "<<double",
        "<>empty<>",
        "&",
        "&#",
        "&#x",
        "<",
        "<!",
        "<!-",
        "<!--",
        "<!-- unterminated comment",
        "<script>unterminated script",
        "<style>unterminated style",
        "<a",
        "<a ",
        "</a",
        "</",
        "tag at eof <div",
        "entity at eof &amp",
        "numeric at eof &#65",
        "hex at eof &#x41",
    ]

    tags = ["div", "span", "p", "a", "b", "i", "em", "strong", "table",
            "tr", "td", "ul", "li", "h1", "h2", "img", "input", "font",
            "center", "blockquote", "reserved", "escaped", "br", "hr",
            "script", "style", "sub", "sup", "tt", "u", "var", "q"]
    ents = ["&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&Gamma;",
            "&eacute;", "&#65;", "&#x41;", "&#8217;", "&#xD83D;&#xDE00;",
            "&bogus;", "&amp", "&#", "&", "&#x2603;"]
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "web", "scale",
             "data", "x<y", "a>b", "q&r", "naïve", "日本語", "café"]
    attrs = ["class=\"c1\"", "id='i1'", "href=\"http://example.com/?a=b&c=d\"",
             "style=\"x:1\"", "onclick=\"f('<x>')\"", "onmouseover='g(\">\")'",
             "data-x=5", "checked", "title=\"q\\\"uote\"", "src=im.png"]

    def rand_text(k):
        return " ".join(rng.choice(words + ents) for _ in range(k))

    for _ in range(5500):
        parts = []
        for _ in range(rng.randrange(1, 10)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.35:
                a = " ".join(rng.sample(attrs, rng.randrange(0, 3)))
                slash = "/" if rng.random() < 0.15 else ""
                parts.append("<%s %s%s>%s</%s>" % (
                    t, a, slash, rand_text(rng.randrange(0, 5)), t))
            elif r < 0.45:
                parts.append("<!-- %s -->" % rand_text(rng.randrange(0, 4)))
            elif r < 0.5:
                parts.append("<script>%s</script>"
                             % rand_text(rng.randrange(0, 4)))
            elif r < 0.55:
                parts.append("<![CDATA[%s]]>"
                             % rand_text(rng.randrange(0, 4)))
            elif r < 0.62:
                # malformed noise
                noise = "".join(rng.choice("<>&#;!/-=\"' abzx0129")
                                for _ in range(rng.randrange(1, 25)))
                parts.append(noise)
            else:
                parts.append(rand_text(rng.randrange(1, 8)))
        docs.append(" ".join(parts))
    return docs


def main():
    from lucene_solr_spark.analysis.charfilter import (
        CHARFILTER_CASES, html_strip,
    )

    build_oracle()
    docs = gen_corpus()

    lines = []
    jobs = []
    for name, spec in CONFIGS.items():
        esc = None if not spec else spec.split(",")
        for d in docs:
            jobs.append((name, esc, d))
            lines.append(spec + "|"
                         + b64encode(d.encode()).decode())
    proc = subprocess.run(
        ["java", "-cp", WORK, "StripDump"],
        input="\n".join(lines).encode(), capture_output=True, check=True)
    oracle_lines = proc.stdout.decode().splitlines()
    assert len(oracle_lines) == len(jobs), (len(oracle_lines), len(jobs))

    bad = 0
    rows = []
    for k, ((name, esc, d), ol) in enumerate(zip(jobs, oracle_lines)):
        want = b64decode(ol).decode("utf-8", errors="replace")
        got = html_strip(d, esc)
        if got != want:
            bad += 1
            if bad <= 8:
                i = next((x for x in range(min(len(got), len(want)))
                          if got[x] != want[x]), min(len(got), len(want)))
                print("MISMATCH %s doc=%r..." % (name, d[:90]))
                print("  py =%r" % got[max(0, i - 30):i + 30])
                print("  jvm=%r" % want[max(0, i - 30):i + 30])
        elif k % STRIDE == 0 and len(d) < 4000:
            rows.append((name, d, want))
    print("verified %d (doc, config) pairs vs JVM oracle, %d mismatches"
          % (len(jobs), bad))
    if bad:
        sys.exit(1)

    # mapping cases: pinned by JUnit vectors in tests/test_charfilter.py
    rng = random.Random(42)
    map_inputs = ["h", "j", "k", "ll", "aa", "bbb", "cccc", "empty",
                  "\U0001D122", "！", "x", "llll", "kjhaabbbccccempty"]
    pool = "abcdefghijkl！empty\U0001D122 "
    for _ in range(400):
        map_inputs.append("".join(rng.choice(pool)
                                  for _ in range(rng.randrange(1, 14))))
    for s in sorted(set(map_inputs)):
        rows.append(("mapping", s, CHARFILTER_CASES["mapping"](s)))

    df = pd.DataFrame(rows, columns=["case", "input_s", "output_s"])
    df = df.drop_duplicates(["case", "input_s"])
    out_pq = os.path.join(FIX_DIR, "charfilter_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d charfilter vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    main()
