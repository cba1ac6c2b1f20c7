"""Generate the phonetic-encoder golden fixture parquet.

The reference's PhoneticFilterFactory registry exposes seven
commons-codec encoders (lucene/analysis/phonetic/src/java/.../
PhoneticFilterFactory.java registry: Metaphone, DoubleMetaphone,
Soundex, RefinedSoundex, Caverphone [2.0], ColognePhonetic, Nysiis)
plus the dedicated DaitchMokotoffSoundexFilter.  commons-codec itself
ships inside PySpark's JVM (jars/commons-codec-1.19.0.jar), so this
script uses the REAL library — the same one the reference wraps — as
the behavior oracle:

  1. encode the full KStem head-word vocabulary (27.8k English words,
     fixtures_data/kstem_tables.json.gz) plus the reference JUnit test
     tokens with each JVM encoder;
  2. verify the repo's pure-Python implementations
     (lucene_solr_spark/analysis/encoders.py) against ALL of them,
     aborting on any mismatch;
  3. freeze an every-Nth sample as
     fixtures_data/phonetic_codes.parquet (encoder, term, code) — the
     driver gate encodes the sampled terms LIVE in the Arrow UDF while
     the DuckDB oracle reads the frozen JVM codes (the light-stems
     pattern; fully non-circular).

Usage:
  python scripts/make_phonetic_fixture.py          # verify + write fixture
  python scripts/make_phonetic_fixture.py --dump   # only write the full
                                                   # JVM dump to /tmp
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "phonetic_codes.parquet")
DUMP = "/tmp/phonetic_jvm.parquet"
STRIDE = 60

# tokens pinned by the reference's own tests (TestPhoneticFilter.java:41-70,
# TestPhoneticFilterFactory.java:128-164, DoubleMetaphoneFilterTest.java,
# TestDaitchMokotoffSoundexFilter.java:35-40)
EXTRA = [
    "aaa", "bbb", "ccc", "easgasg", "international", "Kuczewski", "hello",
    "Darda", "Karleen", "Datha", "Carlene", "Meier", "Schmitt", "Meir",
    "Schmidt", "Macintosh", "Knuth", "Bart", "Hurd",
    # branch probes the English head-word list never exercises
    # (Slavo-Germanic, Polish -owicz/-witz, Dutch sch-, Spanish j/ll,
    # French silent endings, Greek/Germanic ch, pinyin zh, ...)
    "Wasserman", "Vasserman", "Uomo", "Womo", "Arnow", "Arnoff",
    "filipowicz", "Filipowitz", "Jankelowicz", "Yankelovich", "Zhao",
    "jose", "san jacinto", "bajador", "cabrillo", "gallegos", "trabajo",
    "caesar", "chianti", "michael", "chemistry", "chorus", "chore",
    "architect", "arch", "orchestra", "orchid", "wachtler", "wechsler",
    "tichner", "McHugh", "McClellan", "czerny", "focaccia", "bellocchio",
    "bacchus", "accident", "accede", "succeed", "bacci", "bertucci",
    "mac caffrey", "mac gregor", "cagney", "edge", "edgar", "ghislane",
    "ghent", "hugh", "bough", "broughton", "laugh", "McLaughlin",
    "cough", "gough", "rough", "tough", "island", "isle", "carlisle",
    "carlysle", "smith", "snider", "schneider", "school", "schooner",
    "schermerhorn", "schenker", "schlesinger", "scherer", "resnais",
    "artois", "thomas", "thames", "dumb", "thumb", "campbell",
    "raspberry", "lincoln", "tagliaro", "biaggi", "Jablonski", "bheda",
    "ohrmund", "ghiradelli", "vanschuyver", "sugar", "sholz", "shoek",
    "Xavier", "breaux", "zdzislaw", "jankiel", "rogier", "monaghan",
    "danger", "ranger", "manger", "angier", "agnize", "cognac", "gnome",
    "signed", "design", "padilla", "villa", "sevilla", "allegro",
    "Pshaw", "Tsjaikovski", "Czerniak", "witzel", "kawitz", "knizhnik",
    "wojcik", "szczepanik", "strzelczyk", "drzewiecki", "andrzej",
    "jojoba", "hajj", "svoboda", "dvorak", "przybylski", "krzysztof",
]


def vocabulary() -> list[str]:
    with gzip.open(os.path.join(
            HERE, "lucene_solr_spark", "fixtures_data",
            "kstem_tables.json.gz"), "rt", encoding="utf-8") as f:
        words = json.load(f)["head_words"]
    return words + EXTRA


def jvm_dump() -> pd.DataFrame:
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    lang = spark._jvm.org.apache.commons.codec.language
    encoders = {
        "metaphone": lang.Metaphone().encode,
        "refined_soundex": lang.RefinedSoundex().encode,
        "caverphone2": lang.Caverphone2().encode,
        "cologne": lang.ColognePhonetic().encode,
        "nysiis": lang.Nysiis().encode,
        # full branch set, |-joined (DaitchMokotoffSoundexFilter uses
        # .soundex() and emits one token per branch)
        "daitch_mokotoff": lang.DaitchMokotoffSoundex().soundex,
    }
    dm = lang.DoubleMetaphone()
    rows = []
    words = vocabulary()
    for name, fn in encoders.items():
        for w in words:
            rows.append((name, w, fn(w)))
        print(f"{name}: {len(words)} encoded")
    for w in words:
        rows.append(("dmeta", w, dm.doubleMetaphone(w, False)))
        rows.append(("dmeta_alt", w, dm.doubleMetaphone(w, True)))
    print(f"dmeta(+alt): {len(words)} encoded")
    df = pd.DataFrame(rows, columns=["encoder", "term", "code"])
    df["code"] = df["code"].fillna("")
    return df


def main() -> None:
    if os.path.exists(DUMP):
        df = pd.read_parquet(DUMP)
        print(f"loaded cached JVM dump: {len(df)} rows")
    else:
        df = jvm_dump()
        df.to_parquet(DUMP, index=False)
        print(f"wrote JVM dump: {len(df)} rows -> {DUMP}")
    if "--dump" in sys.argv:
        return

    from lucene_solr_spark.analysis import encoders as py

    fns = {
        "metaphone": py.metaphone,
        "dmeta": py.double_metaphone,
        "dmeta_alt": py.double_metaphone_alternate,
        "refined_soundex": py.refined_soundex,
        "caverphone2": py.caverphone2,
        "cologne": py.cologne_phonetic,
        "nysiis": py.nysiis,
        "daitch_mokotoff": lambda w: "|".join(py.daitch_mokotoff(w)),
    }
    for name, fn in fns.items():
        sub = df[df.encoder == name]
        bad = [(t, want, fn(t)) for t, want in zip(sub.term, sub.code)
               if fn(t) != want]
        assert not bad, (f"{name}: {len(bad)}/{len(sub)} mismatches, "
                         f"e.g. {bad[:5]}")
        print(f"{name}: verified {len(sub)} words")

    sample = (df.groupby("encoder", group_keys=False)
                .apply(lambda g: g.iloc[::STRIDE], include_groups=True)
                .reset_index(drop=True))
    sample.to_parquet(OUT, index=False)
    print(f"wrote {len(sample)} sampled rows -> {OUT}")


if __name__ == "__main__":
    main()
