"""Porter stemmer: the 1980 paper's own worked examples as goldens.

Inputs are the worked examples from the algorithm definition ("An
algorithm for suffix stripping", M.F. Porter, 1980); expected values
are the FULL-algorithm stems (the paper shows some pairs per step —
later steps keep stripping, e.g. agreed -> agree -> agre), matching the
reference's PorterStemmer.java end-to-end behavior.
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.porter import porter_stem, porter_stem_filter

PAPER_EXAMPLES = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # departures (official implementation / PorterStemmer.java):
    # bli->ble replaces abli->able; logi->log added
    ("possibli", "possibl"),
    ("archaeology", "archaeolog"),
    # step 5
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PAPER_EXAMPLES)
def test_paper_examples(word, stem):
    assert porter_stem(word) == stem


def test_short_words_untouched():
    for w in ["a", "is", "by", ""]:
        assert porter_stem(w) == w


def test_filter_stage(spark):
    df = spark.createDataFrame(
        [(0, ["motoring", "caresses", "sky"]), (1, None)],
        "doc_id long, tokens array<string>",
    )
    out = {
        r.doc_id: r.stemmed
        for r in df.select(
            "doc_id", porter_stem_filter(F.col("tokens")).alias("stemmed")
        ).collect()
    }
    assert out[0] == ["motor", "caress", "sky"]
    assert out[1] is None
