"""Pattern tokenizer/filters — reference JUnit vectors replayed
(lucene/analysis/common/src/test/org/apache/lucene/analysis/pattern/
Test{PatternTokenizer,PatternCaptureGroupTokenFilter,
PatternReplaceCharFilter}.java)."""

import pytest

from lucene_solr_spark.analysis.patterns import (
    pattern_capture_groups,
    pattern_replace_text,
    pattern_tokenize,
)


@pytest.mark.parametrize("group,pattern,inp,out", [
    # TestPatternTokenizer.testSplitting
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    # qpattern: get stuff between "'"
    (0, r"\'([^\']+)\'", "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, r"\'([^\']+)\'", "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
])
def test_pattern_tokenize(group, pattern, inp, out):
    assert pattern_tokenize(inp, pattern, group) == out


def test_pattern_tokenize_invalid_group():
    with pytest.raises(ValueError):
        pattern_tokenize("x", "(a)", 2)


def _cap(tok, regexes, preserve):
    return pattern_capture_groups([tok], regexes, preserve)


@pytest.mark.parametrize("tok,regexes,preserve,out", [
    ("foobarbaz", [], False, ["foobarbaz"]),            # testNoPattern
    ("foobarbaz", [], True, ["foobarbaz"]),
    ("foobarbaz", ["xx"], False, ["foobarbaz"]),        # testNoMatch
    ("foobarbaz", ["xx"], True, ["foobarbaz"]),
    ("foobarbaz", [".."], False, ["foobarbaz"]),        # testNoCapture
    ("foobarbaz", [".."], True, ["foobarbaz"]),
    ("foobarbaz", [".(y*)"], False, ["foobarbaz"]),     # testEmptyCapture
    ("foobarbaz", [".(y*)"], True, ["foobarbaz"]),
    ("foobarbaz", ["(.+)"], False, ["foobarbaz"]),      # testCaptureAll
    ("foobarbaz", ["(.+)"], True, ["foobarbaz"]),
    ("foobarbaz", ["^(.)"], False, ["f"]),              # testCaptureStart
    ("foobarbaz", ["^(.)"], True, ["foobarbaz", "f"]),
    ("foobarbaz", ["^.(.)."], False, ["o"]),            # testCaptureMiddle
    ("foobarbaz", ["^.(.)."], True, ["foobarbaz", "o"]),
    ("foobarbaz", ["(.)$"], False, ["z"]),              # testCaptureEnd
    ("foobarbaz", ["(.)$"], True, ["foobarbaz", "z"]),
    # testMultiCaptureOverlap
    ("foobarbaz", ["(.(.(.)))"], False,
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]),
    ("foobarbaz", ["(.(.(.)))"], True,
     ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az",
      "z"]),
    # testMultiPattern
    ("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], False,
     ["aaa", "bbb", "aaa"]),
    ("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], True,
     ["aaabbbaaa", "aaa", "bbb", "aaa"]),
    # testCamelCase
    ("letsPartyLIKEits1999_dude",
     ["([A-Z]{2,})", "(?<![A-Z])([A-Z][a-z]+)",
      r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", "([0-9]+)"],
     False, ["lets", "Party", "LIKE", "its", "1999", "dude"]),
])
def test_pattern_capture_groups(tok, regexes, preserve, out):
    assert _cap(tok, regexes, preserve) == out


def test_capture_groups_token_stream():
    assert pattern_capture_groups(
        ["foobarbaz", "xyz"], ["^(.)"], True) == [
        "foobarbaz", "f", "xyz", "x"]


def test_pattern_replace_text():
    # TestPatternReplaceCharFilter semantics: whole-input regex sub
    assert pattern_replace_text("this is test.", "(aa)\\s+(bb)\\s+(cc)",
                                "$1$2$3".replace("$", "\\")) \
        == "this is test."
    assert pattern_replace_text("aa bb cc", r"(aa)\s+(bb)\s+(cc)",
                                r"\1#\2#\3") == "aa#bb#cc"
    assert pattern_replace_text("aa   bb   cc dd", r"(aa)\s+(bb)\s+(cc)",
                                r"\1#\2") == "aa#bb dd"
    # 1block1 test: empty replacement
    assert pattern_replace_text("aa bb cc", "(aa)", "") == " bb cc"
