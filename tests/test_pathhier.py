"""Path-hierarchy tokenizers — every reference JUnit vector replayed
(lucene/analysis/common/src/test/org/apache/lucene/analysis/path/
Test{,Reverse}PathHierarchyTokenizer.java)."""

import pytest

from lucene_solr_spark.analysis.pathhier import (
    path_hierarchy_tokens,
    reverse_path_hierarchy_tokens,
)


@pytest.mark.parametrize("path,kwargs,expected", [
    ("/a/b/c", {}, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", {}, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", {}, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", {}, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", {}, ["/"]),
    ("//", {}, ["/", "//"]),
    ("/a/b/c", {"replacement": "\\"}, ["\\a", "\\a\\b", "\\a\\b\\c"]),
    ("c:\\a\\b\\c", {"delimiter": "\\"},
     ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    ("/a/b/c", {"skip": 1}, ["/b", "/b/c"]),
    ("/a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", {"skip": 1}, ["/b", "/b/c"]),
    ("a/b/c/", {"skip": 1}, ["/b", "/b/c", "/b/c/"]),
    ("/", {"skip": 1}, []),
    ("//", {"skip": 1}, ["/"]),
    ("", {}, []),
])
def test_path_hierarchy(path, kwargs, expected):
    assert path_hierarchy_tokens(path, **kwargs) == expected


@pytest.mark.parametrize("path,kwargs,expected", [
    ("/a/b/c", {}, ["/a/b/c", "a/b/c", "b/c", "c"]),
    ("/a/b/c/", {}, ["/a/b/c/", "a/b/c/", "b/c/", "c/"]),
    ("a/b/c", {}, ["a/b/c", "b/c", "c"]),
    ("a/b/c/", {}, ["a/b/c/", "b/c/", "c/"]),
    ("/", {}, ["/"]),
    ("//", {}, ["//", "/"]),
    ("/a/b/c/", {"skip": 1}, ["/a/b/", "a/b/", "b/"]),
    ("a/b/c", {"skip": 1}, ["a/b/", "b/"]),
    ("a/b/c/", {"skip": 1}, ["a/b/", "b/"]),
    ("/", {"skip": 1}, []),
    ("//", {"skip": 1}, ["/"]),
    ("/a/b/c/", {"skip": 2}, ["/a/", "a/"]),
    ("uri:food:fruit:apple", {"delimiter": ":"},
     ["uri:food:fruit:apple", "food:fruit:apple", "fruit:apple",
      "apple"]),
])
def test_reverse_path_hierarchy(path, kwargs, expected):
    assert reverse_path_hierarchy_tokens(path, **kwargs) == expected


def test_negative_skip_raises():
    with pytest.raises(ValueError):
        path_hierarchy_tokens("/a", skip=-1)
    with pytest.raises(ValueError):
        reverse_path_hierarchy_tokens("/a", skip=-1)
