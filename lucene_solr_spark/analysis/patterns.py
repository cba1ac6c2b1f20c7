"""Pattern tokenizer/filters — the reference ``analysis/pattern``
package re-expressed for Spark token pipelines (PatternReplaceFilter
already lives in analysis/filters.py).

* ``pattern_tokenize`` — PatternTokenizer
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/
  PatternTokenizer.java:86 ``incrementToken``): ``group >= 0`` emits
  that capture group of every match (zero-length groups skipped);
  ``group == -1`` is String.split semantics (non-empty slices between
  matches, plus the tail).
* ``pattern_capture_groups`` — PatternCaptureGroupTokenFilter
  (pattern/PatternCaptureGroupTokenFilter.java:104 ``nextCapture``):
  for each token, emit the capture groups of one or more patterns
  ordered by group start offset (posInc 0 in the reference),
  restarting each exhausted matcher, skipping zero-length groups and
  (with ``preserve_original``) any group equal to the whole token;
  without ``preserve_original`` the first capture REPLACES the token
  when one exists.
* ``pattern_replace_text`` — PatternReplaceCharFilter
  (pattern/PatternReplaceCharFilter.java:91 ``processPattern``):
  whole-input regex replace ahead of tokenization.

Patterns are Python ``re`` (the reference uses java.util.regex — the
subset exercised by the reference tests is syntax-identical; declared
divergence for exotic Java-only constructs like possessive
quantifiers). JUnit vectors replayed in tests/test_patterns.py.
"""

from __future__ import annotations

import re
from typing import List, Optional, Pattern, Sequence, Union

__all__ = ["pattern_tokenize", "pattern_capture_groups",
           "pattern_replace_text"]


def _compile(p: Union[str, Pattern]) -> Pattern:
    return p if hasattr(p, "finditer") else re.compile(p)


def pattern_tokenize(text: str, pattern: Union[str, Pattern],
                     group: int = -1) -> List[str]:
    """PatternTokenizer: group>=0 extracts that group per match;
    group=-1 splits on matches (String.split semantics)."""
    rx = _compile(pattern)
    if group >= 0:
        if group > rx.groups:
            raise ValueError(
                "invalid group specified: pattern only has: %d capturing "
                "groups" % rx.groups)
        out = []
        for m in rx.finditer(text):
            s, e = m.start(group), m.end(group)
            if s != e:
                out.append(text[s:e])
        return out
    out = []
    index = 0
    for m in rx.finditer(text):
        if m.start() - index > 0:
            out.append(text[index:m.start()])
        index = m.end()
    if len(text) - index > 0:
        out.append(text[index:])
    return out


def pattern_capture_groups(tokens: Sequence[str],
                           patterns: Sequence[Union[str, Pattern]],
                           preserve_original: bool = True) -> List[str]:
    """PatternCaptureGroupTokenFilter over a token list: per token,
    captures of all patterns merged in start-offset order."""
    rxs = [_compile(p) for p in patterns]
    out: List[str] = []
    for tok in tokens:
        # per-pattern lazy match iterators mirroring Matcher.find()
        iters = [rx.finditer(tok) for rx in rxs]
        current = [None] * len(rxs)   # current match per pattern
        group_no = [0] * len(rxs)     # next group to emit (1-based)

        def advance(i: int) -> None:
            current[i] = next(iters[i], None)
            group_no[i] = 1 if current[i] is not None else 0

        def next_capture():
            """(pattern_idx, start, end) of the minimal-start pending
            group, advancing exhausted matchers — the nextCapture
            loop including its i-- retry."""
            best = None
            i = 0
            while i < len(rxs):
                if group_no[i] == 0 and current[i] is None:
                    advance(i)
                if current[i] is not None:
                    g = group_no[i]
                    n_groups = rxs[i].groups
                    while g <= n_groups:
                        s, e = current[i].start(g), current[i].end(g)
                        if s == e or (preserve_original and s == 0
                                      and e == len(tok)):
                            g += 1
                            continue
                        break
                    group_no[i] = g
                    if g > n_groups:
                        advance(i)
                        if current[i] is None:
                            group_no[i] = 0
                        continue  # retry same i (the reference's i--)
                    s = current[i].start(g)
                    if best is None or s < best[1]:
                        best = (i, s, current[i].end(g))
                i += 1
            return best

        if preserve_original:
            out.append(tok)
            while True:
                cap = next_capture()
                if cap is None:
                    break
                i, s, e = cap
                out.append(tok[s:e])
                group_no[i] += 1
        else:
            cap = next_capture()
            if cap is None:
                out.append(tok)
                continue
            i, s, e = cap
            out.append(tok[s:e])
            group_no[i] += 1
            while True:
                cap = next_capture()
                if cap is None:
                    break
                i, s, e = cap
                out.append(tok[s:e])
                group_no[i] += 1
    return out


def pattern_replace_text(text: str, pattern: Union[str, Pattern],
                         replacement: str) -> str:
    """PatternReplaceCharFilter: whole-input regex replacement (the
    reference buffers the entire reader, then Matcher.appendReplacement
    per match — i.e. re.sub)."""
    return _compile(pattern).sub(replacement, text)
