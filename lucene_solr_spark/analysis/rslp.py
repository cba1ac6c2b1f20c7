"""RSLP rule-table stemming: Portuguese (full + minimal) and Galician.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
pt/RSLPStemmerBase.java — a Step is an ordered rule list guarded by a
min word length and optional entry-condition suffixes; a Rule strips a
suffix when the remaining stem is at least ``min`` chars, optionally
appending a replacement, unless the word hits an exception (whole-word
or ends-with per the step's flag); the FIRST matching rule fires and
the step ends (Step.apply, RSLPStemmerBase.java:214-236).

Step flows pinned from the per-language stemmers:
- ``portuguese_rslp_stem``  PortugueseStemmer.java:47-101 —
  plural → adverb → feminine → augmentative → noun; verb only if noun
  was a no-op; vowel only if verb was also a no-op; then the RSLP
  accent fold.
- ``portuguese_rslp_minimal_stem``  PortugueseMinimalStemmer.java:36 —
  the Plural step alone (RSLP-S).
- ``galician_rslp_stem``  GalicianStemmer.java:49-82 — plural →
  unification → adverb → augmentative-to-fixpoint → noun (verb only if
  noun no-op) → vowel → RSLG accent fold.
- ``galician_rslp_minimal_stem``  GalicianMinimalStemmer.java:35 —
  Plural only.

The rule TABLES are the published Orengo et al. data, frozen by
scripts/make_rslp_fixture.py into fixtures_data/rslp_rules.json; this
module implements only the engine. Like every analysis stage, the
stemmers are plain str→str functions run Arrow-batched via
analysis/lightstem.py's ``light_stem_filter`` machinery — shuffle-free
at any scale.
"""

from __future__ import annotations

import json
import os

__all__ = [
    "RSLP_STEPS", "apply_step",
    "portuguese_rslp_stem", "portuguese_rslp_minimal_stem",
    "galician_rslp_stem", "galician_rslp_minimal_stem",
]

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "rslp_rules.json",
)

with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    RSLP_STEPS: dict = json.load(_f)

# Step.min == 0 → auto-compute from the rules (RSLPStemmerBase.java:193)
for _steps in RSLP_STEPS.values():
    for _s in _steps.values():
        if _s["min"] == 0:
            _s["min"] = min(
                r[1] + len(r[0]) for r in _s["rules"]
            )


def apply_step(word: str, step: dict) -> str:
    """Step.apply: guard min length + entry suffixes, fire the first
    matching rule (suffix present, stem ≥ rule-min, not an
    exception)."""
    n = len(word)
    if n < step["min"]:
        return word
    conds = step["conds"]
    if conds and not any(word.endswith(c) for c in conds):
        return word
    whole = step["whole_word_exceptions"]
    for suffix, min_stem, repl, exceptions in step["rules"]:
        if n - len(suffix) >= min_stem and word.endswith(suffix):
            if exceptions:
                if whole:
                    if word in exceptions:
                        continue
                elif any(word.endswith(e) for e in exceptions):
                    continue
            return word[: n - len(suffix)] + repl
    return word


_PT_FOLD = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ", "aaaaaaceeeeiiiinooooouuuuyy"
)
_GL_FOLD = str.maketrans("áéêíóú", "aeeiou")


def portuguese_rslp_stem(word: str) -> str:
    """Full RSLP (PortugueseStemmer.java:47-101)."""
    steps = RSLP_STEPS["pt"]
    s = apply_step(word, steps["Plural"])
    s = apply_step(s, steps["Adverb"])
    s = apply_step(s, steps["Feminine"])
    s = apply_step(s, steps["Augmentative"])
    t = apply_step(s, steps["Noun"])
    if t == s:  # noun suffix not removed
        u = apply_step(t, steps["Verb"])
        t = u if u != t else apply_step(u, steps["Vowel"])
    return t.translate(_PT_FOLD)


def portuguese_rslp_minimal_stem(word: str) -> str:
    """RSLP-S plural-only (PortugueseMinimalStemmer.java:36)."""
    return apply_step(word, RSLP_STEPS["pt"]["Plural"])


def galician_rslp_stem(word: str) -> str:
    """RSLG (GalicianStemmer.java:49-82)."""
    steps = RSLP_STEPS["gl"]
    s = apply_step(word, steps["Plural"])
    s = apply_step(s, steps["Unification"])
    s = apply_step(s, steps["Adverb"])
    while True:
        t = apply_step(s, steps["Augmentative"])
        if t == s:
            break
        s = t
    t = apply_step(s, steps["Noun"])
    if t == s:  # noun suffix not removed
        t = apply_step(t, steps["Verb"])
    t = apply_step(t, steps["Vowel"])
    return t.translate(_GL_FOLD)


def galician_rslp_minimal_stem(word: str) -> str:
    """Plural-only (GalicianMinimalStemmer.java:35)."""
    return apply_step(word, RSLP_STEPS["gl"]["Plural"])
