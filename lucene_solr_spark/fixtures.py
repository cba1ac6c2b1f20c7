"""Deterministic synthetic transcript corpus + reference query set.

Implements FIXTURES.md: seeded, synthesized at small scale, no external
data. Shape comes from BASELINE.json input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). The Zipf(s=1.07) vocabulary creates the hot-term skew the
salted merge must handle; edge-case rows mirror the reference's test
corpora (CheckIndex invariants, SmallFloat boundaries, tie-breaks —
citations in FIXTURES.md §4).

Pure pandas/numpy — used both to feed Spark (spark.createDataFrame) and
as the oracle corpus for golden top-k computation.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

__all__ = ["make_vocab", "make_transcripts", "make_queries", "SCALES"]

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

SCALES = {"tiny": 24, "small": 2000}

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na",
    "pe", "qui", "ra", "so", "tu", "va", "wi", "xo", "yu", "za",
    "ster", "mont", "rell", "vin", "dor", "lan", "tek", "ran", "bel", "cor",
]


def make_vocab(size: int = VOCAB_SIZE, seed: int = SEED) -> list:
    """Deterministic pronounceable vocabulary, all lowercase alnum tokens."""
    rng = np.random.default_rng(seed)
    vocab, seen = [], set()
    while len(vocab) < size:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def make_transcripts(
    n_convs: int = SCALES["small"], seed: int = SEED, edge_cases: bool = True
) -> pd.DataFrame:
    """Deterministic transcript corpus (FIXTURES.md §1).

    Rows come out already ordered by (conv_id, turn_idx); the canonical
    doc_id is the 0-based row index of that ordering.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(seed=seed))
    probs = _zipf_probs(len(vocab))
    roles = np.array(["user", "assistant", "tool"])
    tools = np.array(["bash", "search", "editor"])

    rows = []
    for i in range(n_convs):
        conv_id = f"conv{i:08d}"
        conv_len = min(1 + rng.poisson(6), 40)
        for t in range(conv_len):
            role = roles[(t + int(rng.integers(0, 3))) % 3]
            if rng.random() < 0.02:
                text = ""
            else:
                n_tok = int(rng.integers(1, 121))
                toks = list(rng.choice(vocab, size=n_tok, p=probs))
                # seeded sprinkles: punctuation, CamelCase, hyphens,
                # digits, unicode — exercises UAX#29 boundaries
                r = rng.random()
                if r < 0.10:
                    toks.append(rng.choice(["4221b", "3.14", "v2", "1024"]))
                elif r < 0.18:
                    toks.append(rng.choice(["café", "日本語", "ναι", "😀"]))
                elif r < 0.26:
                    j = int(rng.integers(0, len(toks)))
                    toks[j] = toks[j].capitalize() + "Case"
                elif r < 0.34:
                    j = int(rng.integers(0, len(toks)))
                    toks[j] = toks[j] + "-" + str(rng.choice(vocab))
                text = " ".join(toks)
                if rng.random() < 0.15:
                    text += rng.choice([".", "!", "?", ","])
            tool = str(rng.choice(tools)) if role == "tool" else None
            rows.append((conv_id, t, str(role), text, tool))

    if edge_cases:
        rows.extend(_edge_case_rows(vocab))

    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.Series(
        [EPOCH + timedelta(seconds=int(i)) for i in range(len(df))],
        dtype="datetime64[us, UTC]",
    )
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def _edge_case_rows(vocab: np.ndarray) -> list:
    """FIXTURES.md §4 edge rows, in dedicated convs above the random range."""
    head = vocab[0]  # Zipf head: df > 128 corpus-wide (multi-block postings)
    rows = []

    def conv(cid, turns):
        for t, (role, text, tool) in enumerate(turns):
            rows.append((cid, t, role, text, tool))

    # empty text turn → norm byte 0, never matches
    conv("edge00000001", [("user", "", None)])
    # exactly 39 tokens (exact length decode) and 40+ (approximate)
    conv("edge00000002", [("user", " ".join([head] * 39), None)])
    conv("edge00000003", [("assistant", " ".join(vocab[2:42]), None)])
    # singleton term: occurs in exactly one doc
    conv("edge00000004", [("user", "zzsingletonterm " + head, None)])
    # one term repeated 30x → impacts frontier gets competing (freq, norm)
    conv("edge00000005", [("assistant", " ".join(["repeatterm"] * 30), None)])
    # duplicate identical turns in two convs → score tie, docID-asc tie-break
    dup = f"{head} duplicated tie breaker text {vocab[5]}"
    conv("edge00000006", [("user", dup, None)])
    conv("edge00000007", [("user", dup, None)])
    # token > 255 chars: skipped by the tokenizer, position preserved
    conv("edge00000008", [("tool", ("x" * 300) + " " + head + " aftertoken", "bash")])
    # all-same-gap posting run feeder (term every turn of one conv)
    conv(
        "edge00000009",
        [("user", f"gapterm {vocab[9]}", None) for _ in range(8)],
    )
    return rows


def make_queries(seed: int = SEED) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): mixes Zipf head / mid /
    singleton / absent terms, conjunctive + disjunctive, k ∈ {1, 10}."""
    vocab = make_vocab(seed=seed)
    specs = [
        ("disjunctive", [vocab[0]]),                      # head term, df>128
        ("disjunctive", [vocab[0], vocab[1], vocab[50]]),  # head mix
        ("disjunctive", [vocab[200], vocab[900], vocab[2500]]),  # mid/tail
        ("disjunctive", [vocab[0], "zzsingletonterm"]),    # head + singleton
        ("disjunctive", ["qqabsentterm"]),                 # absent from corpus
        ("disjunctive", [vocab[3], "qqabsentterm", vocab[7]]),
        ("disjunctive", ["repeatterm"]),                   # high-freq doc
        ("conjunctive", [vocab[0], vocab[1]]),             # head AND head
        ("conjunctive", [vocab[0], vocab[300]]),           # head AND mid (pruning stress)
        ("conjunctive", [vocab[2], vocab[5], vocab[11]]),
        ("conjunctive", [vocab[0], "qqabsentterm"]),       # AND absent → empty
        ("conjunctive", ["gapterm", vocab[9]]),
        ("disjunctive", [vocab[1], vocab[4], vocab[9], vocab[16], vocab[25]]),
        ("conjunctive", [vocab[0]]),                       # single-term AND == term query
    ]
    rows = []
    qi = 1
    for mode, terms in specs:
        for k in (1, 10):
            rows.append((f"q{qi:03d}", mode, terms, k))
            qi += 1
    return pd.DataFrame(rows, columns=["query_id", "mode", "terms", "k"])
