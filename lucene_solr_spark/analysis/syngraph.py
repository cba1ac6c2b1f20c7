"""SynonymGraphFilter — multi-word synonym graphs with posLength.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymGraphFilter.java — the scanner greedily matches the
LONGEST registered input phrase at each token (parse(), with fallback
to shorter matches per the FST retry), then buffers a graph fragment
(bufferOutputTokens:…): each output phrase becomes a side path from
the match's start node to a shared end node, the original tokens (when
keepOrig) become a final side path, and node ids are allocated exactly
as the reference does —

  totalPathNodes = (keepOrig ? matchInputLength-1 : 0)
                 + Σ (len(outputPath) - 1)
  endNode        = startNode + totalPathNodes + 1
  path fan-out:  single-token path ends at endNode, multi-token path
                 gets fresh intermediate nodes (nextNodeOut+count+1…),
  original path: first token ends at nextNodeOut+newNodeCount+1, tail
                 tokens chain to endNode,

emitted in the reference's buffer order (path first-tokens, original
first token, path tails, original tails) with positionIncrement =
startNode - lastNodeOut and positionLength = endNode - startNode.
Synonym tokens carry the MATCH's [startOffset, endOffset); original
tokens keep their own offsets.  Verified token-for-token against the
reference's TestSynonymGraphFilter vectors (tests/test_syngraph.py).

Spark shape: per-document bounded state → Arrow-batched per-row
application (the analysis-chain pattern); graph-aware phrase matching
is a per-doc adjacency walk, so the whole index+query path stays a
narrow map — no shuffle beyond the usual posting aggregation.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

_TOKEN_RX = re.compile(r"[a-z0-9]+")

# token: (term, start_node, end_node, start_off, end_off, is_synonym)
GraphToken = Tuple[str, int, int, int, int, bool]


def parse_synonym_rules(lines: Sequence[str]):
    """Solr synonyms.txt subset (SolrSynonymParser.java): each line is
    either ``in1 in2 => out1, out2 phrase`` (explicit mapping; keepOrig
    comes from the filter config — we pin the reference JUnit's
    per-rule flag instead via ``in => out ; keeporig=false``) or a
    comma list of equivalent phrases (every member maps to every
    member).  Returns {input_tuple: (keep_orig, [output_tuple, ...])}
    with multi-word phrases as tuples of tokens."""
    rules: Dict[tuple, Tuple[bool, List[tuple]]] = {}

    def toks(p: str) -> tuple:
        return tuple(_TOKEN_RX.findall(p.lower()))

    def add(inp: tuple, out: tuple, keep: bool) -> None:
        if not inp or not out:
            return
        keep0, outs = rules.setdefault(inp, (keep, []))
        if out not in outs:
            outs.append(out)

    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        keep = True
        if ";" in line:
            line, opt = line.split(";", 1)
            if "keeporig=false" in opt.replace(" ", "").lower():
                keep = False
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            for inp in lhs.split(","):
                for out in rhs.split(","):
                    add(toks(inp), toks(out), keep)
        else:
            phrases = [toks(p) for p in line.split(",")]
            for inp in phrases:
                for out in phrases:
                    if inp != out:
                        add(inp, out, keep)
    return rules


def tokenize_offsets(text: str):
    return [
        (m.group(), m.start(), m.end())
        for m in _TOKEN_RX.finditer(text.lower())
    ]


def synonym_graph(tokens, rules) -> List[GraphToken]:
    """Apply the synonym graph to ``tokens`` = [(term, start_off,
    end_off)].  Greedy longest-match scan with shorter-match fallback
    (SynonymGraphFilter.parse), node allocation and emission order per
    bufferOutputTokens — see module docstring."""
    max_len = max((len(k) for k in rules), default=0)
    out: List[GraphToken] = []
    next_node = 0
    i, n = 0, len(tokens)
    while i < n:
        match_len = 0
        matched = None
        for L in range(min(max_len, n - i), 0, -1):
            key = tuple(t[0] for t in tokens[i : i + L])
            if key in rules:
                match_len, matched = L, rules[key]
                break
        if not match_len:
            term, s, e = tokens[i]
            out.append((term, next_node, next_node + 1, s, e, False))
            next_node += 1
            i += 1
            continue
        keep_orig, outputs = matched
        m_start = tokens[i][1]
        m_end = tokens[i + match_len - 1][2]
        total_path_nodes = (match_len - 1) if keep_orig else 0
        total_path_nodes += sum(len(p) - 1 for p in outputs)
        start_node = next_node
        end_node = start_node + total_path_nodes + 1
        # fan-out: first token of each output path
        new_node_count = 0
        path_end: List[int] = []
        for path in outputs:
            if len(path) == 1:
                pe = end_node
            else:
                pe = next_node + new_node_count + 1
                new_node_count += len(path) - 1
            path_end.append(pe)
            out.append((path[0], start_node, pe, m_start, m_end, True))
        orig_first_end = None
        if keep_orig:
            if match_len == 1:
                orig_first_end = end_node
            else:
                orig_first_end = next_node + new_node_count + 1
            term, s, e = tokens[i]
            out.append(
                (term, start_node, orig_first_end, s, e, False)
            )
        next_node = end_node
        # side-path tails for each output
        for pi, path in enumerate(outputs):
            if len(path) > 1:
                last = path_end[pi]
                for k in range(1, len(path) - 1):
                    out.append(
                        (path[k], last, last + 1, m_start, m_end, True)
                    )
                    last += 1
                out.append(
                    (path[-1], last, end_node, m_start, m_end, True)
                )
        # original-token tail path
        if keep_orig and match_len > 1:
            last = orig_first_end
            for k in range(1, match_len - 1):
                term, s, e = tokens[i + k]
                out.append((term, last, last + 1, s, e, False))
                last += 1
            term, s, e = tokens[i + match_len - 1]
            out.append((term, last, end_node, s, e, False))
        i += match_len
    return out


def graph_to_increments(graph: List[GraphToken]):
    """(term, posInc, posLen, start_off, end_off, type) rows — the
    reference token-stream attribute view used by the JUnit vectors."""
    rows = []
    # the stream's virtual start node is -1: the first token arrives
    # with positionIncrement 1 (the reference's lastNodeOut bootstrap)
    last_node_out = -1
    for term, sn, en, s, e, syn in graph:
        rows.append(
            (term, sn - last_node_out, en - sn, s, e,
             "SYNONYM" if syn else "word")
        )
        last_node_out = sn
    return rows


def graph_phrase_match(graph: List[GraphToken], phrase: Sequence[str]) -> bool:
    """Graph-aware exact phrase matching: the phrase matches iff there
    is a node path n0 → n1 → … with token_k spanning (n_{k-1}, n_k) —
    posLength-aware adjacency, the reference's SpanNearQuery-over-graph
    semantics that index-time posLen preserves."""
    adj: Dict[Tuple[int, str], List[int]] = {}
    for term, sn, en, _s, _e, _syn in graph:
        adj.setdefault((sn, term), []).append(en)
    starts = [sn for (sn, t) in adj if t == phrase[0]]
    frontier = set()
    for sn in starts:
        frontier.update(adj[(sn, phrase[0])])
    for term in phrase[1:]:
        nxt = set()
        for node in frontier:
            for en in adj.get((node, term), ()):
                nxt.add(en)
        frontier = nxt
        if not frontier:
            return False
    return True
