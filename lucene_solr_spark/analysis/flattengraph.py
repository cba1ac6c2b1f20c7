"""FlattenGraphFilter — linearize a token graph for indexing.

Re-implements the reference's graph flattener
(core/FlattenGraphFilter.java:155-345) exactly: input positions are
buffered into InputNode/OutputNode frontiers, output nodes are
numbered sequentially as arcs merge (an arc's destination output node
only ever grows, its previous assignment is dissolved), tokens are
released once every arc leaving their output frontier is frozen
(maxToNode <= inputFrom), posInc/posLen are recomputed against output
node numbering, offsets are "shrink-wrapped" so original tokens win
and never go backwards, and holes (positions no token leaves) force a
fresh output node.

Operates on the GraphToken tuples produced by
analysis/worddelim.WordDelimiterGraph (or any graph source); verified
word-for-word against the COMPILED reference filter chained
WhitespaceTokenizer -> WordDelimiterGraphFilter -> FlattenGraphFilter
(scripts/make_wdgf_fixture.py flat_* modes).
"""

from __future__ import annotations

from typing import Dict, List

from .worddelim import GraphToken


class _InputNode:
    __slots__ = ("tokens", "node", "max_to_node", "output_node",
                 "next_out")

    def __init__(self):
        self.tokens: List[GraphToken] = []
        self.node = -1
        self.max_to_node = -1
        self.output_node = -1
        self.next_out = 0


class _OutputNode:
    __slots__ = ("input_nodes", "node", "next_out", "start_offset",
                 "end_offset")

    def __init__(self):
        self.input_nodes: List[int] = []
        self.node = -1
        self.next_out = 0
        self.start_offset = -1
        self.end_offset = -1


class _Buf:
    """RollingBuffer analog: get(pos) auto-creates; max_pos tracks the
    highest position requested so far."""

    def __init__(self, factory):
        self.factory = factory
        self.nodes: Dict[int, object] = {}
        self.max_pos = -1

    def get(self, pos: int):
        if pos not in self.nodes:
            self.nodes[pos] = self.factory()
        self.max_pos = max(self.max_pos, pos)
        return self.nodes[pos]


def flatten_graph(tokens: List[GraphToken]) -> List[GraphToken]:
    inp = _Buf(_InputNode)
    outp = _Buf(_OutputNode)

    # reset() state
    n0 = inp.get(0)
    n0.node = 0
    n0.output_node = 0
    o0 = outp.get(0)
    o0.node = 0
    o0.input_nodes.append(0)
    o0.start_offset = 0

    input_from = -1
    output_from = 0
    last_output_from = -1
    last_start_offset = 0
    done = False
    out: List[GraphToken] = []
    it = iter(tokens)

    def release() -> bool:
        nonlocal output_from, last_output_from, last_start_offset
        while output_from < outp.max_pos:
            output = outp.get(output_from)
            if not output.input_nodes:
                output_from += 1
                continue
            max_to = -1
            for node_id in output.input_nodes:
                max_to = max(max_to, inp.get(node_id).max_to_node)
            if max_to <= input_from or done:
                input_node = inp.get(
                    output.input_nodes[output.next_out])
                if (done and not input_node.tokens
                        and output_from >= outp.max_pos):
                    return False
                if not input_node.tokens:
                    # hole destination: always its own output node
                    output_from += 1
                    continue
                tok = input_node.tokens[input_node.next_out]
                pos_inc = output_from - last_output_from
                to_input = inp.get(input_node.node + tok.pos_len)
                pos_len = to_input.output_node - output_from
                last_output_from = output_from
                input_node.next_out += 1

                output_end = outp.get(to_input.output_node)
                so = max(last_start_offset, output.start_offset)
                eo = max(so, output_end.end_offset)
                last_start_offset = so
                out.append(GraphToken(tok.term, pos_inc, pos_len,
                                      so, eo))

                if input_node.next_out == len(input_node.tokens):
                    output.next_out += 1
                    if output.next_out == len(output.input_nodes):
                        output_from += 1
                return True
            return False
        return False

    while True:
        if release():
            continue
        if done:
            break
        tok = next(it, None)
        if tok is None:
            done = True
            continue
        input_from += tok.pos_inc
        input_to = input_from + tok.pos_len
        src = inp.get(input_from)
        if src.node == -1:
            # just crossed a hole: force a fresh output node
            src.node = input_from
            src.output_node = outp.max_pos + 1
            out_src = outp.get(src.output_node)
            out_src.node = src.output_node
            out_src.input_nodes.append(input_from)
            out_src.start_offset = tok.start
        else:
            out_src = outp.get(src.output_node)
            if (out_src.start_offset == -1
                    or tok.start > out_src.start_offset):
                out_src.start_offset = max(tok.start,
                                           out_src.start_offset)
        src.tokens.append(tok)
        src.max_to_node = max(src.max_to_node, input_to)

        dest = inp.get(input_to)
        if dest.node == -1:
            dest.node = input_to
        output_end_node = src.output_node + 1
        if output_end_node > dest.output_node:
            if dest.output_node != -1:
                outp.get(dest.output_node).input_nodes.remove(input_to)
            outp.get(output_end_node).input_nodes.append(input_to)
            dest.output_node = output_end_node
        out_dest = outp.get(dest.output_node)
        if out_dest.end_offset == -1 or tok.end < out_dest.end_offset:
            out_dest.end_offset = tok.end
    return out
