"""FastVectorHighlighter analog: phrase-aware multi-fragment highlighting.

Reference pipeline (lucene/highlighter/src/java/org/apache/lucene/search/
vectorhighlight/):

- ``FieldTermStack``: the doc's term-vector entries for query terms, in
  position order, each carrying (text, position, startOffset, endOffset)
  and an IDF weight ``log(numDocs/(docFreq+1)) + 1``
  (FieldTermStack.java:86-96);
- ``FieldPhraseList``: greedy longest-phrase scan over the stack against
  the query's phrase trie — pop a term, walk the trie as far as
  consecutive stack entries match, emit the candidate if it is a valid
  term/phrase, else push back and retry shorter prefixes
  (FieldPhraseList.java:66-122); consecutive-position term offsets merge
  into a single highlight span (WeightedPhraseInfo ctor);
- ``BaseFragListBuilder.createFieldFragList``: greedy packing of the
  phrase list into fragments of ``fragCharSize`` with ``margin``,
  centering each fragment on its matches (BaseFragListBuilder.java:48-99)
  and discarding multi-term phrases longer than the fragment
  (``acceptPhrase``);
- ``SimpleFieldFragList.add``: fragment score = Σ phrase boosts;
  ``WeightedFieldFragList.add``: per-phrase boost = Σ over first-seen
  distinct terms of termWeight·phraseBoost, normalized by √(#term
  occurrences in the fragment) (WeightedFieldFragList.java:36-66);
- ``BaseFragmentsBuilder.makeFragment``: snippet assembly with
  pre/post tags at each merged offset, tag LISTS cycling by the clause
  seqnum like getPreTag(preTags, seqnum) — the multi-colored mode
  (BaseFragmentsBuilder.java:243-255);
  ``getFragmentSourceMSO`` snaps the emitted source window to the
  nearest ``SimpleBoundaryScanner`` boundary within maxScan=20
  (SimpleBoundaryScanner.java:28-95) while the recorded span offsets
  stay raw; ``ScoreOrderFragmentsBuilder``: fragments ordered score
  desc, then startOffset asc.

Spark shape: the whole pipeline is per-document with bounded state, so it
runs as ONE narrow ``mapInPandas`` over the stored fields — no shuffle,
no join, embarrassingly parallel at any corpus size.  The Arrow batch
function applies the exact reference control flow per row; query spec and
term weights ride the closure (they are query-sized, not data-sized).

Tokens come from the engine's standard ``[a-z0-9]+`` lowercase
analysis with character offsets.  Slop phrases ARE supported: the scan
runs over the query-term-filtered stack exactly like FieldTermStack,
with position-gap validity per QueryPhraseMap.isValidTermOrPhrase.
INDEX-TIME SYNONYM RINGS are supported as of round 5 (the last
declared FVH divergence closed): ``field_phrase_list`` links
same-position stack entries into circular TermInfo rings in
term-lexicographic order and walks each ring from its current head
during the scan, pushing failed rings back with the head at the
last-tried member (FieldTermStack.java:100-126,
FieldPhraseList.java:64-123); ``fvh_synonym_stack`` builds such a
stack from the engine's SynonymGraphFilter (analysis/syngraph.py) with
the flattened-position view an indexed term vector presents.  Pinned
by the transcribed testWithSynonym / testBooleanPhraseWithSynonym
JUnit vectors in tests/test_fvh.py.

MULTI-VALUED fields are supported as of round 5 (the former
single-valued restriction is closed): ``tokenize_offsets_mv`` is the
multi-valued FieldTermStack (offset accumulation with the 1-char
Analyzer.getOffsetGap, position continuation with a configurable
positionIncrementGap), ``make_fragments_mv`` is getFragmentSourceMSO's
lazily-grown value buffer shared across a doc's fragments
(BaseFragmentsBuilder.java:191-205), and ``discrete_split`` is
discreteMultiValueHighlighting's per-value fragment splitting with
boundary-clamped term offsets (BaseFragmentsBuilder.java:218-300) —
all pinned by the JUnit-transcribed vectors in tests/test_fvh.py
(testPhrasesSpanningFieldValues, testMultiValuedSortByScore) and the
driver gate fts_fvh_multivalued.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_TOKEN_RX = re.compile(r"[a-z0-9]+")

OUT_SCHEMA = (
    "doc_id long, frag int, span_start int, span_end int, "
    "score double, snippet string"
)


@dataclass(frozen=True)
class FvhQuery:
    """Flat query spec: single terms and ordered phrases, each with a
    boost and optional slop (FieldQuery's flatten() produces exactly
    this for Term/Phrase/Boolean-of-those queries).  Phrase entries are
    ``(terms, boost)`` or ``(terms, boost, slop)``."""

    singles: dict          # term -> boost
    phrases: tuple         # ((t1, t2, ...), boost[, slop]), ...

    def trie(self):
        """term-path trie: node = {term: [(boost, slop, seqnum) | None,
        children]} — seqnum is the registration order, the reference's
        termOrPhraseNumber used to pick pre/post tags per clause."""
        root = {}
        seq = 0
        for term, boost in self.singles.items():
            node = root.setdefault(term, [None, {}])
            node[0] = (float(boost), 0, seq)
            seq += 1
        for entry in self.phrases:
            terms, boost = entry[0], entry[1]
            slop = entry[2] if len(entry) > 2 else 0
            level = root
            node = None
            for t in terms:
                node = level.setdefault(t, [None, {}])
                level = node[1]
            node[0] = (float(boost), int(slop), seq)
            seq += 1
        return root

    def term_set(self):
        out = set(self.singles)
        for entry in self.phrases:
            out.update(entry[0])
        return out


def expand_phrases(phrases):
    """FieldQuery.expand (FieldQuery.java:167-204): for every ordered
    pair of phrases where a proper suffix of one equals a prefix of the
    other, add the connected phrase — {"a b", "b c"} gains "a b c", so
    the greedy scan can match the overlap region as one span.  Expanded
    phrases carry boost 1.0 (the reference wraps them in
    BoostQuery(pq, 1f) regardless of the source boost)."""
    out = list(phrases)
    seen = {tuple(t for t in p[0]) for p in phrases}
    for a_terms, _a_boost in phrases:
        for b_terms, _b_boost in phrases:
            if a_terms == b_terms:
                continue
            for i in range(1, len(a_terms)):
                suffix = a_terms[i:]
                if len(suffix) >= len(b_terms):
                    continue
                if tuple(suffix) == tuple(b_terms[: len(suffix)]):
                    joined = tuple(a_terms) + tuple(b_terms[len(suffix):])
                    if joined not in seen:
                        seen.add(joined)
                        out.append((joined, 1.0))
    return tuple(out)


def tokenize_offsets(text: str):
    """(term, position, start_offset, end_offset) per token, the
    FieldTermStack order (offsets are 0-based, end exclusive)."""
    return [
        (m.group(), i, m.start(), m.end())
        for i, m in enumerate(_TOKEN_RX.finditer(text.lower()))
    ]


def field_phrase_list(tokens, query: FvhQuery):
    """FieldPhraseList.java:64-123 scan over the query-term stack with
    SAME-POSITION SYNONYM RINGS (FieldTermStack.java:100-126: stack
    entries sharing a position link into a circular TermInfo ring, in
    term-lexicographic order — the stable position sort over the
    term-sorted vector enumeration).  At each step the ring is walked
    from its current head until a member matches the query-trie level
    (FieldPhraseList.java:79-98); on failure the ring is pushed back
    with its head left at the last-tried member.  Candidates validate
    via terminal + slop-gap checks (isValidTermOrPhrase,
    FieldQuery.java:478-495) with the shorter-prefix push-back
    fallback.  Tokens with unique positions degenerate to singleton
    rings — the pre-ring behavior, bit-for-bit.

    Returns phrases as (start_offset, end_offset, merged_toffs, text,
    boost, terms, seqnum) in scan order, addIfNoOverlap applied."""
    root = query.trie()
    term_set = query.term_set()
    kept = sorted(
        (t for t in tokens if t[0] in term_set),
        key=lambda t: (t[1], t[0]),
    )
    rings = []
    for t in kept:
        if rings and rings[-1][0][1] == t[1]:
            rings[-1].append(t)
        else:
            rings.append([t])
    srot = [0] * len(rings)

    def ring_find(idx, level):
        ring = rings[idx]
        n = len(ring)
        s = srot[idx]
        for k in range(n):
            ti = ring[(s + k) % n]
            node = level.get(ti[0])
            if node is not None:
                return ti, (s + k) % n, node
        # reference iteration ends at the predecessor of the head
        return None, (s - 1) % n, None

    out = []
    i, nrings = 0, len(rings)

    def emit(cand, node):
        info = _phrase_info(cand, node[0][0], node[0][2])
        if not any(_overlaps(info, p) for p in out):
            out.append(info)

    while i < nrings:
        idx0 = i
        i += 1
        ti, mem0, curr = ring_find(idx0, root)
        if curr is None:
            continue  # discard this ring, scan on
        cand = [ti]
        cand_rings = [(idx0, mem0)]
        while True:
            ti2 = nxt = idx2 = None
            if i < nrings:
                idx2 = i
                i += 1
                ti2, mem2, nxt = ring_find(idx2, curr[1])
            if ti2 is None or nxt is None:
                if idx2 is not None:
                    i -= 1  # push the failed ring back
                    srot[idx2] = mem2
                if _valid(curr, cand):
                    emit(cand, curr)
                else:
                    while len(cand) > 1:
                        cand.pop()
                        ridx, rmem = cand_rings.pop()
                        srot[ridx] = rmem
                        i = ridx
                        node_k = _walk(root, [t[0] for t in cand])
                        if node_k is not None and _valid(node_k, cand):
                            emit(cand, node_k)
                            break
                break
            cand.append(ti2)
            cand_rings.append((idx2, mem2))
            curr = nxt
    return out


def _valid(node, cand):
    if node is None or node[0] is None:
        return False
    if len(cand) == 1:
        return True
    slop = node[0][1]
    pos = cand[0][1]
    for t in cand[1:]:
        if abs(t[1] - pos - 1) > slop:
            return False
        pos = t[1]
    return True


def _walk(root, terms):
    level, node = root, None
    for t in terms:
        node = level.get(t)
        if node is None:
            return None
        level = node[1]
    return node


def _phrase_info(matched, boost, seqnum=0):
    # merge offsets of consecutive positions (WeightedPhraseInfo ctor)
    toffs = [[matched[0][2], matched[0][3]]]
    pos = matched[0][1]
    for t in matched[1:]:
        if t[1] - pos == 1:
            toffs[-1][1] = t[3]
        else:
            toffs.append([t[2], t[3]])
        pos = t[1]
    text = "".join(t[0] for t in matched)
    return (
        toffs[0][0],
        toffs[-1][1],
        tuple(tuple(t) for t in toffs),
        text,
        boost,
        tuple(t[0] for t in matched),
        seqnum,
    )


def _overlaps(a, b):
    # WeightedPhraseInfo.isOffsetOverlap
    so, eo, oso, oeo = a[0], a[1], b[0], b[1]
    return (
        (so <= oso < eo)
        or (so < oeo <= eo)
        or (oso <= so < oeo)
        or (oso < eo <= oeo)
    )


def frag_list(
    phrases,
    frag_char_size: int,
    margin: int = 6,
    weighted: bool = False,
    term_weights: dict | None = None,
):
    """BaseFragListBuilder.createFieldFragList greedy packing.  Returns
    fragments as (span_start, span_end, score, accepted_phrases) in text
    order; scores per SimpleFieldFragList or WeightedFieldFragList."""
    min_frag = max(1, margin * 3)
    if frag_char_size < min_frag:
        raise ValueError(
            f"fragCharSize({frag_char_size}) is too small. It must be "
            f"{min_frag} or higher."
        )
    frags = []
    start_offset = 0
    k, n = 0, len(phrases)
    while k < n:
        anchor = phrases[k]
        if anchor[0] < start_offset:
            k += 1
            continue
        wpil = []
        a_start, a_end = anchor[0], anchor[1]
        span_start = max(a_start - margin, start_offset)
        span_end = max(a_end, span_start + frag_char_size)
        cur_end = a_end
        if _accept(anchor, a_end - a_start, frag_char_size):
            wpil.append(anchor)
        k += 1
        while k < n:
            p = phrases[k]
            if p[1] <= span_end:
                cur_end = p[1]
                if _accept(p, cur_end - a_start, frag_char_size):
                    wpil.append(p)
                k += 1
            else:
                break
        if not wpil:
            continue
        match_len = cur_end - a_start
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = max(a_start - new_margin, start_offset)
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        score = (
            _weighted_score(wpil, term_weights or {})
            if weighted
            else sum(p[4] for p in wpil)
        )
        frags.append((span_start, span_end, score, tuple(wpil)))
    return frags


def _accept(info, match_length, frag_char_size):
    # BaseFragListBuilder.acceptPhrase
    return len(info[2]) <= 1 or match_length <= frag_char_size


def _weighted_score(wpil, term_weights):
    # WeightedFieldFragList.add: float32 accumulation replicated
    import numpy as np

    distinct = set()
    length = 0
    sub_boosts = []
    for p in wpil:
        pb = np.float32(0.0)
        for t in p[5]:
            if t not in distinct:
                distinct.add(t)
                pb = np.float32(
                    pb + np.float32(term_weights.get(t, 1.0)) * np.float32(p[4])
                )
            length += 1
        sub_boosts.append(pb)
    # one √length norm over the whole fragment's term occurrences
    norm = np.float32(length * (1.0 / np.float32(math.sqrt(length))))
    total = np.float32(0.0)
    for b in sub_boosts:
        total = np.float32(total + np.float32(b * norm))
    return float(total)


BOUNDARY_CHARS = frozenset(".,!? \t\n")
MAX_SCAN = 20


def find_start_offset(text: str, start: int, boundary=BOUNDARY_CHARS,
                      max_scan: int = MAX_SCAN) -> int:
    """SimpleBoundaryScanner.findStartOffset: walk back ≤max_scan chars
    to the char after a boundary; reaching 0 counts as a boundary."""
    if start > len(text) or start < 1:
        return start
    offset, count = start, max_scan
    while offset > 0 and count > 0:
        if text[offset - 1] in boundary:
            return offset
        offset -= 1
        count -= 1
    return 0 if offset == 0 else start


def find_end_offset(text: str, start: int, boundary=BOUNDARY_CHARS,
                    max_scan: int = MAX_SCAN) -> int:
    """SimpleBoundaryScanner.findEndOffset: walk forward ≤max_scan chars
    to a boundary char's own offset."""
    if start > len(text) or start < 0:
        return start
    offset, count = start, max_scan
    while offset < len(text) and count > 0:
        if text[offset] in boundary:
            return offset
        offset += 1
        count -= 1
    return start


def make_fragment(text, frag, pre_tag="<b>", post_tag="</b>"):
    """BaseFragmentsBuilder.makeFragment + getFragmentSourceMSO: snap
    the source window to SimpleBoundaryScanner boundaries, then tag
    every merged offset of the accepted phrases, in order.

    The reference builds its buffer as value + multiValuedSeparator
    even for a single value, so the END scan can see a virtual ' '
    boundary at len(text) — a fragment ending within maxScan of the
    text end with no real boundary snaps to len(text), not the raw
    span end (getFragmentSourceMSO, BaseFragmentsBuilder.java:
    191-205)."""
    span_start, span_end = frag[0], frag[1]
    mso = find_start_offset(text, span_start)
    eo = (
        len(text)
        if len(text) < span_end
        else find_end_offset(text + " ", span_end)
    )
    pres = [pre_tag] if isinstance(pre_tag, str) else list(pre_tag)
    posts = [post_tag] if isinstance(post_tag, str) else list(post_tag)
    src = text[mso:eo]
    out = []
    idx = 0
    for p in frag[3]:
        seq = p[6] if len(p) > 6 else 0
        for ts, te in p[2]:
            out.append(src[idx : ts - mso])
            out.append(pres[seq % len(pres)])
            out.append(src[ts - mso : te - mso])
            out.append(posts[seq % len(posts)])
            idx = te - mso
    out.append(src[idx:])
    return "".join(out)


def idf_weights(df_map: dict, num_docs: int) -> dict:
    """FieldTermStack.java:87 term weight."""
    import numpy as np

    return {
        t: float(np.float32(math.log(num_docs / (df + 1.0)) + 1.0))
        for t, df in df_map.items()
    }


def highlight_doc(
    text: str,
    query: FvhQuery,
    frag_char_size: int = 100,
    margin: int = 6,
    weighted: bool = False,
    term_weights: dict | None = None,
    max_frags: int = 3,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    tokens=None,
):
    """Full per-document pipeline → [(rank, span_start, span_end, score,
    snippet)] in ScoreOrderFragmentsBuilder order (score desc, start
    asc), capped at max_frags.  ``tokens`` overrides the default
    analyzer's stack — e.g. a stack with index-time synonym tokens at
    duplicated positions (fvh_synonym_stack), which form TermInfo
    rings in field_phrase_list."""
    phrases = field_phrase_list(
        tokenize_offsets(text) if tokens is None else tokens, query
    )
    frags = frag_list(phrases, frag_char_size, margin, weighted, term_weights)
    frags = sorted(frags, key=lambda f: (-f[2], f[0]))[:max_frags]
    return [
        (i, f[0], f[1], f[2], make_fragment(text, f, pre_tag, post_tag))
        for i, f in enumerate(frags)
    ]


def fvh_highlight(
    docs: DataFrame,
    query: FvhQuery,
    frag_char_size: int = 100,
    margin: int = 6,
    weighted: bool = False,
    term_weights: dict | None = None,
    max_frags: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed FVH: one narrow mapInPandas pass over the stored
    fields (plan: scan → ArrowEvalPython, zero shuffles)."""
    q, fcs, mg, wt = query, frag_char_size, margin, weighted
    tw, mf = dict(term_weights or {}), max_frags

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for rank, s, t, score, snip in highlight_doc(
                    text, q, fcs, mg, wt, tw, mf
                ):
                    rows.append((doc_id, rank, s, t, score, snip))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frag", "span_start", "span_end",
                    "score", "snippet",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(run, OUT_SCHEMA)


# ------------------------------------------------- multi-valued fields

MV_SEPARATOR = " "


def tokenize_offsets_mv(values, pos_inc_gap: int = 0):
    """FieldTermStack over a MULTI-VALUED field: character offsets
    accumulate across values with a 1-char gap per boundary
    (Analyzer.getOffsetGap default = 1), positions continue with
    ``pos_inc_gap`` added before each subsequent value
    (Analyzer.getPositionIncrementGap; 0 for the reference's JUnit
    MockAnalyzer, which is why phrases may match ACROSS value
    boundaries — FastVectorHighlighterTest.testPhrasesSpanningFieldValues)."""
    toks = []
    base_off = 0
    base_pos = 0
    for vi, v in enumerate(values or []):
        v = v or ""
        if vi > 0:
            base_pos += pos_inc_gap
        vt = tokenize_offsets(v)
        for t, p, s, e in vt:
            toks.append((t, base_pos + p, base_off + s, base_off + e))
        base_pos += len(vt)
        base_off += len(v) + 1
    return toks


def _sub_boosts(wpil, weighted: bool, term_weights):
    """Per-phrase SubInfo boosts: the phrase boost (SimpleFieldFragList)
    or the fragment-distinct weighted pb (WeightedFieldFragList:36-66 —
    same float32 fold as _weighted_score, WITHOUT the norm, which only
    enters the fragment total)."""
    if not weighted:
        return [p[4] for p in wpil]
    import numpy as np

    distinct = set()
    out = []
    for p in wpil:
        pb = np.float32(0.0)
        for t in p[5]:
            if t not in distinct:
                distinct.add(t)
                pb = np.float32(
                    pb
                    + np.float32((term_weights or {}).get(t, 1.0))
                    * np.float32(p[4])
                )
        out.append(float(pb))
    return out


def discrete_split(frags, values, weighted=False, term_weights=None):
    """BaseFragmentsBuilder.discreteMultiValueHighlighting: split each
    fragment at value boundaries — a Toffs entirely inside a value
    moves there, one straddling a boundary is CLAMPED on each side
    ([start, fieldEnd-1] now, [fieldStart, end] when it resumes) — and
    each per-value fragment's score is the float32 sum of its retained
    SubInfo boosts.  Output sorted by startOffset (the reference's
    final Collections.sort).  Structures are mutated live across the
    value walk exactly like the reference's iterator-removal flow."""
    import numpy as np

    out = []
    for frag in frags:
        fs, fe, _score, wpil = frag
        boosts = _sub_boosts(wpil, weighted, term_weights)
        # live [text, toffs(list of [s,e]), seqnum, boost] per phrase
        subinfos = [
            [p[3], [list(t) for t in p[2]], p[6], boosts[pi]]
            for pi, p in enumerate(wpil)
        ]
        field_end = 0
        for v in values:
            v = v or ""
            if v == "":
                field_end += 1
                continue
            field_start = field_end
            field_end += len(v) + 1
            if (
                fs >= field_start
                and fe >= field_start
                and fs <= field_end
                and fe <= field_end
            ):
                out.append(frag)
                break
            if not subinfos:
                break
            first_toffs = subinfos[0][1][0]
            if fs >= field_end or first_toffs[0] >= field_end:
                continue
            frag_start = field_start
            if field_start < fs < field_end:
                frag_start = fs
            frag_end = field_end
            if field_start < fe < field_end:
                frag_end = fe
            new_subs = []
            boost = np.float32(0.0)
            for sub in list(subinfos):
                toffs_new = []
                for toffs in list(sub[1]):
                    if toffs[0] >= field_end:
                        break
                    starts_after = toffs[0] >= field_start
                    ends_before = toffs[1] < field_end
                    if starts_after and ends_before:
                        toffs_new.append((toffs[0], toffs[1]))
                        sub[1].remove(toffs)
                    elif starts_after:
                        toffs_new.append((toffs[0], field_end - 1))
                    elif ends_before:
                        toffs_new.append((field_start, toffs[1]))
                        sub[1].remove(toffs)
                    else:
                        toffs_new.append((field_start, field_end - 1))
                if toffs_new:
                    new_subs.append(
                        (None, None, tuple(toffs_new), sub[0], sub[3],
                         (), sub[2])
                    )
                    boost = np.float32(boost + np.float32(sub[3]))
                if not sub[1]:
                    subinfos.remove(sub)
            out.append(
                (frag_start, frag_end, float(boost), tuple(new_subs))
            )
    return sorted(out, key=lambda f: f[0])


def make_fragments_mv(values, frags, pre_tag="<b>", post_tag="</b>",
                      tokenized: bool = True):
    """BaseFragmentsBuilder.createFragments over a multi-valued field:
    ONE buffer shared across the doc's fragments (values appended
    lazily, joined by the multiValuedSeparator) — the trailing-
    separator trim and the bufferLength-vs-endOffset cut depend on how
    far EARLIER fragments grew the buffer, exactly as in
    getFragmentSourceMSO (BaseFragmentsBuilder.java:191-205).
    Returns snippets aligned with ``frags`` order."""
    pres = [pre_tag] if isinstance(pre_tag, str) else list(pre_tag)
    posts = [post_tag] if isinstance(post_tag, str) else list(post_tag)
    joined = ""
    vidx = 0
    snippets = []
    for frag in frags:
        span_start, span_end = frag[0], frag[1]
        while len(joined) < span_end and vidx < len(values):
            joined += (values[vidx] or "") + MV_SEPARATOR
            vidx += 1
        buffer_length = len(joined)
        if tokenized and vidx > 0:
            buffer_length -= 1
        eo = (
            buffer_length
            if buffer_length < span_end
            else find_end_offset(joined, span_end)
        )
        mso = find_start_offset(joined, span_start)
        src = joined[mso:eo]
        out = []
        idx = 0
        for p in frag[3]:
            seq = p[6] if len(p) > 6 else 0
            for ts, te in p[2]:
                out.append(src[idx : ts - mso])
                out.append(pres[seq % len(pres)])
                out.append(src[ts - mso : te - mso])
                out.append(posts[seq % len(posts)])
                idx = te - mso
        out.append(src[idx:])
        snippets.append("".join(out))
    return snippets


def highlight_doc_mv(
    values,
    query: FvhQuery,
    frag_char_size: int = 100,
    margin: int = 6,
    weighted: bool = False,
    term_weights: dict | None = None,
    max_frags: int = 3,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    pos_inc_gap: int = 0,
    discrete: bool = False,
    score_order: bool = True,
):
    """Per-document multi-valued pipeline → [(rank, span_start,
    span_end, score, snippet)].  score_order=True is
    ScoreOrderFragmentsBuilder (score desc, start asc);
    score_order=False keeps SimpleFragmentsBuilder's order (discrete:
    startOffset asc)."""
    phrases = field_phrase_list(
        tokenize_offsets_mv(values, pos_inc_gap), query
    )
    frags = frag_list(
        phrases, frag_char_size, margin, weighted, term_weights
    )
    if discrete and len(values) > 1:
        frags = discrete_split(frags, values, weighted, term_weights)
    if score_order:
        frags = sorted(frags, key=lambda f: (-f[2], f[0]))
    frags = frags[:max_frags]
    snips = make_fragments_mv(values, frags, pre_tag, post_tag)
    return [
        (i, f[0], f[1], f[2], snips[i]) for i, f in enumerate(frags)
    ]


def fvh_highlight_mv(
    docs: DataFrame,
    query: FvhQuery,
    frag_char_size: int = 100,
    margin: int = 6,
    weighted: bool = False,
    term_weights: dict | None = None,
    max_frags: int = 3,
    id_col: str = "doc_id",
    values_col: str = "texts",
    pos_inc_gap: int = 0,
    discrete: bool = False,
    score_order: bool = True,
) -> DataFrame:
    """Distributed multi-valued FVH: same zero-shuffle narrow
    mapInPandas shape as fvh_highlight, over an array<string> column."""
    q, fcs, mg, wt = query, frag_char_size, margin, weighted
    tw, mf = dict(term_weights or {}), max_frags
    gap, disc, so = pos_inc_gap, discrete, score_order

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, vals in zip(pdf[id_col], pdf[values_col]):
                for rank, s, t, score, snip in highlight_doc_mv(
                    list(vals), q, fcs, mg, wt, tw, mf,
                    pos_inc_gap=gap, discrete=disc, score_order=so,
                ):
                    rows.append((doc_id, rank, s, t, score, snip))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frag", "span_start", "span_end",
                    "score", "snippet",
                ],
            )

    return docs.select(id_col, values_col).mapInPandas(run, OUT_SCHEMA)


def fvh_synonym_stack(text: str, rules) -> list:
    """FieldTermStack input with INDEX-TIME synonyms: apply the
    synonym graph (analysis/syngraph.py — SynonymGraphFilter) to the
    analyzed tokens, then FLATTEN to stack positions the way an
    indexed-and-read-back term vector presents them: original tokens
    keep their sequential positions; a synonym token takes the
    position of its match's FIRST original token (posInc 0 — the
    FlattenGraphFilter view), carrying the match-wide offsets.  Exact
    for single-token synonym outputs (the reference JUnit surface —
    FastVectorHighlighterTest.testBooleanPhraseWithSynonym builds
    exactly this shape with a CannedTokenStream); multi-token outputs
    assign each path token the nearest original position at or before
    its start node (declared flatten approximation)."""
    from ..analysis.syngraph import synonym_graph

    base = tokenize_offsets(text)
    graph = synonym_graph(
        [(t[0], t[2], t[3]) for t in base], rules
    )
    # original tokens in node order define the position scale
    node_to_pos = {}
    pos = 0
    for term, sn, en, s, e, syn in graph:
        if not syn and sn not in node_to_pos:
            node_to_pos[sn] = pos
            pos += 1
    orig_nodes = sorted(node_to_pos)
    out = []
    for term, sn, en, s, e, syn in graph:
        if sn in node_to_pos:
            p = node_to_pos[sn]
        else:
            import bisect

            k = bisect.bisect_right(orig_nodes, sn) - 1
            p = node_to_pos[orig_nodes[k]] if k >= 0 else 0
        out.append((term, p, s, e))
    return out
