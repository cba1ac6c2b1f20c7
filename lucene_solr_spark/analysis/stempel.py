"""Stempel — the reference's algorithmic Polish stemmer.

The reference's Polish analysis module (lucene/analysis/stempel) wraps
the Egothor project's patch-command trie stemmer: a MultiTrie2 of
backward (suffix-first) tries whose leaves carry *patch commands* —
little edit scripts ("-a" pop 1, "Rx" replace with x, "Dc" delete 3,
"Ie" insert e) that rewrite an inflected form into its stem
(reference lucene/analysis/stempel/src/java/org/egothor/stemmer/
{Trie,MultiTrie,MultiTrie2,Row,Diff}.java and org/apache/lucene/
analysis/stempel/{StempelStemmer,StempelFilter}.java; table
stemmer_20000.tbl, trained on a 20k-lemma Polish corpus).

This is a from-scratch Python re-expression of those *semantics*:

- the serialized table is converted ONCE (scripts/
  make_stempel_fixture.py) from the Java DataOutput format into
  ``fixtures_data/stempel_trie.json.gz`` — rows become plain
  ``{char: [cmd_index, row_ref]}`` dicts;
- lookup mirrors ``MultiTrie2.getLastOnPath``: each of the 8 trie
  levels contributes the deepest patch command on the (suffix-first)
  path of the *remaining* key, levels chain unless the previous
  command class forbids it (``cannotFollow``), and '-' commands
  consume key characters for the next level (``skip``/``lengthPP``);
- ``diff_apply`` mirrors ``Diff.apply`` exactly, INCLUDING the
  reference's silently-caught StringIndexOutOfBounds mid-apply (a
  partial patch is kept, not rolled back);
- ``stempel_polish_stem`` applies StempelFilter's gating: terms of
  length <= 3 (DEFAULT_MIN_LENGTH) pass through, and a null/empty
  stem keeps the original term.

Verified word-for-word against the reference's own implementation
(compiled as a test oracle) over the full JUnit vectors + a 90k-word
deterministic pseudo-Polish vocabulary at fixture-build time; a
sampled slice rides the ``fts_light_stemmers`` driver gate as lang
``pl``.
"""

from __future__ import annotations

import gzip
import json
import os

_TABLE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "stempel_trie.json.gz",
)

_TRIES = None  # lazy: list of (cmds, rows) per level


def _load():
    global _TRIES
    if _TRIES is None:
        with gzip.open(os.path.abspath(_TABLE_PATH), "rt",
                       encoding="utf-8") as f:
            t = json.load(f)
        if t["forward"] or t["BY"] != 1:
            raise ValueError("only backward BY=1 MultiTrie2 supported")
        tries = []
        for lvl in t["tries"]:
            cmds = lvl["cmds"]
            rows = [
                {ch: (cell[0], cell[1]) for ch, cell in row.items()}
                for row in lvl["rows"]
            ]
            nrows = len(rows)
            for row in rows:
                for cell in row.values():
                    if cell[1] >= nrows:
                        raise ValueError("dangling row ref in table")
            tries.append((cmds, rows, lvl["root"]))
        _TRIES = tries
    return _TRIES


def _trie_last_on_path(cmds, rows, root, key):
    """Trie.getLastOnPath for a backward trie: walk the key from its
    END, remembering the last cell that carried a command; stop when
    the path leaves the trie (Trie.java:274-294).  Raises IndexError
    on an empty key exactly where Java's charAt(-1) would."""
    n = len(key)
    if n == 0:
        raise IndexError("empty key")
    now = rows[root]
    last = None
    idx = n - 1  # StrEnum backward
    for _ in range(n - 1):
        cell = now.get(key[idx])
        idx -= 1
        if cell is None:
            return last
        if cell[0] >= 0:
            last = cmds[cell[0]]
        ref = cell[1]
        if ref < 0:
            return last
        now = rows[ref]
    cell = now.get(key[idx])
    if cell is not None and cell[0] >= 0:
        return cmds[cell[0]]
    return last


def _length_pp(cmd):
    """Key characters consumed by a patch command ('-'/'D' pop/delete
    their count, 'R' replaces one, 'I' consumes none) —
    MultiTrie2.lengthPP."""
    ln = 0
    for i in range(0, len(cmd) - 1, 2):
        c = cmd[i]
        if c in "-D":
            ln += ord(cmd[i + 1]) - ord("a") + 1
        elif c == "R":
            ln += 1
    return ln


def _skip_back(key, count):
    """Backward-trie skip: drop `count` chars off the END; Java
    subSequence(0, len-count) throws when count > len."""
    if count > len(key):
        raise IndexError("skip past start")
    return key[: len(key) - count]


def multi_last_on_path(word):
    """MultiTrie2.getLastOnPath: concatenate per-level patch commands
    while each level still matches and may follow the previous one
    (MultiTrie2.java:141-173)."""
    tries = _load()
    result = []
    key = word
    lastkey = word
    lastch = " "
    prev = None
    try:
        for cmds, rows, root in tries:
            r = _trie_last_on_path(cmds, rows, root, lastkey)
            if r is None or (len(r) == 1 and r[0] == "*"):
                break
            if lastch in "-D" and lastch == r[0]:
                break
            lastch = r[-2]
            if r[0] == "-":
                if prev is not None:
                    key = _skip_back(key, _length_pp(prev))
                key = _skip_back(key, _length_pp(r))
            prev = r
            result.append(r)
            if key:
                lastkey = key
    except IndexError:
        pass
    return "".join(result)


def diff_apply(dest, diff):
    """Diff.apply: play the 2-char patch pairs right-to-left over the
    char list; a mid-script out-of-bounds stops the script but KEEPS
    the partial edit (Diff.java apply's silent catch)."""
    if not diff:
        return
    pos = len(dest) - 1
    if pos < 0:
        return
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                end = min(o + 1, len(dest))
                if pos < 0 or pos > len(dest) or pos > end:
                    raise IndexError
                del dest[pos:end]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass


def stempel_stem_raw(word):
    """StempelStemmer.stem: patch-command lookup + Diff application;
    None when the result would be empty."""
    cmd = multi_last_on_path(word)
    buf = list(word)
    diff_apply(buf, cmd)
    return "".join(buf) if buf else None


def stempel_polish_stem(word: str) -> str:
    """StempelFilter semantics: terms of length <= DEFAULT_MIN_LENGTH
    (3) pass through untouched, and a null stem keeps the original
    term (StempelFilter.java:43,73-76)."""
    if len(word) <= 3:
        return word
    s = stempel_stem_raw(word)
    return s if s else word
