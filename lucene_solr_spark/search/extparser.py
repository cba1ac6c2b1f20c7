"""ExtendableQueryParser — pluggable field-syntax extensions.

The reference extends the classic parser so a fielded token
``<field>:<ext>:<value>`` dispatches to a registered ParserExtension:
``Extensions.splitExtensionField`` peels the LAST delimiter-separated
component of the field as the extension key, and the extension builds
a Query from (field, value) (reference lucene/queryparser/src/java/
org/apache/lucene/queryparser/ext/{ExtendableQueryParser,Extensions,
ParserExtension}.java — getFieldQuery override; delimiter ':',
Extensions.DEFAULT_EXTENSION_FIELD_DELIMITER).

This analog keeps the classic parser untouched and runs extensions as
a macro-expansion pass: each registered extension maps (field, value)
to CLASSIC SYNTAX, which then flows through parse_query/execute_parsed
like any other clause — the analog of ParserExtension.parse returning
a Query that joins the surrounding BooleanQuery. ``+``/``-`` occur
prefixes stay outside the rewrite, exactly as the surrounding grammar
owns them in the reference. Unregistered extension keys fall through
untouched (the classic parser then sees the raw fielded token, the
reference's behavior for unknown keys after escaping).

Built-in demonstration extensions (register your own via the dict):
- ``range``: ``f:range:lo-hi``   → ``f:[lo TO hi]``
- ``pre``:   ``f:pre:stem``      → ``stem*`` (dictionary prefix
             expansion; field must be the default text field)
"""

from __future__ import annotations

import re

__all__ = ["DEFAULT_EXTENSIONS", "rewrite_extended", "parse_extended"]


def _ext_range(field: str, value: str) -> str:
    lo, _, hi = value.partition("-")
    if not lo or not hi:
        raise ValueError(f"range extension needs lo-hi, got {value!r}")
    return f"{field}:[{lo} TO {hi}]"


def _ext_prefix(field: str, value: str) -> str:
    if field != "text":
        raise ValueError("pre extension applies to the text field")
    return f"{value}*"


DEFAULT_EXTENSIONS = {"range": _ext_range, "pre": _ext_prefix}

_EXT_TOKEN = re.compile(
    r"^([+-]?)([A-Za-z_][A-Za-z0-9_]*):([A-Za-z_][A-Za-z0-9_]*):(\S+)$"
)


def rewrite_extended(q: str, extensions=None) -> str:
    """One pass over whitespace tokens: rewrite every
    ``[+|-]field:ext:value`` token whose ext is registered; everything
    else (including quoted phrases, which never contain the
    field:ext:value shape) passes through verbatim."""
    exts = DEFAULT_EXTENSIONS if extensions is None else extensions
    out = []
    for tok in q.split():
        m = _EXT_TOKEN.match(tok)
        if m and m.group(3) in exts:
            occur, field, ext, value = m.groups()
            out.append(occur + exts[ext](field, value))
        else:
            out.append(tok)
    return " ".join(out)


def parse_extended(q: str, extensions=None, analyzer=None):
    """ExtendableQueryParser.parse: extension macro-expansion, then the
    classic grammar."""
    from .queryparser import parse_query

    return parse_query(rewrite_extended(q, extensions), analyzer)
