"""Lucene expression-language compiler (lucene/expressions) for Spark + DuckDB.

The reference compiles a small Javascript-like scoring DSL to JVM bytecode
(``lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java``, grammar ``Javascript.g4``): every value is a
double, but the bytecode threads an *expected type* stack (DOUBLE/LONG/INT)
through the tree so that bitwise ops run on longs, truthiness tests run on
ints, and the JVM primitive casts (d2l / d2i / l2i / l2d) happen at each
context boundary.  This module re-expresses that pipeline as pure SQL
expression trees: ``compile_expression(src, bindings)`` parses the same
grammar (recursive descent mirroring the ANTLR alternative order) and emits
one scalar-SQL rendering per engine — a Spark SQL string for ``F.expr`` /
whole-stage codegen and a DuckDB SQL string for the oracle — with identical
IEEE-754 double semantics on both.  No Python runs per row; the compiled
expression is JVM-side Catalyst codegen, so it scales like any built-in
column expression.

JVM semantics replicated exactly (JavascriptCompiler.java:262-655):
- type contexts: arithmetic in DOUBLE, bitwise/shift operands in LONG,
  truthiness (``!``, ``&&``, ``||``, ``?:`` condition) in INT — so
  ``!0.5`` is true (d2i truncates 0.5 to 0) and a LONG entering a
  truthiness test wraps through l2i (low 32 bits only);
- d2l / d2i: NaN → 0, out-of-range clamps to MIN/MAX, truncation toward
  zero (JVM d2l spec);
- shift counts pass through d2i then the JVM's implicit ``& 63`` mask;
- ``==``/``!=``/orderings are double comparisons with Java NaN behavior
  (every ordered comparison false on NaN, ``!=`` true) — NOT the SQL
  engines' native "NaN is largest and equal to itself" ordering;
- ``/`` and ``%`` by zero produce IEEE Inf/NaN (both engines would raise
  or return NULL natively: Spark ANSI errors, DuckDB yields NULL);
- HEX/OCTAL literals are longs pushed in the expected type
  (``Long.parseLong`` overflow is a parse error, as in the reference).

Function table = the reference's JavascriptCompiler.properties (25 names).
MathUtil.{acosh,asinh,atanh,log} formulas are transcribed term-for-term
(MathUtil.java:30-100).  Declared divergences (documented, not silent):
``haversin`` uses the true cosine rather than SloppyMath's table-driven
``cos`` (error ≤ 4e-1 m per SloppyMath.java:40), sinh/cosh on DuckDB use
the exp() identity which overflows ~0.7 ulp earlier at |x|≈709.78, and
zero-sign (−0.0 vs 0.0) results are not distinguished.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

__all__ = [
    "compile_expression",
    "expression_variables",
    "CompiledExpression",
    "JsParseError",
]


class JsParseError(ValueError):
    """Invalid expression (mirrors the reference's ParseException)."""


# --------------------------------------------------------------- lexer

_ARRAY = r"\[(?:'(?:\\'|\\\\|[^\\'])*'|\"(?:\\\"|\\\\|[^\\\"])*\"|0|[1-9][0-9]*)\]"
_ID = r"[_$a-zA-Z][_$a-zA-Z0-9]*"
_VARIABLE = rf"{_ID}(?:{_ARRAY})*(?:\.{_ID}(?:{_ARRAY})*)*"

_TOKEN_RX = re.compile(
    "|".join(
        f"(?P<{name}>{pat})"
        for name, pat in [
            ("WS", r"[ \t\n\r]+"),
            ("HEX", r"0[xX][0-9a-fA-F]+"),
            ("OCTAL", r"0[0-7]+"),
            ("DECIMAL", r"(?:0|[1-9][0-9]*)(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|\.[0-9]+"),
            ("VARIABLE", _VARIABLE),
            ("LSH", r"<<"),
            ("USH", r">>>"),
            ("RSH", r">>"),
            ("LTE", r"<="),
            ("GTE", r">="),
            ("EQ", r"=="),
            ("NE", r"!="),
            ("BOOLAND", r"&&"),
            ("BOOLOR", r"\|\|"),
            ("LP", r"\("),
            ("RP", r"\)"),
            ("COMMA", r","),
            ("BOOLNOT", r"!"),
            ("BWNOT", r"~"),
            ("MUL", r"\*"),
            ("DIV", r"/"),
            ("REM", r"%"),
            ("ADD", r"\+"),
            ("SUB", r"-"),
            ("LT", r"<"),
            ("GT", r">"),
            ("BWAND", r"&"),
            ("BWXOR", r"\^"),
            ("BWOR", r"\|"),
            ("COND", r"\?"),
            ("COLON", r":"),
        ]
    )
)


def _lex(src: str):
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if m is None:
            raise JsParseError(
                f"Invalid expression '{src}': unexpected character at {i}"
            )
        if m.lastgroup != "WS":
            toks.append((m.lastgroup, m.group()))
        i = m.end()
    toks.append(("EOF", ""))
    return toks


# -------------------------------------------------------------- parser
#
# Precedence mirrors the ANTLR alternative order in Javascript.g4
# (first-listed binds tightest): muldiv > addsub > bwshift > boolcomp >
# booleqne > bwand > bwxor > bwor > booland > boolor > conditional.

_BIN_LEVELS = [
    ("BOOLOR",),
    ("BOOLAND",),
    ("BWOR",),
    ("BWXOR",),
    ("BWAND",),
    ("EQ", "NE"),
    ("LT", "LTE", "GT", "GTE"),
    ("LSH", "RSH", "USH"),
    ("ADD", "SUB"),
    ("MUL", "DIV", "REM"),
]


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _lex(src)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos][0]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind):
        k, text = self.next()
        if k != kind:
            raise JsParseError(
                f"Invalid expression '{self.src}': expected {kind}, "
                f"found {k} '{text}'"
            )
        return text

    def parse(self):
        node = self.conditional()
        if self.peek() != "EOF":
            k, text = self.toks[self.pos]
            raise JsParseError(
                f"Invalid expression '{self.src}': unexpected token '{text}'"
            )
        return node

    def conditional(self):
        cond = self.binary(0)
        if self.peek() == "COND":
            self.next()
            a = self.conditional()
            self.expect("COLON")
            b = self.conditional()
            return ("cond", cond, a, b)
        return cond

    def binary(self, level: int):
        if level >= len(_BIN_LEVELS):
            return self.unary()
        node = self.binary(level + 1)
        while self.peek() in _BIN_LEVELS[level]:
            op, _ = self.next()
            rhs = self.binary(level + 1)
            node = ("bin", op, node, rhs)
        return node

    def unary(self):
        k = self.peek()
        if k in ("BOOLNOT", "BWNOT", "ADD", "SUB"):
            self.next()
            return ("un", k, self.unary())
        return self.primary()

    def primary(self):
        k, text = self.next()
        if k == "LP":
            node = self.conditional()
            self.expect("RP")
            return node
        if k == "HEX":
            v = int(text[2:], 16)
            if v > 0x7FFFFFFFFFFFFFFF:
                raise JsParseError(
                    f"Invalid expression '{self.src}': hex literal too large"
                )
            return ("long", v)
        if k == "OCTAL":
            v = int(text[1:], 8)
            if v > 0x7FFFFFFFFFFFFFFF:
                raise JsParseError(
                    f"Invalid expression '{self.src}': octal literal too large"
                )
            return ("long", v)
        if k == "DECIMAL":
            return ("dbl", float(text))
        if k == "VARIABLE":
            if self.peek() == "LP":
                self.next()
                args = []
                if self.peek() != "RP":
                    args.append(self.conditional())
                    while self.peek() == "COMMA":
                        self.next()
                        args.append(self.conditional())
                self.expect("RP")
                if "." in text or "[" in text:
                    raise JsParseError(
                        f"Invalid expression '{self.src}': unrecognized "
                        f"function call ({text})"
                    )
                return ("call", text, args)
            return ("var", _normalize_quotes(text))
        raise JsParseError(
            f"Invalid expression '{self.src}': unexpected token '{text}'"
        )


def _normalize_quotes(text: str) -> str:
    """Double-quoted array strings → single-quoted, as the reference's
    JavascriptCompiler.normalizeQuotes does for externals-map keys."""
    out, i, in_dq = [], 0, False
    while i < len(text):
        c = text[i]
        if c == '"':
            in_dq = not in_dq
            out.append("'")
        elif c == "'" and in_dq:
            out.append("\\'")
        elif c == "\\" and i + 1 < len(text):
            out.append(text[i : i + 2])
            i += 1
        else:
            out.append(c)
        i += 1
    return "".join(out)


# ------------------------------------------------------------- emitter

_LONG_MIN = "(-9223372036854775807 - 1)"
_P63 = "CAST(9.223372036854776e18 AS DOUBLE)"  # 2^63 exactly
_P31 = "CAST(2.147483648e9 AS DOUBLE)"  # 2^31 exactly
_P52 = "CAST(4.503599627370496e15 AS DOUBLE)"  # 2^52: beyond, doubles are integral
_NAN = "CAST('NaN' AS DOUBLE)"
_INF = "CAST('Infinity' AS DOUBLE)"
_NINF = "CAST('-Infinity' AS DOUBLE)"


def _dlit(v: float) -> str:
    if math.isnan(v):
        return _NAN
    if math.isinf(v):
        return _INF if v > 0 else _NINF
    return f"CAST('{v!r}' AS DOUBLE)"


class _Emit:
    """One engine rendering.  emit(node, t) returns SQL whose value is the
    node evaluated in expected-type context t ∈ {'D','L','I'} — exactly
    the typeStack discipline of JavascriptCompiler.compileExpression."""

    def __init__(self, engine: str, bindings: dict, functions: dict | None = None):
        assert engine in ("spark", "duck")
        self.engine = engine
        self.bindings = bindings
        self.extra_functions = dict(functions or {})

    # ---- JVM primitive casts as SQL

    def d2l(self, x: str) -> str:
        trunc = f"CAST({x} AS BIGINT)" if self.engine == "spark" else \
            f"CAST(trunc({x}) AS BIGINT)"
        return (
            f"(CASE WHEN isnan({x}) THEN 0 "
            f"WHEN {x} >= {_P63} THEN 9223372036854775807 "
            f"WHEN {x} <= -{_P63} THEN {_LONG_MIN} "
            f"ELSE {trunc} END)"
        )

    def d2i(self, x: str) -> str:
        trunc = f"CAST({x} AS BIGINT)" if self.engine == "spark" else \
            f"CAST(trunc({x}) AS BIGINT)"
        return (
            f"(CASE WHEN isnan({x}) THEN 0 "
            f"WHEN {x} >= {_P31} THEN 2147483647 "
            f"WHEN {x} <= -{_P31} THEN -2147483648 "
            f"ELSE {trunc} END)"
        )

    def l2i(self, x: str) -> str:
        u = f"({x} & 4294967295)"
        return (
            f"(CASE WHEN {u} >= 2147483648 THEN {u} - 4294967296 "
            f"ELSE {u} END)"
        )

    def coerce(self, sql: str, frm: str, to: str) -> str:
        if frm == to or (frm, to) == ("I", "L"):
            return sql
        if to == "D":
            return f"CAST({sql} AS DOUBLE)"
        if (frm, to) == ("D", "L"):
            return self.d2l(sql)
        if (frm, to) == ("D", "I"):
            return self.d2i(sql)
        if (frm, to) == ("L", "I"):
            return self.l2i(sql)
        raise AssertionError((frm, to))

    # ---- helpers

    def boolean(self, cond: str, t: str) -> str:
        one, zero = ("1.0", "0.0") if t == "D" else ("1", "0")
        return f"(CASE WHEN {cond} THEN {one} ELSE {zero} END)"

    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.engine == "spark" else f"xor({a}, {b})"

    def ieee_div(self, a: str, b: str) -> str:
        # JVM DDIV: x/±0 → NaN when x is 0 or NaN, else Inf signed by
        # the product of operand signs (the zero's sign bit counts).
        negzero = (
            f"startswith(CAST({b} AS STRING), '-')"
            if self.engine == "spark"
            else f"signbit({b})"
        )
        pos = f"((({a} > 0.0) AND NOT {negzero}) OR (({a} < 0.0) AND {negzero}))"
        return (
            f"(CASE WHEN {b} = 0.0 THEN "
            f"(CASE WHEN isnan({a}) OR {a} = 0.0 THEN {_NAN} "
            f"WHEN {pos} THEN {_INF} ELSE {_NINF} END) "
            f"ELSE {a} / {b} END)"
        )

    def ieee_rem(self, a: str, b: str) -> str:
        # JVM DREM (C fmod): x % 0 → NaN; both engines' native `%`
        # matches fmod for nonzero divisors.
        return (
            f"(CASE WHEN {b} = 0.0 THEN {_NAN} ELSE {a} % {b} END)"
        )

    def java_cmp(self, a: str, b: str, op: str) -> str:
        """Boolean SQL condition with Java NaN semantics (dcmpl/dcmpg):
        any NaN → false for orderings and ==, true for !=."""
        nn = f"isnan({a}) OR isnan({b})"
        sqlop = {"LT": "<", "LTE": "<=", "GT": ">", "GTE": ">=", "EQ": "="}[op] \
            if op != "NE" else None
        if op == "NE":
            return f"(({nn}) OR {a} <> {b})"
        return f"(NOT ({nn}) AND {a} {sqlop} {b})"

    def ln_g(self, x: str) -> str:
        # Math.log: NaN/negative → NaN, ±0 → -Inf (Spark returns NULL,
        # DuckDB raises — both guarded here).
        return (
            f"(CASE WHEN isnan({x}) OR {x} < 0.0 THEN {_NAN} "
            f"WHEN {x} = 0.0 THEN {_NINF} ELSE ln({x}) END)"
        )

    def log10_g(self, x: str) -> str:
        return (
            f"(CASE WHEN isnan({x}) OR {x} < 0.0 THEN {_NAN} "
            f"WHEN {x} = 0.0 THEN {_NINF} ELSE log10({x}) END)"
        )

    def sqrt_g(self, x: str) -> str:
        return (
            f"(CASE WHEN isnan({x}) OR {x} < 0.0 THEN {_NAN} "
            f"ELSE sqrt({x}) END)"
        )

    def trig_g(self, fn: str, x: str) -> str:
        # Math.sin/cos/tan(±Inf) → NaN; DuckDB raises on Inf input.
        return (
            f"(CASE WHEN isnan({x}) OR abs({x}) = {_INF} THEN {_NAN} "
            f"ELSE {fn}({x}) END)"
        )

    def dom_g(self, fn: str, x: str) -> str:
        # asin/acos: |x| > 1 → NaN (DuckDB raises).
        return (
            f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0 THEN {_NAN} "
            f"ELSE {fn}({x}) END)"
        )

    def minmax(self, fn: str, a: str, b: str) -> str:
        # Math.min/max propagate NaN; Spark's least() and DuckDB's
        # least() both drop it on one side.
        pick = "greatest" if fn == "max" else "least"
        return (
            f"(CASE WHEN isnan({a}) OR isnan({b}) THEN {_NAN} "
            f"ELSE {pick}({a}, {b}) END)"
        )

    def floor_ceil(self, fn: str, x: str) -> str:
        # Spark floor/ceil return BIGINT: route NaN/Inf/|x|≥2^52 around
        # the cast (those doubles are already integral).
        return (
            f"(CASE WHEN isnan({x}) OR abs({x}) >= {_P52} THEN {x} "
            f"ELSE CAST({fn}({x}) AS DOUBLE) END)"
        )

    def sinh_cosh(self, fn: str, x: str) -> str:
        if self.engine == "spark":
            return f"(CASE WHEN isnan({x}) THEN {_NAN} ELSE {fn}({x}) END)"
        sign = f"(CASE WHEN {x} < 0.0 THEN -1.0 ELSE 1.0 END)"
        if fn == "sinh":
            body = f"{sign} * (exp(abs({x})) - exp(-abs({x}))) / 2.0"
            big = f"{sign} * {_INF}"
        else:
            body = f"(exp(abs({x})) + exp(-abs({x}))) / 2.0"
            big = _INF
        return (
            f"(CASE WHEN isnan({x}) THEN {_NAN} "
            f"WHEN abs({x}) >= 711.0 THEN {big} ELSE {body} END)"
        )

    def tanh_g(self, x: str) -> str:
        if self.engine == "spark":
            return f"(CASE WHEN isnan({x}) THEN {_NAN} ELSE tanh({x}) END)"
        return (
            f"(CASE WHEN isnan({x}) THEN {_NAN} "
            f"WHEN {x} >= 20.0 THEN 1.0 WHEN {x} <= -20.0 THEN -1.0 "
            f"ELSE (exp(2.0 * {x}) - 1.0) / (exp(2.0 * {x}) + 1.0) END)"
        )

    # ---- function table (JavascriptCompiler.properties)

    def call(self, name: str, args: list[str]) -> str:
        e = self
        table = {
            "abs": (1, lambda a: f"abs({a})"),
            "acos": (1, lambda a: e.dom_g("acos", a)),
            "acosh": (1, e.acosh),
            "asin": (1, lambda a: e.dom_g("asin", a)),
            "asinh": (1, e.asinh),
            "atan": (1, lambda a: f"atan({a})"),
            "atan2": (2, lambda a, b: f"atan2({a}, {b})"),
            "atanh": (1, lambda a: (
                f"(CASE WHEN {a} < 0.0 "
                f"THEN -0.5 * {e.ln_g(e.ieee_div(f'(1.0 - {a})', f'(1.0 + {a})'))} "
                f"ELSE 0.5 * {e.ln_g(e.ieee_div(f'(1.0 + {a})', f'(1.0 - {a})'))} END)"
            )),
            "ceil": (1, lambda a: e.floor_ceil("ceil", a)),
            "cos": (1, lambda a: e.trig_g("cos", a)),
            "cosh": (1, lambda a: e.sinh_cosh("cosh", a)),
            "exp": (1, lambda a: f"exp({a})"),
            "floor": (1, lambda a: e.floor_ceil("floor", a)),
            "haversin": (4, e.haversin),
            "ln": (1, lambda a: e.ln_g(a)),
            "log10": (1, lambda a: e.log10_g(a)),
            "logn": (2, lambda b, a: e.ieee_div(e.ln_g(a), e.ln_g(b))),
            "max": (2, lambda a, b: e.minmax("max", a, b)),
            "min": (2, lambda a, b: e.minmax("min", a, b)),
            "pow": (2, lambda a, b: f"coalesce(power({a}, {b}), {_NAN})"),
            "sin": (1, lambda a: e.trig_g("sin", a)),
            "sinh": (1, lambda a: e.sinh_cosh("sinh", a)),
            "sqrt": (1, lambda a: e.sqrt_g(a)),
            "tan": (1, lambda a: e.trig_g("tan", a)),
            "tanh": (1, lambda a: e.tanh_g(a)),
        }
        if name in self.extra_functions:
            arity, fn = self.extra_functions[name]
            if len(args) != arity:
                raise JsParseError(
                    f"Expected ({arity}) arguments for function call "
                    f"({name}), but found ({len(args)})."
                )
            return fn(self.engine, *args)
        if name not in table:
            raise JsParseError(f"Unrecognized function call ({name}).")
        arity, fn = table[name]
        if len(args) != arity:
            raise JsParseError(
                f"Expected ({arity}) arguments for function call ({name}), "
                f"but found ({len(args)})."
            )
        return fn(*args)

    def acosh(self, a: str) -> str:
        root = self.sqrt_g(f"({a} * {a} - 1.0)")
        return self.ln_g(f"({root} + {a})")

    def asinh(self, a: str) -> str:
        root = self.sqrt_g(f"({a} * {a} + 1.0)")
        neg = self.ln_g(f"({root} - {a})")
        pos = self.ln_g(f"({root} + {a})")
        return (
            f"(CASE WHEN {a} < 0.0 THEN -{neg} ELSE {pos} END)"
        )

    def haversin(self, lat1: str, lon1: str, lat2: str, lon2: str) -> str:
        # SloppyMath.haversinKilometers (SloppyMath.java:76-100) with the
        # true cosine instead of the table-driven approximation and
        # without the 3-low-bit sort-key clobber — declared divergence,
        # bounded by SloppyMath's own ≤0.4 m error budget.
        rad = "0.017453292519943295"  # PI/180, printed exactly
        x1 = f"({lat1} * {rad})"
        x2 = f"({lat2} * {rad})"
        h1 = f"(1.0 - {self.trig_g('cos', f'({x1} - {x2})')})"
        h2 = f"(1.0 - {self.trig_g('cos', f'(({lon1} - {lon2}) * {rad})')})"
        h = (
            f"({h1} + {self.trig_g('cos', x1)} * {self.trig_g('cos', x2)}"
            f" * {h2})"
        )
        root = self.sqrt_g(f"({h} * 0.5)")
        return (
            f"(6371.0087714 * 2.0 * "
            f"{self.dom_g('asin', self.minmax('min', '1.0', root))})"
        )

    # ---- node dispatch

    def emit(self, node, t: str) -> str:
        kind = node[0]
        if kind == "dbl":
            v = node[1]
            if t == "D":
                return _dlit(v)
            return str(_py_d2l(v) if t == "L" else _py_d2i(v))
        if kind == "long":
            v = node[1]
            if t == "D":
                return _dlit(float(v))
            return str(v if t == "L" else _py_l2i(v))
        if kind == "var":
            name = node[1]
            if name not in self.bindings:
                raise JsParseError(f"Unbound variable ({name}).")
            return self.coerce(
                f"CAST({self.bindings[name]} AS DOUBLE)", "D", t
            )
        if kind == "call":
            args = [self.emit(a, "D") for a in node[2]]
            return self.coerce(self.call(node[1], args), "D", t)
        if kind == "un":
            op, child = node[1], node[2]
            if op == "BOOLNOT":
                c = self.emit(child, "I")
                return self.boolean(f"{c} = 0", t)
            if op == "BWNOT":
                c = self.emit(child, "L")
                return self.coerce(self.xor(c, "-1"), "L", t)
            if op == "ADD":
                return self.emit(child, t)
            c = self.emit(child, "D")
            return self.coerce(f"(- ({c}))", "D", t)
        if kind == "cond":
            c = self.emit(node[1], "I")
            a = self.emit(node[2], t)
            b = self.emit(node[3], t)
            return f"(CASE WHEN {c} <> 0 THEN {a} ELSE {b} END)"
        assert kind == "bin"
        op, l, r = node[1], node[2], node[3]
        if op in ("ADD", "SUB", "MUL", "DIV", "REM"):
            a, b = self.emit(l, "D"), self.emit(r, "D")
            if op == "DIV":
                d = self.ieee_div(a, b)
            elif op == "REM":
                d = self.ieee_rem(a, b)
            else:
                sqlop = {"ADD": "+", "SUB": "-", "MUL": "*"}[op]
                d = f"({a} {sqlop} {b})"
            return self.coerce(d, "D", t)
        if op in ("BWAND", "BWOR", "BWXOR"):
            a, b = self.emit(l, "L"), self.emit(r, "L")
            res = (
                self.xor(a, b)
                if op == "BWXOR"
                else f"({a} {'&' if op == 'BWAND' else '|'} {b})"
            )
            return self.coerce(res, "L", t)
        if op in ("LSH", "RSH", "USH"):
            v, s = self.emit(l, "L"), self.emit(r, "I")
            return self.coerce(self.shift(op, v, s), "L", t)
        if op in ("LT", "LTE", "GT", "GTE", "EQ", "NE"):
            a, b = self.emit(l, "D"), self.emit(r, "D")
            return self.boolean(self.java_cmp(a, b, op), t)
        if op in ("BOOLAND", "BOOLOR"):
            a, b = self.emit(l, "I"), self.emit(r, "I")
            glue = "AND" if op == "BOOLAND" else "OR"
            return self.boolean(f"({a} <> 0) {glue} ({b} <> 0)", t)
        raise AssertionError(op)

    def shift(self, op: str, v: str, s: str) -> str:
        if self.engine == "spark":
            fn = {"LSH": "shiftleft", "RSH": "shiftright",
                  "USH": "shiftrightunsigned"}[op]
            # the builtins mask the count by 63 exactly like the JVM
            return f"{fn}(CAST({v} AS BIGINT), CAST({s} AS INT))"
        # DuckDB's native shifts range-check, so model the JVM's
        # wrapping semantics through unsigned HUGEINT arithmetic.
        sm = f"({s} & 63)"
        p = f"(CAST(1 AS HUGEINT) << {sm})"
        u = (
            f"((CAST({v} AS HUGEINT) + 18446744073709551616) "
            f"% 18446744073709551616)"
        )
        if op == "LSH":
            ru = f"(({u} * {p}) % 18446744073709551616)"
            return (
                f"CAST((CASE WHEN {ru} >= 9223372036854775808 "
                f"THEN {ru} - 18446744073709551616 ELSE {ru} END) AS BIGINT)"
            )
        if op == "USH":
            ru = f"({u} // {p})"
            return (
                f"CAST((CASE WHEN {ru} >= 9223372036854775808 "
                f"THEN {ru} - 18446744073709551616 ELSE {ru} END) AS BIGINT)"
            )
        return (
            f"(CASE WHEN {v} >= 0 "
            f"THEN CAST(CAST({v} AS HUGEINT) // {p} AS BIGINT) "
            f"ELSE CAST(-((-CAST({v} AS HUGEINT) + {p} - 1) // {p}) "
            f"AS BIGINT) END)"
        )


# ---------------------------- constant folds used for literal contexts


def _py_d2l(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= 2.0**63:
        return 2**63 - 1
    if x <= -(2.0**63):
        return -(2**63)
    return int(x)


def _py_d2i(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= 2.0**31:
        return 2**31 - 1
    if x <= -(2.0**31):
        return -(2**31)
    return int(x)


def _py_l2i(v: int) -> int:
    u = v & 0xFFFFFFFF
    return u - 0x100000000 if u >= 0x80000000 else u


# ----------------------------------------------------------------- API


@dataclass(frozen=True)
class CompiledExpression:
    source: str
    variables: tuple[str, ...]
    spark_sql: str
    duckdb_sql: str

    def column(self):
        from pyspark.sql import functions as F

        return F.expr(self.spark_sql)


def compile_expression(
    source: str,
    bindings: dict[str, str] | None = None,
    functions: dict | None = None,
) -> CompiledExpression:
    """Compile a Lucene-expressions source string.

    ``bindings`` maps normalized variable names (e.g. ``_score``,
    ``doc['field'].value``) to SQL snippets valid on both engines
    (usually bare column names).  ``functions`` extends the default
    table like JavascriptCompiler.compile(src, functions, loader)
    (JavascriptCompiler.java:140-150): name → (arity,
    emitter(engine, *arg_sqls) -> sql) with double in/out semantics.
    The result's ``spark_sql`` / ``duckdb_sql`` are scalar
    double-valued expressions."""
    ast = _Parser(source).parse()
    names = sorted(_free_vars(ast))
    binds = dict(bindings or {})
    missing = [n for n in names if n not in binds]
    if missing:
        raise JsParseError(
            f"Invalid expression '{source}': unbound variables {missing}"
        )
    return CompiledExpression(
        source=source,
        variables=tuple(names),
        spark_sql=_Emit("spark", binds, functions).emit(ast, "D"),
        duckdb_sql=_Emit("duck", binds, functions).emit(ast, "D"),
    )


def expression_variables(source: str) -> tuple[str, ...]:
    """The expression's free variables (normalized-quote form), sorted —
    what SimpleBindings would need to bind."""
    return tuple(sorted(_free_vars(_Parser(source).parse())))


def _free_vars(node) -> set[str]:
    kind = node[0]
    if kind == "var":
        return {node[1]}
    if kind in ("dbl", "long"):
        return set()
    if kind == "call":
        out = set()
        for a in node[2]:
            out |= _free_vars(a)
        return out
    if kind == "un":
        return _free_vars(node[2])
    if kind == "cond":
        return _free_vars(node[1]) | _free_vars(node[2]) | _free_vars(node[3])
    return _free_vars(node[2]) | _free_vars(node[3])
