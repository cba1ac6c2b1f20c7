"""Lucene expression-language compiler parity tests.

Three layers, mirroring the reference's own test split:

1. the full TestJavascriptOperations vector set (213 expression/value
   pairs extracted from lucene/expressions/src/test/.../
   TestJavascriptOperations.java — the long-overload asserts compare
   through a final d2l cast, replicated here) on BOTH engines;
2. a seeded random-expression sweep over the exact-IEEE operator subset
   (arith, bitwise, shifts, comparisons, logic, ternary, literals,
   variables, abs/min/max/floor/ceil/sqrt) checked bit-for-bit against
   an independent Python model of the JVM bytecode semantics
   (d2l/d2i/l2i casts, NaN comparisons, masked shifts, IEEE div/rem);
3. a per-function edge grid (±0, ±1, ±Inf, NaN, denormal, huge) where
   Spark and DuckDB must agree to 1e-12 relative (transcendental libm
   ulps) with exact NaN/Inf class matches.

Parse-error behavior follows JavascriptCompiler's ParseException cases.
"""

import json
import math
import os
import random

import duckdb
import pytest

from lucene_solr_spark.functions.jsexpr import (
    JsParseError,
    compile_expression,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "jsexpr_operations.json")


# ----------------------------------------------------- JVM-model oracle


def _d2l(x):
    if math.isnan(x):
        return 0
    if x >= 2.0**63:
        return 2**63 - 1
    if x <= -(2.0**63):
        return -(2**63)
    return int(x)


def _d2i(x):
    if math.isnan(x):
        return 0
    if x >= 2.0**31:
        return 2**31 - 1
    if x <= -(2.0**31):
        return -(2**31)
    return int(x)


def _l2i(v):
    u = v & 0xFFFFFFFF
    return u - 0x100000000 if u >= 0x80000000 else u


def _wrap_long(v):
    u = v & 0xFFFFFFFFFFFFFFFF
    return u - 0x10000000000000000 if u >= 0x8000000000000000 else u


def _ieee_div(a, b):
    if b == 0.0 and not math.isnan(b):
        if a == 0.0 or math.isnan(a):
            return math.nan
        return math.copysign(math.inf, 1.0) if (
            (a > 0) == (math.copysign(1.0, b) > 0)
        ) else -math.inf
    return a / b


def _ieee_rem(a, b):
    if b == 0.0 or math.isnan(a) or math.isnan(b) or math.isinf(a):
        return math.nan
    if math.isinf(b):
        return a
    try:
        return math.fmod(a, b)
    except ValueError:
        return math.nan


def _jmin(a, b):
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return min(a, b)


def _jmax(a, b):
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return max(a, b)


def _jfloor(x):
    if math.isnan(x) or abs(x) >= 2.0**52:
        return x
    return float(math.floor(x))


def _jceil(x):
    if math.isnan(x) or abs(x) >= 2.0**52:
        return x
    return float(math.ceil(x))


def _jsqrt(x):
    if math.isnan(x) or x < 0.0:
        return math.nan
    if math.isinf(x):
        return x
    return math.sqrt(x) if x != 0.0 else x


_EXACT_FNS = {
    "abs": (1, lambda a: abs(a)),
    "min": (2, _jmin),
    "max": (2, _jmax),
    "floor": (1, _jfloor),
    "ceil": (1, _jceil),
    "sqrt": (1, _jsqrt),
}


def _ref(node, t, env):
    """Evaluate an AST in expected-type context t ∈ {'D','L','I'},
    mirroring JavascriptCompiler's typeStack discipline."""
    kind = node[0]
    if kind == "dbl":
        v = node[1]
        return v if t == "D" else (_d2l(v) if t == "L" else _d2i(v))
    if kind == "long":
        v = node[1]
        return float(v) if t == "D" else (v if t == "L" else _l2i(v))
    if kind == "var":
        v = env[node[1]]
        return v if t == "D" else (_d2l(v) if t == "L" else _d2i(v))
    if kind == "call":
        arity, fn = _EXACT_FNS[node[1]]
        v = fn(*[_ref(a, "D", env) for a in node[2]])
        return v if t == "D" else (_d2l(v) if t == "L" else _d2i(v))
    if kind == "un":
        op, c = node[1], node[2]
        if op == "BOOLNOT":
            return _boolval(_ref(c, "I", env) == 0, t)
        if op == "BWNOT":
            v = _ref(c, "L", env) ^ -1
            return _from_long(v, t)
        if op == "ADD":
            return _ref(c, t, env)
        v = -_ref(c, "D", env)
        return v if t == "D" else (_d2l(v) if t == "L" else _d2i(v))
    if kind == "cond":
        branch = node[2] if _ref(node[1], "I", env) != 0 else node[3]
        return _ref(branch, t, env)
    op, l, r = node[1], node[2], node[3]
    if op in ("ADD", "SUB", "MUL", "DIV", "REM"):
        a, b = _ref(l, "D", env), _ref(r, "D", env)
        v = {"ADD": lambda: a + b, "SUB": lambda: a - b,
             "MUL": lambda: a * b, "DIV": lambda: _ieee_div(a, b),
             "REM": lambda: _ieee_rem(a, b)}[op]()
        return v if t == "D" else (_d2l(v) if t == "L" else _d2i(v))
    if op in ("BWAND", "BWOR", "BWXOR"):
        a, b = _ref(l, "L", env), _ref(r, "L", env)
        v = a & b if op == "BWAND" else (a | b if op == "BWOR" else a ^ b)
        return _from_long(v, t)
    if op in ("LSH", "RSH", "USH"):
        v, s = _ref(l, "L", env), _ref(r, "I", env) & 63
        if op == "LSH":
            out = _wrap_long(v << s)
        elif op == "RSH":
            out = v >> s
        else:
            out = _wrap_long((v & 0xFFFFFFFFFFFFFFFF) >> s)
        return _from_long(out, t)
    if op in ("LT", "LTE", "GT", "GTE", "EQ", "NE"):
        a, b = _ref(l, "D", env), _ref(r, "D", env)
        if math.isnan(a) or math.isnan(b):
            truth = op == "NE"
        else:
            truth = {"LT": a < b, "LTE": a <= b, "GT": a > b,
                     "GTE": a >= b, "EQ": a == b, "NE": a != b}[op]
        return _boolval(truth, t)
    assert op in ("BOOLAND", "BOOLOR")
    a, b = _ref(l, "I", env), _ref(r, "I", env)
    truth = (a != 0 and b != 0) if op == "BOOLAND" else (a != 0 or b != 0)
    return _boolval(truth, t)


def _boolval(truth, t):
    if t == "D":
        return 1.0 if truth else 0.0
    return 1 if truth else 0


def _from_long(v, t):
    if t == "D":
        return float(v)
    return v if t == "L" else _l2i(v)


def _same_double(a, b):
    if a is None or b is None:
        return False
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == b  # +0.0 vs -0.0 equal: zero signs are a declared divergence


# --------------------------------------------- random exact-expr corpus

_VARS = ["x", "y", "n"]
_ROWS = [
    {"x": 0.0, "y": 1.0, "n": 7.0},
    {"x": -1.5, "y": 2.25, "n": -3.0},
    {"x": 1e9, "y": -0.125, "n": 63.0},
    {"x": -7.75, "y": 1e-9, "n": 1023.0},
    {"x": 5.5, "y": -1e18, "n": 2.0},
    {"x": float("inf"), "y": -2.0, "n": 0.0},
    {"x": float("nan"), "y": 0.5, "n": -64.0},
]


def _gen(rng, depth):
    """Random exact-IEEE expression source (no transcendentals)."""
    if depth <= 0 or rng.random() < 0.25:
        pick = rng.random()
        if pick < 0.35:
            return rng.choice(_VARS)
        if pick < 0.55:
            return rng.choice(
                ["0", "1", "2", "3.5", "0.5", "100", "1e3", "2.25"]
            )
        if pick < 0.70:
            return rng.choice(["0x1F", "0xFF", "0x7fffffffffffffff", "017"])
        return rng.choice(["-1", "-2.5", "-0.25"])
    roll = rng.random()
    a = _gen(rng, depth - 1)
    b = _gen(rng, depth - 1)
    if roll < 0.40:
        op = rng.choice(["+", "-", "*", "/", "%"])
        return f"({a} {op} {b})"
    if roll < 0.55:
        op = rng.choice(["&", "|", "^", "<<", ">>", ">>>"])
        return f"({a} {op} {b})"
    if roll < 0.70:
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        return f"({a} {op} {b})"
    if roll < 0.78:
        op = rng.choice(["&&", "||"])
        return f"({a} {op} {b})"
    if roll < 0.86:
        c = _gen(rng, depth - 1)
        return f"({a} ? {b} : {c})"
    if roll < 0.93:
        op = rng.choice(["!", "~", "-"])
        return f"({op}{a})"
    fn = rng.choice(["abs", "sqrt", "floor", "ceil", "min", "max"])
    if fn in ("min", "max"):
        return f"{fn}({a}, {b})"
    return f"{fn}({a})"


def _corpus(n=400, seed=20260821):
    rng = random.Random(seed)
    return [_gen(rng, rng.randint(1, 4)) for _ in range(n)]


# ---------------------------------------------------------------- tests


def test_golden_operations_duckdb():
    cases = json.load(open(GOLDEN))
    con = duckdb.connect()
    for expr, want in cases:
        got = con.execute(
            "SELECT " + compile_expression(expr).duckdb_sql
        ).fetchone()[0]
        assert _d2l(got) == want, (expr, want, got)


def test_golden_operations_spark(spark):
    cases = json.load(open(GOLDEN))
    sels = ", ".join(
        f"({compile_expression(e).spark_sql}) AS c{i}"
        for i, (e, _) in enumerate(cases)
    )
    row = spark.sql("SELECT " + sels).collect()[0]
    for i, (expr, want) in enumerate(cases):
        assert _d2l(row[i]) == want, (expr, want, row[i])


def test_random_exact_vs_jvm_model_duckdb():
    from lucene_solr_spark.functions.jsexpr import _Parser

    con = duckdb.connect()
    binds = {v: v for v in _VARS}
    for src in _corpus():
        ce = compile_expression(src, binds)
        ast = _Parser(src).parse()
        for env in _ROWS:
            want = _ref(ast, "D", env)
            got = con.execute(
                f"SELECT {ce.duckdb_sql} FROM (SELECT "
                f"CAST('{env['x']!r}' AS DOUBLE) AS x, "
                f"CAST('{env['y']!r}' AS DOUBLE) AS y, "
                f"CAST('{env['n']!r}' AS DOUBLE) AS n)"
            ).fetchone()[0]
            assert _same_double(want, got), (src, env, want, got)


def test_random_exact_vs_jvm_model_spark(spark):
    from lucene_solr_spark.functions.jsexpr import _Parser

    binds = {v: v for v in _VARS}
    corpus = _corpus(n=150)
    compiled = [compile_expression(s, binds) for s in corpus]
    vals = ", ".join(
        "(" + ", ".join(f"CAST('{env[v]!r}' AS DOUBLE)" for v in _VARS) + ")"
        for env in _ROWS
    )
    sels = ", ".join(
        f"({c.spark_sql}) AS c{i}" for i, c in enumerate(compiled)
    )
    rows = spark.sql(
        f"SELECT {sels} FROM (VALUES {vals}) AS t(x, y, n)"
    ).collect()
    assert len(rows) == len(_ROWS)
    for src_i, src in enumerate(corpus):
        ast = _Parser(src).parse()
        for row_i, env in enumerate(_ROWS):
            want = _ref(ast, "D", env)
            got = rows[row_i][src_i]
            assert _same_double(want, got), (src, env, want, got)


_FN_GRID = {
    "abs(v)": None, "acos(v)": None, "acosh(v)": None, "asin(v)": None,
    "asinh(v)": None, "atan(v)": None, "atanh(v)": None, "ceil(v)": None,
    "cos(v)": None, "cosh(v)": None, "exp(v)": None, "floor(v)": None,
    "ln(v)": None, "log10(v)": None, "sin(v)": None, "sinh(v)": None,
    "sqrt(v)": None, "tan(v)": None, "tanh(v)": None,
    "atan2(v, 2.5)": None, "logn(2, v)": None, "max(v, 0.5)": None,
    "min(v, 0.5)": None, "pow(v, 2.5)": None, "pow(2, v)": None,
}

_EDGE_VALUES = [
    0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 100.0, -100.0,
    1e-308, -1e-308, 1e300, -1e300, float("inf"), -float("inf"),
    float("nan"), 0.9999999999999999, 20.5, -20.5, 709.0, -709.0,
]


def test_function_edge_grid_cross_engine(spark):
    con = duckdb.connect()
    binds = {"v": "v"}
    compiled = {src: compile_expression(src, binds) for src in _FN_GRID}
    vals = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in _EDGE_VALUES)
    sels = ", ".join(
        f"({c.spark_sql}) AS c{i}"
        for i, c in enumerate(compiled.values())
    )
    srows = spark.sql(
        f"SELECT {sels} FROM (VALUES {vals}) AS t(v)"
    ).collect()
    for row_i, v in enumerate(_EDGE_VALUES):
        drow = con.execute(
            "SELECT "
            + ", ".join(c.duckdb_sql for c in compiled.values())
            + f" FROM (SELECT CAST('{v!r}' AS DOUBLE) AS v)"
        ).fetchone()
        for fn_i, src in enumerate(compiled):
            s_val, d_val = srows[row_i][fn_i], drow[fn_i]
            assert s_val is not None and d_val is not None, (src, v)
            if math.isnan(s_val) or math.isnan(d_val):
                assert math.isnan(s_val) and math.isnan(d_val), (
                    src, v, s_val, d_val)
            elif math.isinf(s_val) or math.isinf(d_val):
                assert s_val == d_val, (src, v, s_val, d_val)
            else:
                assert s_val == pytest.approx(d_val, rel=1e-12, abs=1e-300), (
                    src, v, s_val, d_val)


def test_haversin_cross_engine_and_spec(spark):
    con = duckdb.connect()
    ce = compile_expression(
        "haversin(40.7143528, -74.0059731, 40.759011, -73.9844722)"
    )
    d = con.execute("SELECT " + ce.duckdb_sql).fetchone()[0]
    s = spark.sql(f"SELECT {ce.spark_sql} AS v").collect()[0][0]
    assert s == pytest.approx(d, rel=1e-12)
    # true-cosine haversine distance of the reference's own test pair
    # (TestExpressionSorts-style NYC coords): ~5.28 km
    assert 5.0 < d < 5.5


def test_variables_and_normalization(spark):
    con = duckdb.connect()
    ce = compile_expression(
        'doc["popularity"].value * 2 + _score',
        {"doc['popularity'].value": "pop", "_score": "sc"},
    )
    assert ce.variables == ("_score", "doc['popularity'].value")
    got = con.execute(
        "SELECT " + ce.duckdb_sql + " FROM (SELECT 3.0 AS pop, 1.5 AS sc)"
    ).fetchone()[0]
    assert got == 7.5
    s = spark.sql(
        f"SELECT {ce.spark_sql} AS v FROM (SELECT 3.0D AS pop, 1.5D AS sc)"
    ).collect()[0][0]
    assert s == 7.5


@pytest.mark.parametrize("bad", [
    "08", "1 +", ")", "(1", "0x10000000000000000", "a b", "", "1 ? 2",
    "unknownfn(1)", "min(1)", "min(1, 2, 3)", "foo.bar(2)", "@", "1..2",
])
def test_parse_errors(bad):
    with pytest.raises(JsParseError):
        compile_expression(bad, {"a": "a", "b": "b"})


def test_unbound_variable_error():
    with pytest.raises(JsParseError, match="unbound"):
        compile_expression("popularity + 1")


def test_truthiness_is_int_truncating(spark):
    # d2i truncation: !0.5 is TRUE in the reference (int cast of 0.5 = 0)
    con = duckdb.connect()
    for src, want in [
        ("!0.5", 1.0), ("!!0.5", 0.0), ("0.5 && 1", 0.0),
        ("0.5 || 0", 0.0), ("1.5 && 2.5", 1.0),
        ("0.5 ? 42 : 7", 7.0), ("-0.99 ? 1 : 2", 2.0),
    ]:
        ce = compile_expression(src)
        assert con.execute("SELECT " + ce.duckdb_sql).fetchone()[0] == want, src
        assert spark.sql(
            f"SELECT {ce.spark_sql} AS v"
        ).collect()[0][0] == want, src


def test_custom_functions(spark):
    # JavascriptCompiler.compile(src, functions) extension point
    # (TestCustomFunctions.java): register cbrt like the javadoc example
    con = duckdb.connect()
    ce = compile_expression(
        "cbrt(x) + 1", {"x": "x"},
        functions={"cbrt": (1, lambda eng, a: f"cbrt({a})")},
    )
    d = con.execute(
        "SELECT " + ce.duckdb_sql + " FROM (SELECT 27.0 AS x)"
    ).fetchone()[0]
    s = spark.sql(
        f"SELECT {ce.spark_sql} AS v FROM (SELECT CAST(27.0 AS DOUBLE) AS x)"
    ).collect()[0][0]
    assert d == pytest.approx(4.0, rel=1e-12)
    assert s == pytest.approx(4.0, rel=1e-12)
    # arity checked like the default table
    with pytest.raises(JsParseError):
        compile_expression(
            "cbrt(1, 2)", functions={"cbrt": (1, lambda e, a: a)}
        )
