"""Solr function-query analogs as composable Spark Column expressions.

The reference registers 101 function-query parsers
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:131-932)
used to compute per-document values inside queries (boost functions,
sort-by-function, pseudo-fields). Everything numeric/logical maps to
JVM-native ``pyspark.sql.functions`` expressions that stay inside
whole-stage codegen — no UDFs anywhere in this module.

Index-statistics functions (``docfreq, idf, tf, norm, …``) are lookups
into this engine's dictionary/norms tables and live with the search
code; this module covers the pure per-row functions.

Each function mirrors the reference semantics documented at its
ValueSourceParser registration:

- ``linear(x,m,c)  = m*x + c``
- ``recip(x,m,a,b) = a / (m*x + b)``      (the classic date-boost shape)
- ``scale(x,lo,hi)``: min-max rescale of x into [lo, hi] — needs the
  column's global min/max; expressed with window-free aggregates by the
  caller or the helper `scale_expr` given precomputed bounds.
- ``map_value(x,min,max,target[,default])``: x in [min,max] → target
- ``strdist(a,b)``: Levenshtein-based similarity in [0,1]
  (1 - dist/max_len), the reference's default edit-distance measure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x):
    return x if isinstance(x, Column) else F.lit(x)


def linear(x, m, c) -> Column:
    """ValueSourceParser.java `linear`: m*x + c."""
    return _c(m) * _c(x) + _c(c)


def recip(x, m, a, b) -> Column:
    """ValueSourceParser.java `recip`: a/(m*x+b)."""
    return _c(a) / (_c(m) * _c(x) + _c(b))


def scale_expr(x, x_min, x_max, lo, hi) -> Column:
    """ValueSourceParser.java `scale`: min-max rescale into [lo,hi] given
    precomputed global bounds (one agg job, broadcast as literals)."""
    span = _c(x_max) - _c(x_min)
    return F.when(
        span == 0, _c(lo)
    ).otherwise(( _c(x) - _c(x_min)) / span * (_c(hi) - _c(lo)) + _c(lo))


def map_value(x, lo, hi, target, default=None) -> Column:
    """ValueSourceParser.java `map`: x in [lo,hi] → target else default
    (default None keeps x)."""
    fallback = _c(x) if default is None else _c(default)
    return F.when(_c(x).between(_c(lo), _c(hi)), _c(target)).otherwise(fallback)


def strdist(a, b) -> Column:
    """ValueSourceParser.java `strdist` (edit-distance flavor): 1 -
    levenshtein/max(len) — similarity in [0,1], 1.0 for equal strings."""
    a, b = _c(a), _c(b)
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / mx
    )


def if_value(cond, then, otherwise) -> Column:
    """ValueSourceParser.java `if`."""
    return F.when(_c(cond), _c(then)).otherwise(_c(otherwise))


def exists(x) -> Column:
    """ValueSourceParser.java `exists`: field has a value."""
    return _c(x).isNotNull()


def def_value(x, fallback) -> Column:
    """ValueSourceParser.java `def`: x, or fallback when missing."""
    return F.coalesce(_c(x), _c(fallback))


def gt_v(a, b) -> Column:
    """ValueSourceParser.java `gt` (ComparisonBoolFunction family,
    registrations alongside lt/gte/lte/eq)."""
    return _c(a) > _c(b)


def lt_v(a, b) -> Column:
    return _c(a) < _c(b)


def gte_v(a, b) -> Column:
    return _c(a) >= _c(b)


def lte_v(a, b) -> Column:
    return _c(a) <= _c(b)


def eq_v(a, b) -> Column:
    return _c(a) == _c(b)


def ms(ts_a, ts_b=None) -> Column:
    """ValueSourceParser.java `ms`: epoch millis, or millis between."""
    a = F.unix_millis(_c(ts_a))
    if ts_b is None:
        return a
    return a - F.unix_millis(_c(ts_b))


def sqedist(xs: list, ys: list) -> Column:
    """ValueSourceParser.java `sqedist`: squared euclidean over columns."""
    out = F.lit(0.0)
    for a, b in zip(xs, ys):
        d = _c(a) - _c(b)
        out = out + d * d
    return out


def dist(power: float, xs: list, ys: list) -> Column:
    """ValueSourceParser.java `dist`: p-norm distance over columns."""
    out = F.lit(0.0)
    for a, b in zip(xs, ys):
        out = out + F.pow(F.abs(_c(a) - _c(b)), F.lit(power))
    return F.pow(out, F.lit(1.0 / power))


# --- vector-distance stream evaluators ------------------------------------
# The reference's io/eval distance family over numeric arrays
# (solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
# EuclideanDistanceEvaluator.java, ManhattanDistanceEvaluator.java,
# ChebyshevDistanceEvaluator.java, CanberraDistanceEvaluator.java —
# each delegates to the commons-math DistanceMeasure of the same name).
# Spark shape: pure higher-order-function Column expressions over the
# array column (zip_with / aggregate / transform) — JVM-side, no Python,
# no explode; at 100 TB each distance is a narrow per-row projection.


def _pairs(a, b):
    """zip two float-array columns into (double, double) structs."""
    return F.zip_with(
        _c(a), _c(b),
        lambda x, y: F.struct(
            x.cast("double").alias("x"), y.cast("double").alias("y")
        ),
    )


def _fsum(arr) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def euclidean_dist(a, b) -> Column:
    """EuclideanDistanceEvaluator: sqrt(sum((a_i-b_i)^2))."""
    return F.sqrt(
        _fsum(F.transform(_pairs(a, b), lambda p: (p.x - p.y) * (p.x - p.y)))
    )


def manhattan_dist(a, b) -> Column:
    """ManhattanDistanceEvaluator: sum(|a_i-b_i|)."""
    return _fsum(F.transform(_pairs(a, b), lambda p: F.abs(p.x - p.y)))


def chebyshev_dist(a, b) -> Column:
    """ChebyshevDistanceEvaluator: max(|a_i-b_i|)."""
    return F.array_max(
        F.transform(_pairs(a, b), lambda p: F.abs(p.x - p.y))
    )


def canberra_dist(a, b) -> Column:
    """CanberraDistanceEvaluator: sum(|a_i-b_i| / (|a_i|+|b_i|)), with
    the commons-math 0/0 -> 0 convention."""
    def term(p):
        den = F.abs(p.x) + F.abs(p.y)
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.abs(p.x - p.y) / den
        )

    return _fsum(F.transform(_pairs(a, b), term))


# --- currency(field, target) ---------------------------------------------


def currency_convert(df, amount_col, currency_col, target: str, rates_df,
                     round_to: int = 2):
    """ValueSourceParser `currency(field, [CODE])` / CurrencyFieldType
    (solr/core/.../schema/CurrencyFieldType.java + CurrencyValueSource):
    convert per-row (amount, currency) into the target currency via an
    exchange-rate provider.

    ``rates_df`` is the provider table (currency, rate) with rates
    expressed per 1 unit of ``target`` — the FileExchangeRateProvider
    analog. It is tiny and broadcast; conversion is one multiply in
    codegen. Returns df plus an ``amount_<target>`` column."""
    amount = amount_col if isinstance(amount_col, Column) else F.col(amount_col)
    cur = currency_col if isinstance(currency_col, Column) else F.col(currency_col)
    r = F.broadcast(
        rates_df.select(
            F.col("currency").alias("_cur"), F.col("rate").alias("_rate")
        )
    )
    out = df.join(r, cur == F.col("_cur"), "left")
    conv = amount.cast("double") / F.col("_rate")
    if round_to is not None:
        conv = F.round(conv, round_to)
    return out.withColumn(f"amount_{target.lower()}", conv).drop(
        "_cur", "_rate"
    )


# --- query() value source / FunctionScoreQuery --------------------------


def true_v() -> Column:
    """ValueSourceParser `true` (BoolConstValueSource)."""
    return F.lit(True)


def false_v() -> Column:
    """ValueSourceParser `false` (BoolConstValueSource)."""
    return F.lit(False)


def field_v(name: str) -> Column:
    """ValueSourceParser `field` — the raw field value as a source."""
    return F.col(name)


def field_select(name: str, selector: str = "min") -> Column:
    """ValueSourceParser `field(name, min|max)` — multivalued field
    selector (MultiValuedDoubleFieldSource / SortedSetSelector): the
    min or max of an array-typed column."""
    if selector == "min":
        return F.array_min(F.col(name))
    if selector == "max":
        return F.array_max(F.col(name))
    raise ValueError(f"unsupported field selector: {selector!r}")


def query_boost(main, sub, factor: float = 1.0, default: float = 0.0,
                round_to: int | None = 4):
    """Solr ``query($q, default)`` value source composed into Lucene's
    FunctionScoreQuery.boostByQuery shape: the subquery's per-doc score
    becomes a value (``default`` where the doc doesn't match) and the
    main query's score is multiplied by ``(1 + factor * value)``.

    References: solr/core/.../search/ValueSourceParser.java ``query``
    registration (QueryValueSource, defVal) and lucene/queries/.../
    function/FunctionScoreQuery.java#boostByQuery.

    ``main`` and ``sub`` are per-doc score DataFrames (doc_id, score).
    Equi-join on doc_id — co-partitionable at scale; the optimizer
    picks broadcast when the boost query is selective. ``round_to``
    quantizes both inputs and the product for cross-engine parity."""
    s = sub.select(F.col("doc_id"), F.col("score").alias("_qval"))
    m = main.select("doc_id", "score")
    if round_to is not None:
        s = s.withColumn("_qval", F.round("_qval", round_to))
        m = m.withColumn("score", F.round("score", round_to))
    out = m.join(s, "doc_id", "left").select(
        "doc_id",
        (
            F.col("score")
            * (1.0 + factor * F.coalesce(F.col("_qval"), F.lit(default)))
        ).alias("score"),
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


# --- arithmetic / math family -------------------------------------------
# ValueSourceParser.java registrations: sum, sub, product, div, mod, abs,
# log, ln, sqrt, cbrt, pow, exp, atan2, hypot, max, min (each a direct
# whole-stage-codegen Column expression; multi-arg where the reference
# parser accepts varargs).


def add_v(*xs) -> Column:
    """`sum(a,b,...)` function query (SumFloatFunction)."""
    out = _c(xs[0])
    for x in xs[1:]:
        out = out + _c(x)
    return out


def sub_v(a, b) -> Column:
    """`sub(a,b)` (DualFloatFunction '-')."""
    return _c(a) - _c(b)


def product_v(*xs) -> Column:
    """`product(a,b,...)` (ProductFloatFunction)."""
    out = _c(xs[0])
    for x in xs[1:]:
        out = out * _c(x)
    return out


def div_v(a, b) -> Column:
    """`div(a,b)` (DivFloatFunction)."""
    return _c(a) / _c(b)


def mod_v(a, b) -> Column:
    """`mod(a,b)`."""
    return _c(a) % _c(b)


def abs_v(x) -> Column:
    return F.abs(_c(x))


def log_v(x) -> Column:
    """`log(x)` — base-10 in Solr function queries."""
    return F.log10(_c(x))


def ln_v(x) -> Column:
    return F.log(_c(x))


def sqrt_v(x) -> Column:
    return F.sqrt(_c(x))


def cbrt_v(x) -> Column:
    return F.cbrt(_c(x))


def pow_v(a, b) -> Column:
    return F.pow(_c(a), _c(b))


def exp_v(x) -> Column:
    return F.exp(_c(x))


def atan2_v(y, x) -> Column:
    return F.atan2(_c(y), _c(x))


def hypot_v(a, b) -> Column:
    """`hypot(a,b)` spelled sqrt(a²+b²) so the SQL oracle mirrors the
    exact expression tree (DuckDB has no hypot builtin)."""
    a, b = _c(a), _c(b)
    return F.sqrt(a * a + b * b)


def max_v(*xs) -> Column:
    return F.greatest(*[_c(x) for x in xs])


def min_v(*xs) -> Column:
    return F.least(*[_c(x) for x in xs])


# --- boolean family ------------------------------------------------------
# ValueSourceParser.java: and, or, not, xor (BoolFunction registrations).


def and_v(*cs) -> Column:
    out = _c(cs[0])
    for c in cs[1:]:
        out = out & _c(c)
    return out


def or_v(*cs) -> Column:
    out = _c(cs[0])
    for c in cs[1:]:
        out = out | _c(c)
    return out


def not_v(c) -> Column:
    return ~_c(c)


def xor_v(a, b) -> Column:
    return _c(a) != _c(b)


# --- trig / hyperbolic / rounding family ---------------------------------
# ValueSourceParser.java registers the java.lang.Math single-arg family:
# sin cos tan asin acos atan sinh cosh tanh ceil floor rint deg rad pi e
# (DualFloatFunction/SimpleFloatFunction registrations ~line 400-520).


def sin_v(x) -> Column:
    return F.sin(_c(x))


def cos_v(x) -> Column:
    return F.cos(_c(x))


def tan_v(x) -> Column:
    return F.tan(_c(x))


def asin_v(x) -> Column:
    return F.asin(_c(x))


def acos_v(x) -> Column:
    return F.acos(_c(x))


def atan_v(x) -> Column:
    return F.atan(_c(x))


def sinh_v(x) -> Column:
    """sinh spelled (e^x - e^-x)/2: the SQL oracle engine has no sinh
    builtin, so both engines evaluate the identical expression tree."""
    x = _c(x)
    return (F.exp(x) - F.exp(-x)) / 2


def cosh_v(x) -> Column:
    x = _c(x)
    return (F.exp(x) + F.exp(-x)) / 2


def tanh_v(x) -> Column:
    """tanh spelled (e^2x - 1)/(e^2x + 1) — same oracle-parity reason."""
    x = _c(x)
    e2x = F.exp(x * 2)
    return (e2x - 1) / (e2x + 1)


def ceil_v(x) -> Column:
    return F.ceil(_c(x)).cast("long")


def floor_v(x) -> Column:
    return F.floor(_c(x)).cast("long")


def deg_v(x) -> Column:
    return F.degrees(_c(x))


def rad_v(x) -> Column:
    return F.radians(_c(x))


def pi_v() -> Column:
    return F.lit(3.141592653589793)


def e_v() -> Column:
    return F.lit(2.718281828459045)


def concat_v(*xs) -> Column:
    """concat(...) ValueSource (ConcatStringFunction)."""
    return F.concat(*[x if isinstance(x, Column) else F.lit(x) for x in xs])


def ord_map(df, col: str):
    """`ord(field)` / `rord(field)` (OrdFieldSource): 1-based ordinal of
    the row's value within the field's sorted distinct domain. Returns a
    (value, ord, rord) mapping DataFrame — callers broadcast-join it
    back. The ordinal itself is assigned with the range-partition +
    driver-prefix-sum pattern (index/docid.py) — a distributed sort of
    the distinct domain with one scalar per partition on the driver —
    never a partition-less rank window, so an unbounded domain (e.g.
    ord over a string id field) still parallelizes."""
    from ..index.docid import with_doc_ids

    dom = df.select(F.col(col).alias("val")).distinct()
    ranked = with_doc_ids(dom, order_cols=("val",), id_col="_ord0").select(
        "val", (F.col("_ord0") + 1).cast("long").alias("ord")
    )
    n = ranked.agg(F.max("ord").alias("n_vals"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "val", "ord", (F.col("n_vals") - F.col("ord") + 1).alias("rord")
    )


def index_stat_values(tables, term: str) -> "DataFrame":
    """The index-statistic ValueSource family over one term
    (ValueSourceParser.java registrations: ``termfreq(f,t)``,
    ``tf(f,t)``, ``docfreq(f,t)``, ``totaltermfreq(f,t)``, ``idf``,
    ``numdocs()``, ``maxdoc()``, ``sumtotaltermfreq(f)``, plus the
    per-doc field length behind ``norm(f)``):

    → DataFrame(doc_id, termfreq, tf_classic, idf, dl, docfreq,
    totaltermfreq, numdocs, sumttf) — one row per doc containing the
    term. tf_classic = sqrt(freq) and idf = 1 + ln((N+1)/(df+1)) follow
    ClassicSimilarity (reference lucene/core/.../search/similarities/
    ClassicSimilarity.java:40-55, TFIDFSimilarity.java).

    Scale shape: postings pruned to ONE term (df-bounded), the term's
    dictionary row broadcast, corpus constants are driver-side metadata
    — no corpus-wide work at all."""
    stats = tables.dictionary.filter(F.col("term") == term).select(
        F.col("df").cast("long").alias("docfreq"),
        F.col("cf").cast("long").alias("totaltermfreq"),
    )
    hits = tables.postings.filter(F.col("term") == term).select(
        "doc_id", "freq"
    )
    n = int(tables.doc_count)
    return (
        hits.join(tables.norms.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.col("freq").cast("long").alias("termfreq"),
            F.round(F.sqrt(F.col("freq")), 6).alias("tf_classic"),
            F.round(
                F.lit(1.0)
                + F.log((n + 1.0) / (F.col("docfreq") + F.lit(1.0))),
                6,
            ).alias("idf"),
            F.col("dl").cast("long").alias("dl"),
            "docfreq",
            "totaltermfreq",
            F.lit(n).cast("long").alias("numdocs"),
            F.lit(int(tables.sum_total_term_freq)).cast("long").alias("sumttf"),
        )
    )


GEO_MEAN_RADIUS_KM = 6371.0087714  # solr/core/.../util/DistanceUnits.java EARTH_MEAN_RADIUS


def geodist(lat1, lon1, lat2, lon2) -> Column:
    """ValueSourceParser.java `geodist`/`hsin`: great-circle haversine
    distance in km (reference solr/core/src/java/org/apache/solr/search/
    function/distance/HaversineFunction.java:36-80). Written with
    sin*sin (not pow) so the DuckDB oracle mirrors the exact IEEE
    expression tree."""
    rlat1, rlat2 = F.radians(_c(lat1)), F.radians(_c(lat2))
    hlat = F.sin(F.radians(_c(lat2) - _c(lat1)) / 2)
    hlon = F.sin(F.radians(_c(lon2) - _c(lon1)) / 2)
    h = hlat * hlat + F.cos(rlat1) * F.cos(rlat2) * hlon * hlon
    return F.lit(2.0 * GEO_MEAN_RADIUS_KM) * F.asin(F.sqrt(h))


def hsin(radius, lat1, lon1, lat2, lon2, convert: bool = False) -> Column:
    """ValueSourceParser.java `hsin(radius, convert, p1, p2)`
    (function/distance/HaversineFunction.java:70): haversine arc in
    RADIUS units over RADIAN coordinates (``convert=True`` converts
    degree inputs first, mirroring convertToRadians)."""
    if convert:
        lat1, lon1 = F.radians(_c(lat1)), F.radians(_c(lon1))
        lat2, lon2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    else:
        lat1, lon1 = _c(lat1), _c(lon1)
        lat2, lon2 = _c(lat2), _c(lon2)
    hy = F.sin((lat1 - lat2) / 2)
    hx = F.sin((lon1 - lon2) / 2)
    h = F.least(hy * hy + F.cos(lat1) * F.cos(lat2) * hx * hx, F.lit(1.0))
    return _c(radius) * F.lit(2.0) * F.atan2(F.sqrt(h), F.sqrt(1 - h))


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH_BITS = 30  # 12 base-32 chars = 60 interleaved bits


def _geo_quant(coord, lo: float, span: float):
    """Quantize a coordinate to a _GEOHASH_BITS-bit integer cell; the
    arithmetic ((c - lo)/span * 2^30, floored, clamped) is exact in
    float64 and reproduced verbatim by the DuckDB oracle."""
    scaled = F.floor((_c(coord) - F.lit(lo)) / F.lit(span)
                     * F.lit(float(1 << _GEOHASH_BITS)))
    return F.least(F.greatest(scaled, F.lit(0)),
                   F.lit((1 << _GEOHASH_BITS) - 1)).cast("long")


def _geo_bit(q, m: int) -> Column:
    # bit m (0 = MSB) via exact double arithmetic (q < 2^30):
    # floor(q / 2^(29-m)) % 2 — the form both engines share
    return (F.floor(q / F.lit(float(1 << (_GEOHASH_BITS - 1 - m))))
            .cast("long") % 2)


def geohash_encode(lat, lon, precision: int = 12) -> Column:
    """ValueSourceParser.java `geohash(lat, lon)` (GeohashFunction.java
    → spatial4j GeohashUtils.encodeLatLon, default 12 chars): standard
    base-32 geohash by bit-interleaving the quantized lon (even bits)
    and lat (odd bits). spatial4j quantizes by successive interval
    halving; this closed form is the same cell except at exact binary
    cell boundaries (declared — spatial4j is an external dependency,
    not reference source)."""
    ix = _geo_quant(lon, -180.0, 360.0)
    iy = _geo_quant(lat, -90.0, 180.0)
    chars = []
    for k in range(precision):
        idx = F.lit(0).cast("long")
        for t in range(5):
            p = 5 * k + t
            src, m = (ix, p // 2) if p % 2 == 0 else (iy, (p - 1) // 2)
            idx = idx + _geo_bit(src, m) * F.lit(1 << (4 - t))
        chars.append(F.substring(F.lit(GEOHASH_BASE32),
                                 (idx + 1).cast("int"), 1))
    return F.concat(*chars)


def geohash_center(lat, lon) -> tuple:
    """(lat, lon) of the geohash cell center at full 30-bit precision
    (GeohashUtils.decode returns the cell midpoint)."""
    ix = _geo_quant(lon, -180.0, 360.0)
    iy = _geo_quant(lat, -90.0, 180.0)
    clat = (iy.cast("double") + 0.5) / float(1 << _GEOHASH_BITS) \
        * 180.0 - 90.0
    clon = (ix.cast("double") + 0.5) / float(1 << _GEOHASH_BITS) \
        * 360.0 - 180.0
    return clat, clon


def ghhsin(radius, lat1, lon1, lat2, lon2) -> Column:
    """ValueSourceParser.java `ghhsin(radius, gh1, gh2)`
    (GeohashHaversineFunction.java): haversine between the CELL
    CENTERS of the two points' geohashes (degree inputs, radian
    haversine × radius)."""
    c1lat, c1lon = geohash_center(lat1, lon1)
    c2lat, c2lon = geohash_center(lat2, lon2)
    return hsin(radius, c1lat, c1lon, c2lat, c2lon, convert=True)
