"""Array / time-series stream evaluators as higher-order Column exprs.

The reference ships an array-manipulation evaluator family in
solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
(AscEvaluator, DescribeEvaluator, ReverseEvaluator, LengthEvaluator,
ValueAtEvaluator, SequenceEvaluator, MovingAverageEvaluator,
TimeDifferencingEvaluator, …) operating on per-tuple numeric lists.

Spark shape: every evaluator is a pure higher-order-function Column
expression (transform / aggregate / slice / sequence) over an
``array<double>`` column — JVM-side, no explode, no Python. At 100 TB
each is a narrow per-row projection; the arrays themselves never
shuffle unless the caller groups them.

Semantics pinned to the reference implementations:
- ``moving_avg(arr, w)`` (MovingAverageEvaluator.java:50-63): emit the
  window mean only once the slider holds ``w`` values → output length
  ``n - w + 1``; means are plain ``sum/w`` doubles.
- ``ts_diff(arr, lag)`` (TimeDifferencingEvaluator): ``arr[i] -
  arr[i-lag]`` for ``i >= lag`` → output length ``n - lag``.
- ``value_at(arr, i)`` (ValueAtEvaluator): **0-based** index, null when
  out of range (Spark's element_at is 1-based — adjusted here).
- ``sequence_v(len, start, stride)`` (SequenceEvaluator): arithmetic
  sequence of ``len`` terms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as _T
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x):
    return x if isinstance(x, Column) else F.lit(x)


def asc_v(arr) -> Column:
    """AscEvaluator: sort ascending."""
    return F.array_sort(_c(arr))


def desc_v(arr) -> Column:
    """DescEvaluator: sort descending."""
    return F.reverse(F.array_sort(_c(arr)))


def rev_v(arr) -> Column:
    """ReverseEvaluator."""
    return F.reverse(_c(arr))


def length_v(arr) -> Column:
    """LengthEvaluator."""
    return F.size(_c(arr))


def value_at(arr, i) -> Column:
    """ValueAtEvaluator: 0-based indexing, null when out of range
    (try_element_at — Spark 4's ANSI element_at throws instead)."""
    return F.try_element_at(_c(arr), _c(i) + F.lit(1))


def sequence_v(length, start, stride) -> Column:
    """SequenceEvaluator: `length` terms start, start+stride, …"""
    length, start, stride = _c(length), _c(start), _c(stride)
    return F.sequence(
        start, start + (length - 1) * stride, stride
    )


def moving_avg(arr, window: int) -> Column:
    """MovingAverageEvaluator: means of each full trailing window."""
    arr = _c(arr)
    w = int(window)
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - F.lit(w - 1)),
        lambda i: F.aggregate(
            F.slice(arr, i, w), F.lit(0.0), lambda acc, v: acc + v
        )
        / F.lit(float(w)),
    )


def ts_diff(arr, lag: int = 1) -> Column:
    """TimeDifferencingEvaluator: lag-n first differences."""
    arr = _c(arr)
    n = int(lag)
    return F.transform(
        F.sequence(F.lit(n + 1), F.size(arr)),
        lambda i: F.element_at(arr, i) - F.element_at(arr, i - F.lit(n)),
    )


def sum_v(arr) -> Column:
    """AddEvaluator over a list / SumSqEvaluator building block."""
    return F.aggregate(_c(arr), F.lit(0.0), lambda acc, v: acc + v)


# ---------------------------------------------------------------------
# Scalar math evaluator family (solr/solrj/.../io/eval/): each name
# maps 1:1 to a reference evaluator file; all are native Column exprs
# (whole-stage-codegen'd, no UDF).
#   AbsoluteValue, Ceiling, Floor, Round, SquareRoot, CubedRoot, Power,
#   NaturalLog (log), Log10, Natural (e^x), Sine, Cosine, Tangent,
#   ArcSine, ArcCosine, ArcTangent, HyperbolicSine, HyperbolicCosine,
#   HyperbolicTangent, Modulo, Factorial, BinomialCoefficient,
#   Precision Evaluator.java
# ---------------------------------------------------------------------

def binomial_coefficient(n, k) -> Column:
    """BinomialCoefficientEvaluator: C(n, k) via factorial ratio
    (exact for the small-int domain the evaluator targets)."""
    n, k = _c(n), _c(k)
    return (F.factorial(n) / (F.factorial(k) * F.factorial(n - k)))


def precision_v(x, digits) -> Column:
    """PrecisionEvaluator: round to the given number of decimal
    places (reference delegates to Apache commons Precision.round)."""
    return F.round(_c(x), digits)


SCALAR_EVALUATORS = {
    # name -> Column builder (reference file: <Name>Evaluator.java)
    "abs": F.abs,                       # AbsoluteValueEvaluator
    "ceil": F.ceil,                     # CeilingEvaluator
    "floor": F.floor,                   # FloorEvaluator
    "round": F.round,                   # RoundEvaluator
    "sqrt": F.sqrt,                     # SquareRootEvaluator
    "cbrt": F.cbrt,                     # CubedRootEvaluator
    "pow": F.pow,                       # PowerEvaluator
    "log": F.log,                       # NaturalLogEvaluator
    "log10": F.log10,                   # Log10Evaluator
    "natural": F.exp,                   # NaturalEvaluator (e^x)
    "sin": F.sin,                       # SineEvaluator
    "cos": F.cos,                       # CosineEvaluator
    "tan": F.tan,                       # TangentEvaluator
    "asin": F.asin,                     # ArcSineEvaluator
    "acos": F.acos,                     # ArcCosineEvaluator
    "atan": F.atan,                     # ArcTangentEvaluator
    "sinh": F.sinh,                     # HyperbolicSineEvaluator
    "cosh": F.cosh,                     # HyperbolicCosineEvaluator
    "tanh": F.tanh,                     # HyperbolicTangentEvaluator
    "mod": lambda a, b: _c(a) % _c(b),  # ModuloEvaluator
    "factorial": F.factorial,           # FactorialEvaluator
    "binomialCoefficient": binomial_coefficient,
    "precision": precision_v,           # PrecisionEvaluator
}


# ---------------------------------------------------------------------
# Array / vector evaluator family — higher-order Column exprs.
# ---------------------------------------------------------------------

def append_v(arr, x) -> Column:
    """AppendEvaluator: arr with x appended."""
    return F.concat(_c(arr), F.array(_c(x)))


def copy_of(arr, length) -> Column:
    """CopyOfEvaluator: first ``length`` elements (padding semantics
    not needed for numeric streams — reference truncates likewise when
    shorter)."""
    return F.slice(_c(arr), 1, length)


def copy_of_range(arr, start, end) -> Column:
    """CopyOfRangeEvaluator: elements [start, end) — 0-based like the
    reference (java.util.Arrays.copyOfRange)."""
    return F.slice(_c(arr), int(start) + 1, int(end) - int(start))


def left_shift(arr, n) -> Column:
    """LeftShiftEvaluator: drop the first n values."""
    a = _c(arr)
    return F.slice(a, int(n) + 1, F.size(a) - int(n))


def right_shift(arr, n) -> Column:
    """RightShiftEvaluator: drop the last n values."""
    a = _c(arr)
    return F.slice(a, 1, F.size(a) - int(n))


def repeat_v(x, n) -> Column:
    """RepeatEvaluator: n copies of x."""
    return F.array_repeat(_c(x), int(n))


def zeros_v(n) -> Column:
    """ZerosEvaluator."""
    return F.array_repeat(F.lit(0.0), int(n))


def ones_v(n) -> Column:
    """OnesEvaluator."""
    return F.array_repeat(F.lit(1.0), int(n))


def dot_product(a, b) -> Column:
    """DotProductEvaluator."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)


def l1_norm(arr) -> Column:
    """L1NormEvaluator: sum of absolute values."""
    return F.aggregate(_c(arr), F.lit(0.0), lambda acc, v: acc + F.abs(v))


def l2_norm(arr) -> Column:
    """NormEvaluator: Euclidean norm."""
    return F.sqrt(F.aggregate(
        _c(arr), F.lit(0.0), lambda acc, v: acc + v * v))


def linf_norm(arr) -> Column:
    """LInfNormEvaluator: max absolute value."""
    return F.array_max(F.transform(_c(arr), F.abs))


def cosine_similarity(a, b) -> Column:
    """CosineSimilarityEvaluator: dot / (|a| |b|)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def grand_sum(arr) -> Column:
    """GrandSumEvaluator (vector degenerate of the matrix sum)."""
    return sum_v(arr)


def mean_v(arr) -> Column:
    """MeanEvaluator."""
    a = _c(arr)
    return sum_v(a) / F.size(a)


def normalize_v(arr) -> Column:
    """NormalizeEvaluator: z-score standardization (commons-math
    StatUtils.normalize — SAMPLE standard deviation, n-1)."""
    a = _c(arr)
    mu = mean_v(a)
    var = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + (v - mu) * (v - mu)
    ) / (F.size(a) - 1)
    sd = F.sqrt(var)
    return F.transform(a, lambda v: (v - mu) / sd)


def min_max_scale(arr, lo=0.0, hi=1.0) -> Column:
    """MinMaxScaleEvaluator: rescale into [lo, hi]."""
    a = _c(arr)
    mn, mx = F.array_min(a), F.array_max(a)
    return F.transform(
        a, lambda v: (v - mn) / (mx - mn) * (_c(hi) - _c(lo)) + _c(lo))


def unitize(arr) -> Column:
    """UnitEvaluator: scale to unit L2 norm."""
    a = _c(arr)
    n = l2_norm(a)
    return F.transform(a, lambda v: v / n)


def ebe_add(a, b) -> Column:
    """EBEAddEvaluator (element-by-element)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x + y)


def ebe_subtract(a, b) -> Column:
    """EBESubtractEvaluator."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x - y)


def ebe_multiply(a, b) -> Column:
    """EBEMultiplyEvaluator."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x * y)


def ebe_divide(a, b) -> Column:
    """EBEDivideEvaluator."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x / y)


def scalar_add(x, arr) -> Column:
    """ScalarAddEvaluator."""
    return F.transform(_c(arr), lambda v: v + _c(x))


def scalar_multiply(x, arr) -> Column:
    """ScalarMultiplyEvaluator."""
    return F.transform(_c(arr), lambda v: v * _c(x))


def rank_v(arr) -> Column:
    """RankEvaluator: 1-based fractional ranking (commons-math
    NaturalRanking, ties averaged)."""
    a = _c(arr)
    return F.transform(a, lambda v: (
        F.aggregate(a, F.lit(0.0),
                    lambda acc, w: acc + F.when(w < v, 1.0).otherwise(0.0))
        + (F.aggregate(a, F.lit(0.0),
                       lambda acc, w: acc
                       + F.when(w == v, 1.0).otherwise(0.0)) + 1.0) / 2.0
    ))


# ---------------------------------------------------------------------
# Temporal evaluator family (TemporalEvaluator*.java): field extraction
# from a date/timestamp column. epoch_seconds is TZ-free (days since
# 1970-01-01 × 86400; the reference's TemporalEvaluatorEpoch returns
# the same instant in millis).
# ---------------------------------------------------------------------

def day_of_quarter(d) -> Column:
    """TemporalEvaluatorDayOfQuarter: 1-based day within the quarter."""
    d = _c(d)
    return F.datediff(d, F.trunc(d, "quarter")) + 1


def epoch_seconds(d) -> Column:
    """TemporalEvaluatorEpoch (seconds at UTC midnight for dates)."""
    return F.datediff(_c(d), F.lit("1970-01-01")).cast("long") * 86400


TEMPORAL_EVALUATORS = {
    "year": F.year,                    # TemporalEvaluatorYear
    "month": F.month,                  # TemporalEvaluatorMonth
    "day": F.dayofmonth,               # TemporalEvaluatorDay
    "dayOfYear": F.dayofyear,          # TemporalEvaluatorDayOfYear
    "dayOfQuarter": day_of_quarter,    # TemporalEvaluatorDayOfQuarter
    "hour": F.hour,                    # TemporalEvaluatorHour
    "minute": F.minute,                # TemporalEvaluatorMinute
    "second": F.second,                # TemporalEvaluatorSecond
    "week": F.weekofyear,              # TemporalEvaluatorWeek (ISO)
    "quarter": F.quarter,              # TemporalEvaluatorQuarter
    "epoch": epoch_seconds,            # TemporalEvaluatorEpoch
}


# ---------------------------------------------------------------------
# Matrix evaluator family (Matrix.java + {Matrix,Transpose,MatrixMultiply,
# SumRows,SumColumns,RowAt,ColumnAt,RowCount,ColumnCount}Evaluator.java):
# a matrix is an array<array<double>> Column; every op is a nested
# higher-order-function expression — JVM-side, no UDF, no explode.
# ---------------------------------------------------------------------

def row_count(m) -> Column:
    """RowCountEvaluator."""
    return F.size(_c(m))


def column_count(m) -> Column:
    """ColumnCountEvaluator."""
    return F.size(F.element_at(_c(m), 1))


def row_at(m, i) -> Column:
    """RowAtEvaluator (0-based, like the reference)."""
    return F.element_at(_c(m), int(i) + 1)


def column_at(m, j) -> Column:
    """ColumnAtEvaluator (0-based)."""
    return F.transform(_c(m), lambda row: F.element_at(row, int(j) + 1))


def transpose_m(m) -> Column:
    """TransposeEvaluator."""
    m = _c(m)
    return F.transform(
        F.sequence(F.lit(1), column_count(m)),
        lambda j: F.transform(m, lambda row: F.element_at(row, j)),
    )


def sum_rows(m) -> Column:
    """SumRowsEvaluator: per-row sums."""
    return F.transform(_c(m), sum_v)


def sum_columns(m) -> Column:
    """SumColumnsEvaluator: per-column sums."""
    return sum_rows(transpose_m(m))


def grand_sum_m(m) -> Column:
    """GrandSumEvaluator over a matrix."""
    return sum_v(sum_rows(m))


def matrix_mult(a, b) -> Column:
    """MatrixMultiplyEvaluator: result[i][k] = Σ_j a[i][j]·b[j][k]."""
    bt = transpose_m(b)
    return F.transform(
        _c(a), lambda row: F.transform(bt, lambda col: dot_product(row, col)))


# ---------------------------------------------------------------------
# Signal / frequency evaluator family.
# ---------------------------------------------------------------------

def convolve_v(a, b) -> Column:
    """ConvolutionEvaluator (commons-math MathArrays.convolve): full
    convolution, output length n+m-1; out[k] = Σ_i a[i]·b[k-i]."""
    a, b = _c(a), _c(b)
    n, m = F.size(a), F.size(b)
    return F.transform(
        F.sequence(F.lit(1), n + m - 1),
        lambda k: F.aggregate(
            F.sequence(F.greatest(F.lit(1), k - m + 1), F.least(n, k)),
            F.lit(0.0),
            lambda acc, i: acc + F.element_at(a, i)
            * F.element_at(b, (k - i + 1).cast("int")),
        ),
    )


def find_delay(a, b) -> Column:
    """FindDelayEvaluator: convolve a with reverse(b), take the FIRST
    index of max |value| (strict > scan), return (idx+1) - len(b)."""
    b = _c(b)
    conv = convolve_v(a, F.reverse(b))
    best = F.aggregate(
        F.sequence(F.lit(1), F.size(conv)),
        F.struct(F.lit(0).alias("i"), F.lit(float("-inf")).alias("v")),
        lambda acc, k: F.when(
            F.abs(F.element_at(conv, k)) > acc.v,
            F.struct(k.alias("i"),
                     F.abs(F.element_at(conv, k)).alias("v")),
        ).otherwise(acc),
    )
    return (best.i - F.size(b)).cast("double")


def mode_v(arr) -> Column:
    """ModeEvaluator (commons-math StatUtils.mode): every value whose
    frequency equals the max frequency, ascending."""
    a = _c(arr)

    def cnt(v):
        return F.aggregate(
            a, F.lit(0),
            lambda acc, w: acc + F.when(w == v, 1).otherwise(0))

    maxc = F.array_max(F.transform(a, cnt))
    return F.array_sort(
        F.array_distinct(F.filter(a, lambda v: cnt(v) == maxc)))


def freq_table_count(arr, v) -> Column:
    """FrequencyTableEvaluator probe: occurrence count of one value."""
    return F.aggregate(
        _c(arr), F.lit(0),
        lambda acc, w: acc + F.when(w == _c(v), 1).otherwise(0))


def pair_sort(x, y) -> Column:
    """PairSortEvaluator: sort (x,y) pairs by x then y ascending;
    returns the 2×n matrix [sorted-x, sorted-y] (PairComp semantics)."""
    pairs = F.array_sort(F.zip_with(
        _c(x), _c(y), lambda a, b: F.struct(a.alias("x"), b.alias("y"))))
    return F.array(
        F.transform(pairs, lambda p: p.x),
        F.transform(pairs, lambda p: p.y),
    )


# ---------------------------------------------------------------------
# Distribution evaluator family ({Normal,Binomial,Poisson,Geometric,
# UniformReal}DistributionEvaluator + CumulativeProbabilityEvaluator /
# ProbabilityEvaluator — all delegating to commons-math3). pmf/cdf
# formulas are native Column exprs; the normal CDF needs erf, which has
# no JVM SQL builtin — Arrow-batched math.erf (matches commons-math's
# Erf at double precision; the gate compares at 6dp).
# ---------------------------------------------------------------------

_erf_udf_cache = None


def _erf_udf():
    """Lazily-built Arrow erf UDF (pandas_udf parses its DDL return
    type against the ACTIVE session, so it cannot be built at import)."""
    global _erf_udf_cache
    if _erf_udf_cache is None:
        @F.pandas_udf("double")
        def _erf(z: pd.Series) -> pd.Series:
            import math

            return z.map(math.erf)

        _erf_udf_cache = _erf
    return _erf_udf_cache


def normal_cdf(x, mu, sd) -> Column:
    """NormalDistribution(mu, sd).cumulativeProbability(x)."""
    import math as _math

    z = (_c(x) - _c(mu)) / (_c(sd) * _math.sqrt(2.0))
    return 0.5 * (F.lit(1.0) + _erf_udf()(z))


def choose_double(n, k) -> Column:
    """C(n, k) as a double product Π_{i=1..k} (n-k+i)/i — overflow-free
    far beyond factorial's long range (n=50 needs ~2^46)."""
    n, k = _c(n), _c(k)
    prod = F.aggregate(
        F.sequence(F.lit(1), k), F.lit(1.0),
        lambda acc, i: acc * (n - k + i).cast("double") / i.cast("double"))
    return F.when(k == 0, F.lit(1.0)).otherwise(prod)


def binomial_pmf(n, p, k) -> Column:
    """BinomialDistribution(n, p).probability(k)."""
    n, p, k = _c(n), _c(p), _c(k)
    return (choose_double(n, k)
            * F.pow(p, k.cast("double"))
            * F.pow(F.lit(1.0) - p, (n - k).cast("double")))


def poisson_pmf(lam, k) -> Column:
    """PoissonDistribution(lam).probability(k)."""
    lam, k = _c(lam), _c(k)
    return (F.exp(-lam) * F.pow(lam, k.cast("double"))
            / F.factorial(k))


def geometric_cdf(p, k) -> Column:
    """GeometricDistribution(p).cumulativeProbability(k):
    1 - (1-p)^(k+1) (failures-before-first-success parameterization)."""
    p, k = _c(p), _c(k)
    return F.lit(1.0) - F.pow(F.lit(1.0) - p, (k + 1).cast("double"))


def uniform_cdf(lo, hi, x) -> Column:
    """UniformRealDistribution(lo, hi).cumulativeProbability(x)."""
    lo, hi, x = _c(lo), _c(hi), _c(x)
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                                          (x - lo) / (hi - lo)))


# ---------------------------------------------------------------------
# Sliding-window evaluator family (DescriptiveStatistics slider).
# ---------------------------------------------------------------------

def _windows(arr, w: int) -> Column:
    """Full sliding windows of width w (the DescriptiveStatistics
    slider state at each emit point)."""
    a = _c(arr)
    return F.transform(
        F.sequence(F.lit(int(w)), F.size(a)),
        lambda k: F.slice(a, k - int(w) + 1, int(w)))


def moving_median(arr, w: int) -> Column:
    """MovingMedianEvaluator: commons-math Percentile(50) per full
    window — the LEGACY estimate pos = 0.5·(n+1), which for n=w is
    linear interpolation between the two middle order statistics."""
    def med(win):
        s = F.array_sort(win)
        n = int(w)
        pos = 0.5 * (n + 1)
        lo = int(pos)
        frac = pos - lo
        if frac == 0.0:
            return F.element_at(s, lo)
        return (F.element_at(s, lo)
                + (F.element_at(s, lo + 1) - F.element_at(s, lo)) * frac)

    return F.transform(_windows(arr, w), med)


def moving_mad(arr, w: int) -> Column:
    """MovingMADEvaluator: mean absolute deviation from the window
    mean, per full window."""
    def mad(win):
        mu = sum_v(win) / F.lit(float(w))
        return F.aggregate(
            win, F.lit(0.0), lambda acc, v: acc + F.abs(v - mu)
        ) / F.lit(float(w))

    return F.transform(_windows(arr, w), mad)


def exp_moving_avg(arr, w: int, alpha: float | None = None) -> Column:
    """ExponentialMovingAverageEvaluator: seed with the mean of the
    first w values, then e ← α(x − e) + e for each later observation
    (default α = 2/(w+1)); emits the seed plus one value per
    post-window observation."""
    a = _c(arr)
    if alpha is None:
        alpha = 2.0 / (float(w) + 1.0)
    al = F.lit(float(alpha))
    e0 = sum_v(F.slice(a, 1, int(w))) / F.lit(float(w))
    n = F.size(a)
    stepped = F.aggregate(
        F.sequence(F.lit(int(w) + 1), n),
        F.struct(F.array(e0).alias("seq"), e0.alias("last")),
        lambda acc, i: F.struct(
            F.concat(
                acc.seq,
                F.array(al * (F.element_at(a, i) - acc.last) + acc.last),
            ).alias("seq"),
            (al * (F.element_at(a, i) - acc.last) + acc.last).alias("last"),
        ),
    ).seq
    return F.when(n > int(w), stepped).otherwise(F.array(e0))


def weibull_cdf(shape, scale, x) -> Column:
    """WeibullDistribution(shape, scale).cumulativeProbability(x):
    1 − exp(−(x/scale)^shape)."""
    shape, scale, x = _c(shape), _c(scale), _c(x)
    return F.lit(1.0) - F.exp(-F.pow(x / scale, shape))


def lognormal_cdf(mu, sigma, x) -> Column:
    """LogNormalDistribution(mu, sigma).cumulativeProbability(x):
    Φ((ln x − mu)/sigma)."""
    return normal_cdf(F.log(_c(x)), mu, sigma)


def zipf_pmf(n: int, s: float, k) -> Column:
    """ZipfDistribution(n, s).probability(k): k^-s / H(n, s). The
    generalized harmonic H is a Python-side constant folded into the
    expression (commons-math sums it n→1 descending; replicated)."""
    h = 0.0
    for i in range(int(n), 0, -1):
        h += 1.0 / (float(i) ** float(s))
    return F.pow(_c(k).cast("double"), F.lit(-float(s))) / F.lit(h)


def triangular_cdf(lo, mode, hi, x) -> Column:
    """TriangularDistribution(lo, mode, hi).cumulativeProbability(x)."""
    lo, mode, hi, x = _c(lo), _c(mode), _c(hi), _c(x)
    return (
        F.when(x <= lo, F.lit(0.0))
        .when(x < mode, (x - lo) * (x - lo) / ((hi - lo) * (mode - lo)))
        .when(x < hi, F.lit(1.0)
              - (hi - x) * (hi - x) / ((hi - lo) * (hi - mode)))
        .otherwise(F.lit(1.0))
    )


# ------------------------------------------------- two-sample inference

def mann_whitney_u(a, b) -> Column:
    """MannWhitneyUEvaluator (commons-math MannWhitneyUTest): the U
    statistic max(U1, U2) from tie-averaged natural ranks of the
    combined sample."""
    a, b = _c(a), _c(b)
    combined = F.concat(a, b)
    ranks = rank_v(combined)
    n1 = F.size(a).cast("double")
    n2 = F.size(b).cast("double")
    r1 = sum_v(F.slice(ranks, 1, F.size(a)))
    u1 = r1 - n1 * (n1 + 1.0) / 2.0
    u2 = n1 * n2 - u1
    return F.greatest(u1, u2)


def mann_whitney_p(a, b) -> Column:
    """MannWhitneyUTest.mannWhitneyUTest asymptotic p:
    z = (min(U1,U2) − n1n2/2) / sqrt(n1n2(n1+n2+1)/12), p = 2·Φ(z).
    Delegates to the self-contained Arrow UDF: composing the erf UDF
    into the rank HOF expression trips Spark's common-subexpression
    proxies (a Python UDF inside an ExpressionProxy cannot evaluate)."""
    return mann_whitney_p_udf()(_c(a), _c(b))


def ks_statistic(a, b) -> Column:
    """KolmogorovSmirnovEvaluator D statistic (commons-math
    kolmogorovSmirnovStatistic): max |ECDF_a − ECDF_b| over the
    combined sample points."""
    a, b = _c(a), _c(b)
    n1 = F.size(a).cast("double")
    n2 = F.size(b).cast("double")

    def diff_at(v):
        ca = F.aggregate(a, F.lit(0.0),
                         lambda acc, w: acc + F.when(w <= v, 1.0)
                         .otherwise(0.0))
        cb = F.aggregate(b, F.lit(0.0),
                         lambda acc, w: acc + F.when(w <= v, 1.0)
                         .otherwise(0.0))
        return F.abs(ca / n1 - cb / n2)

    return F.array_max(F.transform(F.concat(a, b), diff_at))


_mwp_udf_cache = None


def mann_whitney_p_udf():
    """Arrow-batched mannWhitneyUTest asymptotic p over plain (xs, ys)
    array columns — the same formula as mann_whitney_p, packaged as a
    single UDF so suite plans never embed erf inside a nested
    higher-order sort expression (Spark cannot extract a Python UDF
    whose argument tree is a large HOF expression)."""
    global _mwp_udf_cache
    if _mwp_udf_cache is None:
        @F.pandas_udf("double")
        def _mwp(xs: pd.Series, ys: pd.Series) -> pd.Series:
            import math

            def one(a, b):
                comb = list(a) + list(b)
                n1, n2 = float(len(a)), float(len(b))
                ranks = []
                for v in comb:
                    lt = sum(1.0 for w in comb if w < v)
                    eq = sum(1.0 for w in comb if w == v)
                    ranks.append(lt + (eq + 1.0) / 2.0)
                r1 = sum(ranks[: len(a)])
                u1 = r1 - n1 * (n1 + 1.0) / 2.0
                u2 = n1 * n2 - u1
                umin = min(u1, u2)
                z = (umin - n1 * n2 / 2.0) / math.sqrt(
                    n1 * n2 * (n1 + n2 + 1.0) / 12.0)
                return 2.0 * 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

            return pd.Series([one(a, b) for a, b in zip(xs, ys)])

        _mwp_udf_cache = _mwp
    return _mwp_udf_cache


_polyfit_udf_cache = None


def polyfit_udf(degree: int = 3):
    """PolyFitEvaluator (commons-math PolynomialCurveFitter): fitted
    predictions at x = 0..n−1 — Arrow-batched numpy least squares,
    which solves the same normal equations as the reference's LM fit
    on this linear-in-parameters model (agreement < 1e-13, asserted at
    fixture build)."""
    global _polyfit_udf_cache
    if _polyfit_udf_cache is None:
        import numpy as np

        @F.pandas_udf(_T.ArrayType(_T.DoubleType()))
        def _pf(ys: pd.Series) -> pd.Series:
            def one(y):
                y = np.asarray(y, dtype="float64")
                x = np.arange(len(y), dtype="float64")
                return list(np.polyval(np.polyfit(x, y, 3), x))

            return ys.map(one)

        _polyfit_udf_cache = _pf
    return _polyfit_udf_cache


def _natural_cubic_spline(ys):
    """commons-math SplineInterpolator (natural cubic) coefficients for
    knots x = 0..n−1: per-interval (a, b, c, d) with
    S_i(t) = a + b·t + c·t² + d·t³, t = x − i."""
    import numpy as np

    y = np.asarray(ys, dtype="float64")
    n = len(y) - 1
    # tridiagonal system for second-derivative terms (natural: c0=cn=0)
    c = np.zeros(n + 1)
    if n > 1:
        al = np.zeros(n + 1)
        l = np.ones(n + 1)
        mu = np.zeros(n + 1)
        z = np.zeros(n + 1)
        for i in range(1, n):
            al[i] = 3.0 * (y[i + 1] - y[i]) - 3.0 * (y[i] - y[i - 1])
        for i in range(1, n):
            l[i] = 4.0 - mu[i - 1]
            mu[i] = 1.0 / l[i]
            z[i] = (al[i] - z[i - 1]) / l[i]
        for i in range(n - 1, 0, -1):
            c[i] = z[i] - mu[i] * c[i + 1]
    a = y[:-1]
    b = np.array([(y[i + 1] - y[i]) - (2.0 * c[i] + c[i + 1]) / 3.0
                  for i in range(n)])
    d = np.array([(c[i + 1] - c[i]) / 3.0 for i in range(n)])
    return a, b, c[:-1], d


_spline_udf_cache = None


def spline_chain_udf():
    """spline/derivative/integrate evaluator chain (reference
    solr/solrj/.../io/eval/{Spline,Derivative,Integrate}Evaluator.java
    → commons-math SplineInterpolator natural cubic +
    PolynomialSplineFunction derivative + RombergIntegrator): returns
    struct(mid: spline values at knot midpoints, deriv: S'(x) at the
    knots, integral over [0, n−1] — analytic per-piece, which Romberg
    converges to; agreement asserted at fixture build)."""
    global _spline_udf_cache
    if _spline_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("mid", _T.ArrayType(_T.DoubleType())),
            _T.StructField("deriv", _T.ArrayType(_T.DoubleType())),
            _T.StructField("integral", _T.DoubleType()),
        ]))
        def _sp(ys: pd.Series) -> pd.DataFrame:
            rows = []
            for y in ys:
                a, b, c, d = _natural_cubic_spline(list(y))
                n = len(a)
                mid = [float(a[i] + b[i] * 0.5 + c[i] * 0.25 + d[i] * 0.125)
                       for i in range(n)]
                deriv = [float(b[i]) for i in range(n)]
                # right endpoint derivative from the last piece at t=1
                deriv.append(float(b[-1] + 2.0 * c[-1] + 3.0 * d[-1]))
                integral = float(sum(
                    a[i] + b[i] / 2.0 + c[i] / 3.0 + d[i] / 4.0
                    for i in range(n)))
                rows.append((mid, deriv, integral))
            return pd.DataFrame(rows, columns=["mid", "deriv", "integral"])

        _spline_udf_cache = _sp
    return _spline_udf_cache


def _tricube(t: float) -> float:
    a = abs(t)
    if a >= 1.0:
        return 0.0
    tmp = 1.0 - a * a * a
    return tmp * tmp * tmp


def loess_smooth(ys, bandwidth: float = 0.25, robustness_iters: int = 2,
                 accuracy: float = 1e-12):
    """LoessEvaluator (commons-math LoessInterpolator.smooth over
    x = 0..n−1): tricube-weighted local linear regression over the
    sliding bandwidth window, with biweight robustness reweighting —
    verified to ~1e-13 against the real library at fixture build
    (scripts/make_loess_fixture.py). Defaults match the evaluator
    (bandwidth 0.25, robustIterations 2)."""
    import numpy as np

    y = np.asarray(ys, dtype="float64")
    n = len(y)
    x = np.arange(n, dtype="float64")
    if n <= 2:
        return [float(v) for v in y]
    bw = int(bandwidth * n)
    if bw < 2:
        bw = 2
    res = np.zeros(n)
    robustness = np.ones(n)
    for it in range(robustness_iters + 1):
        interval = [0, bw - 1]
        for i in range(n):
            xi = x[i]
            if i > 0:
                left, right = interval
                if right < n - 1 and (x[right + 1] - xi) < (xi - x[left]):
                    interval[0] = left + 1
                    interval[1] = right + 1
            ileft, iright = interval
            edge = ileft if (xi - x[ileft]) > (x[iright] - xi) else iright
            sumw = sumx = sumxs = sumy = sumxy = 0.0
            denom = abs(1.0 / (x[edge] - xi))
            for k in range(ileft, iright + 1):
                xk = x[k]
                yk = y[k]
                dist = (xk - xi) if k >= i else (xi - xk)
                w = _tricube(dist * denom) * robustness[k]
                xkw = xk * w
                sumw += w
                sumx += xkw
                sumxs += xk * xkw
                sumy += yk * w
                sumxy += yk * xkw
            mx = sumx / sumw
            my = sumy / sumw
            mxy = sumxy / sumw
            mxs = sumxs / sumw
            if (abs(mxs - mx * mx)) ** 0.5 < accuracy:
                beta = 0.0
            else:
                beta = (mxy - mx * my) / (mxs - mx * mx)
            res[i] = beta * xi + (my - beta * mx)
        if it == robustness_iters:
            break
        residuals = np.abs(y - res)
        median = np.sort(residuals)[n // 2]
        if abs(median) < accuracy:
            break
        for i in range(n):
            arg = residuals[i] / (6.0 * median)
            robustness[i] = 0.0 if arg >= 1.0 else (1.0 - arg * arg) ** 2
    return [float(v) for v in res]


_loess_udf_cache = None


def loess_udf():
    """Arrow-batched loess over an array<double> column."""
    global _loess_udf_cache
    if _loess_udf_cache is None:
        @F.pandas_udf(_T.ArrayType(_T.DoubleType()))
        def _lo(ys: pd.Series) -> pd.Series:
            return ys.map(lambda y: loess_smooth(list(y)))

        _loess_udf_cache = _lo
    return _loess_udf_cache


_fft_udf_cache = None


def fft_udf():
    """FFTEvaluator / IFFTEvaluator (commons-math
    FastFourierTransformer, STANDARD normalization): forward FFT of a
    real series as struct(re, im) — Arrow-batched numpy.fft, which
    matches the reference transform to machine epsilon (asserted at
    fixture build). Series must be radix-2 length, as in the
    reference."""
    global _fft_udf_cache
    if _fft_udf_cache is None:
        import numpy as np

        @F.pandas_udf(_T.StructType([
            _T.StructField("re", _T.ArrayType(_T.DoubleType())),
            _T.StructField("im", _T.ArrayType(_T.DoubleType())),
        ]))
        def _fft(ys: pd.Series) -> pd.DataFrame:
            rows = []
            for y in ys:
                z = np.fft.fft(np.asarray(y, dtype="float64"))
                rows.append((list(z.real), list(z.imag)))
            return pd.DataFrame(rows, columns=["re", "im"])

        _fft_udf_cache = _fft
    return _fft_udf_cache


def akima_smooth(ys, probes):
    """AkimaEvaluator (commons-math AkimaSplineInterpolator over
    x = 0..n−1, n ≥ 5): spline values at the probe points — Akima
    weighted-slope derivatives with three-point parabolic end
    derivatives, evaluated as a cubic Hermite (the exact commons-math
    construction, verified against the real library at fixture build).
    """
    import numpy as np

    y = np.asarray(ys, dtype="float64")
    n = len(y)
    if n < 5:
        raise ValueError("Akima needs at least 5 points")
    d = np.diff(y)  # slopes (h = 1)
    w = np.empty(n - 1)
    w[0] = 0.0
    for i in range(1, n - 1):
        w[i] = abs(d[i] - d[i - 1])
    fd = np.empty(n)

    def three_point(i, s0):
        # parabola through (s0, s0+1, s0+2), derivative at x=i
        t = float(i - s0)
        a = (y[s0 + 2] - y[s0] - 2.0 * (y[s0 + 1] - y[s0])) / 2.0
        b = (y[s0 + 1] - y[s0] - a)
        return 2.0 * a * t + b

    fd[0] = three_point(0, 0)
    fd[1] = three_point(1, 0)
    for i in range(2, n - 2):
        wp = w[i + 1]
        wm = w[i - 1]
        if wp + wm == 0.0:
            fd[i] = 0.5 * (d[i - 1] + d[i])
        else:
            fd[i] = (wp * d[i - 1] + wm * d[i]) / (wp + wm)
    fd[n - 2] = three_point(n - 2, n - 3)
    fd[n - 1] = three_point(n - 1, n - 3)

    out = []
    for p in probes:
        i = min(int(p), n - 2)
        t = p - i
        h00 = (1.0 + 2.0 * t) * (1.0 - t) * (1.0 - t)
        h10 = t * (1.0 - t) * (1.0 - t)
        h01 = t * t * (3.0 - 2.0 * t)
        h11 = t * t * (t - 1.0)
        out.append(float(h00 * y[i] + h10 * fd[i]
                         + h01 * y[i + 1] + h11 * fd[i + 1]))
    return out


_akima_udf_cache = None


def akima_udf():
    """Arrow-batched Akima spline values at knot midpoints."""
    global _akima_udf_cache
    if _akima_udf_cache is None:
        @F.pandas_udf(_T.ArrayType(_T.DoubleType()))
        def _ak(ys: pd.Series) -> pd.Series:
            return ys.map(lambda y: akima_smooth(
                list(y), [i + 0.5 for i in range(len(y) - 1)]))

        _akima_udf_cache = _ak
    return _akima_udf_cache


def convex_hull(points):
    """ConvexHullEvaluator (commons-math MonotoneChain → ConvexHull2D):
    hull vertices (CCW), region area, and area centroid — all unique
    properties of the point set, verified against the real library at
    fixture build. ``points`` = list of (x, y)."""
    pts = sorted(set((float(x), float(y)) for x, y in points))
    if len(pts) <= 2:
        return pts, 0.0, None

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    # shoelace area + area centroid
    a2 = 0.0
    cx = cy = 0.0
    for i in range(len(hull)):
        x0, y0 = hull[i]
        x1, y1 = hull[(i + 1) % len(hull)]
        w = x0 * y1 - x1 * y0
        a2 += w
        cx += (x0 + x1) * w
        cy += (y0 + y1) * w
    area = a2 / 2.0
    centroid = (cx / (3.0 * a2), cy / (3.0 * a2))
    return hull, abs(area), centroid


def enclosing_disk(points):
    """EnclosingDiskEvaluator (commons-math WelzlEncloser +
    DiskGenerator): the minimum enclosing disk — unique for any point
    set, so any correct algorithm matches the reference. Returns
    (center, radius)."""
    import random as _random

    pts = [(float(x), float(y)) for x, y in points]

    def circle_two(a, b):
        cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        r = ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) ** 0.5 / 2.0
        return (cx, cy), r

    def circle_three(a, b, c):
        ax, ay = a
        bx, by = b
        cx_, cy_ = c
        d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        if d == 0.0:
            return None
        ux = ((ax * ax + ay * ay) * (by - cy_)
              + (bx * bx + by * by) * (cy_ - ay)
              + (cx_ * cx_ + cy_ * cy_) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx_ - bx)
              + (bx * bx + by * by) * (ax - cx_)
              + (cx_ * cx_ + cy_ * cy_) * (bx - ax)) / d
        r = ((ax - ux) ** 2 + (ay - uy) ** 2) ** 0.5
        return (ux, uy), r

    def inside(c, r, p, eps=1e-10):
        return ((p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2) ** 0.5 <= r + eps

    def trivial(boundary):
        if not boundary:
            return (0.0, 0.0), -1.0
        if len(boundary) == 1:
            return boundary[0], 0.0
        if len(boundary) == 2:
            return circle_two(*boundary)
        c = circle_three(*boundary)
        if c is None:
            # collinear: widest pair
            best = None
            for i in range(3):
                for j in range(i + 1, 3):
                    cc, rr = circle_two(boundary[i], boundary[j])
                    if best is None or rr > best[1]:
                        best = (cc, rr)
            return best
        return c

    def welzl(p, boundary):
        if not p or len(boundary) == 3:
            return trivial(boundary)
        q = p[0]
        c, r = welzl(p[1:], boundary)
        if r >= 0 and inside(c, r, q):
            return c, r
        return welzl(p[1:], boundary + [q])

    rng = _random.Random(12345)
    shuffled = list(pts)
    rng.shuffle(shuffled)
    import sys as _sys
    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(10000)
    try:
        c, r = welzl(shuffled, [])
    finally:
        _sys.setrecursionlimit(old)
    return c, r


_geometry_udf_cache = None


def geometry_udf():
    """Arrow-batched convexHull + enclosingDisk over (xs, ys) columns:
    struct(hull_n, hull_area, bary_x, disk_r, disk_cx, disk_cy)."""
    global _geometry_udf_cache
    if _geometry_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("hull_n", _T.DoubleType()),
            _T.StructField("hull_area", _T.DoubleType()),
            _T.StructField("bary_x", _T.DoubleType()),
            _T.StructField("disk_r", _T.DoubleType()),
            _T.StructField("disk_cx", _T.DoubleType()),
            _T.StructField("disk_cy", _T.DoubleType()),
        ]))
        def _geo(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
            rows = []
            for x, y in zip(xs, ys):
                pts = list(zip(x, y))
                hull, area, cen = convex_hull(pts)
                c, r = enclosing_disk(pts)
                rows.append((float(len(hull)), area, cen[0], r,
                             c[0], c[1]))
            return pd.DataFrame(rows, columns=[
                "hull_n", "hull_area", "bary_x", "disk_r", "disk_cx",
                "disk_cy"])

        _geometry_udf_cache = _geo
    return _geometry_udf_cache


# ------------------- special functions: incomplete gamma / beta (pure
# Python doubles, the classic series + continued-fraction pair — same
# numerical route commons-math3's Gamma.regularizedGammaP /
# Beta.regularizedBeta take, agreement ~1e-13, gates compare at 6dp)

def _gser(a: float, x: float, itmax: int = 400, eps: float = 3e-15) -> float:
    import math

    ap, s = a, 1.0 / a
    d = s
    for _ in range(itmax):
        ap += 1.0
        d *= x / ap
        s += d
        if abs(d) < abs(s) * eps:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float, itmax: int = 400, eps: float = 3e-15) -> float:
    import math

    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — the gamma CDF at
    scale 1 (GammaDistributionEvaluator → commons-math
    GammaDistribution.cumulativeProbability, which is
    Gamma.regularizedGammaP(shape, x/scale))."""
    if x <= 0.0:
        return 0.0
    if x < a + 1.0:
        return _gser(a, x)
    return 1.0 - _gcf(a, x)


def _betacf(a: float, b: float, x: float, itmax: int = 400,
            eps: float = 3e-15) -> float:
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, itmax + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — the beta CDF
    (BetaDistributionEvaluator → commons-math
    BetaDistribution.cumulativeProbability =
    Beta.regularizedBeta(x, alpha, beta))."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    bt = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def f_sf(f: float, df1: float, df2: float) -> float:
    """F-distribution survival 1 − CDF via the incomplete beta —
    what OneWayAnova.anovaPValue computes."""
    if f <= 0.0:
        return 1.0
    return betainc(df2 / 2.0, df1 / 2.0, df2 / (df2 + df1 * f))


_gammabeta_udf_cache = None


def gamma_beta_cdf_udf():
    """Arrow-batched (shape, scale, alpha, beta, x) → struct(gamma_cdf,
    beta_cdf_unit) where beta takes x mapped into (0,1) by the caller.
    Plain column inputs only (see mann_whitney_p_udf on why UDFs never
    ride inside big HOF expression trees)."""
    global _gammabeta_udf_cache
    if _gammabeta_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("gamma_cdf", _T.DoubleType()),
            _T.StructField("beta_cdf", _T.DoubleType()),
        ]))
        def _gb(shape: pd.Series, scale: pd.Series, al: pd.Series,
                be: pd.Series, x: pd.Series, xb: pd.Series) -> pd.DataFrame:
            rows = [
                (gammainc_p(float(s), float(v) / float(sc)),
                 betainc(float(a), float(b), float(vb)))
                for s, sc, a, b, v, vb in zip(shape, scale, al, be, x, xb)
            ]
            return pd.DataFrame(rows, columns=["gamma_cdf", "beta_cdf"])

        _gammabeta_udf_cache = _gb
    return _gammabeta_udf_cache


def enumerated_pmf_cdf(values, weights, x):
    """EnumeratedDistributionEvaluator (commons-math
    EnumeratedIntegerDistribution): pmf/cdf of a discrete distribution
    given as literal (value, weight) lists — normalized weights, CDF =
    sum of pmf over support <= x. Pure Column when-chains (the support
    is a query-literal, exactly as the Solr expression embeds it)."""
    total = float(sum(weights))
    pmf = F.lit(0.0)
    cdf = F.lit(0.0)
    for v, w in sorted(zip(values, weights)):
        p = float(w) / total
        pmf = F.when(x == F.lit(v), F.lit(p)).otherwise(pmf)
        cdf = cdf + F.when(x >= F.lit(v), F.lit(p)).otherwise(F.lit(0.0))
    return pmf, cdf


def earth_movers(a, b) -> Column:
    """EarthMoversEvaluator (commons-math EarthMoversDistance): 1-D EMD
    over two equal-length distributions — running transport
    emd_i = a_i + emd_{i-1} − b_i, distance = Σ|emd_i|. One
    aggregate fold over the zipped difference array."""
    a, b = _c(a), _c(b)
    diffs = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(
        diffs,
        F.struct(F.lit(0.0).alias("emd"), F.lit(0.0).alias("tot")),
        lambda s, d: F.struct(
            (s.emd + d).alias("emd"),
            (s.tot + F.abs(s.emd + d)).alias("tot"),
        ),
        lambda s: s.tot,
    )


def describe_stats(arr):
    """DescribeEvaluator (commons-math DescriptiveStatistics): the
    summary tuple (mean, sample stddev, min, max) as Column exprs."""
    arr = _c(arr)
    n = F.size(arr).cast("double")
    mean = sum_v(arr) / n
    ss = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean)
    )
    std = F.sqrt(ss / (n - 1.0))
    return mean, std, F.array_min(arr), F.array_max(arr)


_anova_udf_cache = None


def anova_udf():
    """AnovaEvaluator (commons-math OneWayAnova over 2+ numeric arrays):
    Arrow-batched (g1, g2, g3) → struct(f_ratio, p_value). F =
    between-group / within-group mean squares; p = F-survival via the
    incomplete beta — identical formulas to OneWayAnova.anovaFValue /
    anovaPValue."""
    global _anova_udf_cache
    if _anova_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("f_ratio", _T.DoubleType()),
            _T.StructField("p_value", _T.DoubleType()),
        ]))
        def _anova(g1: pd.Series, g2: pd.Series,
                   g3: pd.Series) -> pd.DataFrame:
            rows = []
            for groups in zip(g1, g2, g3):
                gs = [list(map(float, g)) for g in groups]
                n_tot = sum(len(g) for g in gs)
                k = len(gs)
                grand = sum(sum(g) for g in gs) / n_tot
                ssb = sum(
                    len(g) * (sum(g) / len(g) - grand) ** 2 for g in gs
                )
                ssw = sum(
                    sum((x - sum(g) / len(g)) ** 2 for x in g) for g in gs
                )
                df1, df2 = k - 1.0, n_tot - float(k)
                fv = (ssb / df1) / (ssw / df2)
                rows.append((fv, f_sf(fv, df1, df2)))
            return pd.DataFrame(rows, columns=["f_ratio", "p_value"])

        _anova_udf_cache = _anova
    return _anova_udf_cache


_olsreg_udf_cache = None


def ols_regress_udf():
    """OLSRegressionEvaluator (commons-math
    OLSMultipleLinearRegression, intercept included): Arrow-batched
    (X rows array<array<double>>, y array<double>) →
    [b0, b1, …, bk, R²] — numpy least squares solves the same normal
    equations as the reference's QR decomposition."""
    global _olsreg_udf_cache
    if _olsreg_udf_cache is None:
        import numpy as np

        @F.pandas_udf(_T.ArrayType(_T.DoubleType()))
        def _ols(xs: pd.Series, ys: pd.Series) -> pd.Series:
            def one(X, y):
                X = np.asarray([list(r) for r in X], dtype="float64")
                y = np.asarray(y, dtype="float64")
                A = np.column_stack([np.ones(len(y)), X])
                beta, *_ = np.linalg.lstsq(A, y, rcond=None)
                resid = y - A @ beta
                ssr = float(resid @ resid)
                sst = float(((y - y.mean()) ** 2).sum())
                return [float(b) for b in beta] + [1.0 - ssr / sst]

            return pd.Series([one(a, b) for a, b in zip(xs, ys)])

        _olsreg_udf_cache = _ols
    return _olsreg_udf_cache


# the literal discrete support the enumeratedDistribution gate and its
# fixture script share (EnumeratedIntegerDistribution's (values,
# weights) constructor args)
ENUM_VALUES = list(range(1, 11))
ENUM_WEIGHTS = [float(w) for w in (5, 9, 2, 7, 1, 8, 3, 10, 4, 6)]


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided Student-t p = 2·(1 − CDF(|t|)) via the incomplete
    beta identity I_{df/(df+t²)}(df/2, 1/2) — the TDistribution route
    commons-math TTest / PearsonsCorrelation.getCorrelationPValues
    take."""
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def chi2_sf(x: float, df: float) -> float:
    """Chi-square survival 1 − CDF = 1 − P(df/2, x/2)."""
    return 1.0 - gammainc_p(df / 2.0, x / 2.0)


def _welch_p(a, b) -> float:
    import statistics

    n1, n2 = float(len(a)), float(len(b))
    m1, m2 = statistics.fmean(a), statistics.fmean(b)
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1.0)
    v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1.0)
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / (se1 + se2) ** 0.5
    df = (se1 + se2) ** 2 / (se1 ** 2 / (n1 - 1.0) + se2 ** 2 / (n2 - 1.0))
    return t_sf_two_sided(t, df)


def _pearson_p(a, b) -> float:
    import statistics

    n = float(len(a))
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
    den = (sum((x - ma) ** 2 for x in a)
           * sum((y - mb) ** 2 for y in b)) ** 0.5
    r = num / den
    t = r * ((n - 2.0) / (1.0 - r * r)) ** 0.5
    return t_sf_two_sided(abs(t), n - 2.0)


def _chi2_datasets_p(c1, c2) -> float:
    """commons-math ChiSquareTest.chiSquareTestDataSetsComparison over
    two count vectors: scaled two-sample statistic (weight
    sqrt(sum1/sum2) when totals differ), df = len − 1, p = chi-square
    survival. Agreement with the JVM is ASSERTED at fixture build
    (scripts/make_anova_fixture.py)."""
    s1, s2 = float(sum(c1)), float(sum(c2))
    unequal = s1 != s2
    w = (s1 / s2) ** 0.5 if unequal else 1.0
    stat = 0.0
    for o1, o2 in zip(c1, c2):
        d = (o1 / w - o2 * w) if unequal else (float(o1) - float(o2))
        stat += d * d / (o1 + o2)
    return chi2_sf(stat, len(c1) - 1.0)


_tests3_udf_cache = None


def tests3_udf():
    """Arrow-batched (g1, g2) → struct(welch_p, corr_p, chi2_p):
    ttest p (Welch + Welch–Satterthwaite df through the t survival),
    correlationSignificance p (PearsonsCorrelation.
    getCorrelationPValues semantics), chiSquareDataSet p over the
    derived count vectors round(x)+1 (reference solr/solrj/.../io/eval/
    {TTest,CorrelationSignificance,ChiSquareDataSet}Evaluator.java)."""
    global _tests3_udf_cache
    if _tests3_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("welch_p", _T.DoubleType()),
            _T.StructField("corr_p", _T.DoubleType()),
            _T.StructField("chi2_p", _T.DoubleType()),
        ]))
        def _t3(g1: pd.Series, g2: pd.Series) -> pd.DataFrame:
            rows = []
            for a, b in zip(g1, g2):
                a = [float(x) for x in a]
                b = [float(x) for x in b]
                c1 = [int(round(x)) + 1 for x in a]
                c2 = [int(round(x)) + 1 for x in b]
                rows.append((
                    _welch_p(a, b), _pearson_p(a, b),
                    _chi2_datasets_p(c1, c2),
                ))
            return pd.DataFrame(rows, columns=["welch_p", "corr_p",
                                               "chi2_p"])

        _tests3_udf_cache = _t3
    return _tests3_udf_cache


def _paired_ttest_p(a, b) -> float:
    """commons-math TTest.pairedTTest: one-sample t over the pairwise
    differences — t = meanDiff / sqrt(varDiff / n), df = n−1, p
    two-sided through the t survival (StatUtils.meanDifference /
    varianceDifference; reference solr/solrj/.../io/eval/
    PairedTTestEvaluator.java delegates there)."""
    import statistics

    n = float(len(a))
    d = [x - y for x, y in zip(a, b)]
    md = statistics.fmean(d)
    vd = sum((x - md) ** 2 for x in d) / (n - 1.0)
    t = md / (vd / n) ** 0.5
    return t_sf_two_sided(abs(t), n - 1.0)


def _gtest_datasets_p(c1, c2) -> float:
    """commons-math GTest.gTestDataSetsComparison over two count
    vectors: G = 2·N·[H(rowSums) + H(colSums) − H(cells)] with Shannon
    entropy in nats over the 2×k table, df = k−1, p = chi-square
    survival (GTest.gDataSetsComparison; reference GTestDataSet
    Evaluator.java). Agreement with the JVM is ASSERTED at fixture
    build (scripts/make_hyptests3_fixture.py)."""
    import math

    k = len(c1)
    n = float(sum(c1) + sum(c2))

    def h(counts):
        tot = 0.0
        for c in counts:
            if c > 0:
                p = c / n
                tot -= p * math.log(p)
        return tot

    h_rows = h([sum(c1), sum(c2)])
    h_cols = h([c1[i] + c2[i] for i in range(k)])
    h_cells = h(list(c1) + list(c2))
    g = 2.0 * n * (h_rows + h_cols - h_cells)
    return chi2_sf(g, k - 1.0)


_hyp3_udf_cache = None


def hyptests3_udf():
    """Arrow-batched (xs, ys, c1, c2) → struct(paired_p, gtest_p,
    mean_diff, sum_diff): pairedTtest p, gtestDataSet p, and the
    meanDifference / sumDifference evaluators (reference
    solr/solrj/.../io/eval/{PairedTTest,GTestDataSet,MeanDifference,
    SumDifference}Evaluator.java — thin commons-math3 wrappers)."""
    global _hyp3_udf_cache
    if _hyp3_udf_cache is None:
        @F.pandas_udf(_T.StructType([
            _T.StructField("paired_p", _T.DoubleType()),
            _T.StructField("gtest_p", _T.DoubleType()),
            _T.StructField("mean_diff", _T.DoubleType()),
            _T.StructField("sum_diff", _T.DoubleType()),
        ]))
        def _h3(xs: pd.Series, ys: pd.Series, c1: pd.Series,
                c2: pd.Series) -> pd.DataFrame:
            import statistics

            rows = []
            for a, b, o1, o2 in zip(xs, ys, c1, c2):
                a, b = list(a), list(b)
                d = [x - y for x, y in zip(a, b)]
                rows.append((
                    _paired_ttest_p(a, b),
                    _gtest_datasets_p(list(o1), list(o2)),
                    statistics.fmean(d),
                    float(sum(d)),
                ))
            return pd.DataFrame(
                rows,
                columns=["paired_p", "gtest_p", "mean_diff", "sum_diff"],
            )

        _hyp3_udf_cache = _h3
    return _hyp3_udf_cache


def knn_regress(
    obs: "DataFrame",
    queries: "DataFrame",
    k: int = 5,
    feature_cols=("f1", "f2", "f3"),
    outcome_col: str = "outcome",
    idx_col: str = "idx",
    id_col: str = "qid",
):
    """knnRegress + predict (reference solr/solrj/.../io/eval/
    {KnnRegression,Knn,Predict}Evaluator.java): for each query point,
    the k nearest observations by Euclidean distance — ties broken by
    observation index asc, exactly KnnEvaluator.Neighbor.compareTo
    (:146-152) — aggregated as the MEAN of their outcomes, plus the
    robust=true variant (50th-percentile median, :227-237).

    Relational shape: distance join + per-query rank window + one
    agg. The evaluator's model is driver-resident in the reference;
    here both sides stay distributed — at corpus scale this is the
    ANN family's problem and the `td_ann` pruned paths apply.

    → (qid, pred, pred_robust) ordered by qid."""
    from pyspark.sql import DataFrame, Window  # noqa: F811

    dist = None
    for f in feature_cols:
        term = (obs[f] - queries[f]) * (obs[f] - queries[f])
        dist = term if dist is None else dist + term
    j = queries.join(obs, how="cross").select(
        queries[id_col].alias("qid"),
        obs[idx_col].alias("idx"),
        F.sqrt(dist).alias("dist"),
        obs[outcome_col].alias("outcome"),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("idx"))
    top = j.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    return (
        top.groupBy("qid")
        .agg(
            F.avg("outcome").alias("pred"),
            F.percentile("outcome", F.lit(0.5)).alias("pred_robust"),
        )
        .orderBy("qid")
    )
