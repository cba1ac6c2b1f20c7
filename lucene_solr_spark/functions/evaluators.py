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
