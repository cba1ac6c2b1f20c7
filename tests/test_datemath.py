"""Solr date-math expressions (functions/datemath.py) vs hand-computed
values and driver/executor parity. Reference semantics:
solr/core/src/java/org/apache/solr/util/DateMathParser.java (round
down on /UNIT, Calendar.add month clamping, left-to-right chains).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.datemath import (
    date_math,
    date_math_col,
    parse_date_math,
)

ANCHOR = dt.datetime(2024, 1, 21, 7, 45, 30, 123456)


def test_parse():
    assert parse_date_math("/DAY-7DAYS") == [("round", "DAY"),
                                             ("add", -7, "DAY")]
    assert parse_date_math("+6MONTHS+3DAYS/HOUR") == [
        ("add", 6, "MONTH"), ("add", 3, "DAY"), ("round", "HOUR")]
    assert parse_date_math("-1year/month") == [
        ("add", -1, "YEAR"), ("round", "MONTH")]
    with pytest.raises(ValueError):
        parse_date_math("NOW/DAY")  # NOW is the caller's anchor, not math
    with pytest.raises(ValueError):
        parse_date_math("/FORTNIGHT")


def test_round_down():
    assert date_math(ANCHOR, "/YEAR") == dt.datetime(2024, 1, 1)
    assert date_math(ANCHOR, "/MONTH") == dt.datetime(2024, 1, 1)
    assert date_math(ANCHOR, "/DAY") == dt.datetime(2024, 1, 21)
    assert date_math(ANCHOR, "/HOUR") == dt.datetime(2024, 1, 21, 7)
    assert date_math(ANCHOR, "/MINUTE") == dt.datetime(2024, 1, 21, 7, 45)
    assert date_math(ANCHOR, "/SECOND") == dt.datetime(2024, 1, 21, 7, 45, 30)
    assert date_math(ANCHOR, "/MILLI").microsecond == 123000


def test_add_and_chain():
    assert date_math(ANCHOR, "-7DAYS/DAY") == dt.datetime(2024, 1, 14)
    assert date_math(ANCHOR, "/DAY-7DAYS") == dt.datetime(2024, 1, 14)
    assert date_math(ANCHOR, "+2HOURS").hour == 9
    assert date_math(ANCHOR, "+500MILLIS").microsecond == 623456
    # month clamp: Jan 31 + 1 MONTH = Feb 29 (2024 is a leap year)
    assert date_math(dt.datetime(2024, 1, 31), "+1MONTH") == dt.datetime(
        2024, 2, 29)
    assert date_math(dt.datetime(2023, 1, 31), "+1MONTH") == dt.datetime(
        2023, 2, 28)
    assert date_math(dt.datetime(2024, 2, 29), "+1YEAR") == dt.datetime(
        2025, 2, 28)


@pytest.mark.parametrize("expr", [
    "/DAY", "/DAY-7DAYS", "+6MONTHS+3DAYS/HOUR", "-1YEAR/MONTH",
    "+90MINUTES", "-30SECONDS/MINUTE", "+1MONTH",
])
def test_column_matches_driver(spark, expr):
    """date_math_col and date_math agree on every expression — the
    filter resolved on the driver and the bucket computed on executors
    see the same instants (incl. the Jan-31 month-clamp anchor)."""
    anchors = [ANCHOR.replace(microsecond=0), dt.datetime(2024, 1, 31, 23, 59, 59)]
    df = spark.createDataFrame([(a,) for a in anchors], "ts timestamp")
    got = [r["out"] for r in
           df.select(date_math_col(F.col("ts"), expr).alias("out"))
           .orderBy("ts").collect()]
    want = [date_math(a, expr) for a in sorted(anchors)]
    assert got == want, expr
