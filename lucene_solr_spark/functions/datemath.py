"""Solr date-math expressions (``NOW/DAY-7DAYS``-style) for Spark.

The reference parses date-math strings at query time and applies them
to an anchor instant (solr/core/src/java/org/apache/solr/util/
DateMathParser.java): a left-to-right chain of

- ``+<n><UNIT>`` / ``-<n><UNIT>`` — calendar arithmetic (month adds
  clamp the day-of-month, Calendar.add semantics),
- ``/<UNIT>`` — round DOWN to the unit boundary.

Units: ``YEAR MONTH DAY DATE HOUR MINUTE SECOND MILLI`` (plural and
``MILLISECOND`` aliases accepted, case-insensitive — DateMathParser's
CALENDAR_UNITS table).

Two appliers, one parse:

- ``date_math(dt, expr)``   — driver-side on a ``datetime`` (how Solr
  resolves ``NOW`` once per request so every shard sees one instant);
- ``date_math_col(col, expr)`` — a Column chain of ``date_trunc`` +
  ``make_interval`` adds (JVM codegen; Spark's timestamp + INTERVAL
  month arithmetic clamps exactly like Calendar.add).

Both appliers share ``parse_date_math`` so a filter computed on the
driver and a per-row bucket computed on executors agree.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_date_math", "date_math", "date_math_col"]

# canonical unit -> (python attr, spark date_trunc name)
_UNITS = {
    "YEAR": "year",
    "MONTH": "month",
    "DAY": "day",
    "DATE": "day",
    "HOUR": "hour",
    "MINUTE": "minute",
    "SECOND": "second",
    "MILLI": "milli",
    "MILLISECOND": "milli",
}

_TOKEN = re.compile(
    r"(?P<round>/(?P<runit>[A-Z]+))|(?P<add>(?P<sign>[+-])(?P<n>\d+)(?P<aunit>[A-Z]+))"
)


def _unit(name: str) -> str:
    u = name.upper().rstrip("S") if name.upper() not in _UNITS else name.upper()
    u = {"MILLI": "MILLI", "MILLISECOND": "MILLI"}.get(u, u)
    if u not in _UNITS:
        raise ValueError(f"unknown date math unit: {name!r}")
    return u


def parse_date_math(expr: str) -> list:
    """``'/DAY-7DAYS'`` → ``[('round','DAY'), ('add',-7,'DAY')]``.
    Raises ValueError on trailing garbage (DateMathParser throws
    ParseException)."""
    ops = []
    pos = 0
    s = expr.strip().upper()
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"bad date math expression at {s[pos:]!r}")
        if m.group("round"):
            ops.append(("round", _unit(m.group("runit"))))
        else:
            n = int(m.group("n"))
            if m.group("sign") == "-":
                n = -n
            ops.append(("add", n, _unit(m.group("aunit"))))
        pos = m.end()
    return ops


_TRUNC_ZERO = {
    "YEAR": dict(month=1, day=1, hour=0, minute=0, second=0, microsecond=0),
    "MONTH": dict(day=1, hour=0, minute=0, second=0, microsecond=0),
    "DAY": dict(hour=0, minute=0, second=0, microsecond=0),
    "HOUR": dict(minute=0, second=0, microsecond=0),
    "MINUTE": dict(second=0, microsecond=0),
    "SECOND": dict(microsecond=0),
}


def _add_months(dt: _dt.datetime, n: int) -> _dt.datetime:
    """Calendar.add month semantics: clamp day-of-month."""
    m = dt.month - 1 + n
    year = dt.year + m // 12
    month = m % 12 + 1
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return dt.replace(year=year, month=month, day=day)


def date_math(dt: _dt.datetime, expr: str) -> _dt.datetime:
    """Apply a date-math expression to a datetime (driver-side NOW)."""
    for op in parse_date_math(expr):
        if op[0] == "round":
            u = op[1]
            if u == "MILLI":
                dt = dt.replace(microsecond=dt.microsecond // 1000 * 1000)
            else:
                dt = dt.replace(**_TRUNC_ZERO[u])
        else:
            _, n, u = op
            if u == "YEAR":
                dt = _add_months(dt, 12 * n)
            elif u == "MONTH":
                dt = _add_months(dt, n)
            elif u == "MILLI":
                dt = dt + _dt.timedelta(milliseconds=n)
            else:
                dt = dt + _dt.timedelta(**{_UNITS[u] + "s": n})
    return dt


def date_math_col(col, expr: str) -> Column:
    """Apply a date-math expression to a timestamp Column — a chain of
    date_trunc / make_interval adds, all inside whole-stage codegen."""
    if not isinstance(col, Column):
        col = F.lit(col).cast("timestamp")
    zero = F.lit(0)
    for op in parse_date_math(expr):
        if op[0] == "round":
            u = op[1]
            if u == "MILLI":
                raise ValueError("/MILLI rounding is not supported on "
                                 "the Column path (sub-ms timestamps)")
            col = F.date_trunc(_UNITS[u], col)
        else:
            _, n, u = op
            years = F.lit(n) if u == "YEAR" else zero
            months = F.lit(n) if u == "MONTH" else zero
            days = F.lit(n) if u == "DAY" else zero
            hours = F.lit(n) if u == "HOUR" else zero
            mins = F.lit(n) if u == "MINUTE" else zero
            secs = (
                F.lit(float(n)) if u == "SECOND"
                else F.lit(n / 1000.0) if u == "MILLI"
                else F.lit(0.0)
            )
            col = col + F.make_interval(
                years, months, zero, days, hours, mins, secs
            )
    return col
