"""IntervalMonthDayNano parsing/printing for the SQL dialect.

The reference's interval literals parse into arrow IntervalMonthDayNano
(months, days, nanoseconds) and print with DataFusion's Display — "14 mons
3 days 4 hours 5 mins 6.000100000 secs" (reference interval goldens,
tests/cases/standalone/common/types/interval/interval.result).  Spark's ANSI
intervals can't mix the year-month and day-time classes in one value, so the
dialect front door parses literals here, folds standalone interval algebra in
Python, and expands timestamp±interval into chained single-class intervals.
"""

from __future__ import annotations

import re

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_S = 1_000_000_000
NS_PER_MIN = 60 * NS_PER_S
NS_PER_HOUR = 3600 * NS_PER_S
NS_PER_DAY = 24 * NS_PER_HOUR

_UNIT_ALIASES = {
    "y": "year", "yr": "year", "yrs": "year", "year": "year", "years": "year",
    "mon": "month", "mons": "month", "month": "month", "months": "month",
    "w": "week", "week": "week", "weeks": "week",
    "d": "day", "day": "day", "days": "day",
    "h": "hour", "hr": "hour", "hrs": "hour", "hour": "hour", "hours": "hour",
    "m": "minute", "min": "minute", "mins": "minute",
    "minute": "minute", "minutes": "minute",
    "s": "second", "sec": "second", "secs": "second",
    "second": "second", "seconds": "second",
    "ms": "millisecond", "millisecond": "millisecond", "milliseconds": "millisecond",
    "us": "microsecond", "microsecond": "microsecond", "microseconds": "microsecond",
    "ns": "nanosecond", "nanosecond": "nanosecond", "nanoseconds": "nanosecond",
}

# fractional years carry into months; fractional months into days (30/mon,
# PostgreSQL interval justification, which DataFusion follows)
_UNIT_MONTHS = {"year": 12, "month": 1}
_UNIT_NS = {
    "week": 7 * NS_PER_DAY, "day": NS_PER_DAY, "hour": NS_PER_HOUR,
    "minute": NS_PER_MIN, "second": NS_PER_S,
    "millisecond": NS_PER_MS, "microsecond": NS_PER_US, "nanosecond": 1,
}

_TOKEN_RE = re.compile(r"([-+]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)")
_ISO_RE = re.compile(
    r"^([-+]?)P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?"
    r"(?:(\d+(?:\.\d+)?)D)?"
    r"(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)S)?)?$",
    re.IGNORECASE,
)


def parse_interval_mdn(text: str) -> tuple[int, int, int]:
    """Interval string → (months, days, nanoseconds).

    Accepts the reference's forms: unit lists ('1 year 2 months'), compact
    ('1y2w3d4h', '-1h5m' — the sign binds to its own component), ISO-8601
    ('P3Y3M700DT133H17M36.789S', sign prefixes the whole value), fractional
    values ('1.5 year' → 18 months). Raises ValueError on junk."""
    s = text.strip()
    if not s:
        raise ValueError("empty interval")
    # arrow IntervalMonthDayNano keeps the three component classes
    # UNNORMALIZED ('55h' stays 55 hours of nanos, '700D' stays 700 days) —
    # only week folds into days and year into months
    m = _ISO_RE.match(s)
    if m and s.upper().lstrip("+-").startswith("P"):
        # sqlparser lowers ISO-8601 intervals entirely into days+nanos
        # (Y→365 days, M→30 days; interval.result 'p3y3m700d…' golden)
        sign = -1 if m.group(1) == "-" else 1
        y, mo, w, d, h, mi, sec = (float(g) if g else 0.0 for g in m.groups()[1:])
        days = y * 365 + mo * 30 + w * 7 + d
        ns = h * NS_PER_HOUR + mi * NS_PER_MIN + sec * NS_PER_S
        d_whole = int(days)
        ns += (days - d_whole) * NS_PER_DAY
        return 0, sign * d_whole, sign * int(round(ns))

    months = 0.0
    days = 0.0
    ns = 0.0
    pos = 0
    for tok in _TOKEN_RE.finditer(s):
        between = s[pos:tok.start()]
        if between.strip():
            raise ValueError(f"bad interval {text!r}")
        pos = tok.end()
        num = float(tok.group(1))
        unit = _UNIT_ALIASES.get(tok.group(2).lower())
        if unit is None:
            raise ValueError(f"unknown interval unit {tok.group(2)!r}")
        if unit in _UNIT_MONTHS:
            months += num * _UNIT_MONTHS[unit]
        elif unit == "week":
            days += num * 7
        elif unit == "day":
            days += num
        else:
            ns += num * _UNIT_NS[unit]
    if pos != len(s) and s[pos:].strip():
        raise ValueError(f"bad interval {text!r}")
    mi_whole = int(months)
    days += (months - mi_whole) * 30  # fractional months → days
    d_whole = int(days)
    ns += (days - d_whole) * NS_PER_DAY
    return mi_whole, d_whole, int(round(ns))


def render_interval_mdn(months: int, days: int, ns: int) -> str:
    """DataFusion IntervalMonthDayNano Display (arrow-rs interval_mdn fmt):
    '14 mons 3 days 4 hours 5 mins 6.000100000 secs'."""
    parts = []
    if months:
        parts.append(f"{months} mons")
    if days:
        parts.append(f"{days} days")
    # emit the sign as a prefix per component: multiplying into a component
    # that is 0 (e.g. -0.5 s → secs=0) would silently drop it
    sgn = "-" if ns < 0 else ""
    rest = abs(ns)
    hours, rest = divmod(rest, NS_PER_HOUR)
    mins, rest = divmod(rest, NS_PER_MIN)
    secs, frac = divmod(rest, NS_PER_S)
    if hours:
        parts.append(f"{sgn}{hours} hours")
    if mins:
        parts.append(f"{sgn}{mins} mins")
    if frac:
        parts.append(f"{sgn}{secs}.{frac:09d} secs")
    elif secs:
        parts.append(f"{sgn}{secs} secs")
    if not parts:
        return "0 mons"
    return " ".join(parts)


def to_spark_literal(months: int, days: int, ns: int) -> str | None:
    """Single-class Spark interval literal, or None when the value mixes
    year-month and day-time fields (those need additive chaining)."""
    if months and (days or ns):
        return None
    if months:
        return f"INTERVAL '{months}' MONTH"
    total_us = days * 86_400_000_000 + ns // 1000
    return f"INTERVAL '{total_us}' MICROSECOND"


def to_spark_chain(sign: str, months: int, days: int, ns: int) -> str:
    """`± INTERVAL '<mixed>'` → chained single-class terms."""
    out = []
    if months:
        out.append(f" {sign} INTERVAL '{months}' MONTH")
    total_us = days * 86_400_000_000 + ns // 1000
    if total_us or not months:
        out.append(f" {sign} INTERVAL '{total_us}' MICROSECOND")
    return "".join(out)
