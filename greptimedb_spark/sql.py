"""SQL front door — GreptimeDB dialect shims over spark.sql.

The reference extends its SQL surface at plan time (RangePlanRewriter for
RANGE queries, TranscribeAtatRule for `@@`, TQL statements, function aliases
registered in its function registry). Here the same surface is a *pre-parse
text rewrite* in Python followed by spark.sql — no Catalyst hooks needed
(SURVEY.md §3.1 "Spark shape").

Supported statements:
- ``TQL EVAL (start, end, step) <promql>``
  (reference src/sql/src/statements/tql.rs:22-26)
- ``SELECT ... agg(x) RANGE '..' ... ALIGN '..' [TO ..] [BY (..)] [FILL ..]``
  (reference src/query/src/range_select/plan_rewrite.rs)
- ``col @@ 'term'`` term-match operator → matches_term predicate
  (reference src/query/src/optimizer/transcribe_atat.rs:28-46)
- function aliases: to_unixtime → unix_timestamp, etc.
  (reference src/common/function aliases)
- everything else → spark.sql unchanged (joins/aggs/windows/setops/CTEs are
  native).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_ALIASES = {
    # greptime/datafusion name → spark name (same arity)
    "to_unixtime": "unix_timestamp",
    "arrow_cast": "cast",
    "approx_distinct": "approx_count_distinct",
    "approx_median": "median",
    "mod": "pmod",
}

_ATAT_RE = re.compile(r"(\w+)\s*@@\s*'([^']*)'")
_TQL_RE = re.compile(
    r"^\s*TQL\s+EVAL\s*\(\s*([^,]+)\s*,\s*([^,]+)\s*,\s*([^)]+)\s*\)\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_atat(text: str) -> str:
    def repl(m: re.Match) -> str:
        col, term = m.group(1), re.escape(m.group(2))
        return f"{col} RLIKE '(^|[^a-zA-Z0-9_]){term}($|[^a-zA-Z0-9_])'"

    return _ATAT_RE.sub(repl, text)


def _rewrite_aliases(text: str) -> str:
    for old, new in _ALIASES.items():
        text = re.sub(rf"\b{old}\s*\(", f"{new}(", text, flags=re.IGNORECASE)
    return text


def _parse_time_arg(arg: str) -> int:
    """TQL time bound: epoch seconds or ISO string → epoch ms."""
    a = arg.strip().strip("'\"")
    if re.fullmatch(r"-?\d+(\.\d+)?", a):
        return int(float(a) * 1000)
    import datetime as dt

    d = dt.datetime.fromisoformat(a.replace("T", " ").replace("Z", ""))
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


class GreptimeSQL:
    """Session facade: spark.sql + dialect rewrites + PromQL metric registry."""

    def __init__(self, spark: SparkSession, promql_tables: dict | None = None,
                 lookback_ms: int = 300_000):
        self.spark = spark
        self.promql_tables = promql_tables or {}
        self.lookback_ms = lookback_ms

    def register_metric(self, name: str, table) -> None:
        self.promql_tables[name] = table

    def sql(self, text: str, time_index: str = "ts") -> DataFrame:
        m = _TQL_RE.match(text)
        if m:
            from greptimedb_spark.promql import PromQLEngine

            start, end, step, promql = m.groups()
            eng = PromQLEngine(self.spark, self.promql_tables, self.lookback_ms)
            step_ms = _parse_step(step)
            return eng.evaluate(
                promql.strip().rstrip(";"),
                _parse_time_arg(start),
                _parse_time_arg(end),
                step_ms,
            )
        text = _rewrite_atat(text)
        text = _rewrite_aliases(text)
        if re.search(r"\bALIGN\s+'", text, re.IGNORECASE):
            from greptimedb_spark.range_query import range_sql

            return range_sql(self.spark, text, time_index=time_index)
        return self.spark.sql(text)


def _parse_step(step: str) -> int:
    s = step.strip().strip("'\"")
    if re.fullmatch(r"\d+(\.\d+)?", s):
        return int(float(s) * 1000)
    from greptimedb_spark.promql.parser import parse_duration

    return parse_duration(s)
