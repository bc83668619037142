"""Log-query DSL → DataFrame filters (SURVEY.md §2.12).

Reference: the `/v1/logs` JSON API (LogQuery model,
src/log-query/src/log_query.rs:26; ContentFilter variants at :383-408 —
Exact/Prefix/Postfix/Contains/Regex/Exist/Between; Compound and/or) planned by
LogQueryPlanner (src/query/src/log_query/planner.rs). Here each filter
compiles to a Column predicate, so the whole query is a scan-stage filter
chain Catalyst pushes into Parquet.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnFilter:
    column: str
    op: str           # exact | prefix | postfix | contains | regex | exist |
                      # between | gt | ge | lt | le | in | compound
    value: Any = None
    value2: Any = None                 # between upper bound
    children: list["ColumnFilter"] = field(default_factory=list)
    compound_op: str = "and"           # for op == "compound"
    negate: bool = False


@dataclass
class LogQuery:
    time_start: str | None = None      # ISO strings; closed-open [start, end)
    time_end: str | None = None
    time_column: str = "ts"
    filters: list[ColumnFilter] = field(default_factory=list)
    columns: list[str] | None = None   # projection; None → all
    limit: int | None = None


def _compile_filter(f: ColumnFilter) -> Column:
    c = F.col(f.column) if f.column else None
    op = f.op.lower()
    if op == "compound":
        parts = [_compile_filter(ch) for ch in f.children]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if f.compound_op == "and" else (out | p)
    elif op == "exact":
        out = c == f.value
    elif op == "prefix":
        out = c.startswith(str(f.value))
    elif op == "postfix":
        out = c.endswith(str(f.value))
    elif op == "contains":
        out = c.contains(str(f.value))
    elif op == "regex":
        out = c.rlike(str(f.value))
    elif op == "exist":
        out = c.isNotNull()
    elif op == "between":
        out = c.between(f.value, f.value2)
    elif op == "gt":
        out = c > f.value
    elif op == "ge":
        out = c >= f.value
    elif op == "lt":
        out = c < f.value
    elif op == "le":
        out = c <= f.value
    elif op == "in":
        out = c.isin(list(f.value))
    else:
        raise ValueError(f"unknown filter op {f.op!r}")
    return ~out if f.negate else out


def run_log_query(df: DataFrame, q: LogQuery) -> DataFrame:
    out = df
    if q.time_start is not None:
        out = out.filter(F.col(q.time_column) >= F.lit(q.time_start).cast("timestamp"))
    if q.time_end is not None:
        out = out.filter(F.col(q.time_column) < F.lit(q.time_end).cast("timestamp"))
    for f in q.filters:
        out = out.filter(_compile_filter(f))
    if q.columns:
        out = out.select(*q.columns)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def parse_log_query(payload: dict) -> LogQuery:
    """JSON body → LogQuery (mirrors the reference's HTTP API shape)."""
    def pf(d: dict) -> ColumnFilter:
        return ColumnFilter(
            column=d.get("column", ""),
            op=d["op"],
            value=d.get("value"),
            value2=d.get("value2"),
            children=[pf(ch) for ch in d.get("children", [])],
            compound_op=d.get("compound_op", "and"),
            negate=d.get("negate", False),
        )

    return LogQuery(
        time_start=payload.get("time_start"),
        time_end=payload.get("time_end"),
        time_column=payload.get("time_column", "ts"),
        filters=[pf(f) for f in payload.get("filters", [])],
        columns=payload.get("columns"),
        limit=payload.get("limit"),
    )
