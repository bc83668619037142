"""Prometheus metadata HTTP API over the PromQL engine's tables.

The reference serves `/api/v1/labels`, `/api/v1/label/<name>/values` and
`/api/v1/series` next to query/query_range
(src/servers/src/http/prometheus.rs: labels_query:616,
label_values_query:1583, series_query:1999). These are the endpoints
Grafana hits to populate dropdowns; this module is their engine-side
analog over the same ``{metric: MetricTable}`` registry
``PromQLEngine`` evaluates against.

Reference semantics preserved:
- labels without ``match[]`` = every tag column name across all tables
  plus ``__name__``, sorted (get_all_column_names — schema-only, no scan).
- labels with ``match[]`` = the tag columns of the matched tables only.
- label_values("__name__") = the metric (table) names, sorted.
- label_values(tag) = distinct live values of that tag across matched
  tables inside [start, end] — a data scan: one distinct per table,
  unioned; at scale each is scan + partial-agg distinct on one column.
- series = the distinct labelsets (including ``__name__``) each selector
  matches inside [start, end].

Wire shape: ``prometheus_metadata_response`` wraps any of these in the
``{"status": "success", "data": ...}`` envelope PromJsonResponse emits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from greptimedb_spark.promql.parser import VectorSelector, parse_promql

METRIC_NAME = "__name__"


def _selector(query: str) -> VectorSelector:
    node = parse_promql(query)
    if not isinstance(node, VectorSelector):
        raise ValueError(
            f"match[] must be a series selector, got: {query}")
    return node


def _metric_of(sel: VectorSelector) -> str | None:
    if sel.metric:
        return sel.metric
    for m in sel.matchers:
        if m.name == METRIC_NAME and m.op == "=":
            return m.value
    return None


def _matcher_cond(sel: VectorSelector, tags: list[str]):
    cond = F.lit(True)
    for m in sel.matchers:
        if m.name in (METRIC_NAME, "__schema__", "__database__", "__field__"):
            continue
        if m.name not in tags:
            # a matcher on a non-existent label sees the empty string
            import re as _re

            if m.op == "=":
                ok = m.value == ""
            elif m.op == "!=":
                ok = m.value != ""
            elif m.op == "=~":
                ok = bool(_re.fullmatch(f"(?:{m.value})", ""))
            else:  # !~
                ok = not _re.fullmatch(f"(?:{m.value})", "")
            if not ok:
                return F.lit(False)
            continue
        col = F.coalesce(F.col(m.name), F.lit(""))
        if m.op == "=":
            cond = cond & (col == m.value)
        elif m.op == "!=":
            cond = cond & (col != m.value)
        elif m.op == "=~":
            cond = cond & col.rlike(f"^(?:{m.value})$")
        elif m.op == "!~":
            cond = cond & ~col.rlike(f"^(?:{m.value})$")
    return cond


def _window(df, time_index: str, start_ms: int | None, end_ms: int | None):
    if start_ms is not None:
        df = df.filter(F.unix_millis(F.col(time_index)) >= start_ms)
    if end_ms is not None:
        df = df.filter(F.unix_millis(F.col(time_index)) <= end_ms)
    return df


def label_names(tables: dict, matches: list[str] | None = None) -> list[str]:
    """`/api/v1/labels`: sorted tag-column names (+ __name__); with
    ``match[]`` selectors, only the matched tables' tags (schema-level,
    like the reference's get_all/get_target_column_names)."""
    names = {METRIC_NAME}
    if not matches:
        for mt in tables.values():
            names.update(mt.tags)
    else:
        for q in matches:
            metric = _metric_of(_selector(q))
            mt = tables.get(metric)
            if mt is not None:
                names.update(mt.tags)
    return sorted(names)


def label_values(tables: dict, label: str,
                 matches: list[str] | None = None,
                 start_ms: int | None = None,
                 end_ms: int | None = None) -> list[str]:
    """`/api/v1/label/<name>/values`: __name__ -> sorted metric names;
    a tag -> sorted distinct live values inside the window, evaluated
    per selector and UNIONED across selectors (the reference's
    label_values_query runs each match[] as its own PromQuery and
    merges results — prometheus.rs:1583 — so
    match[]=up{job="a"}&match[]=up{job="b"} returns both jobs'
    values). Tag labels without match[] are InvalidArguments in the
    reference; mirrored here as ValueError."""
    if label == METRIC_NAME:
        names = set(tables)
        if matches:
            names &= {_metric_of(_selector(q)) for q in matches}
        return sorted(n for n in names if n)
    if not matches:
        raise ValueError("match[] parameter is required")
    out: set[str] = set()
    for q in matches:
        sel = _selector(q)
        mt = tables.get(_metric_of(sel))
        if mt is None or label not in mt.tags:
            continue
        df = _window(mt.df, mt.time_index, start_ms, end_ms)
        df = df.filter(_matcher_cond(sel, mt.tags))
        rows = df.select(label).where(
            F.col(label).isNotNull()).distinct().collect()
        out.update(r[0] for r in rows)
    return sorted(out)


def series(tables: dict, matches: list[str],
           start_ms: int | None = None,
           end_ms: int | None = None) -> list[dict]:
    """`/api/v1/series`: the distinct labelsets (with __name__) each
    selector matches inside [start, end], deduplicated across selectors
    and sorted for determinism."""
    if not matches:
        raise ValueError("match[] parameter is required")
    seen: set = set()
    out: list[dict] = []
    for q in matches:
        sel = _selector(q)
        metric = _metric_of(sel)
        mt = tables.get(metric)
        if mt is None:
            continue
        df = _window(mt.df, mt.time_index, start_ms, end_ms)
        df = df.filter(_matcher_cond(sel, mt.tags))
        for r in df.select(*mt.tags).distinct().collect():
            labels = {METRIC_NAME: metric}
            labels.update({t: r[t] for t in mt.tags if r[t] is not None})
            key = tuple(sorted(labels.items()))
            if key not in seen:
                seen.add(key)
                out.append(labels)
    out.sort(key=lambda d: sorted(d.items()))
    return out


def prometheus_metadata_response(data) -> dict:
    """PromJsonResponse success envelope (prometheus.rs
    PrometheusJsonResponse::success)."""
    return {"status": "success", "data": data}
