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
from pyspark.sql import functions as F

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
    r"^\s*TQL\s+EVAL\s*\(\s*([^,]+)\s*,\s*([^,]+)\s*,\s*([^,)]+)\s*"
    r"(?:,\s*([^)]+)\s*)?\)\s*,?\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)
# TQL EVAL with the (start, end, step) omitted → defaults (0, 0, '1s')
# (reference parser allows it; promql/label.result exercises it)
_TQL_NOARGS_RE = re.compile(
    r"^\s*TQL\s+EVAL\s+(?!\()(.*)$", re.IGNORECASE | re.DOTALL
)


def _strip_line_comments(text: str) -> str:
    """Remove `-- ...` end-of-line comments outside string literals."""
    out = []
    for line in text.splitlines():
        res, i, q = [], 0, None
        while i < len(line):
            ch = line[i]
            if q:
                if ch == q:
                    q = None
                res.append(ch)
            elif ch in ("'", '"'):
                q = ch
                res.append(ch)
            elif ch == "-" and line[i : i + 2] == "--":
                break
            else:
                res.append(ch)
            i += 1
        out.append("".join(res))
    return "\n".join(out)


def _rewrite_atat(text: str) -> str:
    def repl(m: re.Match) -> str:
        col, term = m.group(1), re.escape(m.group(2))
        return f"{col} RLIKE '(^|[^a-zA-Z0-9_]){term}($|[^a-zA-Z0-9_])'"

    return _ATAT_RE.sub(repl, text)


def _rewrite_aliases(text: str) -> str:
    for old, new in _ALIASES.items():
        text = re.sub(rf"\b{old}\s*\(", f"{new}(", text, flags=re.IGNORECASE)
    return text


_COLON_CAST_RE = re.compile(
    r"('(?:[^']*)'|\b\w+(?:\([^()]*\))?)\s*::\s*(\w+(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)


def _rewrite_colon_cast(text: str) -> str:
    """DataFusion `expr::TYPE` cast → CAST(expr AS TYPE). Handles literal and
    simple-identifier/call operands (the forms the sqlness corpus uses)."""

    def repl(m: re.Match) -> str:
        val, typ = m.group(1), m.group(2)
        if re.fullmatch(r"'(?:nan|NAN|NaN)'", val) and typ.lower() in ("double", "float64"):
            val = "'NaN'"  # Spark double parsing accepts only this spelling
        return f"CAST({val} AS {_map_type(typ)})"

    return _COLON_CAST_RE.sub(repl, text)


def _parse_time_arg(arg: str) -> int:
    """TQL time bound: epoch seconds or ISO string → epoch ms."""
    a = arg.strip().strip("'\"")
    if re.fullmatch(r"-?\d+(\.\d+)?", a):
        return int(float(a) * 1000)
    import datetime as dt

    d = dt.datetime.fromisoformat(a.replace("T", " ").replace("Z", ""))
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


_TYPE_MAP = {
    # greptime type → spark type (SURVEY.md §1.2)
    "tinyint": "tinyint", "int8": "tinyint", "smallint": "smallint", "int16": "smallint",
    "int": "int", "int32": "int", "integer": "int", "bigint": "bigint", "int64": "bigint",
    "uint8": "smallint", "uint16": "int", "uint32": "bigint", "uint64": "decimal(20,0)",
    "float": "float", "float32": "float", "double": "double", "float64": "double",
    "string": "string", "varchar": "string", "text": "string", "char": "string",
    "binary": "binary", "varbinary": "binary", "boolean": "boolean", "bool": "boolean",
    "date": "date", "datetime": "timestamp",
}


def _map_type(t: str) -> str:
    t = t.strip().lower()
    m = re.match(r"timestamp(?:\((\d)\))?", t)
    if m:
        return "timestamp"
    if t.startswith("decimal"):
        return t
    if t.startswith("vector"):
        return "array<float>"
    return _TYPE_MAP.get(t, t)


def _ts_unit(t: str) -> str:
    """Integer-literal unit for a greptime timestamp type: timestamp(0)=s,
    (3)=ms, (6)=µs, (9)=ns; bare timestamp defaults to ms."""
    m = re.match(r"timestamp(?:\((\d)\))?", t.strip().lower())
    if not m:
        return "ms"
    return {None: "ms", "0": "s", "3": "ms", "6": "us", "9": "ns"}.get(m.group(1), "ms")


class GreptimeSQL:
    """Session facade: spark.sql + dialect rewrites + PromQL metric registry.

    With a Catalog attached, GreptimeDB DDL/DML runs too — so the reference's
    own sqlness scripts work end-to-end:

        CREATE TABLE host (ts timestamp(3) time index, host STRING PRIMARY KEY,
                           val BIGINT) [WITH (append_mode='true', ttl='7d', ...)]
        INSERT INTO [TABLE] host VALUES (0, 'host1', 0), ...
        DROP TABLE host
        SELECT ts, host, min(val) RANGE '5s' FROM host ALIGN '5s' ...

    Tables read back as their merged logical view (upsert semantics) under
    their own name in the Spark catalog.
    """

    def __init__(self, spark: SparkSession, promql_tables: dict | None = None,
                 lookback_ms: int = 300_000, catalog=None):
        self.spark = spark
        self.promql_tables = promql_tables or {}
        self.lookback_ms = lookback_ms
        self.catalog = catalog

    def register_metric(self, name: str, table) -> None:
        self.promql_tables[name] = table

    # -- DDL/DML ----------------------------------------------------------

    _INSERT_RE = re.compile(
        r"^\s*INSERT\s+INTO\s+(?:TABLE\s+)?\"?(\w+)\"?\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_RE = re.compile(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?\"?(\w+)\"?\s*$", re.IGNORECASE)
    _DELETE_RE = re.compile(
        r"^\s*DELETE\s+FROM\s+\"?(\w+)\"?\s*(?:WHERE\s+(.*))?$",
        re.IGNORECASE | re.DOTALL,
    )

    def _ddl(self, text: str):
        if self.catalog is None:
            return None
        text = text.replace('`', '')
        from greptimedb_spark.catalog import TableMeta

        # PARTITION ON COLUMNS (...) (...) — the reference's range-sharding
        # clause; region placement maps to Parquet bucket layout + hash
        # shuffles here, so the clause is accepted and dropped
        text = re.sub(
            r"PARTITION\s+ON\s+COLUMNS\s*\([^)]*\)\s*\((?:[^()]|\([^()]*\))*\)",
            "",
            text,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if not self._INSERT_RE.match(text.strip().rstrip(";")):
            # ANSI double-quoted identifiers → bare (NOT in INSERT, where
            # double quotes are string literals in the reference dialect)
            text = re.sub(r'"(\w+)"', r"\1", text)
        # CREATE parsed by paren-depth (trailing ENGINE=/WITH() clauses make
        # a single greedy regex mis-capture the column list)
        cm0 = re.match(
            r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\(",
            text.strip().rstrip(";"),
            re.IGNORECASE,
        )
        m = cm0
        if cm0 is not None:
            body = text.strip().rstrip(";")
            name = cm0.group(1)
            cols_text, tail = _balanced_paren(body[cm0.end() - 1 :])
            wm = re.search(r"WITH\s*\(", tail, re.IGNORECASE)
            with_text = _balanced_paren(tail[wm.end() - 1 :])[0] if wm else None
        if m:
            cols, tags, time_index = [], [], None
            for item in _split_columns(cols_text):
                item = item.strip()
                if not item:
                    continue
                pk_inline = re.match(r"PRIMARY\s+KEY\s*\(([^)]*)\)", item, re.IGNORECASE)
                if pk_inline:
                    tags.extend(c.strip().strip('"`') for c in pk_inline.group(1).split(","))
                    continue
                ti_inline = re.match(r"TIME\s+INDEX\s*\(\s*\"?`?(\w+)`?\"?\s*\)", item, re.IGNORECASE)
                if ti_inline:
                    time_index = ti_inline.group(1)
                    continue
                if re.match(r"(FULLTEXT|INVERTED|SKIPPING)\s+INDEX", item, re.IGNORECASE):
                    continue  # index clauses: Parquet stats/bloom serve these
                cm = re.match(r"(\w+)\s+([\w()]+)(.*)", item, re.DOTALL)
                col, typ, rest = cm.group(1), cm.group(2), cm.group(3) or ""
                cols.append((col, _map_type(typ)))
                self._ts_units = getattr(self, "_ts_units", {})
                self._ts_units.setdefault(name, {})[col] = _ts_unit(typ)
                if re.search(r"TIME\s+INDEX", rest, re.IGNORECASE):
                    time_index = col
                if re.search(r"PRIMARY\s+KEY", rest, re.IGNORECASE):
                    tags.append(col)
            opts = {}
            if with_text:
                for kv in with_text.split(","):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        opts[k.strip().strip("'\"")] = v.strip().strip("'\"")
            meta = TableMeta(
                name=name,
                time_index=time_index or cols[0][0],
                tags=[t for t in tags if t != time_index],
                merge_mode=opts.get("merge_mode", "last_row"),
                append_mode=opts.get("append_mode", "false").lower() == "true",
                ttl=opts.get("ttl"),
                columns=[list(c) for c in cols],
            )
            self.catalog.create_table(meta, if_not_exists="IF NOT EXISTS" in text.upper())
            self._schemas = getattr(self, "_schemas", {})
            self._schemas[name] = cols
            return self.spark.createDataFrame([], "result string")
        m = self._INSERT_RE.match(text.strip().rstrip(";"))
        if m:
            name, col_list, values_text = m.groups()
            known = getattr(self, "_schemas", {})
            if name not in known:
                # recover the declared schema from the catalog meta (table
                # created by an earlier session)
                try:
                    meta_cols = self.catalog.meta(name).columns
                except FileNotFoundError:
                    meta_cols = None
                if not meta_cols:
                    raise ValueError(
                        f"table {name!r} does not exist (known: {sorted(known)})"
                    )
                known = getattr(self, "_schemas", {})
                known[name] = [tuple(c) for c in meta_cols]
                self._schemas = known
            full_cols = self._schemas[name]
            cols = full_cols
            if col_list:
                order = [c.strip().strip('"`') for c in col_list.split(",")]
                cols = [next(c for c in full_cols if c[0] == o) for o in order]
            # evaluate the VALUES rows with Spark itself (handles literals,
            # strings, nulls, ISO timestamps the same way the reference does);
            # integer literals for timestamp columns are epoch values in the
            # column's declared precision (timestamp(0)=s .. timestamp(9)=ns)
            values_text = values_text.strip().rstrip(",")  # trailing comma (commented-out tuple)
            raw = self.spark.sql(f"SELECT * FROM VALUES {values_text}").toDF(
                *[f"col{i + 1}" for i in range(len(cols))]
            )
            units = getattr(self, "_ts_units", {}).get(name, {})
            int_to_ts = {
                "s": "timestamp_seconds({v})",
                "ms": "timestamp_millis({v})",
                "us": "timestamp_micros({v})",
                "ns": "timestamp_micros(CAST({v} / 1000 AS BIGINT))",
            }
            exprs = []
            for i, (c, t) in enumerate(cols):
                v = f"col{i + 1}"
                if t == "timestamp":
                    if dict(raw.dtypes)[v] in ("bigint", "int", "smallint", "tinyint"):
                        tpl = int_to_ts[units.get(c, "ms")]
                        exprs.append(tpl.format(v=f"CAST({v} AS BIGINT)") + f" AS {c}")
                    else:
                        exprs.append(f"CAST(CAST({v} AS STRING) AS TIMESTAMP) AS {c}")
                else:
                    exprs.append(f"CAST({v} AS {t}) AS {c}")
            df = raw.selectExpr(*exprs)
            listed = {c for c, _t in cols}
            if listed != {c for c, _t in full_cols}:
                # column-list INSERT: null-fill the unlisted columns and emit
                # in declared order so every parquet file shares one schema
                df = df.select(
                    *[
                        F.col(c) if c in listed else F.lit(None).cast(t).alias(c)
                        for c, t in full_cols
                    ]
                )
            self.catalog.insert(name, df)
            self.catalog.read(name).createOrReplaceTempView(name)
            return self.spark.createDataFrame([], "result string")
        m = self._DROP_RE.match(text.strip().rstrip(";"))
        if m:
            self.catalog.drop_table(m.group(1))
            self.spark.catalog.dropTempView(m.group(1))
            return self.spark.createDataFrame([], "result string")
        m = self._DELETE_RE.match(text.strip().rstrip(";"))
        if m:
            name, pred = m.groups()
            meta = self.catalog.meta(name)
            pred = pred.strip() if pred else "true"
            try:
                self.catalog.delete(name, pred)
            except Exception:
                # `ts = 0`-style integer comparisons against the timestamp
                # column: rewrite the time index to its declared integer unit
                unit = getattr(self, "_ts_units", {}).get(name, {}).get(
                    meta.time_index, "ms"
                )
                conv = {
                    "s": "unix_seconds({c})",
                    "ms": "unix_millis({c})",
                    "us": "unix_micros({c})",
                    "ns": "unix_micros({c}) * 1000",
                }[unit].format(c=meta.time_index)
                pred2 = re.sub(rf"\b{meta.time_index}\b", f"({conv})", pred)
                self.catalog.delete(name, pred2)
            self.catalog.read(name).createOrReplaceTempView(name)
            return self.spark.createDataFrame([], "result string")
        return None

    _SET_TZ_RE = re.compile(r"^\s*SET\s+time_zone\s*=\s*'([^']*)'\s*$", re.IGNORECASE)

    def sql(self, text: str, time_index: str = "ts") -> DataFrame:
        text = _strip_line_comments(text)
        text = _rewrite_colon_cast(text)
        m = self._SET_TZ_RE.match(text.strip().rstrip(";"))
        if m:
            self.tz_offset_ms = _tz_offset_ms(m.group(1))
            return self.spark.createDataFrame([], "result string")
        ddl = self._ddl(text)
        if ddl is not None:
            return ddl
        tql_groups = None
        m = _TQL_RE.match(text)
        if m:
            tql_groups = m.groups()
        else:
            m2 = _TQL_NOARGS_RE.match(text.strip().rstrip(";"))
            if m2:
                tql_groups = ("0", "0", "'1s'", None, m2.group(1))
        if tql_groups is not None:
            from greptimedb_spark.promql import MetricTable, PromQLEngine

            start, end, step, lookback, promql = tql_groups
            promql = promql.strip().rstrip(";")
            # trailing `AS name` renames the value column (reference tql.rs)
            value_alias = "value"
            alias_m = re.search(r"\s+AS\s+(\w+)\s*$", promql, re.IGNORECASE)
            if alias_m:
                value_alias = alias_m.group(1)
                promql = promql[: alias_m.start()]
            tables = dict(self.promql_tables)
            if self.catalog is not None:
                for t in self.catalog.list_tables():
                    if t in tables:
                        continue
                    meta = self.catalog.meta(t)
                    df = (
                        self.spark.table(t)
                        if self.spark.catalog.tableExists(t)
                        else self.catalog.read(t)
                    )
                    fields = [
                        c for c in df.columns
                        if c not in meta.tags and c != meta.time_index
                    ]
                    if not fields:
                        continue
                    tables[t] = MetricTable(
                        df, value_col=fields[0], time_index=meta.time_index,
                        tags=meta.tags, fields=fields,
                    )
            lookback_ms = _parse_step(lookback) if lookback else self.lookback_ms
            eng = PromQLEngine(self.spark, tables, lookback_ms)
            out = eng.evaluate(
                promql, _parse_time_arg(start), _parse_time_arg(end), _parse_step(step)
            )
            return out.withColumnRenamed("value", value_alias) if value_alias != "value" else out
        text = _rewrite_atat(text)
        text = _rewrite_aliases(text)
        if not re.match(r"^\s*INSERT", text, re.IGNORECASE):
            text = re.sub(r'"(\w+)"', r"\1", text)  # ANSI quoted identifiers
        if re.search(r"\bALIGN\s+['(]", text, re.IGNORECASE):
            from greptimedb_spark.range_query import parse_range_sql, range_sql

            default_by = None
            if self.catalog is not None:
                try:
                    meta = self.catalog.meta(parse_range_sql(text)["table"])
                    default_by = meta.tags
                    time_index = meta.time_index
                except FileNotFoundError:
                    pass
            return range_sql(
                self.spark, text, time_index=time_index, default_by=default_by,
                tz_offset_ms=getattr(self, "tz_offset_ms", 0),
            )
        return self.spark.sql(text)


def _tz_offset_ms(tz: str) -> int:
    """'+08:00' / 'Asia/Shanghai' / 'UTC' → offset milliseconds."""
    tz = tz.strip()
    m = re.fullmatch(r"([+-])(\d{2}):(\d{2})", tz)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return sign * (int(m.group(2)) * 3600 + int(m.group(3)) * 60) * 1000
    if tz.upper() in ("UTC", "GMT", ""):
        return 0
    import datetime as dt
    from zoneinfo import ZoneInfo

    off = dt.datetime(1970, 1, 1, tzinfo=ZoneInfo(tz)).utcoffset()
    return int(off.total_seconds() * 1000)


def _balanced_paren(s: str) -> tuple[str, str]:
    """``s`` starts at '(' → (inner text, remainder after the matching ')')."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i], s[i + 1 :]
    return s[1:], ""


def _split_columns(text: str) -> list[str]:
    out, depth, cur = [], 0, ""
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(cur)
            cur = ""
            continue
        cur += ch
    if cur.strip():
        out.append(cur)
    return out


def _parse_step(step: str) -> int:
    s = step.strip().strip("'\"")
    if re.fullmatch(r"\d+(\.\d+)?", s):
        return int(float(s) * 1000)
    from greptimedb_spark.promql.parser import parse_duration

    return parse_duration(s)
