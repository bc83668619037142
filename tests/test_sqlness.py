"""Mini-sqlness runner: execute the reference's OWN .sql case files through
GreptimeSQL and compare against the .result golden tables (the reference's
primary test mechanism, SURVEY.md §5).

Statements whose syntax is outside the supported dialect subset are skipped
(counted); every executed SELECT must match its golden table as a multiset.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import re
import time

import pytest

REF = "/root/reference/tests/cases/standalone/common"

# Per-case checked/skipped ledger: a statement that starts raising after a
# regression silently converts from "checked" to "skipped" (the harness
# counts exceptions as skips by design) — the ledger turns any drop in a
# case's checked count into a hard failure. Regenerate after intentionally
# widening coverage: SPARK_GRAFT_UPDATE_LEDGER=1 python -m pytest tests/test_sqlness.py
_LEDGER_PATH = os.path.join(os.path.dirname(__file__), "conformance_ledger.json")


def _ledger() -> dict:
    import json

    if not os.path.exists(_LEDGER_PATH):
        return {}
    with open(_LEDGER_PATH) as f:
        return json.load(f)


def _record_ledger(case: str, checked: int, skipped: int, errored: int,
                   errs: list) -> None:
    import json

    led = _ledger()
    prior = led.get(case)
    if os.environ.get("SPARK_GRAFT_UPDATE_LEDGER"):
        led[case] = {"checked": checked, "skipped": skipped,
                     "errored": errored}
        with open(_LEDGER_PATH, "w") as f:
            json.dump(dict(sorted(led.items())), f, indent=1)
            f.write("\n")
        return
    if prior is not None:
        assert checked >= prior["checked"], (
            f"conformance regression: {case} verified {checked} statements, "
            f"ledger has {prior['checked']} ({skipped} skipped, {errored} "
            f"errored: {errs[:3]})")
        # exception-class skips are a ratchet: any NEW statement raising
        # (instead of being explicitly skip-listed) fails loudly here
        assert errored <= prior.get("errored", errored), (
            f"exception-skip regression: {case} had {errored} statements "
            f"raise (ledger floor {prior.get('errored')}); new: {errs[:5]}")

# reference-dialect fragments our shim does not translate (skipped, counted)
_SKIP_PATTERNS = [
    r"TO\s+NOW\b",    # nondeterministic origin (RANGE … ALIGN … TO NOW)
    r"\bgcd\b",       # DataFusion-only scalar in calculate.sql
    # approximate-sketch ESTIMATES differ by engine (Spark HLL vs DataFusion
    # HLL) once the input exceeds the exact range — values can't match
    r"APPROX_DISTINCT\(a\).*FROM\s+large_test",
    # golden table is destroyed by its own `REPLACE [\s\-]+` directive
    r"^\s*select\s+current_time\(\)",
    # physical plan dumps are engine-specific text
    r"^\s*EXPLAIN\b",
    r"^\s*TQL\s+(ANALYZE|EXPLAIN)\b",
    # mysql-protocol transcript lines in insert/mysql_insert goldens
    r"^\s*affected_rows:",
    r"^\s*Failed to execute query",
]


_REPLACE_DIRECTIVE = re.compile(r"--\s*SQLNESS\s+REPLACE\s+(\S+)\s*(.*?)\s*$")
_SLEEP_DIRECTIVE = re.compile(r"--\s*SQLNESS\s+SLEEP\s+(\d+)s", re.IGNORECASE)


def _parse_result_file(path: str):
    """Yield (statement, expected, replaces) where expected is None
    (non-query), 'error' or list[list[str]] table rows, and replaces is the
    list of (regex, replacement) SQLNESS REPLACE directives preceding the
    statement (applied to the engine's rendered output before comparing,
    exactly like the reference's sqlness runner)."""
    text = open(path).read()
    # strip comments, but keep SQLNESS directives attached to the next stmt
    raw_lines = text.splitlines()
    lines = []
    directives: dict[int, list] = {}
    pending: list = []
    for l in raw_lines:
        if l.strip().startswith("--"):
            m = _REPLACE_DIRECTIVE.match(l.strip())
            if m:
                pat = m.group(1)
                # the reference's sqlness runner uses Rust regex, which
                # accepts POSIX classes Python's re doesn't (ssts.sql)
                for posix, py in (("[:blank:]", " \\t"), ("[:space:]", "\\s"),
                                  ("[:digit:]", "0-9"), ("[:alnum:]", "0-9A-Za-z"),
                                  ("[:alpha:]", "A-Za-z"),
                                  ("[:xdigit:]", "0-9A-Fa-f")):
                    pat = pat.replace(posix, py)
                pending.append((pat, m.group(2)))
            m = _SLEEP_DIRECTIVE.match(l.strip())
            if m:
                pending.append(("__SLEEP__", int(m.group(1))))
            if re.match(r"--\s*SQLNESS\s+ARG\s+restart=true", l.strip(),
                        re.IGNORECASE):
                pending.append(("__RESTART__", 1))
            if re.match(r"--\s*SQLNESS\s+PROTOCOL\s+MYSQL", l.strip(),
                        re.IGNORECASE):
                # mysql wire rendering: booleans print 0/1
                pending.append(("__MYSQL__", 1))
            if re.match(r"--\s*SQLNESS\s+PROTOCOL\s+POSTGRES", l.strip(),
                        re.IGNORECASE):
                # postgres wire rendering: booleans print t/f; pg_catalog
                # tables become visible
                pending.append(("__POSTGRES__", 1))
            if re.match(r"--\s*SQLNESS\s+SORT_RESULT", l.strip(),
                        re.IGNORECASE):
                # the reference runner sorts the rendered LINES, shuffling
                # the header row into the data block
                pending.append(("__SORT_RESULT__", 1))
            continue
        if pending and l.strip():
            directives[len(lines)] = pending
            pending = []
        lines.append(l)
    i = 0
    out = []
    while i < len(lines):
        # statement: up to a line ending with ';'
        stmt_lines = []
        replaces = directives.get(i, [])
        while i < len(lines):
            replaces = replaces or directives.get(i, [])
            stmt_lines.append(lines[i])
            if lines[i].rstrip().endswith(";"):
                i += 1
                break
            i += 1
        stmt = "\n".join(stmt_lines).strip().rstrip(";").strip()
        if not stmt:
            continue
        # response: either 'Affected Rows: N', 'Error: ...', or an ascii table
        while i < len(lines) and not lines[i].strip():
            i += 1
        expected = None
        if i < len(lines):
            line = lines[i].strip()
            if line.startswith("Affected Rows") or \
                    line.startswith("affected_rows"):
                # second spelling: mysql-protocol transcript (mysql_insert)
                expected = None
                i += 1
            elif line.startswith("Error") or line.startswith(
                    "Failed to execute query"):
                # "Failed to execute query, err: MySqlError…" is the
                # mysql-protocol error transcript form (read_preference.sql)
                expected = "error"
                i += 1
                # multi-line error bodies ("Candidate functions:" etc.)
                # continue until a blank line
                while i < len(lines) and lines[i].strip():
                    i += 1
            elif line == "++":
                expected = ([], [])
                i += 2  # '++' twice = zero-column empty table
            elif line.startswith("+") and not re.fullmatch(r"[+-]+", line):
                # a REPLACE directive collapsed the golden table into opaque
                # text (function/time.sql & system.sql `REPLACE [\s\-]+`,
                # pg_catalog's handshake SELECT): capture the munged text —
                # _run_case re-renders the engine's table, applies the same
                # directives, and compares the opaque strings
                block = []
                while i < len(lines) and lines[i].strip():
                    block.append(lines[i].strip())
                    i += 1
                expected = ("opaque", "".join(block))
            elif line.startswith("+"):
                # slice rows at the BORDER's '+' offsets — cell data may
                # itself contain '|' (e.g. concat_ws('|', …)), so splitting
                # on pipes corrupts such rows
                border = lines[i].rstrip()
                cuts = [j for j, ch in enumerate(border) if ch == "+"]

                def _slice(row_line):
                    row_line = row_line.rstrip("\n")
                    # wide (CJK) characters shift python indexes off the
                    # display-width-aligned borders — only slice when every
                    # cut lands on a '|'; else fall back to pipe-splitting
                    aligned = len(row_line) == len(border) and all(
                        row_line[j] == "|" for j in cuts
                    )
                    if aligned:
                        return [
                            row_line[a + 1:b].strip() if a + 1 < len(row_line) else ""
                            for a, b in zip(cuts, cuts[1:])
                        ]
                    return [c.strip() for c in row_line.strip().strip("|").split("|")]

                i += 1  # top border
                header = _slice(lines[i])
                i += 1  # header
                i += 1  # header border
                rows = []
                while i < len(lines) and lines[i].strip().startswith("|"):
                    rows.append(_slice(lines[i]))
                    i += 1
                i += 1  # bottom border
                expected = (header, rows)
        out.append((stmt, expected, replaces))
    return out


_DUR_TEXT_RE = re.compile(
    r"(\s*[-+]?\d+(?:\.\d+)?\s*"
    r"(?:mons?|months?|days?|hours?|hrs?|mins?|minutes?|secs?|seconds?|years?))+\s*",
    re.IGNORECASE,
)


def _canon_duration(v):
    """Durations/intervals appear in goldens in several spellings depending
    on the arrow type (Duration 'PT900S'/'P0D', IntervalDayTime
    '00:00:00.918', IntervalMonthDayNano '3 hours' / '14 mons 3 days …');
    the engine returns timedeltas. Canonicalize all of them to
    ('dur', months, seconds) so spelling differences don't fail the diff."""
    if isinstance(v, dt.timedelta):
        return ("dur", 0, round(v.total_seconds(), 9))
    if not isinstance(v, str):
        return None
    t = v.strip()
    m = re.fullmatch(r"([+-])?(\d{1,6}):(\d{2}):(\d{2}(?:\.\d+)?)", t)
    if m:
        sign = -1 if m.group(1) == "-" else 1
        return ("dur", 0, round(sign * (int(m.group(2)) * 3600
                                        + int(m.group(3)) * 60
                                        + float(m.group(4))), 9))
    if re.fullmatch(r"[+-]?P[0-9TYMWDHS.]+", t, re.IGNORECASE) or \
            _DUR_TEXT_RE.fullmatch(t):
        from greptimedb_spark.functions.interval_mdn import parse_interval_mdn

        try:
            mo, d, ns = parse_interval_mdn(t)
        except ValueError:
            return None
        return ("dur", mo, round(d * 86400 + ns / 1e9, 9))
    return None


def _norm_cell(v):
    if v is None or v == "":
        return None
    dur = _canon_duration(v)
    if dur is not None:
        return dur
    if isinstance(v, str):
        ext = _canon_ext_ts(v)
        if ext is not None:
            return ext
    if isinstance(v, (bytes, bytearray)):
        # reference renders binary as lowercase hex; empty renders blank
        return bytes(v).hex() or None
    if type(v).__name__ == "VariantVal":
        return str(v)  # variant renders as compact JSON
    if isinstance(v, list):
        # arrow renders arrays as [a, b] (elements unquoted)
        return "[" + ", ".join(_render_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"  # arrow prints booleans lowercase
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        # Date32 vs timestamp-at-midnight: compare on the same axis (date
        # arithmetic widens to timestamp under Spark's interval typing)
        return dt.datetime(v.year, v.month, v.day)
    s = str(v)
    m = re.fullmatch(r"\d{4}-\d{2}-\d{2}[T ][\d:.]+", s)
    if m:
        return dt.datetime.fromisoformat(s).replace(tzinfo=None)
    if isinstance(v, str) and re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        return dt.datetime.fromisoformat(s)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    # binary cells render as long hex strings; float() would misread e.g.
    # '0000e040' as 0e40 == 0.0, masking real mismatches between distinct
    # blobs — skip float coercion for hex-blob-shaped strings (even-length,
    # ≥8 chars, only [0-9a-f], at least one letter; engine/reference float
    # renderings always carry a '.' or a signed exponent so never match)
    hexish = (isinstance(v, str) and len(s) >= 8 and len(s) % 2 == 0
              and re.fullmatch(r"[0-9a-f]*[a-f][0-9a-f]*", s) is not None)
    if not hexish and not (isinstance(v, str)
                           and re.fullmatch(r"[+-]?\d+[eE][+-]?\d{4,}", s)):
        try:
            f = float(s)
            if math.isnan(f):
                return "NaN"
            f = round(f, 9)
            # canonicalize -0.0: Spark normalizes negative zero on output
            # (SPARK-26021) and -0.0 == 0.0 anyway — but their str() differs,
            # which would make the row sort-key inconsistent with equality
            return 0.0 if f == 0 else f
        except (ValueError, TypeError):
            pass
    # ascii-table cells lose edge whitespace in the golden parser —
    # normalize engine strings the same way (all-space reads as NULL)
    return s.strip() or None


def _collect(df):
    """collect(), retrying with timestamp columns cast to strings when the
    values exceed python datetime's year range (timestamp.sql stores year
    ±262143 — fine in Spark's µs int64, unrepresentable in datetime)."""
    try:
        return df.collect()
    except Exception as e:
        if "out of range" not in str(e):
            raise
        from pyspark.sql import functions as F
        cols = [F.col(f.name).cast("string").alias(f.name)
                if f.dataType.typeName().startswith("timestamp")
                else F.col(f.name) for f in df.schema.fields]
        return df.select(cols).collect()


_EXT_YEAR_TS_RE = re.compile(
    r"([+-]?\d{4,7})-(\d{2})-(\d{2})[T ](\d{2}:\d{2}:\d{2})(\.\d+)?")


def _canon_ext_ts(s: str):
    """Canonical form for extended-year timestamp strings (beyond datetime's
    range): T separator, fraction with trailing zeros trimmed."""
    m = _EXT_YEAR_TS_RE.fullmatch(s.strip())
    if not m:
        return None
    y = int(m.group(1))
    if -9999 <= y <= 9999 and not m.group(1).startswith("+"):
        return None  # normal range — datetime parsing handles it
    frac = (m.group(5) or "").rstrip("0").rstrip(".")
    return f"{m.group(1)}-{m.group(2)}-{m.group(3)}T{m.group(4)}{frac}"


def _render_cell(v):
    """Render a Spark cell the way sqlness/arrow would print it (enough for
    SQLNESS REPLACE regexes to apply)."""
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dt.datetime):
        s = v.replace(tzinfo=None).isoformat()
        return s[:-3] if s.endswith("000") and "." in s else s
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    return str(v)


def _apply_replaces(v, replaces):
    """Apply SQLNESS REPLACE (pattern, replacement) pairs to a rendered cell.

    Patterns often include table-context whitespace (e.g. `(\\s1970-...)`), so
    match against the space-padded cell the way it appears in an ascii table.
    Integral floats are tried in both int and float spellings (the reference
    prints an Int64 column as `7` where our double prints `7.0`). If no
    pattern fires, the ORIGINAL value is returned so normal numeric/datetime
    normalization still applies."""
    if isinstance(v, float) and not math.isnan(v) and v == int(v) and abs(v) < 1e15:
        candidates = [str(int(v)), f"{v:.1f}"]
    else:
        candidates = [_render_cell(v)]
    for cand in candidates:
        # patterns may anchor on the ascii-table pipes ("\|\s+\d+\s+\|") or
        # only on the cell padding — try both renderings
        for s in (" " + cand + " ", "| " + cand + " |"):
            s2 = s
            for pat, rep in replaces:
                s2 = re.sub(pat, rep, s2)
            if s2 != s:
                return s2.strip().strip("|").strip()
    return v


def _expand_multiline_rows(rows):
    """Mirror the reference's ascii-table renderer: a cell containing
    newlines (e.g. SHOW CREATE FLOW definitions) is printed as continuation
    lines whose sibling cells are blank — the golden parser reads those as
    extra rows with None cells. Expand engine rows the same way so they
    compare 1:1."""
    out = []
    for row in rows:
        cells = list(row)
        if not any(isinstance(c, str) and "\n" in c for c in cells):
            out.append(cells)
            continue
        split = [c.split("\n") if isinstance(c, str) and "\n" in c else [c] for c in cells]
        depth = max(len(s) for s in split)
        for j in range(depth):
            out.append([s[j] if j < len(s) else None for s in split])
    return out


def _normalize_f32(df, rows):
    """FLOAT (f32) columns reach Python widened to f64 with garbage digits
    (-9.99…e37 for a stored -1e38); re-render through f32 repr the way the
    reference's arrow formatter prints Float32."""
    fcols = [i for i, (_, t) in enumerate(df.dtypes) if t == "float"]
    if not fcols:
        return rows
    import numpy as np

    def fix(i, v):
        if i in fcols and isinstance(v, float) and math.isfinite(v):
            return float(repr(np.float32(v)))
        return v

    return [[fix(i, v) for i, v in enumerate(row)] for row in rows]


def _case_path(case: str) -> str:
    """Most cases live under standalone/common; a few suites (copy/…) sit
    directly under standalone; a handful exist only under distributed
    (tsid_on_phy, flow_eval_interval_schedule, …)."""
    p = f"{REF}/{case}.result"
    if os.path.exists(p):
        return p
    sa = f"{os.path.dirname(REF)}/{case}.result"
    if os.path.exists(sa):
        return sa
    cases_root = os.path.dirname(os.path.dirname(REF))
    return f"{cases_root}/distributed/{case}.result"


def _render_opaque(df, rows, replaces, pg=False) -> str:
    """Re-create a REPLACE-destroyed golden: render the result as a minimal
    sqlness ascii table, apply the statement's REPLACE directives per line
    (exactly what the reference runner did to the real table), and join.
    Layout widths don't matter — the destroying directive (`[\\s\\-]+`)
    removes all whitespace and dashes from both renderings."""
    def cell(v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return ("t" if v else "f") if pg else ("true" if v else "false")
        # sqlness/arrow rendering (ISO-T timestamps, float32 repr, hex
        # binary) so the REPLACE regexes see the same text they redacted
        return _render_cell(v)

    cols = list(df.columns)
    border = "+" + "-+" * max(len(cols), 1)
    lines = [border, "| " + " | ".join(cols) + " |", border]
    for r in rows:
        lines.append("| " + " | ".join(cell(v) for v in r) + " |")
    lines.append(border)
    out = []
    for ln in lines:
        for pat, rep in replaces:
            ln = re.sub(pat, rep, ln)
        out.append(ln.strip())
    return "".join(out)


def _split_compound(stmt: str) -> list[str]:
    """Split a statement block on top-level semicolons (quote-aware).
    pg_catalog's is_on_search_path block is two SELECTs sharing one golden —
    the reference runner sent them as one postgres-protocol packet and only
    the non-empty result rendered."""
    parts, buf, quote = [], [], None
    for ch in stmt:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


_EXPLAIN_INNER_RE = re.compile(
    r"^\s*EXPLAIN\s+(?:ANALYZE\s+)?(?:VERBOSE\s+)?(?:SELECT|WITH)\b",
    re.IGNORECASE)

# DuckDB spells parametrized timestamp precision as distinct type names
_TS_PRECISION_MAP = {"0": "TIMESTAMP_S", "3": "TIMESTAMP_MS",
                     "6": "TIMESTAMP", "9": "TIMESTAMP_NS"}


def _canon_oracle_cell(v):
    """Canonical cell for the engine-vs-DuckDB row compare (mirrors
    _norm_cell's float rounding / -0.0 / NaN rules on live values)."""
    import datetime
    from decimal import Decimal

    if v is None or isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, int):
        # unify int/float numerics so both lists sort identically
        return float(v) if abs(v) < 2 ** 53 else v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 9)
        return 0.0 if v == 0 else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, str):
        return v.strip()
    return str(v)


def _explain_inner_oracle(g, stmt: str):
    """EXPLAIN / EXPLAIN ANALYZE goldens are engine-specific plan text we
    cannot diff — but the INNER query's semantics are checkable against an
    independent engine. Runs the inner SELECT through the engine AND through
    DuckDB over the same base tables (registered from the engine's catalog)
    and compares rows. Returns True (rows match — counts as checked), False
    (mismatch), or None when no independent check is possible (non-SELECT
    inner, schema-qualified/CTE-only tables, DuckDB dialect gap)."""
    if not _EXPLAIN_INNER_RE.match(stmt):
        return None
    inner = re.sub(r"^\s*EXPLAIN\s+(?:ANALYZE\s+)?(?:VERBOSE\s+)?", "",
                   stmt, count=1, flags=re.IGNORECASE)
    tables = set(re.findall(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_.]*)", inner,
        re.IGNORECASE))
    if not tables or any("." in t for t in tables):
        return None
    if any(t.lower() == "numbers" for t in tables):
        # the built-in `numbers` virtual table serves 0..pushed-down-LIMIT
        # rows (reference numbers.rs:119) — its row count depends on the
        # query's own LIMIT, which no relational snapshot can mirror
        return None
    try:
        import duckdb

        engine_rows = _collect(g.sql(inner))
        con = duckdb.connect()
        for t in tables:
            con.register(t, g.sql(f"SELECT * FROM {t}").toPandas())
        duck_sql = re.sub(
            r"TIMESTAMP\s*\(\s*([0369])\s*\)",
            lambda mm: _TS_PRECISION_MAP[mm.group(1)], inner,
            flags=re.IGNORECASE)
        # backtick quoting -> SQL standard double quotes
        duck_sql = re.sub(r"`([^`]*)`", r'"\1"', duck_sql)
        if not re.search(r"\bOVER\b", duck_sql, re.IGNORECASE):
            # DataFusion's first_value/last_value ORDERED AGGREGATES are
            # spelled first/last in DuckDB; only safe outside window
            # clauses (window first_value has frame semantics `first`
            # does not share)
            duck_sql = re.sub(r"\bfirst_value\s*\(", "first(", duck_sql,
                              flags=re.IGNORECASE)
            duck_sql = re.sub(r"\blast_value\s*\(", "last(", duck_sql,
                              flags=re.IGNORECASE)
        duck_rows = con.execute(duck_sql).fetchall()
    except Exception:
        return None  # dialect gap on either side -> no oracle, plain skip

    def canon(rows):
        sort_key = lambda r: tuple((c is None, str(c)) for c in r)
        return sorted((tuple(_canon_oracle_cell(c) for c in r)
                       for r in rows), key=sort_key)

    return canon(engine_rows) == canon(duck_rows)


def _plan_dump_inner(stmt: str) -> str | None:
    """The runnable inner statement of a plan-dump statement: strips
    EXPLAIN [ANALYZE] [VERBOSE] from SQL, and rewrites TQL ANALYZE/EXPLAIN
    to the TQL EVAL the reference plans (tql.rs executes the same query
    either way). None when stmt is not a plan dump."""
    m = re.match(r"^\s*EXPLAIN\s+(?:ANALYZE\s+)?(?:VERBOSE\s+)?"
                 r"(?=(?:SELECT|WITH)\b)", stmt, re.IGNORECASE)
    if m:
        return stmt[m.end():]
    m = re.match(r"^\s*TQL\s+(?:ANALYZE|EXPLAIN)\s+(?:VERBOSE\s+)?(\(.*)$",
                 stmt, re.IGNORECASE | re.DOTALL)
    if m:
        return "TQL EVAL " + m.group(1)
    return None


def _norm_stmt_key(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip().rstrip(";").lower()


_MUTATOR_RE = re.compile(
    r"^\s*(INSERT|DELETE|UPDATE|CREATE|DROP|ALTER|TRUNCATE|ADMIN|COPY|SET"
    r"|USE)\b", re.IGNORECASE)


# Hand-pinned DuckDB oracles for the FOUR plan-dump inner queries that have
# neither a DuckDB dialect (TQL) nor a same-text twin golden in their case
# (promql/tsid_binary_join_regression: the ignoring/comparison/group_left
# ANALYZE variants). Each SQL reproduces the PromQL semantics for THAT
# case's data: the eval grid is (0s, 5s] step 5s and every sample sits
# exactly on a step, so the 5m-lookback instant selection reduces to a ts
# equi-join; vector matching is the documented column algebra (ignoring ->
# join on the remaining label, comparison -> filter keeping lhs values,
# bool -> 0/1, group_left -> many-to-one then divide on full lhs labels).
_PINNED_TQL_ORACLES_RAW = {
    "TQL EVAL (0, 5, '5s') tsid_binary_join_left / ignoring(host) "
    "tsid_binary_join_right":
        "SELECT l.ts, l.host, l.job, l.greptime_value / r.greptime_value "
        "AS value FROM tsid_binary_join_left l JOIN tsid_binary_join_right "
        "r ON l.job = r.job AND l.ts = r.ts",
    "TQL EVAL (0, 5, '5s') tsid_binary_join_left > tsid_binary_join_right":
        "SELECT l.ts, l.host, l.job, l.greptime_value AS value "
        "FROM tsid_binary_join_left l JOIN tsid_binary_join_right r "
        "ON l.host = r.host AND l.job = r.job AND l.ts = r.ts "
        "WHERE l.greptime_value > r.greptime_value",
    "TQL EVAL (0, 5, '5s') tsid_binary_join_left > bool "
    "tsid_binary_join_right":
        "SELECT l.ts, l.host, l.job, CASE WHEN l.greptime_value > "
        "r.greptime_value THEN 1.0 ELSE 0.0 END AS value "
        "FROM tsid_binary_join_left l JOIN tsid_binary_join_right r "
        "ON l.host = r.host AND l.job = r.job AND l.ts = r.ts",
    "TQL EVAL (0, 5, '5s') (tsid_binary_join_left / ignoring(host) "
    "group_left tsid_binary_join_right) / tsid_binary_join_left":
        "SELECT l.ts, l.host, l.job, (l.greptime_value / r.greptime_value) "
        "/ l.greptime_value AS value FROM tsid_binary_join_left l "
        "JOIN tsid_binary_join_right r ON l.job = r.job AND l.ts = r.ts",
}

# tql-explain-analyze/explain: bare instant selectors with explicit
# lookback semantics — each SQL builds the eval-step grid and picks the
# latest sample per series within (t - lookback, t], i.e. the full
# InstantManipulate contract, independent of sample/step alignment.
_INSTANT_SEL_SQL = (
    "WITH steps AS (SELECT unnest(generate_series(0, {end_ms}, {step_ms})) "
    "AS tm), cand AS (SELECT s.tm, x.k, x.i, row_number() OVER "
    "(PARTITION BY s.tm, x.k ORDER BY x.j DESC) AS rn FROM steps s "
    "JOIN {table} x ON epoch_ms(x.j) <= s.tm "
    "AND epoch_ms(x.j) > s.tm - {lookback_ms}) "
    "SELECT make_timestamp(tm * 1000) AS ts, k, i AS {val} "
    "FROM cand WHERE rn = 1"
)
_PINNED_TQL_ORACLES_RAW.update({
    "TQL EVAL (0, 10, '5s') test": _INSTANT_SEL_SQL.format(
        end_ms=10000, step_ms=5000, lookback_ms=300000, table="test",
        val="value"),
    "TQL EVAL (0, 10, '1s', '2s') test": _INSTANT_SEL_SQL.format(
        end_ms=10000, step_ms=1000, lookback_ms=2000, table="test",
        val="value"),
    "TQL EVAL ('1970-01-01T00:00:00'::timestamp, "
    "'1970-01-01T00:00:00'::timestamp + '10 seconds'::interval, '5s') test":
        _INSTANT_SEL_SQL.format(
            end_ms=10000, step_ms=5000, lookback_ms=300000, table="test",
            val="value"),
    "TQL EVAL (0, 10, '5s') test AS series": _INSTANT_SEL_SQL.format(
        end_ms=10000, step_ms=5000, lookback_ms=300000, table="test",
        val="series"),
    "TQL EVAL (0, 10, '5s') test_nano": _INSTANT_SEL_SQL.format(
        end_ms=10000, step_ms=5000, lookback_ms=300000, table="test_nano",
        val="value"),
})

# promql/regex: ANALYZE VERBOSE dumps of regex matchers at a single
# instant (0, 0, '1s'); both samples sit at ts=0 so the 5m lookback keeps
# exactly them. `.*`/`.+` match every (non-empty) host; their negations
# match nothing.
_REGEX_ALL_SQL = (
    "SELECT ts, host, CAST(val AS DOUBLE) AS value FROM test "
    "WHERE epoch_ms(ts) <= 0 AND epoch_ms(ts) > -300000")
_REGEX_NONE_SQL = _REGEX_ALL_SQL + " AND 1 = 0"
_PINNED_TQL_ORACLES_RAW.update({
    "TQL EVAL (0, 0, '1s') test{host=~\".*\"}": _REGEX_ALL_SQL,
    "TQL EVAL (0, 0, '1s') test{host=~\".+\"}": _REGEX_ALL_SQL,
    "TQL EVAL (0, 0, '1s') test{host!~\".*\"}": _REGEX_NONE_SQL,
    "TQL EVAL (0, 0, '1s') test{host!~\".+\"}": _REGEX_NONE_SQL,
})

# promql/precisions: EXPLAIN dumps over µs/ns time indexes — instant
# selector (5m lookback, latest per series) and avg_over_time (window
# (t-5s, t], exclusive left — pinned by the case's own EVAL goldens:
# avg at t=5s is 3.0, i.e. only the ts=5s sample).
_PREC_INSTANT_SQL = (
    "WITH steps AS (SELECT unnest(generate_series(0, 10000, 5000)) AS tm), "
    "cand AS (SELECT s.tm, x.host, x.val, row_number() OVER (PARTITION BY "
    "s.tm, x.host ORDER BY x.ts DESC) AS rn FROM steps s JOIN {table} x "
    "ON epoch_ms(x.ts) <= s.tm AND epoch_ms(x.ts) > s.tm - 300000 "
    "WHERE x.host = 'host1') "
    "SELECT make_timestamp(tm * 1000) AS ts, host, val AS value "
    "FROM cand WHERE rn = 1"
)
_PREC_AVG_SQL = (
    "WITH steps AS (SELECT unnest(generate_series(0, 10000, 5000)) AS tm) "
    "SELECT make_timestamp(s.tm * 1000) AS ts, x.host, AVG(x.val) AS value "
    "FROM steps s JOIN {table} x ON epoch_ms(x.ts) <= s.tm "
    "AND epoch_ms(x.ts) > s.tm - 5000 WHERE x.host = 'host1' "
    "GROUP BY s.tm, x.host"
)
_PINNED_TQL_ORACLES_RAW.update({
    "TQL EVAL (0, 10, '5s') host_micro{host=\"host1\"}":
        _PREC_INSTANT_SQL.format(table="host_micro"),
    "TQL EVAL (0, 10, '5s') host_nano{host=\"host1\"}":
        _PREC_INSTANT_SQL.format(table="host_nano"),
    "TQL EVAL (0, 10, '5s') avg_over_time(host_micro{host=\"host1\"}[5s])":
        _PREC_AVG_SQL.format(table="host_micro"),
    "TQL EVAL (0, 10, '5s') avg_over_time(host_nano{host=\"host1\"}[5s])":
        _PREC_AVG_SQL.format(table="host_nano"),
})

# select/tql_filter: ANALYZE dumps of matcher pushdown over t1(a tag,
# b time index, c value); grid (1s, 3s] step 1s, default lookback carries
# each series forward from its single sample.
_TQLF_SQL = (
    "WITH steps AS (SELECT unnest(generate_series(1000, 3000, 1000)) AS tm),"
    " cand AS (SELECT s.tm, x.a, x.c, row_number() OVER (PARTITION BY s.tm, "
    "x.a ORDER BY x.b DESC) AS rn FROM steps s JOIN t1 x ON "
    "epoch_ms(x.b) <= s.tm AND epoch_ms(x.b) > s.tm - 300000{where}) "
    "SELECT make_timestamp(tm * 1000) AS ts, a, c AS value "
    "FROM cand WHERE rn = 1"
)
_PINNED_TQL_ORACLES_RAW.update({
    "TQL EVAL (1, 3, '1s') t1{ a = \"a\" }":
        _TQLF_SQL.format(where=" WHERE x.a = 'a'"),
    "TQL EVAL (1, 3, '1s') t1{ a =~ \".*\" }":
        _TQLF_SQL.format(where=""),
    "TQL EVAL (1, 3, '1s') t1{ a =~ \"a.*\" }":
        _TQLF_SQL.format(where=" WHERE regexp_matches(x.a, '^(?:a.*)$')"),
})


# function/vector/vector_index_explain: EXPLAIN ANALYZE VERBOSE dumps whose
# inner KNN queries DuckDB cannot run (vec_* distance functions). Results
# hand-computed from the case's own INSERTs: l2sq/cos distances to the
# [1,0] probe and dot products, tie-broken by vec_id — the pinned rows ARE
# the nearest-neighbor semantics of each inner query.
_PINNED_TQL_ORACLES_RAW.update({
    ("SELECT vec_id FROM vectors_explain ORDER BY "
     "vec_l2sq_distance(embedding, '[1.0, 0.0]'), vec_id LIMIT 2"):
        "SELECT * FROM (VALUES (1), (2)) t(vec_id)",  # d2 = 0, 0.01
    ("SELECT l.vec_id FROM vectors_explain_left l JOIN "
     "vectors_explain_right r ON l.vec_id = r.vec_id ORDER BY "
     "vec_l2sq_distance(l.embedding, '[1.0, 0.0]'), l.vec_id LIMIT 1"):
        "SELECT 4 AS vec_id",  # right side keeps {3, 4}; d2 = 2.0 vs 1.81
    ("SELECT vec_id FROM vectors_explain_metric ORDER BY "
     "vec_cos_distance(embedding, '[1.0, 0.0]'), vec_id LIMIT 2"):
        "SELECT * FROM (VALUES (1), (2)) t(vec_id)",  # cosd = 0, then 1 (tie)
    ("SELECT vec_id FROM vectors_explain_metric ORDER BY "
     "vec_dot_product(embedding, '[1.0, 0.0]') DESC, vec_id LIMIT 2"):
        "SELECT * FROM (VALUES (1), (2)) t(vec_id)",  # dot = 1, then 0 (tie)
})

# optimizer/order_by: EXPLAIN dumps over the built-in `numbers` virtual
# table, excluded from the generic DuckDB re-run because its row count IS
# the query's pushed-down LIMIT (reference numbers.rs:119, mirrored by the
# per-statement re-registration in sql.py). The pinned oracles encode that
# contract: no LIMIT → 0..99; LIMIT 10 → rows 0..9 regardless of sort
# direction (the limit cuts the SOURCE, not the sorted output).
_PINNED_TQL_ORACLES_RAW.update({
    "select * from numbers":
        "SELECT CAST(range AS INTEGER) AS number FROM range(100)",
    "select * from numbers order by number desc":
        "SELECT CAST(range AS INTEGER) AS number FROM range(100)",
    "select * from numbers order by number asc":
        "SELECT CAST(range AS INTEGER) AS number FROM range(100)",
    "select * from numbers order by number desc limit 10":
        "SELECT CAST(range AS INTEGER) AS number FROM range(10)",
    "select * from numbers order by number asc limit 10":
        "SELECT CAST(range AS INTEGER) AS number FROM range(10)",
})

# tql/partition + partition: plan dumps over tables that hold ZERO rows at
# dump time (created, never inserted) — the inner query's only checkable
# semantic is emptiness, which the pinned empty relation asserts. The TQL
# key covers all three partition variants (same statement text each time).
_PINNED_TQL_ORACLES_RAW.update({
    "TQL EVAL (0, 10, '1s') 100 - (avg by (k) (irate(t[1m])) * 100)":
        "SELECT 1 AS v WHERE 1 = 0",
    ("SELECT * FROM valid_rule WHERE a = 10 OR (ts > 1 AND b ='h')"):
        "SELECT 1 AS v WHERE 1 = 0",
    "SELECT * FROM valid_rule WHERE a = 10 OR ts > 1":
        "SELECT 1 AS v WHERE 1 = 0",
})


# limit/limit: EXPLAIN over numbers with WHERE 1=0 — the constant-false
# filter makes the inner query empty regardless of the numbers contract.
_PINNED_TQL_ORACLES_RAW.update({
    ("SELECT * FROM (SELECT SUM(number) FROM numbers "
     "LIMIT 100000000000) WHERE 1=0"):
        "SELECT 1 AS v WHERE 1 = 0",
})

# range/nest: EXPLAIN + EXPLAIN ANALYZE of a tumbling RANGE query (window
# [t, t+5s), align 5s, every sample exactly on a boundary → per-(bucket,
# host) MIN, all-NULL groups stay NULL). One key clears both dumps.
_PINNED_TQL_ORACLES_RAW.update({
    "SELECT ts, host, min(val) RANGE '5s' FROM host ALIGN '5s'":
        ("SELECT make_timestamp(CAST(epoch_ms(ts) // 5000 AS BIGINT) "
         "* 5000000) AS ts, host, MIN(val) AS mn FROM host GROUP BY 1, 2"),
})


def _pinned_tql_oracles() -> dict:
    return {_norm_stmt_key(k): v for k, v in _PINNED_TQL_ORACLES_RAW.items()}


def _pinned_oracle_check(g, inner: str, duck_sql: str):
    """Run the inner TQL statement through the engine and the pinned SQL
    through DuckDB over the same catalog tables; True/False like
    _explain_inner_oracle (None on infrastructure failure -> plain skip)."""
    tables = set(re.findall(r"\b(?:FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)",
                            duck_sql, re.IGNORECASE))
    try:
        import duckdb

        engine_rows = _collect(g.sql(inner))
        con = duckdb.connect()
        for t in tables:
            try:
                con.register(t, g.sql(f"SELECT * FROM {t}").toPandas())
            except Exception:
                pass  # a CTE name, not an engine table
        duck_rows = con.execute(duck_sql).fetchall()
    except Exception:
        return None

    def canon(rows):
        sort_key = lambda r: tuple((c is None, str(c)) for c in r)
        return sorted((tuple(_canon_oracle_cell(c) for c in r)
                       for r in rows), key=sort_key)

    return canon(engine_rows) == canon(duck_rows)


def _build_twin_index(stmts) -> dict:
    """Map normalized statement text -> [(index, expected, replaces)] for
    every statement carrying a REAL data golden (not error/opaque/plan
    dump). A plan-dump statement whose inner query re-appears verbatim with
    a reference golden elsewhere in the case can then be row-verified
    against that golden — the reference itself is the oracle (stronger than
    the DuckDB re-run, and it covers TQL, which DuckDB cannot parse)."""
    twins: dict = {}
    for i, (s, exp, reps) in enumerate(stmts):
        if exp is None or exp == "error":
            continue
        if isinstance(exp, tuple) and exp and exp[0] == "opaque":
            continue
        if _plan_dump_inner(s) is not None:
            continue
        if any(re.search(p, s, re.IGNORECASE) for p in _SKIP_PATTERNS):
            continue
        twins.setdefault(_norm_stmt_key(s), []).append((i, exp, reps))
    return twins


def _twin_golden(stmts, twins, i: int, inner: str):
    """The nearest same-text twin of `inner` with no state-mutating
    statement between the plan dump (index i) and the twin — i.e. both
    statements observe identical table state, so the twin's golden is a
    valid expected output for the inner query run now."""
    cands = twins.get(_norm_stmt_key(inner)) or []
    best = None
    for j, exp, reps in cands:
        lo, hi = (i, j) if i < j else (j, i)
        if any(_MUTATOR_RE.match(stmts[k][0]) for k in range(lo + 1, hi)):
            continue
        if best is None or abs(j - i) < abs(best[0] - i):
            best = (j, exp, reps)
    return best


def _run_case(spark, tmp_path, case: str, min_checked: int, known_diffs=(),
              stop_marker: str | None = None):
    """known_diffs: statement substrings whose golden mismatch is expected and
    documented (e.g. t-digest approximation artifacts the exact engine can't
    reproduce) — those statements are skipped, not asserted.
    stop_marker: first statement containing it ends the run; it and every
    later statement count as skips (for cases whose tail exercises a value
    range this engine's type mapping deliberately does not represent)."""
    from greptimedb_spark.catalog import Catalog
    from greptimedb_spark.sql import GreptimeSQL

    g = GreptimeSQL(spark, catalog=Catalog(spark, str(tmp_path / "sqlness_cat")))
    checked = skipped = errored = 0
    errs: list = []
    audit = os.environ.get("SPARK_GRAFT_SKIP_AUDIT") == "1"

    def _audit(reason: str, stmt: str) -> None:
        if audit:
            print(f"SKIP[{reason}] {case}: "
                  f"{stmt.replace(chr(10), ' ')[:100]}", flush=True)
    stmts = list(_parse_result_file(_case_path(case)))
    twin_index = _build_twin_index(stmts)
    stopped = False
    for stmt_i, (stmt, expected, replaces) in enumerate(stmts):
        if stopped or (stop_marker is not None and stop_marker in stmt):
            stopped = True
            _audit("stop-marker", stmt)
            skipped += 1
            continue
        sleeps = [r[1] for r in replaces if r[0] == "__SLEEP__"]
        restart = any(r[0] == "__RESTART__" for r in replaces)
        mysql_proto = any(r[0] == "__MYSQL__" for r in replaces)
        pg_proto = any(r[0] == "__POSTGRES__" for r in replaces)
        sort_result = any(r[0] == "__SORT_RESULT__" for r in replaces)
        g.protocol = "postgres" if pg_proto else None
        replaces = [r for r in replaces
                    if r[0] not in ("__SLEEP__", "__RESTART__", "__MYSQL__",
                                    "__POSTGRES__", "__SORT_RESULT__")]
        if restart:
            # node-restart emulation: skip-wal tables lose unflushed rows
            g.simulate_restart()
        if any(k in stmt for k in known_diffs):
            _audit("known-diff", stmt)
            skipped += 1
            continue
        if expected is not None and expected != "error":
            # plan-dump goldens (normal AND opaque alike): check the inner
            # query's SEMANTICS against DuckDB / a pinned oracle / the
            # nearest same-text twin golden instead of skipping outright
            # (the plan text itself stays unchecked)
            oracle = _explain_inner_oracle(g, stmt)
            if oracle is True:
                checked += 1
                continue
            if oracle is False:
                # a live row mismatch against the independent engine is a
                # real signal — surface it in the ledger ratchet, don't
                # demote to a silent skip
                errored += 1
                errs.append((stmt.replace("\n", " ")[:80],
                             "explain-oracle-mismatch"))
                continue
            inner = _plan_dump_inner(stmt)
            if inner is not None:
                twin = _twin_golden(stmts, twin_index, stmt_i, inner)
                if twin is not None:
                    # rebind to the twin's golden and fall through to the
                    # normal comparison path below
                    _j, expected, replaces = twin
                    stmt = inner
                    sort_result = any(
                        r[0] == "__SORT_RESULT__" for r in replaces)
                    replaces = [r for r in replaces if r[0] not in
                                ("__SLEEP__", "__RESTART__", "__MYSQL__",
                                 "__POSTGRES__", "__SORT_RESULT__")]
                else:
                    pinned = _pinned_tql_oracles().get(_norm_stmt_key(inner))
                    if pinned is not None:
                        ok = _pinned_oracle_check(g, inner, pinned)
                        if ok is True:
                            checked += 1
                            continue
                        if ok is False:
                            errored += 1
                            errs.append((stmt.replace("\n", " ")[:80],
                                         "pinned-oracle-mismatch"))
                            continue
        if isinstance(expected, tuple) and expected and expected[0] == "opaque":
            # REPLACE-destroyed golden: compare opaque strings
            if any(re.search(p, stmt, re.IGNORECASE) for p in _SKIP_PATTERNS):
                _audit("pattern", stmt)
                skipped += 1
                continue
            try:
                df = g.sql(stmt)
                rows = _collect(df) if df is not None else []
            except Exception as e:
                errored += 1
                errs.append((stmt.replace("\n", " ")[:80],
                             f"opaque:{type(e).__name__}"))
                continue
            got = _render_opaque(df, rows, replaces, pg_proto)
            if got == expected[1]:
                checked += 1
            else:
                _audit("opaque-mismatch", stmt)
                skipped += 1
            continue
        if expected == "error" and re.match(
                r"^\s*(SELECT|WITH|VALUES"
                # EXECUTE of a prepared SELECT is read-only; binder errors
                # (missing/unconvertible parameters) are parity-checkable
                r"|EXECUTE"
                # SHOW / DESC / TQL EVAL are read-only — error parity is
                # always safe to check
                r"|SHOW\b|DESC(?:RIBE)?\b|TQL\s+EVAL"
                # ADMIN BUILD_INDEX error-goldens (bad arg count/type,
                # missing table): index build writes nothing here (Parquet
                # stats play that role), so error parity is mutation-free
                r"|ADMIN\s+BUILD_INDEX"
                # SET max_execution_time error-goldens (negative /
                # out-of-u64-range exprs): a rejection stores nothing, and
                # the case's own later @@max_execution_time reads pin any
                # lenient drift loudly
                r"|SET\s+(?:@@)?(?:SESSION\s+|LOCAL\s+|GLOBAL\s+)?"
                r"(?:SESSION\.)?MAX_EXECUTION_TIME\b"
                # SET read_preference error-goldens: validated up front
                # against the leader/follower enum — rejection stores nothing
                r"|SET\s+read_preference\b"
                # COPY error-goldens (path-escape sandboxing, bad formats):
                # _resolve_copy_path rejects before any IO; a lenient COPY
                # FROM lands rows later goldens read — loud either way
                r"|COPY\s"
                # DROP DATABASE/SCHEMA/VIEW error-goldens: a rejection drops
                # nothing; a lenient accept deletes state later goldens read
                r"|DROP\s+(?:DATABASE|SCHEMA|VIEW|FLOW)"
                # DELETE error-goldens (system/read-only tables): same
                # loud-if-lenient argument as INSERT VALUES
                r"|DELETE\s+FROM"
                # CREATE VIEW error-goldens (clause conflicts, name
                # collisions, non-query bodies): a lenient accept surfaces in
                # the case's later SHOW CREATE VIEW / catalog goldens
                r"|CREATE\s+(?:OR\s+REPLACE\s+)?VIEW"
                # RENAME / MODIFY COLUMN error-goldens: a lenient accept
                # changes names/types that every later golden in the case
                # reads — loud
                r"|ALTER\s+TABLE\s+[^;]*?\bRENAME\b"
                r"|ALTER\s+TABLE\s+[^;]*?\bMODIFY\s+COLUMN\b"
                # table-option and ADD COLUMN error-goldens: same
                # loud-if-lenient argument (SHOW CREATE / DESC goldens read
                # the mutated state)
                r"|ALTER\s+TABLE\s+[^;]*?\b(?:SET|UNSET)\b"
                r"|ALTER\s+TABLE\s+[^;]*?\bADD\b"
                r"|ALTER\s+TABLE\s+[^;]*?\bDROP\s+COLUMN\b"
                # ALTER…REPARTITION is rejected up front by both engines
                # (metasrv GC precondition) — parity-checkable without any
                # state mutation, unlike general DDL error-goldens
                r"|ALTER\s+TABLE\s+\S+\s+(?:REPARTITION|SPLIT\s+PARTITION"
                r"|MERGE\s+PARTITION"
                # interval-column rejections are validated up front — no
                # state can mutate, so parity is safe (issue #5422)
                r"|(?:ADD|MODIFY)\s+COLUMN\s+\S+\s+interval\b"
                # SET FULLTEXT INDEX option/immutability rejections are
                # validated up front — nothing mutates
                r"|MODIFY\s+COLUMN\s+\S+\s+SET\s+FULLTEXT)"
                # INSERT … VALUES error-goldens (malformed literals): a
                # rejection writes nothing; if the engine were lenient the
                # bad row would make the case's later SELECT goldens fail
                # loudly, so parity-checking is safe
                r"|INSERT\s+INTO\s+\S+(?:\s*\([^)]*\))?\s+(?:VALUES|SELECT)"
                # CREATE TABLE error-goldens (invalid schema: missing/
                # nullable/duplicate time index, bad names): a rejection
                # creates nothing; a lenient accept would leave a spurious
                # table that later goldens in the case trip over loudly
                r"|CREATE\s+TABLE"
                # CREATE FLOW error-goldens (clause conflicts, sink-schema
                # mismatches): a rejection registers nothing; lenient
                # accepts surface in later SHOW CREATE FLOW goldens
                r"|CREATE\s+(?:OR\s+REPLACE\s+)?FLOW"
                # CREATE/ALTER DATABASE error-goldens (reserved schema names,
                # invalid identifiers, instant TTL): a rejection registers
                # nothing; a lenient accept would surface in the case's later
                # SHOW DATABASES / SHOW CREATE DATABASE goldens
                r"|CREATE\s+(?:DATABASE|SCHEMA)|ALTER\s+DATABASE"
                # DROP/TRUNCATE error-goldens (read-only/system tables): a
                # lenient accept would delete state later goldens read —
                # also loud
                r"|DROP\s+TABLE|TRUNCATE)"
                r"\b", stmt, re.IGNORECASE) and \
                not any(re.search(p, stmt, re.IGNORECASE)
                        for p in _SKIP_PATTERNS):
            # error-parity check for read-only statements: the reference
            # rejects this statement, so must we. Statements our ANSI-off
            # engine is deliberately lenient on (e.g. 'nan'::DECIMAL casts
            # return NULL where DataFusion raises) count as skips, not
            # failures. DDL/DML error-goldens stay skipped — executing one
            # that our engine accepts would mutate state the later goldens
            # depend on.
            try:
                df = g.sql(stmt)
                if df is not None:
                    _collect(df)
                _audit("lenient-errgold", stmt)
                skipped += 1  # lenient where the reference errors
            except Exception as e:
                # only a deliberate rejection counts as parity — an internal
                # shim crash (AttributeError, re.error, KeyError…) on an
                # expected-error statement must surface in the ledger, not
                # masquerade as a verified check
                if isinstance(e, ValueError) or type(e).__module__.startswith(
                        ("pyspark", "py4j")):
                    checked += 1  # error parity verified
                else:
                    errored += 1
                    errs.append((stmt.replace("\n", " ")[:80],
                                 f"errparity:{type(e).__name__}"))
            continue
        if any(re.search(p, stmt, re.IGNORECASE) for p in _SKIP_PATTERNS) or expected == "error":
            _audit("errgold" if expected == "error" else "pattern", stmt)
            skipped += 1
            continue
        for s in sleeps:
            time.sleep(min(s, 8))
        # compound block (two statements, one golden): the golden belongs to
        # the statement that produced output; trailing statements must come
        # back empty or the comparison is meaningless (pg_catalog's
        # is_on_search_path block)
        extras = []
        if expected is not None and expected != "error" and \
                re.search(r";\s*(SELECT|WITH)\b", stmt, re.IGNORECASE):
            parts = _split_compound(stmt)
            if len(parts) > 1:
                stmt, extras = parts[0], parts[1:]
        try:
            df = g.sql(stmt)
            rows = _collect(df) if expected is not None else []
            for ex in extras:
                ex_df = g.sql(ex)
                if ex_df is not None and _collect(ex_df):
                    raise AssertionError(
                        f"compound trailing statement returned rows: {ex[:60]}")
        except Exception as e:  # unsupported dialect/semantics — counted
            # separately from pattern-skips so a new exception fails the
            # ledger ratchet instead of silently demoting to a skip
            errored += 1
            errs.append((stmt.replace("\n", " ")[:80], type(e).__name__))
            continue
        if expected is None:
            continue
        if any("\\n" in pat for pat, _rep in replaces):
            # table-spanning REPLACE: the FLUSH_FLOW row-count redaction
            # (the only such directive in the corpus) leaves exactly this
            # checkable: one column named ADMIN FLUSH_FLOW('<flow>'), one
            # row, a non-negative integer — verify that shape
            if (all(pat.startswith(r"(ADMIN\sFLUSH_FLOW")
                    for pat, _rep in replaces if "\\n" in pat)
                    and len(df.columns) == 1
                    and re.fullmatch(r"ADMIN FLUSH_FLOW\('\w+'\)",
                                     df.columns[0])
                    and len(rows) == 1 and len(rows[0]) == 1
                    and isinstance(rows[0][0], int) and rows[0][0] >= 0):
                checked += 1
            else:
                # any other table-spanning REPLACE can't be applied at cell
                # granularity: executed for side effects, comparison skipped
                _audit("table-replace", stmt)
                skipped += 1
            continue
        exp_header, exp_rows = expected
        if sort_result:
            # line-sorting pushed the header row into the data block —
            # drop the expected row whose cells are the column names
            cols_ms = sorted(c.lower() for c in df.columns)
            exp_rows = [r for r in exp_rows
                        if sorted(str(c).lower() for c in r) != cols_ms]
        if any(p == r"(\s\s+)" and r == "_" for p, r in replaces):
            # ascii-table-mangling directives (meant for EXPLAIN dumps but
            # attached to the next data SELECT, e.g. filter/topk_dyn_filter):
            # the reference runner collapsed the table's cell padding into a
            # trailing '_' — strip it from the golden cells and don't apply
            # the spacing patterns to engine cells (which carry no padding)
            exp_rows = [[c[:-1] if isinstance(c, str) and c.endswith("_")
                         else c for c in row] for row in exp_rows]
            replaces = [pr for pr in replaces
                        if pr[0] not in (r"(\s\s+)", r"(-+)")]
        rows = _normalize_f32(df, rows)
        if mysql_proto:
            # mysql wire rendering prints booleans as 0/1
            rows = [[int(c) if isinstance(c, bool) else c for c in row]
                    for row in rows]
        if pg_proto:
            # postgres wire rendering prints booleans as t/f
            rows = [[("t" if c else "f") if isinstance(c, bool) else c
                     for c in row] for row in rows]
        rows = _expand_multiline_rows(rows)
        if replaces:
            got_cells = [[_apply_replaces(c, replaces) for c in row] for row in rows]
        else:
            got_cells = rows
        # Positional compare when every golden header name resolves uniquely
        # to an engine column (case-insensitive): reorder engine cells to the
        # golden column order — catches transposed-column bugs the old
        # cell-sorted compare let through. Fall back to cell-sorted when the
        # engines disagree on projection names/order (e.g. TQL emits value
        # first, DataFusion synthesizes `sum(t.c)` names).
        eng_cols = {c.lower(): j for j, c in enumerate(df.columns)}
        idx = [eng_cols.get(h.lower()) for h in exp_header]
        positional = (
            exp_header
            and len(exp_header) == len(df.columns)
            and all(j is not None for j in idx)
            and len(set(idx)) == len(idx)
            and not any("\n" in str(c) for row in got_cells for c in row)
        )
        if positional:
            got = [[_norm_cell(row[j]) for j in idx] for row in got_cells]
            want = [[_norm_cell(c) for c in row] for row in exp_rows]
        else:
            cell_key = lambda x: (x is None, str(type(x)), str(x))
            got = [sorted((_norm_cell(c) for c in row), key=cell_key) for row in got_cells]
            want = [sorted((_norm_cell(c) for c in row), key=cell_key) for row in exp_rows]
        key = lambda r: tuple((x is None, str(x)) for x in r)
        assert sorted(got, key=key) == sorted(want, key=key), f"mismatch for: {stmt}"
        checked += 1
    assert checked >= min_checked, (
        f"only {checked} statements verified ({skipped} skipped, "
        f"{errored} errored: {errs[:5]})")
    _record_ledger(case, checked, skipped, errored, errs)
    return checked, skipped


def test_sqlness_range_fill(spark, tmp_path):
    checked, _ = _run_case(spark, tmp_path, "range/fill.sql".replace(".sql", ""), 6)


def test_sqlness_range_by(spark, tmp_path):
    checked, _ = _run_case(spark, tmp_path, "range/by", 2)


def test_sqlness_range_to(spark, tmp_path):
    checked, _ = _run_case(spark, tmp_path, "range/to", 3)


def test_sqlness_tql_basic(spark, tmp_path):
    checked, skipped = _run_case(spark, tmp_path, "tql/basic", 3)


def test_sqlness_tql_aggr_over_time(spark, tmp_path):
    checked, skipped = _run_case(spark, tmp_path, "tql/aggr_over_time", 3)


def test_sqlness_tql_binary_operator(spark, tmp_path):
    checked, skipped = _run_case(spark, tmp_path, "tql/binary_operator", 2)


def test_sqlness_range_interval(spark, tmp_path):
    checked, _ = _run_case(spark, tmp_path, "range/interval", 1)


def test_sqlness_range_precisions(spark, tmp_path):
    checked, _ = _run_case(spark, tmp_path, "range/precisions", 1)


# Full-pass reference case files: (case, min verified statements)
_CONFORMANCE_CASES = [
    ("cte/cte", 11),
    ("join/inequality_joins", 5),
    ("join/join_with_aggregates", 5),
    ("select/dummy", 14),
    ("select/multi_column_ref", 4),
    ("select/unnest", 1),
    ("copy/copy_from_fs_csv", 9),
    ("copy/copy_from_fs_json", 9),
    ("copy/copy_from_fs_parquet", 13),
    ("copy/copy_database_from_fs_parquet", 7),
    ("copy/copy_from_csv_compressed", 10),
    ("copy/copy_from_json_compressed", 10),
    ("types/interval/interval", 25),
    ("types/timestamp/timestamp", 27),
    ("types/float/nan_aggregate", 11),
    ("types/decimal/decimal_cast", 7),
    ("types/json/json", 3),
    # per-SST union-schema display (flush/compact boundary dependent) is
    # reproduced by functions/json2_shred — the full file verifies
    ("types/json/json2", 19),
    ("types/json/json2_cast", 13),
    ("types/json/json2_nested", 20),
    ("types/json/json2_deep_nesting", 14),
    ("types/json/json2_limit", 1),
    # typed field hints: SHOW CREATE block + default-filled extraction
    # verify; the invalid-hint statements are error goldens
    ("types/json/json2_type_hints", 2),
    ("types/json/jsonbench", 3),
    ("types/blob/blob", 8),
    ("ttl/database_ttl", 7),
    ("ttl/database_ttl_with_metric_engine", 5),
    ("ttl/metric_engine_ttl", 5),
    ("ttl/show_ttl", 21),
    ("flow/flow_status", 3),
    ("promql/string_identifier", 4),
    ("system/timezone", 27),
    ("insert/insert_default_timezone", 3),
    ("keywords/escaped_quotes", 1),
    ("system/database", 2),
    ("select/qualified_view", 2),
    ("select/schema_reference", 1),
    ("select/matches", 31),
    ("select/tz_encode", 1),
    ("alter/alter_database", 23),
    ("alter/alter_metric_table", 10),
    ("create/create_database", 1),
    ("create/create_database_opts", 16),
    ("truncate/truncate", 8),
    ("catalog/schema", 10),
    ("types/vector/vector", 10),
    ("range/special_aggr", 12),
    ("types/decimal/decimal_ops", 36),
    ("types/decimal/decimal_arithmetic", 24),
    ("types/decimal/decimal_aggregates", 6),
    ("alter/change_col_inverted_index", 5),
    # r8: the 5 EXPLAIN ANALYZE plan dumps now verify their INNER query's
    # rows against the DuckDB oracle (_explain_inner_oracle); the 2
    # remaining skips are information_schema.partitions/region_peers
    # metadata projections whose golden embeds reference region ids
    ("partition", 19),
    ("parser/operator_precedence", 15),
    ("comment", 12),
    ("sample/basic_sample", 8),
    ("aggregate/array_agg", 11),
    ("view/show_create", 10),
    ("information_schema/table_constraints", 4),
    ("information_schema/table_semantics", 2),
    ("information_schema/views", 2),
    ("create/current_timestamp", 3),
    ("create/create_type_alias", 2),
    ("create/create_with_skipping_index", 1),
    ("create/create_with_fulltext", 3),
    ("show/show_columns", 5),
    ("show/show_databases_tables", 5),
    ("setops/basic_setops", 14),
    ("order/nulls_first", 9),
    ("order/nulls_first_last", 8),
    ("order/limit", 6),
    ("order/limit_union", 2),
    ("order/limit_zero", 3),
    ("limit/limit_advanced", 5),
    ("subquery/table", 16),
    ("cte/cte_in_cte", 6),
    ("join/complex_join_expr", 5),
    ("join/cross_product", 3),
    ("join/full_outer_join", 3),
    ("join/inequality_join", 4),
    ("join/hash_join_complex", 5),
    ("join/cross_join_advanced", 6),
    ("window/basic_window", 4),
    ("window/ntile", 4),
    ("window/lead_lag", 5),
    ("window/rank_functions", 3),
    ("window/percent_functions", 3),
    ("aggregate/avg", 4),
    ("aggregate/approx_distinct", 2),
    # t-digest compression + estimate reproduced exactly (functions/sketch.py
    # register_weighted_pct) — zero known-diffs since round 4
    ("aggregate/approx_median", 11),
    ("aggregate/approx_percentile_cont", 16),
    ("aggregate/approx_percentile_cont_with_weight", 11),
    ("aggregate/bit_operations", 7),
    ("aggregate/corr", 4),
    ("aggregate/covar", 5),
    ("aggregate/distinct", 7),
    ("aggregate/distinct_order_by", 4),
    ("aggregate/first_last", 15),
    ("aggregate/median", 10),
    ("aggregate/regression", 8),
    ("aggregate/stddev", 18),
    ("order/order_by", 25),
    ("order/order_by_basic", 12),
    ("order/order_by_expressions", 8),
    ("order/windowed_sort", 4),
    ("window/value_functions", 2),
    ("window/window_advanced", 3),
    ("window/window_aggregates", 4),
    ("window/window_frames", 3),
    ("window/window_null_handling", 4),
    ("join/inner_join_advanced", 7),
    ("join/join_conditions_complex", 7),
    ("join/join_distinct", 3),
    ("join/join_null_handling", 5),
    ("join/join_types", 5),
    ("join/join_with_expressions", 4),
    ("join/join_with_nulls", 5),
    ("join/join_with_subqueries", 5),
    ("join/left_outer_join", 4),
    ("join/multi_way_joins", 5),
    ("join/multiple_joins", 3),
    ("join/natural_join", 3),
    ("join/natural_join_advanced", 5),
    ("join/outer_join_complex", 5),
    ("join/right_outer_join", 3),
    ("join/self_join", 4),
    ("join/using_clause_joins", 5),
    ("range/calculate", 4),
    ("tql/case_sensitive", 3),
    ("tql/join", 6),
    ("tql/literal_only", 3),
    ("tql/range", 11),
    ("tql/tql-cte", 37),
    # reference promql/ corpus (the flagship PromQL conformance surface,
    # reference src/query/src/promql/planner.rs); counts = verified statements
    ("promql/absent", 9),
    ("promql/anon_promql_ratio_repro", 4),
    ("promql/binary_time_fn", 1),
    ("promql/comparison_filter_or", 3),
    ("promql/count_values", 2),
    ("promql/functions", 12),
    ("promql/group_by", 1),
    ("promql/histogram_quantile_binary_op", 5),
    ("promql/label", 25),
    ("promql/math", 24),  # r10: scalar-arg type errors now parity-checked
    ("promql/offset", 9),
    ("promql/offset_direction", 3),
    ("promql/or_operation", 5),
    ("promql/precisions", 10),  # r9: 4 EXPLAIN dumps verify via pinned oracles
    ("promql/quantile", 4),
    ("promql/range_sparse_empty_trailing", 1),
    ("promql/regex", 8),  # r9: 4 ANALYZE VERBOSE dumps verify via pinned oracles
    ("promql/scalar", 45),
    ("promql/set_operation", 40),
    ("promql/simple_histogram", 23),
    ("promql/sort", 6),
    ("promql/stats_schema_mismatch_regression", 1),
    ("promql/subquery", 6),
    ("promql/time_fn", 42),
    ("promql/timestamp_fn", 13),
    ("promql/topk_bottomk", 12),
    ("promql/histogram_multi_partition", 1),
    # round 9: the last 5 uncovered standalone/common case files join the
    # battery — scan_big_varchar is a real scan-stress case (doubling
    # inserts to 16K x 10KB strings, COUNT/SUM goldens); the other four
    # are plan/substrait dumps whose checkable residue (DDL errors, twin
    # goldens, inner-query oracles) now counts honestly instead of the
    # files being absent from the ledger entirely
    # (scan_big_varchar runs via its own prefix-limited test below)
    # all 7 TQL EXPLAIN dumps verify via pinned lookback-SQL oracles
    ("tql-explain-analyze/explain", 7),
    ("tql/general_table", 0),
    ("tql/partition", 3),  # r10: empty-relation pinned oracles
    # encode_substrait's two TQL statements (top-level subquery) both
    # verify: the EXPLAIN via its EVAL twin, the EVAL via its own golden
    ("promql/encode_substrait", 2),
    # round 9: ALL 11 TQL ANALYZE plan dumps row-verify — 7 against their
    # paired TQL EVAL goldens (twin-golden oracle), the 4 twin-less
    # variants (ignoring(host), >, > bool, group_left) against hand-pinned
    # DuckDB SQL (_PINNED_TQL_ORACLES_RAW). 0 skips left in this file
    ("promql/tsid_binary_join_regression", 20),
    ("promql/tsid_histogram_quantile_regression", 4),
    # DDL surface: ALTER / DELETE / TRUNCATE / DESC / SHOW / VIEW / INSERT
    # (reference src/sql/src/statements/statement.rs; schema evolution is
    # core to the auto-alter ingest model, SURVEY §1.3)
    ("alter/add_col", 9),
    ("alter/add_col_chain", 1),
    ("alter/add_col_default", 5),
    ("alter/add_incorrect_col", 1),
    ("alter/alter_auto_flush_interval", 1),
    ("alter/alter_format", 16),
    ("alter/alter_table_alter_column_drop_default", 3),
    ("alter/alter_table_alter_column_set_default", 1),
    ("alter/alter_table_first_after", 16),
    ("alter/alter_table_options", 5),
    ("alter/change_col_skipping_options", 7),
    ("alter/change_col_type", 5),
    ("alter/change_col_type_inverted_index", 2),
    ("alter/change_col_type_not_null", 3),
    ("alter/change_col_type_skipping_index", 2),
    ("alter/drop_add_col", 4),
    ("alter/drop_col", 1),
    ("alter/drop_col_not_null", 2),
    ("alter/drop_col_not_null_next", 2),
    ("alter/partition_and_alter", 2),
    ("alter/prefilter_last_row_null", 5),
    ("alter/rename_table", 5),
    ("delete/delete", 9),
    ("delete/delete_non_null", 2),
    ("describe/describe_table", 4),
    ("view/columns", 1),
    ("view/create", 7),
    ("view/view", 3),
    ("drop/drop_table", 1),
    ("show/show_charset", 8),
    ("show/show_collation", 5),
    ("insert/append_mode", 3),
    ("insert/big_insert", 2),
    ("insert/insert", 2),
    ("insert/insert_default", 3),
    ("insert/insert_different_order", 2),
    ("insert/insert_invalid", 1),
    ("insert/insert_select", 1),
    ("insert/merge_mode", 6),
    ("insert/special_value", 1),
    ("create/create", 8),
    ("create/create_row_group_size", 2),
    ("create/upper_case_table_name", 4),
    ("ttl/basic", 4),
    # CREATE FLOW / ADMIN FLUSH_FLOW surface (reference src/flow/; batching
    # vs streaming mode, table-id binding, dirty-window recompute, TTL
    # interplay, uddsketch/hll state aggregation, TQL flows)
    ("flow/flow_aft_alter", 2),
    ("flow/flow_auto_sink_table", 5),
    ("flow/flow_basic", 35),
    ("flow/flow_batch_join_subquery", 2),
    ("flow/flow_blog", 2),
    ("flow/flow_call_df_func", 4),
    ("flow/flow_flush", 1),
    ("flow/flow_incremental_aggr", 4),
    ("flow/flow_incremental_memtable", 5),
    ("flow/flow_incremental_partitioned", 3),
    ("flow/flow_ins_default", 1),
    ("flow/flow_insert", 4),
    ("flow/flow_last_non_null", 3),
    ("flow/flow_no_aggr", 4),
    ("flow/flow_null", 7),
    ("flow/flow_pending", 3),
    ("flow/flow_rebuild", 23),
    ("flow/flow_step_aggr", 6),
    ("flow/flow_tql_avg", 5),
    ("flow/flow_user_guide", 2),
    ("flow/show_create_flow", 27),
    ("aggregate/uddsketch", 5),
    # scalar-function packages (reference src/common/function/src/scalars/*):
    # json (jsonb paths/coercions), ip (v4+v6 cidr/range), vector (f32 math),
    # matches_term boundaries, anomaly windows, string/date dialect shims
    ("function/admin/build_index_table", 2),
    ("function/admin/flush_compact_table", 4),
    ("function/anomaly", 11),
    ("function/arithmetic", 19),
    ("function/count_hash", 2),
    ("function/date", 22),
    ("function/expression", 21),
    ("function/function_alias", 6),
    # 20 = geohash family + neighbours + full S2 + wkt point/measure/relation
    # + h3 index math (cells_contains) + geo_path/json_encode_path; the
    # remaining skips are the H3 geometry family (needs the C library's
    # base-cell data tables) and golden `Error:` statements
    ("function/geo", 20),
    ("function/ip", 8),
    ("function/json/json", 18),
    ("function/json/json_get", 33),
    ("function/json/json_is", 17),
    ("function/matches_term", 40),
    ("function/string/concat", 21),
    ("function/string/length", 19),
    ("function/string/like_pattern", 25),
    ("function/string/mysql_compat", 38),
    ("function/string/position", 30),
    ("function/string/regex", 7),
    ("function/string/repeat", 23),
    ("function/string/replace", 19),
    ("function/string/reverse", 21),
    ("function/string/string_split", 17),
    ("function/string/substring", 13),
    ("function/string/trim_pad", 27),
    ("function/string/upper_lower", 29),
    ("function/time", 1),
    ("function/vector/vector", 48),
    ("function/vector/vector_distance", 12),
    ("function/vector/vector_scalar", 12),
    ("function/vector/vector_index", 29),
    ("function/vector/vector_index_explain", 7),  # r10: pinned KNN oracles
    ("function/vector/vector_index_join", 6),
    # broad dialect coverage: types (float/NaN/decimal/string/timestamp),
    # select pruning, joins, casts, ttl, information_schema, tql extras
    ("aggregate/bool_agg", 12),
    ("aggregate/hll", 3),
    ("aggregate/min_max", 11),
    ("aggregate/string_agg", 7),
    ("aggregate/sum", 6),
    ("basic", 11),
    ("cast/boolean_cast", 11),
    ("cast/string_to_integer", 10),
    ("expr/atat", 17),
    # r8: all 13 former EXPLAIN skips now row-verified via the DuckDB
    # inner-query oracle (cast-preimage rewrites are about SELECT
    # semantics, which the oracle checks end-to-end)
    ("filter/cast_preimage", 16),
    ("filter/constant_comparisons", 16),
    ("function/admin/build_index_table_restart", 1),
    ("information_schema/region_info", 1),
    ("information_schema/ssts", 2),
    ("join/join_edge_cases", 3),
    ("join/join_large_tables", 2),
    ("join/join_lateral", 1),
    ("join/join_mixed_types", 1),
    ("join/join_ordering", 2),
    ("join/join_performance_patterns", 3),
    ("join/join_pushdown", 2),
    ("join/join_self_patterns", 2),
    ("join/join_window_functions", 1),
    ("join/left_join_patterns", 4),
    ("join/rdf_having_filter_regression", 1),
    ("join/right_join_patterns", 4),
    ("keywords/keywords_expressions", 2),
    ("mysql", 5),
    ("order/order_by_exceptions", 3),
    ("order/order_variable_size_payload", 14),
    ("overflow/integer_overflow", 6),
    ("parser/parser", 2),
    ("range/nest", 3),
    # skip_wal: restart emulation drops unflushed rows of skip-wal tables
    # (simulate_restart; loss window starts at first skip_wal enable)
    ("skip_wal", 7),
    # SHOW INDEX + information_schema.statistics (round 4)
    ("show/show_index", 7),
    ("select/flush_append_only", 4),
    ("select/like", 1),
    ("select/projection_names", 5),
    ("select/prune", 15),
    ("select/prune_field", 6),
    ("select/prune_pk", 6),
    ("select/skipping_index", 3),
    ("select/tql_filter", 3),
    ("select/union_all", 1),
    ("subquery/neumann", 2),
    ("subquery/test_neumann", 1),
    ("system/set_unsupported", 1),
    ("system/starrocks_compatibility", 2),
    ("timestamp/timestamp", 3),
    ("tql/operator", 1),
    ("ttl/alter_table_ttl", 9),
    ("ttl/ttl_instant", 20),
    ("types/decimal/decimal_small_precision_behavior", 8),
    ("types/decimal/decimal_table", 7),
    ("types/float/infinity", 44),
    ("types/float/infinity_nan", 15),
    ("types/float/nan", 32),
    ("types/float/nan_aggregates", 8),
    ("types/float/nan_arithmetic", 44),
    ("types/float/nan_arithmetic_extended", 38),
    ("types/float/nan_cast", 12),
    ("types/float/nan_cast_extended", 21),
    ("types/float/nan_join", 10),
    ("types/float/nan_ordering", 16),
    ("types/float/nan_window", 8),
    ("types/null/null_handling", 14),
    ("types/string/big_strings", 8),
    ("types/string/bigstring", 1),
    ("types/string/unicode", 6),
    ("types/string/unicode_extended", 7),
    ("types/timestamp/timestamp_join", 1),
    # ---- standalone-root suites (tests/cases/standalone/*, round 4):
    # COPY round-trips incl. compressed csv/json and COPY DATABASE
    ("copy/copy_from_fs_csv", 9),
    ("copy/copy_from_fs_json", 9),
    ("copy/copy_from_fs_parquet", 13),
    ("copy/copy_from_csv_compressed", 10),
    ("copy/copy_from_json_compressed", 10),
    ("copy/copy_database_from_fs_parquet", 7),
    # export-only files: every statement is a writing non-query — executing
    # without error IS the check (errored floor 0)
    ("copy/copy_to_fs", 0),
    ("copy/copy_to_csv_compressed", 0),
    ("copy/copy_to_json_compressed", 0),
    ("limit/limit", 3),
    ("create/recover_created", 2),
    ("information_schema/cluster_info", 4),
    # relative COPY/external paths resolve under the copy root; '..' rejected
    ("local_file_access", 1),
    # optimizer suites: r8 — EXPLAIN goldens whose inner query DuckDB can
    # run are now row-verified via _explain_inner_oracle (the optimization
    # under test must not change SELECT semantics, and that is exactly what
    # the oracle checks); residual skips are inner queries DuckDB's dialect
    # rejects (reference-only functions, `numbers` virtual-table limit
    # pushdown) plus the plan-text-only statements
    ("optimizer/count", 12),
    # 1 errored pinned: `WHERE i IN ((SELECT i FROM integers)) AND i1.i=i2.i`
    # over a self-join — DataFusion resolves the bare `i`, Spark calls it
    # ambiguous (A column or function parameter with name `i` is ambiguous)
    ("optimizer/filter_push_down", 21),
    ("optimizer/filter_column_pruning", 30),
    ("optimizer/first_value_advance", 10),
    ("optimizer/last_value_advance", 10),
    ("optimizer/last_value", 2),
    ("optimizer/order_by", 9),  # r10: numbers-contract pinned oracles
    ("optimizer/join_filter_pushdown", 2),
    ("optimizer/join_filter_pushdown_edge", 9),
    ("optimizer/lateral_join_guard", 2),
    ("optimizer/rewrite_set_comparison", 4),
    ("optimizer/scalar_subquery_prepass", 3),
    ("optimizer/time_index_filter_pushdown", 5),
    ("optimizer/windowed_sort", 5),
    ("optimizer/windowed_sort_advance", 3),
    ("optimizer/windowed_sort_nanos", 2),
    # TQL flows (Prometheus recording rules): DataFusion-named sink value
    # columns, label PRIMARY KEYs, simplest-CTE validation, full-window flush
    ("flow-tql/flow_tql", 15),
    ("flow-tql/flow_tql_cte", 6),
    ("flow-tql/flow_tql_flownode_addrs", 1),
    # error-golden-only file (sink schema mismatch message)
    ("flow-tql/flow_tql_missing_value_sink_schema", 0),
    ("types/timestamp/timestamp_limits", 1),
    ("types/timestamp/timestamp_tz", 1),
    ("window/latest_per_series", 4),
    # round-4 additions: previously uncovered reference files now green
    ("aggregate/multi_regions", 0),
    ("alter/alter_append_mode", 4),
    ("alter/alter_table_default", 3),
    ("alter/alter_physical_table", 4),
    ("alter/change_col_fulltext_options", 19),
    ("create/create_if_not_exists", 0),
    ("create/create_with_options", 0),
    ("create/metric_engine_partition", 7),
    ("flow/flow_more_usecase", 0),
    ("flow/flow_scheduled_late_overlap", 1),
    ("flow/flow_scheduled_now_boundary", 1),
    # distributed-only case files (no standalone sibling): scheduled-tick
    # replay, TQL flow over a metric physical table, region admin fns,
    # dictionary-label regex pushdown
    ("flow-tql/flow_eval_interval_schedule", 1),
    ("flow-tql/tsid_on_phy", 2),
    ("function/admin/flush_compact_region", 2),
    ("optimizer/metric_dictionary_regex_filter", 4),
    ("optimizer/pass_distribution_partition_subset_join", 3),
    ("optimizer/range_select_projection", 1),
    ("repartition/repartition", 16),
    ("alter/repartition_error", 12),
    ("flow/flow_sink_schema_mismatch", 0),
    ("flow/flow_view", 3),
    ("function/admin/build_index_table_error", 3),  # r10: arg-binder error parity
    ("function/system", 2),
    ("information_schema/procedure_info", 1),
    ("information_schema/tables", 1),
    ("information_schema/region_peers", 1),
    ("information_schema/region_statistics", 2),
    ("insert/mysql_insert", 1),
    ("insert/nullable_tag", 1),
    ("insert/physical_metric_table_insert", 0),
    ("range/error", 1),
    ("show/show_process_list", 2),
    ("show/show_region", 3),
    ("system/max_execution_time", 1),
    ("system/read_preference", 1),
    ("system/semantic_graph", 5),
    # round 5: the read-only error goldens verify via the error-parity path
    # (SELECT-form rejects must reject here too); CREATE/DROP scaffolding
    # verifies by affected-rows
    ("error/incorrect_sql", 10),
    # round 5: PREPARE/EXECUTE/DEALLOCATE server-side prepared statements
    ("prepare/mysql_prepare", 9),
    # round 5: the dyn_filter files are mostly EXPLAIN plan dumps (skipped
    # as engine-specific text) but their verification SELECTs are checkable
    ("filter/hash_join_dyn_filter", 2),
    ("filter/hash_join_topk_dyn_filter", 3),
    ("filter/topk_dyn_filter", 4),
    ("types/timestamp/incorrect_timestamp", 0),
    ("types/timestamp/timestamp_precision_display", 0),
]
# flow files NOT in the battery: (none left — flow_view, the flow_scheduled_*
# pair, flow_sink_schema_mismatch, flow_more_usecase and flow_advance_ttl
# joined in round 4; scheduled EVAL INTERVAL flows evaluate lazily at sink
# read).  flow/flow_status IS in the battery (partial statement set).
# DDL files NOT in the battery, with reasons:
# - alter/alter_table IS in the battery now (round 5, partial): the
#   test_alt_table / metric / grpc slices verify; the three default-value
#   tables pin greptime's lazy-cast internals ("wired behavior due to
#   underlying column data is unchanged" — a value written as Float64
#   re-renders from its f64 bits after MODIFY COLUMN … STRING) and stay
#   documented known-diffs
# - error/incorrect_sql, prepare/mysql_prepare, system/pg_catalog and the
#   three filter/*dyn_filter files ARE in the battery now (round 5:
#   error-parity typing, PREPARE/EXECUTE, pg_catalog emulation, and
#   plan-dump-skipping with data-SELECT verification respectively); the
#   round 9: NOTHING under standalone/common is excluded any more —
#   tql-explain-analyze/explain, promql/encode_substrait, tql/partition,
#   tql/general_table joined the battery (plan-dump residue recorded as
#   honest skips; encode_substrait fully verifies via the top-level-
#   subquery support + twin oracle) and scan_big_varchar runs prefix-
#   limited to Spark's µs-int64 timestamp ceiling
# - alter/alter_metric_table, create/create_metric_table,
#   insert/logical_metric_table, ttl/metric_engine_ttl and
#   ttl/database_ttl_with_metric_engine ARE in the battery now
#   (metric-engine logical→physical emulation, round 3)
# - alter/alter_database, create/create_database* ARE in the battery now
#   (round 3: database registry with option inheritance over the single
#   physical schema; DROP DATABASE drops its tables)
# - truncate/truncate IS in the battery now (FILE RANGE maps to a
#   time-range delete over the time-bucketed layout)
# - show/show_region, show/show_process_list: engine-internal presentation
#   (region ids / process lists).  show/show_index IS in the battery now
#   (round 4: index metadata from the declared schema).  show/show_create
#   and ttl/show_ttl ARE in the battery (partial statement sets).

# (round 9: promql/encode_substrait, tql/partition and tql/general_table
# are IN the battery now — see the round-9 block in _CONFORMANCE_CASES)
# - tql/tql-cte IS in the battery (round 4: WITH t AS (TQL EVAL …) rewrite;
#   all 16 non-EXPLAIN statements verify, incl. the positional
#   (ts, value, tags…) alias mapping the reference pins; round 9: the 18
#   EXPLAIN twins row-verify against their in-case goldens via the
#   twin-golden oracle — 2 skips left, both twin-less plan dumps)
# promql/string_identifier IS in the battery and runs verbatim — all 4 TQL
# statements (quoted "service.name" matchers/grouping, bare quoted metric,
# hex-escaped values) verify → 31/31 non-substrait promql files


# Files verified end-to-end but carrying a handful of statements whose golden
# output the exact engine cannot reproduce — each with the reason, skipped via
# known_diffs rather than dropped from the battery:
# - subquery/offset: scalar subquery with OFFSET and no ORDER BY returns zero
#   rows in DataFusion; Spark returns the NULL scalar
# - create/create_metric_table + insert/logical_metric_table: all metric
#   statements verify except SHOW INDEX (presentation) and the one SELECT
#   pinning raw __tsid values (see the entries below)
# - query/type_conversion_traversal: string-timestamp literals compared under
#   SET TIME_ZONE; session-timezone literal parsing not yet wired
_CONFORMANCE_CASES_KNOWN_DIFFS = [
    # COUNT(DISTINCT node_id) > 1: the distributed golden runs on multiple
    # datanodes; a single engine (like greptime standalone) has one node
    ("information_schema/ssts_limit", 3, ("has_multi_datanodes",)),
    # metric physical-region SHOW INDEX pins the engine-internal primary-key
    # layout (host, __table_id, __tsid, job ordering + auto skipping
    # indexes); user-table SHOW INDEX verifies in show/show_index
    ("show/show_create", 15, ("show index from phy",)),
    # metric engine emulation: TSIDs reproduce the reference's FxHash label
    # hash (verified for the `host` series); the golden's `job` TSIDs don't
    # match any composition of the current row_modifier.rs algorithm, so the
    # one SELECT pinning raw __tsid values is excluded. SHOW INDEX output is
    # engine-internal presentation.
    ("create/create_metric_table", 13, ("SHOW INDEX",)),
    ("insert/logical_metric_table", 12, (
        "SELECT ts, val, __tsid, host, job FROM phy",)),
    # Spark timestamps are microsecond-precision: the one statement casting
    # a TimestampNanosecond column to VARCHAR pins the 9-digit fraction
    ("types/timestamp/timestamp_precision", 7, ("CAST(sec AS VARCHAR)",)),
    # same µs limit: the ts_ns_bug rows at …00.000000195 vs …00.000000000
    # truncate to the same µs instant, so ns-boundary predicates on that
    # table cannot distinguish them (the ms/µs/s tables + the ns-literal
    # bump rewrite verify; 27 statements checked)
    # same µs limit: a TimestampNanosecond column's ::TIME render pins the
    # 9-digit fraction (…01.889268321); everything else verifies
    ("types/timestamp/timestamp_types", 36, ("nano::TIME from",)),
    ("types/timestamp/ts_precision_comparison", 26, (
        "ts_ns_bug WHERE ts <= '2026-06-02 03:50:00' ORDER BY ts",
        "ts_ns_bug WHERE ts = '2026-06-02 03:50:00.000000195'",
        "ts_ns_bug WHERE ts > '2026-06-02 03:50:00' ORDER BY ts")),
    ("subquery/offset", 2, ("FROM temp_values OFFSET 1)",)),
    # alter_table joins the battery (round 5): the test_alt_table /
    # metric-engine / grpc_latencies slices verify end-to-end; the three
    # default-value tables pin greptime's LAZY column casts (a value written
    # while the column was Float64 re-renders from its original f64 bits
    # after MODIFY COLUMN … STRING — "wired behavior due to underlying
    # column data is unchanged"), unreproducible for an eager-rewrite engine
    ("alter/alter_table", 29, ()),
    # pg_catalog joins the battery (round 5): pg_class/pg_namespace/
    # pg_attribute/pg_database emulation + psql scalar shims under the
    # POSTGRES protocol. Round 6 added the full static pg_type dump
    # (PostgreSQL's public catalog constants, data/pg_type.csv) and the psql
    # tab-completion shims (current_setting/parse_ident/quote_ident/
    # string_to_array/generate_series/1-based subscripts). Round 7 closed
    # the last three skips: `create database pg_catalog` (error parity),
    # the REPLACE-destroyed handshake SELECT (opaque-golden compare), and
    # the two-statements-one-golden is_on_search_path block (compound split)
    ("system/pg_catalog", 31, ()),
    # flow_advance_ttl's goldens carry a newer auto-sink comment string
    # ('Sink table for flow flow-id=N') than flow_basic's ('Auto created
    # table by flow engine') — one engine version can't match both
    ("flow/flow_advance_ttl", 15, ("SHOW CREATE TABLE out_distinct_basic",)),
    ("query/type_conversion_traversal", 1, ("> '2024-05-01 08:00:00'", "TIMESTAMP '2024-05-01 00:00:00'")),
    # DataFusion star-expands a second USING join with both sides' key
    # column; Spark coalesces every USING key
    ("join/using_join", 3, ("JOIN user_profiles USING",)),
    # Spark treats NaN = NaN as TRUE (SQL NaN-equality) where the reference
    # follows IEEE: the `WHERE f != f` probe returns the NaN row there, no
    # rows here. The -0.0 rendering rows now compare fine (negative zero is
    # canonicalized in _norm_cell).
    ("types/float/ieee_floating_points", 7, ("WHERE f != f", "WHERE d != d")),
    # DATE - DATE is an int day-count in DataFusion, an interval in Spark
    ("types/date/test_date", 8, ("i - DATE '1993-08-14'",)),
    # full SELECT * over the system tables pins the reference's internal
    # table-id constants and the meta-columns of every info table — only the
    # user-table surface is reproduced here
    ("system/information_schema", 9, (
        "from information_schema.tables\nwhere table_name != 'scripts'",
        "from information_schema.columns\nwhere table_schema != 'greptime_private'",
        "create_time > NOW()")),
]


@pytest.mark.parametrize("case,min_checked", _CONFORMANCE_CASES,
                         ids=[c for c, _ in _CONFORMANCE_CASES])
def test_sqlness_conformance(spark, tmp_path, case, min_checked):
    _run_case(spark, tmp_path, case, min_checked)


def test_sqlness_scan_big_varchar(spark, tmp_path):
    """types/string/scan_big_varchar, prefix-limited: the case doubles a
    16K x 10KB string table with ts = to_unixtime(ts) * prime chains. The
    reference's timestamp_s column is an i64 of SECONDS, so its epoch
    products stay representable ~1e6x longer than Spark's i64-µs
    timestamps (max ~9.2e12 s). Every statement through the last in-range
    chain (ts products <= 3e12 s, table at 128 rows / 1.28 MB of string
    payload) verifies against the goldens; the `* 53` insert is the first
    to overflow µs-i64 and the remainder is counted as skips — a
    documented type-mapping bound, not missing semantics."""
    _run_case(spark, tmp_path, "types/string/scan_big_varchar", 8,
              stop_marker="* 53")


@pytest.mark.parametrize("case,min_checked,known_diffs",
                         _CONFORMANCE_CASES_KNOWN_DIFFS,
                         ids=[c for c, _, _ in _CONFORMANCE_CASES_KNOWN_DIFFS])
def test_sqlness_conformance_known_diffs(spark, tmp_path, case, min_checked,
                                         known_diffs):
    _run_case(spark, tmp_path, case, min_checked, known_diffs=known_diffs)
