"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against its
oracle_sql() in DuckDB: row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [name_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# STRICT=1 (default) mirrors the driver's exact value-hash: floats keep full
# repr (and int vs float is a type mismatch). STRICT=0 is the old 9-decimal gate
# for triaging whether a failure is ulp-level or real.
STRICT = os.environ.get("SPARK_GRAFT_STRICT", "1") == "1"


def _norm_cell(v):
    import datetime as dt
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders NULL ints as NaN; fold NaN→None so nullable int
            # columns fetched via .df() don't false-positive against Spark None
            return None if STRICT else "NaN"
        return repr(v) if STRICT else round(v, 9)
    if isinstance(v, Decimal):
        return str(v) if STRICT else round(float(v), 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    import numpy as np

    if isinstance(v, np.floating):
        return _norm_cell(float(v))
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as ent
    from greptimedb_spark import get_spark

    filters = sys.argv[1:]
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"spark:{type(e).__name__}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": "no_oracle"}
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            if STRICT:
                # fetch via pandas like the driver: exposes HUGEINT→float64 etc.
                odf = rel.df()
                orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
            else:
                orows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            a = _normalize(srows, [c.lower() for c in scols])
            b = _normalize(orows, ocols)
            if a != b:
                bad = sum(1 for x, y in zip(a, b) if x != y)
                problems.append(f"values differ in {bad}/{len(a)} rows")
                for x, y in list(zip(a, b))[:200]:
                    if x != y:
                        problems.append(f"  spark={x}")
                        problems.append(f"  duck ={y}")
                        break
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(c.lower() for c in scols) == sorted(ocols)
        results[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": not problems, "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems[:2]) or None,
        }
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    out_path = os.environ.get("SPARK_GRAFT_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
