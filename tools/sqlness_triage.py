"""Triage runner: run reference sqlness case files through GreptimeSQL and
report per-file checked/skipped/failed counts (non-asserting version of
tests/test_sqlness.py::_run_case).

Usage: python tools/sqlness_triage.py promql/functions promql/label ...
       python tools/sqlness_triage.py --dir promql      # every file in a dir
       SHOW_FAIL=1 ... to print each mismatching statement + diff head
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/tests/cases/standalone/common"
SHOW_FAIL = os.environ.get("SHOW_FAIL", "0") == "1"


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_sqlness import (
        _parse_result_file, _norm_cell, _apply_replaces, _SKIP_PATTERNS,
        _expand_multiline_rows, _normalize_f32, _case_path,
    )
    import re

    from pyspark.sql import SparkSession

    from greptimedb_spark.session import get_spark

    spark = get_spark()

    args = sys.argv[1:]
    cases = []
    if args and args[0] == "--dir":
        d = args[1]
        for f in sorted(os.listdir(f"{REF}/{d}")):
            if f.endswith(".result"):
                cases.append(f"{d}/{f[:-7]}")
    else:
        cases = args

    grand = [0, 0, 0]
    for case in cases:
        from greptimedb_spark.catalog import Catalog
        from greptimedb_spark.sql import GreptimeSQL

        tmp = tempfile.mkdtemp(prefix="sqlness_")
        g = GreptimeSQL(spark, catalog=Catalog(spark, tmp))
        checked = skipped = failed = 0
        fail_msgs = []
        for stmt, expected, replaces in _parse_result_file(_case_path(case)):
            # drop pseudo-replace directives (sleep/restart/sort markers
            # carry non-string payloads the regex sub can't take)
            replaces = [r for r in replaces
                        if not r[0].startswith("__") and isinstance(r[1], str)]
            if any(re.search(p, stmt, re.IGNORECASE) for p in _SKIP_PATTERNS) or expected == "error":
                skipped += 1
                continue
            try:
                df = g.sql(stmt)
                rows = df.collect() if expected is not None else []
            except Exception as e:
                skipped += 1
                if SHOW_FAIL:
                    fail_msgs.append(f"  SKIP(exc) {stmt[:120]!r}\n    {type(e).__name__}: {str(e)[:200]}")
                continue
            if expected is None:
                continue
            if any("\\n" in pat for pat, _rep in replaces):
                skipped += 1
                continue
            exp_header, exp_rows = expected
            rows = _normalize_f32(df, rows)
            rows = _expand_multiline_rows(rows)
            if replaces:
                got_cells = [[_apply_replaces(c, replaces) if isinstance(c, str) else c
                              for c in row] for row in rows]
            else:
                got_cells = rows
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
            if sorted(got, key=key) == sorted(want, key=key):
                checked += 1
            else:
                failed += 1
                if SHOW_FAIL:
                    fail_msgs.append(
                        f"  FAIL {stmt[:160]!r}\n    got  {sorted(got, key=key)[:4]}\n    want {sorted(want, key=key)[:4]}"
                    )
        status = "PASS" if failed == 0 and checked > 0 else ("EMPTY" if checked == 0 and failed == 0 else "FAIL")
        print(f"{status:5s} {case}: checked={checked} skipped={skipped} failed={failed}")
        for m in fail_msgs:
            print(m)
        grand[0] += checked
        grand[1] += skipped
        grand[2] += failed
    print(f"TOTAL checked={grand[0]} skipped={grand[1]} failed={grand[2]}")


if __name__ == "__main__":
    main()
