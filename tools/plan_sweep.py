"""Physical-plan node-count sweep over every registry query.

Reproduces the plans/r12/plan_sweep_all104.txt methodology: formatted
explain, count '(N) <node>' operator headers per query at sf0.1. Writes the
table to stdout (redirect to the plans/ file to commit).
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greptimedb_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark()
    qs = entry.queries()
    print("# physical-plan NODE counts per registry query at sf0.1 (formatted explain")
    print("# '(N) <node>' headers): ex=Exchange+BroadcastExchange, reuse=ReusedExchange,")
    print("# py=Arrow/Batch/MapIn* Python nodes, gen=Generate, bnlj=BroadcastNestedLoopJoin,")
    print("# smj=SortMergeJoin. ONE methodology, generated on final r12 HEAD.")
    print("query                              ex reuse py gen bnlj smj flags")
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"{name:<34} ERROR {type(e).__name__}: {e}")
            continue
        heads = re.findall(r"^\((\d+)\) ([A-Za-z]+)", plan, re.M)
        nodes = [h[1] for h in heads]

        def n(*names):
            return sum(nodes.count(x) for x in names)

        flags = []
        if n("BatchEvalPython"):
            flags.append("BATCH_EVAL_PY")
        if n("CartesianProduct"):
            flags.append("CARTESIAN")
        print(f"{name:<34} {n('Exchange', 'BroadcastExchange'):>2} "
              f"{n('ReusedExchange'):>4} {n('ArrowEvalPython', 'BatchEvalPython', 'MapInArrow', 'MapInPandas', 'FlatMapGroupsInPandas', 'FlatMapGroupsInPandasWithState'):>2} "
              f"{n('Generate'):>3} {n('BroadcastNestedLoopJoin'):>4} "
              f"{n('SortMergeJoin'):>3} {','.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main()
