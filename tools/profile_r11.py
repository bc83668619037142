"""Round-11 profiling harness (guide §1: measure first).

For each headline bench query, separately time:
- build:   Python builder call (plan construction + analysis round-trips)
- plan:    .explain("formatted") — analysis + optimization + physical planning
- first:   first noop-sink execution (includes codegen compile)
- min/med: min/median of N further noop executions (steady state)

Also writes plans/r11/<query>_before.txt unless they already exist.

Usage: python tools/profile_r11.py [query ...] [--reps N] [--tag before|after]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q20_time_bucket_agg",
    "q21_lastpoint",
    "q24_range_sliding",
    "q25_topk_per_bucket",
    "q10_conditional_agg",
    "q52_minhash_lsh",
    "q54_ann_bruteforce",
]


def main() -> None:
    from greptimedb_spark import get_spark
    from greptimedb_spark.queries import all_queries

    argv = sys.argv[1:]
    reps = 5
    tag = None
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    names = names or BENCH_QUERIES

    spark = get_spark("greptimedb-spark-profile")
    specs = all_queries()

    # warm up, mirroring bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from greptimedb_spark.queries import read

    read(spark, SF_DIR, "region").count()
    read(spark, SF_DIR, "events").limit(1).count()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        build = specs[name].build
        spark.sparkContext.setJobDescription(f"profile:{name}")

        t0 = time.time()
        df = build(spark, SF_DIR)
        t_build = time.time() - t0

        t0 = time.time()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t_plan = time.time() - t0
        if tag:
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())

        spark.catalog.clearCache()
        t0 = time.time()
        build(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        t_first = time.time() - t0
        spark.catalog.clearCache()

        samples = []
        for _ in range(reps):
            t0 = time.time()
            build(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        samples.sort()
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "first": round(t_first, 3),
            "min": round(samples[0], 3),
            "med": round(samples[len(samples) // 2], 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"all": out, "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
