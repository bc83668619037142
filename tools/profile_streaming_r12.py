"""Round-12 profiling for the streaming trio q73/q75/q111 (guide §1).

Times each builder end-to-end (build + stream run + result materialization,
the same region the oracle gate pays), and breaks q75 down into its phases:
src write, stream run (with per-batch progress), rollup read. Run at sf0.01
and sf0.1 to see how the floor scales with data.

Usage: python tools/profile_streaming_r12.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from greptimedb_spark import get_spark
    from greptimedb_spark.queries import all_queries

    spark = get_spark("profile-streaming-r12")
    specs = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {"sf_dir": SF_DIR, "shuffle_partitions":
           spark.conf.get("spark.sql.shuffle.partitions")}
    for name in ("q73_streaming_dedup", "q75_streaming_neardup",
                 "q111_streaming_asof"):
        reps = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"r12 profile {name}")
            t0 = time.time()
            specs[name].build(spark, SF_DIR).write.mode("overwrite") \
                .format("noop").save()
            reps.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = reps
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
