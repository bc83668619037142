"""q53 cold-start A/B: first-execution wall of the signature job in a FRESH
JVM (captures Janino/JIT of the 65- vs 33-aggregate codegen).

Usage: python tools/ab_q53_cold_r12.py old|new [--sf DIR]
Prints one JSON line with first/second/third rep walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1]
    sf = SF_DIR
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from greptimedb_spark.queries import read
    from tools.ab_q53_packed_r12 import old_simhash_agg, packed_simhash_agg

    spark = get_spark("ab-q53-cold")
    spark.sparkContext.setLogLevel("ERROR")
    d = read(spark, sf, "documents")
    d.count()

    build = old_simhash_agg if which == "old" else packed_simhash_agg
    walls = []
    for _ in range(3):
        t0 = time.time()
        build(d, "doc_id", "text").write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"which": which, "sf": sf, "walls": walls,
                      "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
