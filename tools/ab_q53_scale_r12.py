"""q53 packed-aggregate A/B at SCALECHECK corpus scales (x10/x100 docs).

Rebuilds the scalecheck document corpus (same deterministic transform) and
interleave-times the old 65-agg vs packed 33-agg signature job on it.

Usage: python tools/ab_q53_scale_r12.py [x10|x100] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_q53scale"


def main() -> None:
    from pyspark.sql import functions as F

    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from tools.ab_q53_packed_r12 import old_simhash_agg, packed_simhash_agg

    scale = 10
    reps = 3
    for a in sys.argv[1:]:
        if a in ("x10", "x100"):
            scale = int(a[1:])
        elif a.startswith("--reps"):
            pass
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    spark = get_spark("ab-q53-scale")
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(WORK, f"x{scale}_documents.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

        def doc_replica(k: int):
            return docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1{k}z").alias("text"),
                "lang", "source", "n_chars",
            )

        d = doc_replica(0)
        for k in range(1, scale):
            d = d.unionByName(doc_replica(k))
        d.write.mode("overwrite").parquet(path)

    d = spark.read.parquet(path)
    n = d.count()
    print(f"corpus x{scale}: {n} docs", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # JIT warm both shapes once before the interleaved reps
    noop(old_simhash_agg(d, "doc_id", "text"))
    noop(packed_simhash_agg(d, "doc_id", "text"))

    out: dict[str, list[float]] = {"sig_old": [], "sig_new": []}
    for _ in range(reps):
        t0 = time.time()
        noop(old_simhash_agg(d, "doc_id", "text"))
        out["sig_old"].append(round(time.time() - t0, 3))
        t0 = time.time()
        noop(packed_simhash_agg(d, "doc_id", "text"))
        out["sig_new"].append(round(time.time() - t0, 3))

    print(json.dumps({"scale": scale, "docs": n, "reps": reps, **out,
                      "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
