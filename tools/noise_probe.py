"""Host noise-floor probe (VERDICT r9 Next #2b).

Times ONE fixed, code-stable query (q20_time_bucket_agg, untouched since
r7) N times with a sleep between samples, recording wall time + loadavg
per sample. Run it interleaved through a work session to measure the
box's noise floor on identical code — the evidence that separates
host drift from code regressions when bench artifacts move.

Usage:
    python tools/noise_probe.py [--samples N] [--interval SEC] [--out F]

Prints one JSON line; with --out, also appends it to the file so probes
from different points in a session accumulate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_QUERY = "q20_time_bucket_agg"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--interval", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from greptimedb_spark import get_spark
    from greptimedb_spark.queries import all_queries, read

    spark = get_spark("greptimedb-spark-noise-probe")
    build = all_queries()[PROBE_QUERY].build

    # steady-state warmup, same as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    read(spark, SF_DIR, "events").limit(1).count()
    build(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    samples = []
    for i in range(args.samples):
        if i:
            time.sleep(args.interval)
        la = round(os.getloadavg()[0], 2)
        t0 = time.time()
        build(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        samples.append({"t": round(time.time(), 1), "loadavg": la,
                        "sec": round(time.time() - t0, 3)})
        spark.catalog.clearCache()

    secs = sorted(s["sec"] for s in samples)
    out = {
        "probe": PROBE_QUERY, "sf_dir": SF_DIR,
        "min": secs[0], "median": secs[len(secs) // 2], "max": secs[-1],
        "spread": round(secs[-1] / secs[0], 2) if secs[0] else None,
        "samples": samples,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
