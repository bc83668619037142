"""q53 simhash breakdown + A/B harness (r12, guide §1: measure first).

Times, in ONE session with interleaved reps:
- sigjob:   the _simhash_agg pipeline alone (noop sink, no checkpoint)
- sigckpt:  _simhash_agg().localCheckpoint(eager=True) (the build-time job)
- pairs:    full simhash_pairs noop on top of a prebuilt checkpoint

Usage: python tools/ab_q53_r12.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from greptimedb_spark.queries import read

    reps = 4
    sf = SF_DIR
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            i += 1

    spark = get_spark("ab-q53-r12")
    spark.sparkContext.setLogLevel("ERROR")
    d = read(spark, sf, "documents")
    d.count()  # warm the scan/file listing

    out: dict[str, list[float]] = {"sigjob": [], "sigckpt": [], "pairs": [], "full": []}
    for _ in range(reps):
        spark.catalog.clearCache()

        t0 = time.time()
        noop(dd._simhash_agg(d, "doc_id", "text"))
        out["sigjob"].append(round(time.time() - t0, 3))

        t0 = time.time()
        ck = dd._simhash_agg(d, "doc_id", "text").localCheckpoint(eager=True)
        out["sigckpt"].append(round(time.time() - t0, 3))

        # pairs on top of the prebuilt checkpoint: replicate simhash_pairs tail
        from pyspark.sql import functions as F

        banded = ck.select(
            "id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i2).alias("band"),
                            F.shiftright("sig", i2 * 16).bitwiseAND(F.lit(0xFFFF)).alias("bits"),
                        )
                        for i2 in range(4)
                    ]
                )
            ).alias("bb"),
        ).select("id", "sig", "bb.band", "bb.bits")
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bits") == F.col("b.bits"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        res = (
            pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= 3)
            .select("id_a", "id_b", "hamming")
        )
        t0 = time.time()
        noop(res)
        out["pairs"].append(round(time.time() - t0, 3))

        t0 = time.time()
        noop(dd.simhash_pairs(d, "doc_id", "text", max_hamming=3))
        out["full"].append(round(time.time() - t0, 3))

    print(json.dumps({"sf": sf, "reps": reps, **out, "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
