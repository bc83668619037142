"""Pin the q81 HLL fixture — a SELF-generated regression oracle.

Unlike every other fixture in tests/fixtures (independent pure-Python
reimplementations), this one is produced by the engine itself: q81's
estimates come out of Spark's Apache DataSketches HLL binary state
(F.hll_sketch_agg / hll_union_agg / hll_sketch_estimate, reference analog
src/common/function/src/aggrs/approximate/hll.rs:42), and those register
bits cannot be re-derived outside datasketches. Pinning Spark's own output
at sf0.001+sf0.01 turns q81 from a rows-only check into a regression gate:
any silent change to the sketch wiring (wrong column, dropped merge, lgK
drift across Spark upgrades) breaks the hash. It does NOT prove the
estimates correct — tests/test_sql_functions.py asserts the estimates land
within tolerance of exact counts, which covers accuracy.

Determinism: HLL registers are max-based, so state, union, and estimate are
row-order-insensitive pure functions of the input set.

Usage: python tools/gen_q81_self_fixture.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(os.path.dirname(HERE), "tests", "fixtures",
                   "oracle_q81_sf001.parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("gen-q81-fixture")
        .getOrCreate()
    )
    from greptimedb_spark.queries.stats_q import q81_hll_sketch

    df = q81_hll_sketch(spark, "/root/testdata/sf0.01").orderBy("event_type")
    pdf = df.toPandas()
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} rows")
    print(pdf)


if __name__ == "__main__":
    main()
