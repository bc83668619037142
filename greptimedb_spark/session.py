"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and scaled down by env vars for
local runs:
- AQE on (runtime coalesce, skew-join splitting) — replaces the reference's
  hand-written distribution rules (src/query/src/optimizer/parallelize_scan.rs,
  pass_distribution.rs): Spark's EnsureRequirements + AQE cover them.
- Parquet filter pushdown + aggregate pushdown — replaces SST zone-map pruning
  (src/mito2/src/read/prune.rs).
- Arrow execution for the few pandas-UDF paths.
- UTC session timezone (reference stores UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst (default true) makes AQE keep default parallelism
    # instead of honoring the advisory partition size — every multi-stage
    # pipeline then pays full-width scheduling on tiny exchanges. With it
    # off, small exchanges coalesce to ~64MB partitions (solo A/B at sf0.1:
    # q52 4.37→3.03s, q02 1.42→1.17s, q54 0.96→0.81s, q03 1.41→1.25s) while
    # 100TB-scale exchanges exceed the advisory size and stay wide.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # 256MB advisory shuffle-partition target (default 64MB): standard
    # large-cluster sizing — at 100 TB exchanges still exceed it and stay
    # wide, while multi-stage pipelines on small inputs coalesce harder
    # (solo A/B at sf0.1, same session: q52 3.72→2.65s median). 1GB tested
    # faster still (2.41s) but risks per-task memory at real executor
    # sizes — rejected.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # zstd output parquet (guide §6): 38% fewer bytes than snappy on the
    # ingest-bench batch (5.3 vs 8.6 MB) at statistically equal write time
    # locally (r11 A/B: min 0.90 vs 0.91 s) — at 100 TB the byte saving is
    # the lever (less disk + network on every write/read of written data)
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.recordLevelFilter.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # v2 commit: tasks move output files into place at task commit instead of
    # a serial driver-side rename pass at job commit — with partitionBy over
    # many bucket directories the v1 job-commit rename is O(files) on the
    # driver and dominates small-batch ingest latency
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
}


def get_spark(app_name: str = "greptimedb-spark", **conf: str) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32);
    ``SPARK_GRAFT_MASTER`` overrides the master URL (a real cluster would set
    e.g. ``yarn``/``k8s://...`` — nothing here assumes local mode).
    """
    master = os.environ.get(
        "SPARK_GRAFT_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = dict(_DEFAULTS)
    merged.update({k: str(v) for k, v in conf.items()})
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
