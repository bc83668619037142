"""Solo experiment for VERDICT r6 Next #7: q52's remaining cost is the
tokenize->window->distinct pipeline feeding three consumers.

Variants timed at sf0.1 (run SOLO — contention invalidates the numbers):
  A. current operator (persist() of sh / per_doc / pair_ids)
  B. sh spilled to parquet and re-read (columnar re-read for 3 consumers)
  C. current operator under different spark.sql.shuffle.partitions

Usage: python tools/bench_q52_variants.py
Prints one line per variant; keep the loser documented in the operator.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def timeit(spark, build):
    samples = []
    for _ in range(REPS):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
        spark.catalog.clearCache()
    samples.sort()
    return samples[len(samples) // 2], samples[0]


def main() -> None:
    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from greptimedb_spark.queries import read

    spark = get_spark("q52-variants")
    d = read(spark, SF, "documents")
    d.limit(1).count()  # warm FS

    def current():
        return dd.minhash_lsh_pairs(d, "doc_id", "text", num_hashes=64,
                                    bands=16, shingle_k=3,
                                    jaccard_threshold=0.12)

    med, lo = timeit(spark, current)
    print(f"A current persist: median={med:.3f}s min={lo:.3f}s")

    # B: spill sh to parquet, re-read, run the rest of the pipeline by hand
    def spilled():
        tmp = os.path.join(tempfile.gettempdir(), "q52_sh_spill")
        sh0 = dd.shingle_hashes(d, "doc_id", "text", 3)
        sh0.write.mode("overwrite").parquet(tmp)
        sh = spark.read.parquet(tmp)
        return dd._pairs_from_shingles(sh, num_hashes=64, bands=16,
                                       jaccard_threshold=0.12) \
            if hasattr(dd, "_pairs_from_shingles") else None

    if hasattr(dd, "_pairs_from_shingles"):
        med, lo = timeit(spark, spilled)
        print(f"B parquet spill:   median={med:.3f}s min={lo:.3f}s")
        shutil.rmtree(os.path.join(tempfile.gettempdir(), "q52_sh_spill"),
                      ignore_errors=True)
    else:
        print("B parquet spill:   (operator split not available)")

    for n in (8, 16, 64):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        med, lo = timeit(spark, current)
        print(f"C shuffle={n:>3}:     median={med:.3f}s min={lo:.3f}s")
    spark.conf.set("spark.sql.shuffle.partitions", "32")


if __name__ == "__main__":
    main()
