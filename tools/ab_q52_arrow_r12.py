"""r12 crossover A/B (r11 VERDICT Next #4): q52's JVM profile statement vs a
numpy `mapInArrow` profile (tokenize/shingle per doc in Python, hashing via
the parity-proven vectorized XXH64 in tools/xxh64_np.py), at the SCALECHECK
corpus sizes (x1 = 5 k docs, x10 = 50 k, x100 = 500 k).

The r11 experiment lost at 5 k docs (Arrow boundary > JVM work replaced);
this re-runs the interleaved A/B at 10x/100x to find the crossover. Outputs
are asserted pair-identical at every scale before any timing is trusted.

Run SOLO:  python tools/ab_q52_arrow_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ab_q52_arrow_r12"
SCALES = (1, 10, 100)
NUM_HASHES, BANDS, K, THRESH = 64, 16, 3, 0.12


def _build_docs(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def replica(k: int):
        return docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1{k}z").alias("text"),
        )

    paths = {}
    for n in SCALES:
        d = replica(0)
        for k in range(1, n):
            d = d.unionByName(replica(k))
        p = os.path.join(WORK, f"x{n}_documents.parquet")
        if not os.path.exists(p):
            d.write.mode("overwrite").parquet(p)
        paths[n] = p
    return paths


def _arrow_profile(spark, src):
    """(id, n_sh, sig, hs) per doc via one mapInArrow pass — the map-only
    twin of minhash_lsh_pairs' profile statement."""
    import numpy as np
    import pyarrow as pa

    from greptimedb_spark.operators.dedup import _perm_coeffs
    from tools.xxh64_np import xxh64_strings

    coeffs = [_perm_coeffs(i) for i in range(NUM_HASHES)]
    A = np.array([a for a, _ in coeffs], dtype=np.uint64)
    B = np.array([b for _, b in coeffs], dtype=np.uint64)
    MASK = np.uint64(0xFFFFFFFF)
    out_schema = ("id long, n_sh long, sig array<bigint>, hs array<bigint>")
    import re as _re

    # Java \s is ASCII-only; the corpus is ASCII so this matches Spark's
    # regexp_replace(lower(trim(text)), '\s+', ' ') exactly
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def profile(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("__text").to_pylist()
            o_id, o_n, o_sig, o_hs = [], [], [], []
            for i, t in zip(ids, texts):
                toks = ws.sub(" ", (t or "").strip().lower()).split(" ")
                if len(toks) >= K:
                    sh = [" ".join(toks[j:j + K]) for j in range(len(toks) - K + 1)]
                else:
                    sh = [" ".join(toks)]
                hs = np.unique(
                    xxh64_strings(sh).astype(np.uint64) & MASK)
                sig = ((hs[:, None] * A + B) & MASK).min(axis=0)
                o_id.append(i)
                o_n.append(len(hs))
                o_sig.append([int(x) for x in sig])
                o_hs.append([int(x) for x in hs])
            yield pa.RecordBatch.from_pydict(
                {"id": o_id, "n_sh": o_n, "sig": o_sig, "hs": o_hs})

    from pyspark.sql import functions as F

    src_df = spark.read.parquet(src).select(
        F.col("doc_id").alias("id"), F.col("text").alias("__text"))
    return src_df.mapInArrow(profile, out_schema)


def _pairs_over_view(spark, view):
    from greptimedb_spark.operators.dedup import _band_exprs_sql

    banded = ("(SELECT id, explode(array("
              + ",".join(_band_exprs_sql(NUM_HASHES, BANDS))
              + f")) AS bucket FROM {view})")
    n_inter = "size(array_intersect(pa.hs, pb.hs))"
    return spark.sql(f"""
SELECT id_a, id_b, est_jaccard, jaccard FROM (
  SELECT c.id_a, c.id_b,
         round(size(filter(zip_with(pa.sig, pb.sig, (x, y) -> cast(x = y AS int)), v -> v = 1)) / {NUM_HASHES}, 6) AS est_jaccard,
         round({n_inter} / (pa.n_sh + pb.n_sh - {n_inter}), 6) AS jaccard
  FROM (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM {banded} a JOIN {banded} b ON a.bucket = b.bucket AND a.id < b.id
  ) c
  JOIN {view} pa ON pa.id = c.id_a
  JOIN {view} pb ON pb.id = c.id_b
)
WHERE jaccard >= CAST({THRESH!r} AS DOUBLE)
""")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd

    spark = get_spark("ab-q52-arrow-r12")
    spark.range(1000).selectExpr("sum(id)").collect()
    paths = _build_docs(spark)
    out = {"sf_dir": SF_DIR, "reps": reps, "scales": {}}

    for n in SCALES:
        docs = spark.read.parquet(paths[n])

        def run_jvm():
            return dd.minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=NUM_HASHES, bands=BANDS,
                shingle_k=K, jaccard_threshold=THRESH)

        def run_arrow():
            prof = _arrow_profile(spark, paths[n]).persist()
            prof.createOrReplaceTempView("__ab_arrow_prof")
            return _pairs_over_view(spark, "__ab_arrow_prof")

        # parity first (x1/x10 only; x100 row counts compared)
        if n <= 10:
            a = sorted(tuple(r) for r in run_jvm().collect())
            spark.catalog.clearCache()
            b = sorted(tuple(r) for r in run_arrow().collect())
            spark.catalog.clearCache()
            assert a == b, f"x{n}: outputs differ! jvm={len(a)} arrow={len(b)}"
            parity = f"identical ({len(a)} pairs)"
        else:
            ca = run_jvm().count()
            spark.catalog.clearCache()
            cb = run_arrow().count()
            spark.catalog.clearCache()
            assert ca == cb, f"x{n}: counts differ {ca} vs {cb}"
            parity = f"counts equal ({ca} pairs)"

        walls = {"jvm": [], "arrow": []}
        for _ in range(reps):
            for name, fn in (("jvm", run_jvm), ("arrow", run_arrow)):
                t0 = time.time()
                fn().write.mode("overwrite").format("noop").save()
                walls[name].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        out["scales"][f"x{n}"] = {
            "parity": parity,
            **{k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
               for k, v in walls.items()},
        }
        print(f"x{n}: {json.dumps(out['scales'][f'x{n}'])}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
