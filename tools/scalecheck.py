"""SCALECHECK: empirical 1x-vs-10x scaling evidence for the LLM-data ops.

The 100-TB claims for the dedup/ANN/decontamination operators are argued
from plan shapes (banded/bucketed/broadcast, bounded candidate joins); this
harness produces DATA: it scales the sf0.1 corpus 10x and records wall
time + plan shuffle counts for each leg at both scales, so sub-quadratic
growth is demonstrated, not asserted.

Corpus construction (deterministic, dup-rate preserving):
- documents: 10 replicas; every token gets a replica-unique suffix
  (``{k}z``), so shingle/n-gram overlap ACROSS replicas is zero while the
  near-dup structure WITHIN each replica mirrors the original — the 10x
  corpus has ~10x the dup pairs, not 45x from self-collisions. The 1x
  corpus is replica 0 (same transform), keeping token lengths comparable.
- embeddings: 10 replicas with a small deterministic per-replica,
  per-component perturbation — distinct vectors, same cluster geometry.
- ANN query set and the contamination benchmark set are FIXED (taken from
  replica 0) at both scales: the measurement isolates corpus scaling.

Expected shapes: q52 minhash ~linear (per-doc signature work + ~10x
banded candidate pairs); q54 brute force ~linear (fixed queries x 10x
corpus); q57 IVF ~linear with a smaller constant (probe subset); q106
contamination ~linear (fixed broadcast benchmark, 10x probe side).

Run SOLO (no concurrent Spark) — wall times are the artifact:

    python tools/scalecheck.py            # writes SCALECHECK_r9.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALECHECK_DIR", "/tmp/spark_graft_scalecheck")
OUT = os.environ.get("SPARK_GRAFT_SCALECHECK_OUT", "SCALECHECK_r9.json")
REPS = int(os.environ.get("SPARK_GRAFT_SCALECHECK_REPS", "2"))


def _build_corpora(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def doc_replica(k: int):
        return docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1{k}z").alias("text"),
            "lang", "source", "n_chars",
        )

    def emb_replica(k: int):
        return emb.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.lit(float(k)) * (
                    F.lit(0.003) * ((i % 7).cast("float") - F.lit(3.0))),
            ).alias("embedding"),
            "label",
        )

    d1, e1 = doc_replica(0), emb_replica(0)
    d10 = d1
    e10 = e1
    for k in range(1, 10):
        d10 = d10.unionByName(doc_replica(k))
        e10 = e10.unionByName(emb_replica(k))

    paths = {}
    for name, df in (("x1/documents", d1), ("x1/embeddings", e1),
                     ("x10/documents", d10), ("x10/embeddings", e10)):
        p = os.path.join(WORK, name + ".parquet")
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths


def _time_leg(spark, build, reps: int = REPS):
    """min-of-reps wall time for a leg (min is robust to external load:
    contention can only inflate); plan shuffle count from the initial
    physical plan (structural, data-size independent)."""
    df = build()
    exchanges = df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange")
    samples = []
    for _ in range(reps):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
        spark.catalog.clearCache()
    rows_out = build().count()
    spark.catalog.clearCache()
    return {"sec": round(min(samples), 3), "exchanges": exchanges,
            "rows_out": rows_out}


def main() -> None:
    from pyspark.sql import functions as F

    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from greptimedb_spark.operators import similarity as sim
    from greptimedb_spark.operators import textpipe as tp

    spark = get_spark("greptimedb-spark-scalecheck")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm up

    paths = _build_corpora(spark)

    def docs(scale):
        return spark.read.parquet(paths[f"{scale}/documents"])

    def embs(scale):
        return spark.read.parquet(paths[f"{scale}/embeddings"])

    # FIXED across scales: ANN queries + contamination benchmark from
    # replica 0 (present identically in both corpora)
    queries = (embs("x1").filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    benchmark = docs("x1").filter(F.col("doc_id") % 37 == 0)

    legs = {
        # same parameters as the driver-gate queries (queries/llmdata.py)
        "q52_minhash_lsh": lambda s: dd.minhash_lsh_pairs(
            docs(s), "doc_id", "text", num_hashes=64, bands=16,
            shingle_k=3, jaccard_threshold=0.12),
        "q54_ann_bruteforce": lambda s: sim.brute_force_topk(
            embs(s), queries, k=5),
        "q57_ann_ivf": lambda s: sim.ivf_topk(
            embs(s), queries, k=5, n_centroids=16, n_probe=8, iters=1),
        "q106_contamination": lambda s: tp.ngram_contamination(
            docs(s), benchmark, n=5),
    }

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None

    results = {}
    for name, build in legs.items():
        r1 = _time_leg(spark, lambda: build("x1"))
        r10 = _time_leg(spark, lambda: build("x10"))
        ratio = round(r10["sec"] / max(r1["sec"], 1e-9), 2)
        results[name] = {
            "x1": r1, "x10": r10, "time_ratio_10x": ratio,
            # 10x input with fixed overheads: <= ~12 reads as linear-ish,
            # ~100 would be the quadratic signature
            "verdict": ("sub-linear" if ratio < 7 else
                        "linear-ish" if ratio <= 15 else
                        "SUPER-LINEAR"),
        }
        print(f"{name}: x1={r1['sec']}s x10={r10['sec']}s "
              f"ratio={ratio} -> {results[name]['verdict']}", flush=True)

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    out = {
        "generated_by": "tools/scalecheck.py",
        "sf_base": SF_DIR,
        "rows": {"documents_x1": docs("x1").count(),
                 "documents_x10": docs("x10").count(),
                 "embeddings_x1": embs("x1").count(),
                 "embeddings_x10": embs("x10").count()},
        "reps": REPS,
        "loadavg": {"start": load0, "end": load1},
        "legs": results,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"scalecheck": OUT, "legs": {
        k: v["time_ratio_10x"] for k, v in results.items()}}))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
