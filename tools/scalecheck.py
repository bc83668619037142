"""SCALECHECK: empirical 1x / 10x / 100x scaling evidence for the LLM-data ops.

The 100-TB claims for the dedup/ANN/decontamination operators are argued
from plan shapes (banded/bucketed/broadcast, bounded candidate joins); this
harness produces DATA: it scales the sf0.1 corpus 10x and 100x and records
wall time, plan shuffle counts AND measured shuffle read/write BYTES (from
Spark's status REST API) for each leg, so sub-quadratic growth is
demonstrated at the byte level, not asserted.

Corpus construction (deterministic, dup-rate preserving):
- documents: k replicas; every token gets a replica-unique suffix
  (``{k}z``), so shingle/n-gram overlap ACROSS replicas is zero while the
  near-dup structure WITHIN each replica mirrors the original — the 10x
  corpus has ~10x the dup pairs, not 45x from self-collisions. The 1x
  corpus is replica 0 (same transform), keeping token lengths comparable.
- embeddings: k replicas with a small deterministic per-replica,
  per-component perturbation — distinct vectors, same cluster geometry.
- ANN query set and the contamination benchmark set are FIXED (taken from
  replica 0) at ALL scales: the measurement isolates corpus scaling.

Expected shapes: q52 minhash ~linear (per-doc signature work + ~kx banded
candidate pairs); q54 brute force ~linear (fixed queries x kx corpus);
q57 IVF ~linear with a smaller constant (probe subset); q106 contamination
~linear (fixed broadcast benchmark, kx probe side).

Run SOLO (no concurrent Spark) — wall times are the artifact:

    python tools/scalecheck.py            # writes SCALECHECK_r10.json
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
OUT = os.environ.get("SPARK_GRAFT_SCALECHECK_OUT", "SCALECHECK_r10.json")
REPS = int(os.environ.get("SPARK_GRAFT_SCALECHECK_REPS", "2"))
SCALES = (1, 10, 100)


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

    paths = {}
    for n in SCALES:
        d = doc_replica(0)
        e = emb_replica(0)
        for k in range(1, n):
            d = d.unionByName(doc_replica(k))
            e = e.unionByName(emb_replica(k))
        for name, df in ((f"x{n}/documents", d), (f"x{n}/embeddings", e)):
            p = os.path.join(WORK, name + ".parquet")
            df.write.mode("overwrite").parquet(p)
            paths[name] = p
    return paths


def _shuffle_totals(spark):
    """Cumulative shuffle read/write bytes across all completed stages,
    from the Spark status REST API (the UI's own numbers). None when the
    UI is disabled."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app = spark.sparkContext.applicationId
    try:
        url = f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return None
    return {
        "read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def _time_leg(spark, build, reps: int = REPS):
    """min-of-reps wall time for a leg (min is robust to external load:
    contention can only inflate); plan shuffle count from the initial
    physical plan (structural, data-size independent); shuffle BYTES
    measured around one dedicated rep via the status API."""
    df = build()
    exchanges = df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange")
    samples = []
    for _ in range(reps):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
        spark.catalog.clearCache()
    sh0 = _shuffle_totals(spark)
    build().write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    sh1 = _shuffle_totals(spark)
    shuffle = None
    if sh0 is not None and sh1 is not None:
        shuffle = {"read_bytes": sh1["read"] - sh0["read"],
                   "write_bytes": sh1["write"] - sh0["write"]}
    rows_out = build().count()
    spark.catalog.clearCache()
    out = {"sec": round(min(samples), 3), "exchanges": exchanges,
           "rows_out": rows_out}
    if shuffle is not None:
        out["shuffle"] = shuffle
    return out


def _q75_twin(d):
    """Batch twin of streaming_neardup_marks' per-batch map work: signature
    fold + 16 band-bucket keys per doc (no state store)."""
    from pyspark.sql import functions as F

    from greptimedb_spark.streaming.neardup_stream import _signature_expr

    num_hashes, bands = 64, 16
    r = num_hashes // bands
    sig = _signature_expr(F.col("text"), num_hashes, 3)
    banded = d.select("doc_id", sig.alias("__sig"))
    keys = F.array(*[
        F.xxhash64(
            F.concat_ws(",", *[F.element_at("__sig", b * r + i + 1)
                               for i in range(r)]), F.lit(b))
        for b in range(bands)
    ])
    return banded.select("doc_id", F.explode(keys).alias("bucket"))


def main() -> None:
    from pyspark.sql import functions as F

    from greptimedb_spark import get_spark
    from greptimedb_spark.operators import dedup as dd
    from greptimedb_spark.operators import similarity as sim
    from greptimedb_spark.operators import textpipe as tp

    # the session default disables the UI; the status REST API (shuffle
    # byte capture) rides it, so turn it on for this tool only
    spark = get_spark("greptimedb-spark-scalecheck",
                      **{"spark.ui.enabled": "true",
                         "spark.ui.port": "4099"})
    spark.range(1000).selectExpr("sum(id)").collect()  # warm up

    paths = _build_corpora(spark)

    def docs(scale):
        return spark.read.parquet(paths[f"{scale}/documents"])

    def embs(scale):
        return spark.read.parquet(paths[f"{scale}/embeddings"])

    # FIXED across scales: ANN queries + contamination benchmark from
    # replica 0 (present identically in every corpus)
    queries = (embs("x1").filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    benchmark = docs("x1").filter(F.col("doc_id") % 37 == 0)

    legs = {
        # same parameters as the driver-gate queries (queries/llmdata.py);
        # the second tuple element lists the scales the leg runs at —
        # q52/q54/q106 get the 100x leg (VERDICT r9 Next #6), q57's IVF
        # training cost dominates at 100x without adding signal
        "q52_minhash_lsh": (lambda s: dd.minhash_lsh_pairs(
            docs(s), "doc_id", "text", num_hashes=64, bands=16,
            shingle_k=3, jaccard_threshold=0.12), ("x1", "x10", "x100")),
        "q54_ann_bruteforce": (lambda s: sim.brute_force_topk(
            embs(s), queries, k=5), ("x1", "x10", "x100")),
        "q57_ann_ivf": (lambda s: sim.ivf_topk(
            embs(s), queries, k=5, n_centroids=16, n_probe=8, iters=1),
            ("x1", "x10")),
        "q106_contamination": (lambda s: tp.ngram_contamination(
            docs(s), benchmark, n=5), ("x1", "x10", "x100")),
        # replica-suffixed tokens make cross-replica gram overlap zero, so
        # the kx corpus has ~kx the shared-substring pairs — linear target
        "q114_exact_substring": (lambda s: dd.exact_substring_pairs(
            docs(s), "doc_id", "text", k=8), ("x1", "x10", "x100")),
        # r12 additions (r11 VERDICT Next #8): byte-level legs for the
        # operators restructured in r11 that only had wall A/Bs.
        # q59 shape: label propagation over the (linear-growing) minhash
        # pair set — kx components, same diameters; measures the
        # connected-components rounds, not the pair generator (ngram block
        # pairs grow k^2 by blocking-key construction and would mask it)
        "q59_dedup_clusters": (lambda s: dd.dedup_clusters(
            dd.minhash_lsh_pairs(
                docs(s), "doc_id", "text", num_hashes=64, bands=16,
                shingle_k=3, jaccard_threshold=0.12).select("id_a", "id_b")),
            ("x1", "x10")),
        # q75 batch twin: the streaming signature fold + band keys as a
        # map-only batch projection (the per-micro-batch work of the
        # streaming operator, minus state machinery)
        "q75_signature_twin": (lambda s: _q75_twin(docs(s)),
                               ("x1", "x10", "x100")),
        # q55 LSH ANN: fixed queries x kx corpus, posexplode signature form
        "q55_ann_lsh": (lambda s: sim.lsh_topk(
            embs(s), queries, dim=64, k=5, n_planes=4, n_tables=20),
            ("x1", "x10", "x100")),
    }

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None

    results = {}
    for name, (build, scales) in legs.items():
        entry = {}
        for sc in scales:
            entry[sc] = _time_leg(
                spark, lambda: build(sc),
                reps=1 if sc == "x100" else REPS)
        r1, r10 = entry["x1"], entry["x10"]
        entry["time_ratio_10x"] = round(r10["sec"] / max(r1["sec"], 1e-9), 2)
        # 10x input with fixed overheads: <= ~12 reads as linear-ish,
        # ~100 would be the quadratic signature
        entry["verdict"] = ("sub-linear" if entry["time_ratio_10x"] < 7 else
                            "linear-ish" if entry["time_ratio_10x"] <= 15
                            else "SUPER-LINEAR")
        if "x100" in entry:
            entry["time_ratio_100x_over_10x"] = round(
                entry["x100"]["sec"] / max(r10["sec"], 1e-9), 2)
            # 10x more data again: <= ~12 stays linear-ish
            entry["verdict_100x"] = (
                "sub-linear" if entry["time_ratio_100x_over_10x"] < 7 else
                "linear-ish" if entry["time_ratio_100x_over_10x"] <= 15
                else "SUPER-LINEAR")
        results[name] = entry
        print(f"{name}: " + " ".join(
            f"{sc}={entry[sc]['sec']}s" for sc in scales)
            + f" ratio10x={entry['time_ratio_10x']}"
            + (f" ratio100x/10x={entry['time_ratio_100x_over_10x']}"
               if "x100" in entry else "")
            + f" -> {entry['verdict']}", flush=True)

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    out = {
        "generated_by": "tools/scalecheck.py",
        "sf_base": SF_DIR,
        "rows": {f"documents_{s}": docs(s).count() for s in
                 ("x1", "x10", "x100")}
        | {f"embeddings_{s}": embs(s).count() for s in ("x1", "x10", "x100")},
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
