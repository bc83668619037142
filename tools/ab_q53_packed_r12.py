"""q53 packed-aggregate A/B (r12).

Variant: the 64 per-bit conditional sums in _simhash_agg are packed two per
long — bit b and bit b+32 of xxhash64(t) extracted together with ONE
shift+mask ((h >> b) & 0x100000001) and summed into one 64-bit accumulator
holding two 32-bit fields. Exact: per-doc token count < 2^31 (a single row's
string is < 2 GB), so the low field can never carry into the high field.
Halves the aggregate count (65 -> 33), the codegen size, and the per-token
shift/mask/add work.

Checks bit-identical signature parity (collect + compare) then interleaved
wall A/B of the signature job and the full q53 shape.

Usage: python tools/ab_q53_packed_r12.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PAIR_MASK = 0x100000001  # bit 0 and bit 32


def old_simhash_agg(df, id_col: str, text_col: str):
    """The r11 65-aggregate form, frozen here after the library adopted the
    packed variant, so this A/B stays re-runnable."""
    from pyspark.sql import functions as F

    from greptimedb_spark.operators.dedup import _spread

    toks = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")),
        "id",
    ).select(
        "id",
        F.explode(F.split(F.lower(F.trim(F.col("__text"))), r"\s+")).alias("t"),
    ).select("id", F.xxhash64("t").alias("h"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"b{b}") for b in range(64)
    ]
    per_doc = toks.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        vote = (F.col(f"b{b}") * 2 > F.col("n")).cast("long")
        sig = sig.bitwiseOR(F.shiftleft(vote, b))
    return per_doc.select("id", sig.alias("sig"))


def packed_simhash_agg(df, id_col: str, text_col: str):
    from pyspark.sql import functions as F

    from greptimedb_spark.operators.dedup import _spread

    toks = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")),
        "id",
    ).select(
        "id",
        F.explode(F.split(F.lower(F.trim(F.col("__text"))), r"\s+")).alias("t"),
    ).select("id", F.xxhash64("t").alias("h"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(PAIR_MASK))).alias(f"p{b}")
        for b in range(32)
    ]
    per_doc = toks.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(32):
        lo = F.col(f"p{b}").bitwiseAND(F.lit(0xFFFFFFFF))
        hi = F.shiftright(F.col(f"p{b}"), 32)
        sig = sig.bitwiseOR(F.shiftleft((lo * 2 > F.col("n")).cast("long"), b))
        sig = sig.bitwiseOR(F.shiftleft((hi * 2 > F.col("n")).cast("long"), b + 32))
    return per_doc.select("id", sig.alias("sig"))


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
            reps = int(argv[i + 1]); i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]; i += 2
        else:
            i += 1

    spark = get_spark("ab-q53-packed-r12")
    spark.sparkContext.setLogLevel("ERROR")
    d = read(spark, sf, "documents")
    d.count()

    # --- exact parity ---
    old = {r["id"]: r["sig"] for r in old_simhash_agg(d, "doc_id", "text").collect()}
    new = {r["id"]: r["sig"] for r in packed_simhash_agg(d, "doc_id", "text").collect()}
    assert old == new, f"signature mismatch: {len(old)} vs {len(new)} docs"
    print(f"parity ok: {len(old)} signatures bit-identical", flush=True)

    out: dict[str, list[float]] = {"sig_old": [], "sig_new": []}
    for _ in range(reps):
        t0 = time.time()
        noop(old_simhash_agg(d, "doc_id", "text"))
        out["sig_old"].append(round(time.time() - t0, 3))

        t0 = time.time()
        noop(packed_simhash_agg(d, "doc_id", "text"))
        out["sig_new"].append(round(time.time() - t0, 3))

    print(json.dumps({"sf": sf, "reps": reps, **out, "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
