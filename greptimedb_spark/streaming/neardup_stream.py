"""Streaming NEAR-duplicate suppression — MinHash-LSH band claims as state.

The continuous-ingest counterpart of ``operators/dedup.minhash_lsh_pairs``:
each incoming document's MinHash signature is banded into LSH bucket keys,
and Structured Streaming keeps one claim per bucket. A document that lands
in a bucket some earlier document already claimed is a near-duplicate
candidate and is marked; first arrivals claim their buckets. The reference's
flow engine has no dedup operator (its flows are recomputed aggregates);
this is the Spark-native stateful path (applyInPandasWithState), completing
the batch/streaming dedup matrix (exact batch q50, near-dup batch q52,
exact streaming q73, near-dup streaming here).

Scale shape: state is keyed by band-bucket hash — the exact shuffle the
batch banding join does — and each key holds ONE boolean claim, GC'd by the
event-time timeout at the watermark horizon. At 100 TB the state store is
bounded by (distinct band buckets inside the horizon) = bands × distinct
near-dup classes, not stream length. The signature itself is computed with
codegen'd column expressions on each micro-batch (no Python in that stage).

DETERMINISM SPEC (pinned for the independent fixture oracle,
tools/gen_oracle_fixtures.gen_q75):
- tokens: split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ');
  k-shingles joined by one space; docs shorter than k contribute their
  whole token list as a single shingle (exactly operators/dedup.shingles).
- shingle hash: xxhash64(shingle, seed 42) & 0xFFFFFFFF; DISTINCT set.
- signature: num_hashes mins of (h*A_i + B_i) mod 2^32 with the same
  (A_i, B_i) family as operators/dedup._perm_hash.
- bucket key of band b: xxhash64(concat_ws(',', sig[b*r .. b*r+r-1]), b)
  with r = num_hashes // bands (decimal renderings of the signature ints).
- greedy claim order: (ts asc, id asc); a document is COLLIDED iff any of
  its band buckets was already claimed by a strictly earlier document
  (earlier ts, or same ts and lower id); every document then claims all its
  buckets regardless of its own collided flag (transitive suppression — a
  chain A~B, B~C keeps only A, like the batch cluster keep-first rule).

The operator emits one row PER (document, band): (id, ts, collided). The
per-document verdict is a stateless rollup the sink consumer runs:
``kept = marks.groupBy(id).agg(max(collided) = false)`` — kept documents are
those that collided in NO band. Keeping that rollup out of the stream avoids
chaining a second stateful operator per micro-batch.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greptimedb_spark.operators.dedup import _perm_coeffs


def _signature_expr(text_col: Column, num_hashes: int, k: int) -> Column:
    """MinHash signature (array<long>, length num_hashes) of a text column,
    as pure column expressions, folded in ONE pass over the shingle hashes.

    The obvious form — num_hashes × array_min(transform(hs, perm_i)) — embeds
    a full copy of the tokenize→shingle→hash→distinct subtree in every entry
    (HOF lambdas are excluded from Spark's subexpression elimination), so the
    whole pipeline ran num_hashes× per row: 28 s for 500 sf0.01 docs. The
    aggregate() fold evaluates hs exactly once and keeps the running minima
    in the accumulator array: same mins, same types, ~60× less work."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ")
    n = F.size(toks)
    idxs = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingles = F.transform(idxs, lambda j: F.concat_ws(" ", F.slice(toks, j, k)))
    hs = F.array_distinct(F.transform(
        shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF))))
    coeffs = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in (_perm_coeffs(i) for i in range(num_hashes))
    ])
    # init 2^32 > every (· & 0xFFFFFFFF) value, so the fold's result is the
    # true min; a constant-foldable literal array, built once
    init = F.array_repeat(F.lit(1 << 32), num_hashes)
    # null text needs no special case: concat_ws folds the null token array
    # to "", so hs is always a non-null array and the fold always applies —
    # exactly the per-entry form's behavior (null text == empty text).
    return F.aggregate(
        hs, init,
        lambda acc, h: F.zip_with(
            acc, coeffs,
            lambda cur, ab: F.least(
                cur, (h * ab["a"] + ab["b"]).bitwiseAND(F.lit(0xFFFFFFFF)))),
    )


def streaming_neardup_marks(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    dedup_horizon: str = "1 hour",
) -> DataFrame:
    """Per-(document, band) collision marks over a streaming DataFrame.

    Returns (id, ts, collided) rows — ``bands`` rows per document. See the
    module docstring for the pinned greedy-claim semantics and the rollup
    the consumer applies for the per-document verdict.
    """
    import pandas as pd

    rows_per_band = num_hashes // bands
    sig = _signature_expr(F.col(text_col), num_hashes, shingle_k)
    banded = stream.withColumn("__sig", sig)
    band_keys = F.array(*[
        F.xxhash64(
            F.concat_ws(",", *[
                F.element_at("__sig", b * rows_per_band + i + 1)
                for i in range(rows_per_band)]),
            F.lit(b),
        )
        for b in range(bands)
    ])
    exploded = (
        banded.withColumn("__bucket", F.explode(band_keys))
        .select(id_col, ts_col, "__bucket")
        .withWatermark(ts_col, dedup_horizon)
    )

    out_schema = f"{id_col} long, {ts_col} timestamp, collided boolean"
    state_schema = "claimed boolean"

    # per-GROUP work is the scale cost of this operator: the state function
    # runs once per band bucket (thousands per micro-batch), so every pandas
    # op inside is multiplied by the key count (r12 A/B: the unoptimized body
    # cost ~4 ms/group — 30+ s serial for 7.6 k groups). Parse the horizon
    # once per task, skip concat/sort for the overwhelmingly common
    # single-row group, and use the exact integer ns value for the expiry.
    horizon_ms = int(pd.Timedelta(dedup_horizon).total_seconds() * 1000)

    def claim(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True)
        n = len(batch)
        if n > 1:
            batch = batch.sort_values([ts_col, id_col])
        # first row of the group claims for the rest
        out = batch[[id_col, ts_col]].copy()
        out["collided"] = [bool(state.exists)] + [True] * (n - 1)
        state.update((True,))
        expiry_ms = batch[ts_col].max().value // 1_000_000 + horizon_ms
        state.setTimeoutTimestamp(expiry_ms)
        yield out

    return exploded.groupBy("__bucket").applyInPandasWithState(
        claim,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
