"""Streaming as-of enrichment — the continuous dual of ``operators/asof``.

Enrich a stream of left events with the most recent right-stream row per
key (``r.ts <= l.ts``, equal timestamps match) — "attach the latest price
as of trade time", "latest config as of event time" — as an
``applyInPandasWithState`` operator.

Semantics (pinned by tests/test_streaming_asof.py): within a micro-batch,
rows process in event-time order, so a left event matches every right row
of the same batch with ``r.ts <= l.ts`` plus the newest right row carried
in state from earlier batches. A right row arriving in a LATER batch than
a left event it would have matched does NOT retro-match — the documented
streaming relaxation (the same latest-known-dimension contract as a
Kafka-Streams KTable join or our q75 greedy near-dup spec; an exact
event-time temporal join would have to buffer both sides to the watermark
and re-emit). When each micro-batch is time-ordered — the single-batch
gate case — the output is EXACTLY the batch ``asof_join``.

Scale shape: one shuffle on the join key (the same groupBy a batch job
would run); state per key is ONE right row (the newest), GC'd by the
event-time timeout at ``horizon`` past the watermark — bounded by
distinct in-horizon keys, not stream length. The per-key batch work is a
vectorized ``pandas.merge_asof``, not a Python row loop.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "__is_left"


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple = ("user_id",),
    left_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    horizon: str = "24 hours",
    suffix: str = "_r",
) -> DataFrame:
    """Left streaming events enriched with the latest right payload.

    Output: (*by, on, *left_cols, {on}{suffix} epoch-ms long of the matched
    right row (-1 = no match yet), *value_cols [suffixed on collision]).
    ``horizon`` doubles as the watermark delay and the state GC timeout.
    """
    import pandas as pd

    by = list(by)
    if left_cols is None:
        left_cols = [c for c in left.columns if c not in by and c != on]
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in value_cols}
    ts_out = on + suffix

    union = left.select(
        *by, F.col(on).alias(on), F.lit(1).alias(_MARK),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in value_cols],
    ).unionByName(right.select(
        *by, F.col(on).alias(on), F.lit(0).alias(_MARK),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        *[F.col(c).alias(out_names[c]) for c in value_cols],
    )).withWatermark(on, horizon)

    vals = [out_names[c] for c in value_cols]
    left_field_types = [left.schema[c].dataType.simpleString()
                        for c in left_cols]
    val_types = [right.schema[c].dataType.simpleString()
                 for c in value_cols]
    out_schema = ", ".join(
        [f"{c} {left.schema[c].dataType.simpleString()}" for c in by]
        + [f"{on} timestamp"]
        + [f"{c} {t}" for c, t in zip(left_cols, left_field_types)]
        + [f"{ts_out} long"]
        + [f"{c} {t}" for c, t in zip(vals, val_types)]
    )
    # state: newest right row -> its epoch-ms + payload values
    state_schema = ", ".join(["r_ts long"]
                             + [f"{c} {t}" for c, t in zip(vals, val_types)])

    # parsed once per task, not once per key group (the function runs once
    # per distinct join key per micro-batch)
    horizon_ms = int(pd.Timedelta(horizon).total_seconds() * 1000)

    def enrich(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True)
        # event-time order; rights before lefts at equal ts (>= matches)
        batch = batch.sort_values([on, _MARK], kind="mergesort")
        rights = batch[batch[_MARK] == 0]
        def _ms(s):
            # normalize to ns first: pandas may carry us- or ns-unit
            # datetimes depending on the arrow conversion path
            return s.astype("datetime64[ns]").astype("int64") // 1_000_000

        hist = pd.DataFrame({
            "__r_ts_ms": _ms(rights[on]),
            **{c: rights[c].to_numpy() for c in vals},
        })
        if state.exists:
            prev = pd.DataFrame([state.get],
                                columns=["__r_ts_ms"] + vals)
            hist = pd.concat([prev, hist], ignore_index=True)
        lefts = batch[batch[_MARK] == 1]
        out = lefts[by + [on] + left_cols].copy()
        out["__l_ts_ms"] = _ms(out[on])
        if len(hist):
            hist = hist.sort_values("__r_ts_ms", kind="mergesort")
            out = pd.merge_asof(
                out.sort_values("__l_ts_ms", kind="mergesort"), hist,
                left_on="__l_ts_ms", right_on="__r_ts_ms",
                allow_exact_matches=True, direction="backward")
            new_state = tuple(hist.iloc[-1][["__r_ts_ms"] + vals])
            state.update((int(new_state[0]),) + tuple(new_state[1:]))
        else:
            out["__r_ts_ms"] = pd.NA
            for c in vals:
                out[c] = pd.NA
        out[ts_out] = out["__r_ts_ms"].fillna(-1).astype("int64")
        # GC once the watermark passes the horizon beyond the newest event
        expiry_ms = batch[on].max().value // 1_000_000 + horizon_ms
        state.setTimeoutTimestamp(expiry_ms)
        yield out[by + [on] + left_cols + [ts_out] + vals]

    return union.groupBy(*by).applyInPandasWithState(
        enrich,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
