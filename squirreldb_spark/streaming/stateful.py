"""Custom stateful streaming operator: cross-batch per-series deltas.

The reference's short-term store (A5, batch/batch.go:914-1033) keeps the
tail of every series in memory so consecutive-sample logic (counter deltas,
dedup, flush thresholds) can run before points reach cold storage. The
Spark-native equivalent of "per-key mutable state that survives
micro-batches" is ``applyInPandasWithState``: state lives in the streaming
state store, checkpointed exactly-once, partitioned by the grouping key —
no Redis, no ownership/takeover protocol.

``streaming_deltas`` demonstrates the pattern end-to-end: each series
carries ``(last_ts, last_value)`` across micro-batches and every incoming
sample is emitted with its delta versus the previous sample — including
across a query restart (state restores from the checkpoint). This is the
building block for streaming counter-rate and threshold alerting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from squirreldb_spark.tsdb.binops import _ieee_div

OUT_SCHEMA = (
    "user_id long, event_type string, ts long, value double, delta double"
)
STATE_SCHEMA = "last_ts long, last_value double"


def _delta_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_ts, last_value = state.get if state.exists else (None, None)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "value"])
        prev = pdf["value"].shift(1)
        if last_value is not None:
            prev.iloc[0] = last_value
        out.append(
            pd.DataFrame(
                {
                    "user_id": key[0],
                    "event_type": key[1],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "delta": pdf["value"] - prev,
                }
            )
        )
        last_ts = int(pdf["ts"].iloc[-1])
        last_value = float(pdf["value"].iloc[-1])
    if last_ts is not None:
        state.update((last_ts, last_value))
    yield pd.concat(out) if out else pd.DataFrame(
        columns=["user_id", "event_type", "ts", "value", "delta"]
    )


def streaming_deltas(stream: DataFrame) -> DataFrame:
    """Per-series sample deltas with state across micro-batches.

    Input: a streaming DataFrame with ``user_id, event_type, ts, value``.
    Output stream: the same rows plus ``delta`` (null for the first sample
    of a series ever seen). Grouping shuffles by series — the same
    partitioning every stateful TSDB op wants, so state stays local.
    """
    return (
        stream.select("user_id", "event_type", "ts", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _delta_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------- streaming sessionization

SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long,"
    " n_events long, duration_ms long"
)
SESSION_STATE_SCHEMA = "session_start long, last_ts long, n_events long"

#: default inactivity gap, matching the batch operator
#: (pipeline/events.py SESSION_GAP_MS)
SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn_factory(gap_ms: int):
    def _session_fn(
        key: tuple, pdfs, state: GroupState
    ):
        cur = state.get if state.exists else None  # (start, last, n)
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                ts = int(ts)
                if cur is None:
                    cur = (ts, ts, 1)
                elif ts - cur[1] > gap_ms:
                    closed.append(cur)
                    cur = (ts, ts, 1)
                else:
                    cur = (cur[0], ts, cur[2] + 1)
        if cur is not None:
            state.update(cur)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "duration_ms": [c[1] - c[0] for c in closed],
            }
        )

    return _session_fn


def streaming_sessions(
    stream: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """Streaming gap-based sessionization: the stateful counterpart of
    ``pipeline.events.sessionize``.

    Each user's open session (start, last_ts, n_events) lives in the
    checkpointed state store; a session is emitted when a later event
    arrives more than ``gap_ms`` after it ends — including across
    micro-batches and query restarts. State is one tuple per user (not
    per event), so the store is bounded by the user cardinality. A
    production deployment closes idle sessions with an event-time
    timeout against the ingest watermark; with ``availableNow`` batch
    replays the trailing open session simply stays in state, which is
    the honest answer (it might still grow).

    The per-row Python loop is confined to each user's slice of ONE
    micro-batch (already tiny); the shuffle key is ``user_id`` — the
    same distribution the batch operator uses.
    """
    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_factory(gap_ms),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------- watermarked stream-stream join

#: bucket width for the streaming binop alignment (1 h)
JOIN_BUCKET_MS = 3_600_000


def streaming_ratio(
    lhs: DataFrame,
    rhs: DataFrame,
    bucket_ms: int = JOIN_BUCKET_MS,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming binary operation: the continuous counterpart of the
    batch PromQL ``lhs / rhs`` vector match — two sample streams of the
    same key space joined on (user_id, time bucket) as they arrive.

    This is the watermarked stream-stream inner join pattern: both sides
    carry an event-time watermark AND the join predicate bounds the two
    event times against each other, so Spark can expire join state — the
    window of co-arrival a deployment must buffer is explicit
    (watermark + one bucket), not unbounded. Per-side aggregation
    happens BEFORE the join (sum per (user, bucket)), so join state
    holds one row per key-bucket, not one per sample.

    Inputs are streaming DataFrames with ``user_id, ts (epoch ms),
    value`` (pre-filtered to one metric each). Output: one row per
    (user_id, bucket) seen on both sides, with lhs/rhs sums and their
    ratio.
    """
    def prep(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                "user_id",
                F.timestamp_millis(F.col("ts")).alias("ts_ts"),
                F.col("value").alias(f"{tag}_value"),
            )
            .withWatermark("ts_ts", watermark)
            .groupBy(
                "user_id",
                F.window("ts_ts", f"{bucket_ms // 1000} seconds").alias(
                    f"{tag}_win"
                ),
            )
            .agg(F.sum(f"{tag}_value").alias(f"{tag}_sum"))
            .select(
                F.col("user_id").alias(f"{tag}_user"),
                F.col(f"{tag}_win"),
                f"{tag}_sum",
            )
        )

    l, r = prep(lhs, "l"), prep(rhs, "r")
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("l_win") == F.col("r_win")),
        "inner",
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        (F.unix_millis(F.col("l_win.start")) / bucket_ms)
        .cast("long")
        .alias("bucket"),
        "l_sum",
        "r_sum",
        # IEEE division: a zero-valued rhs bucket must yield ±Inf/NaN,
        # not kill the streaming query under ANSI mode
        F.round(_ieee_div(F.col("l_sum"), F.col("r_sum")), 6).alias("ratio"),
    )


# ------------------------------------------- streaming HLL registers

def streaming_hll_registers(
    stream: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Incremental HLL register maintenance on an event stream: the
    per-(key, day, bucket) ``max(rank)`` is a standard watermarked
    streaming aggregation — registers are EXACTLY the mergeable
    fixed-size state HLL was designed around, so the stream holds 64
    numbers per (key, day) instead of a distinct-user set, closed days
    emit in append mode once the watermark passes, and a restart
    resumes from checkpointed registers.  The emitted rows are the same
    ``(key, day, bucket, r)`` shape the batch writers produce;
    ``pipeline.events.hll_estimate_from_registers`` turns any stored
    register slice into estimates without touching raw events — the
    streaming twin of ``hll_rollup``'s hour->day re-aggregation story.

    Uses the shared 60-bit hash + rank rule from ``hll_distinct``, so a
    streamed register table is bit-identical to the batch one over the
    same events (asserted in tests/test_streaming.py).
    """
    from squirreldb_spark.pipeline.dedup import _h60_sql_expr
    from squirreldb_spark.pipeline.events import HLL_M, _HLL_WBITS

    wbits = _HLL_WBITS
    h = _h60_sql_expr(f"cast({id_col} as string)")
    rank = (
        f"CASE WHEN ({h} % {1 << wbits}) = 0 THEN {wbits + 1} "
        f"ELSE {wbits} - cast(floor(log2({h} % {1 << wbits})) as int) END"
    )
    ev = stream.withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    ).withWatermark("event_time", watermark)
    return (
        ev.groupBy(
            F.window("event_time", "1 day").alias("w"),
            F.col(key_col),
            F.expr(f"{h} div {1 << wbits}").alias("bucket"),
        )
        .agg(F.max(F.expr(rank)).alias("r"))
        .select(
            key_col,
            (F.unix_millis(F.col("w.start")) / F.lit(86_400_000))
            .cast("long")
            .alias("day"),
            "bucket",
            "r",
        )
    )
