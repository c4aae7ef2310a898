"""Event-stream analytics: tumbling-window aggregation and gap-based
sessionization, usable on both batch DataFrames and Structured Streams.

The aggregations are plain Catalyst programs (``F.window`` /
``F.session_window`` in a ``groupBy``), so the SAME function serves the
batch path (driver-entry oracle parity) and the streaming path
(``readStream`` → ``withWatermark`` → windowed agg → sink). Late-data
semantics (watermark drops events older than the threshold, windows
finalize append-only) are exercised in ``tests/test_streaming_events.py``
with engineered late arrivals.

Quantization: ``sum(value)`` is emitted as ``sum_value_q =
floor(sum*100 + 0.5)`` (values are 2-decimal), putting the floored
quantity mid-interval — bit-stable across engines and summation orders.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _q2(col) -> F.Column:
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type. Works unchanged on a
    batch DataFrame or a stream (add ``withWatermark`` upstream for
    append-mode finalization)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _q2(F.sum("value")).alias("sum_value_q"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_q",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user via the native ``session_window``
    (streaming-stateful under the hood; batch-exact here): a session
    breaks when consecutive events are >= gap apart.

    Output: (user_id, session_start, session_end, n_events,
    sum_value_q) with session_end = last event ts (not ts+gap, which
    would leak the gap parameter into the data)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            _q2(F.sum("value")).alias("sum_value_q"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value_q")
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    query_name: str = "ev_windowed",
    watermark: str | None = None,
    output_mode: str = "complete",
) -> DataFrame:
    """Run the windowed aggregation as a REAL Structured Streaming job
    (file source → availableNow → memory sink) and return the result.

    ``complete`` mode without watermark emits every window (bounded
    input ⇒ deterministic, used by the driver entry); ``append`` with a
    watermark emits only finalized windows (late-data tests).

    ``events_path`` may be a directory or a single parquet file (the
    file source requires a directory, so a file resolves to its parent
    plus a ``pathGlobFilter`` on the name)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.parquet(events_path)
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    agg = windowed_event_counts(stream, window)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def dedup_events(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",), watermark: str | None = None
) -> DataFrame:
    """Exactly-once event dedup by key — Structured Streaming's
    stateful dedup, or the identical batch semantics on a bounded frame.
    The operator every at-least-once ingestion pipeline needs in front
    of the index/aggregation stages.

    With a watermark, uses ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates`` only evicts per-key state when the event-time
    column is part of the key subset, so ``withWatermark`` +
    ``dropDuplicates(key)`` keeps state FOREVER on a continuous stream
    (unbounded growth). The WithinWatermark variant evicts each key's
    state once the watermark passes its event time — redeliveries of an
    at-least-once source land inside the watermark delay by definition,
    so dedup stays exact while state stays bounded."""
    if watermark:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))


def stream_dedup_events(
    spark: SparkSession,
    events_path: str,
    query_name: str = "ev_dedup",
    dup_factor: int = 2,
    watermark: str = "2 hours",
) -> DataFrame:
    """Run dedup as a REAL stream with ENGINEERED duplicates: every
    source row is emitted ``dup_factor`` times (the at-least-once
    redelivery analog), then deduped by event_id with per-key state —
    the result must equal the original event set exactly."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.parquet(events_path)
    doubled = stream.withColumn(
        "_copy", F.explode(F.sequence(F.lit(1), F.lit(dup_factor)))
    ).drop("_copy")
    out = dedup_events(doubled, ("event_id",), watermark=watermark).select(
        "event_id", "ts", "user_id", "event_type", _q2(F.col("value")).alias("value_q")
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def running_user_totals(
    events: DataFrame,
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    (the escape hatch for semantics the built-in stateful operators
    can't express): per-user RUNNING totals — each micro-batch emits
    every seen user's cumulative (n_events, sum_value, batch ordinal),
    carrying (n, sum, emit_count) in group state across batches.

    The built-ins cover windowed aggs (F.window), sessions
    (session_window) and dedup (dropDuplicates); a monotone running
    total re-emitted per batch is none of those — state must survive
    and accumulate across triggers, which is exactly what the pandas
    state API provides. Batch-equivalence law (driver-verified): the
    LAST emission per user equals a plain groupBy over the bounded
    input."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value_q", T.LongType()),
            T.StructField("emit_seq", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sum", T.DoubleType()),
            T.StructField("emits", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        import math

        import pandas as pd

        n, total, emits = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        emits += 1
        state.update((n, total, emits))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value_q": [math.floor(total * 100 + 0.5)],
                "emit_seq": [emits],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_running_user_totals(
    spark: SparkSession,
    events_path: str,
    query_name: str = "ev_running",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run :func:`running_user_totals` as a REAL stream (file source →
    availableNow → memory sink). With ``max_files_per_trigger`` set the
    input splits into several micro-batches, so users spanning batches
    emit MULTIPLE monotone rows — the cross-batch state is observable,
    not just the final answer."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def attribution_join(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Signup→purchase ATTRIBUTION via an event-time interval join: each
    purchase is joined to the same user's signup(s) at most ``horizon``
    earlier → (signup_id, purchase_id, user_id, delta_us). delta_us is
    the exact microsecond gap (integer — bit-stable across engines).

    On bounded frames this is the batch semantics; feed it streaming
    inputs via :func:`stream_attribution_join`, where the same
    time-range predicate is what lets Spark bound join state."""
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = s.join(
        p,
        [
            s.user_id == p.user_id,
            F.expr(f"p_ts >= s_ts AND p_ts <= s_ts + INTERVAL {horizon}"),
        ],
        "inner",
    )
    return joined.select(
        "signup_id",
        "purchase_id",
        s.user_id.alias("user_id"),
        F.expr("timestampdiff(MICROSECOND, s_ts, p_ts)").alias("delta_us"),
    )


def stream_attribution_join(
    spark: SparkSession,
    events_path: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "ev_attrib",
) -> DataFrame:
    """The interval join as a REAL stream-stream inner join — the
    Structured Streaming feature that makes event attribution work on
    unbounded inputs: BOTH sides watermarked, and the time-range
    predicate in the join condition lets Spark evict each signup's
    state once the watermark passes ``s_ts + horizon`` (without the
    range, stream-stream join state grows forever). availableNow +
    append + memory sink; bounded input ⇒ result equals
    :func:`attribution_join` on the same frame (tested)."""
    def rd():
        reader = spark.readStream.schema(EVENTS_SCHEMA)
        path = events_path
        if os.path.isfile(path):
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            path = os.path.dirname(path)
        return reader.parquet(path)

    s = (
        rd()
        .filter(F.col("event_type") == "signup")
        .withWatermark("ts", watermark)
        .select("user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts"))
    )
    p = (
        rd()
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = s.join(
        p,
        F.expr(
            f"user_id = p_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL {horizon}"
        ),
        "inner",
    ).select(
        "signup_id",
        "purchase_id",
        "user_id",
        F.expr("timestampdiff(MICROSECOND, s_ts, p_ts)").alias("delta_us"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
