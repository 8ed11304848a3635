"""Streaming sessionization — the reference's Beam pipeline was
event-time windowed batch (`window.Sessions`, ``main.py:217``); the
Spark-first generalization runs the SAME ``session_window`` expression
under Structured Streaming with a watermark (one definition, two
execution modes — the core design point of the Structured Streaming
model).

Production topology (100 TB/day feed):

    readStream (files/kafka) → withWatermark(ts, delay)
      → groupBy(user, session_window(ts, gap)) → append-mode sink

Append mode emits a session exactly once, when the watermark passes
its close — late hits inside the delay merge into their session;
later ones are dropped (counted via StreamingQueryListener on the
observation, cf. ``sources.hitlog``). State per in-flight session is
bounded: AQE doesn't apply to streaming, so size
``spark.sql.shuffle.partitions`` to the expected concurrent-session
key space up front.

The helpers below also expose a **replay** path (``availableNow`` +
complete mode into a memory sink) used by tests and the driver gate to
prove batch ≡ streaming on the same fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from web_analytics_visits_re_processing_spark.operators.sessionize import (
    DEFAULT_GAP_SECONDS,
    visit_key_col,
)

# events.parquet physical schema (ts stored as TIMESTAMP(NANOS) →
# read as long under nanosAsLong, rebuilt to micros like load_table).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # FileStreamSource requires a directory/glob, not a bare file path.
    df = reader.parquet(f"{sf_dir}/events.parquet" if "*" in sf_dir else f"{sf_dir}/events*.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming visits aggregation: one row per closed session (append
    mode) or per session-so-far (complete/update)."""
    visits = (
        events.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark_delay)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{int(gap_seconds)} seconds"),
        )
        .agg(
            F.min("ts").alias("visit_start"),
            F.max("ts").alias("visit_end"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return visits.select(
        visit_key_col(F.col("user_id"), F.col("visit_start")).alias("visit_key"),
        "user_id",
        "visit_start",
        "visit_end",
        "n_hits",
        "total_value",
    )


def run_stream_to_memory(
    result: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> None:
    """Replay a bounded stream to completion into an in-memory table
    (test/driver utility — production sinks are files/kafka)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()


def streaming_visits_replay(
    spark: SparkSession,
    sf_dir: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Full-replay streaming sessionization; complete mode ⇒ result is
    identical to the batch sessionizer (same oracle applies)."""
    events = read_events_stream(spark, sf_dir)
    visits = sessionize_stream(events, gap_seconds)
    run_stream_to_memory(visits, "streaming_visits", "complete")
    return spark.table("streaming_visits").select(
        "visit_key",
        "user_id",
        F.unix_micros("visit_start").alias("visit_start_us"),
        F.unix_micros("visit_end").alias("visit_end_us"),
        "n_hits",
        "total_value",
    )


def streaming_tumbling_counts_replay(
    spark: SparkSession, sf_dir: str, width: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows under a watermark, replayed."""
    events = read_events_stream(spark, sf_dir)
    counts = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    run_stream_to_memory(counts, "streaming_tumbling", "complete")
    return spark.table("streaming_tumbling")
