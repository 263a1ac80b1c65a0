"""Structured Streaming operators over the events stream.

The reference has no streaming engine (its job queue is RQ — SURVEY.md
§2.5), but a web-scale ingest pipeline needs one: new observations /
granules arrive continuously and the chip pipeline's upstream aggregations
must tolerate late data. These operators run the same logical plans as
their batch twins under `readStream`:

  * windowed_event_counts: tumbling event-time windows + watermark;
  * streaming_dedup: dropDuplicates within the watermark (exact-once obs
    ingest);
  * run_available_now: drains all currently-available input with
    Trigger.AvailableNow into a memory sink — the batch-parity test path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame, key_cols: list[str], watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Exactly-once ingest: drop duplicate keys within the watermark
    horizon (state bounded by the watermark)."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def run_available_now(
    stream_df: DataFrame, name: str, checkpoint: str, output_mode: str = "append"
) -> DataFrame:
    """Drain all available input (Trigger.AvailableNow) into a memory sink;
    returns the sink table. Used for batch-parity tests.

    output_mode: 'append' for row streams / dedup; 'complete' for windowed
    aggregations (append would hold back windows newer than the final
    watermark).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
