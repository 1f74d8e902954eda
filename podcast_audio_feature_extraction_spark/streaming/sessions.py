"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only; the engine adds the streaming path for the
same semantics:

- sliding segment windows (W1) -> windowed streaming aggregation with a
  watermark bounding state;
- gap sessions -> ``F.session_window`` (gap-merge) with watermark-driven
  session finalization.

Batch/stream parity note: ``session_window`` merges rows whose
[ts, ts+gap) windows OVERLAP, i.e. a new session starts when the gap is
>= gap_s; the batch ``sessionize`` (lag+cumsum) splits when the gap is
strictly > gap_s. ``session_window_bounds`` is provided in both modes so
tests can pin the shared semantics on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from podcast_audio_feature_extraction_spark.schema import TRANSCRIPT_VAL_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-based streaming source over the canonical transcript layout
    (schema is the val-superset: files written without the LLD column
    read it as NULL)."""
    return (
        spark.readStream.schema(TRANSCRIPT_VAL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def session_window_bounds(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(conv, session-window) aggregates; works on both batch and
    streaming DataFrames (watermark applies only to streams)."""
    src = df
    if watermark is not None and df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(conv_col), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(conv_col, F.col("sw.start").alias("session_start"), F.col("sw.end").alias("session_end"),
                "n_turns", "first_ts", "last_ts")
    )


def sliding_window_counts_stream(
    df: DataFrame,
    length: str = "120 seconds",
    hop: str = "60 seconds",
    watermark: str = "10 minutes",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant of the W1 segment aggregation with bounded state."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(conv_col), F.window(F.col(ts_col), length, hop).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(conv_col, F.col("win.start").alias("win_start"), "n_turns")
    )


def sliding_window_functionals_stream(
    df: DataFrame,
    length: str = "120 seconds",
    hop: str = "60 seconds",
    watermark: str = "10 minutes",
    val_col: str = "val",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant of the A1 windowed functionals with bounded state.

    Emits the incrementally-mergeable subset (count/mean/pop-std/min/max —
    constant state per open window); the exact percentiles/slope of the
    batch ``window_functionals`` need the window's full value buffer and
    belong to the batch/backfill path."""
    v = F.col(val_col).cast("double")
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(conv_col), F.window(F.col(ts_col), length, hop).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(v).alias("val_mean"),
            F.coalesce(F.stddev_pop(v), F.lit(0.0)).alias("val_std"),
            F.min(v).alias("val_min"),
            F.max(v).alias("val_max"),
        )
        .select(
            conv_col,
            F.col("win.start").alias("win_start"),
            "n",
            "val_mean",
            "val_std",
            "val_min",
            "val_max",
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state for older keys is evicted.
    The streaming twin of exact_dedup's at-most-once-per-content guarantee
    (for a content-keyed stream pass ``keys=[md5(text)]`` upstream)."""
    keys = keys or ["conv_id", "turn_idx"]
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def run_stream_to_memory(stream_df: DataFrame, query_name: str, spark: SparkSession) -> DataFrame:
    """Drive a streaming aggregation to completion with availableNow and
    return the materialized result (test/bench helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
