"""Derive the transcript table from the driver's ``events`` parquet.

The driver's correctness gate (``__spark_entry__.py``) runs each Spark query
against a DuckDB oracle over the same parquet tables. The transcript-domain
operators therefore run over a transcript view derived *deterministically*
from ``events`` — defined once here in both dialects so the Spark side and
the SQL oracle can never drift.

Mapping (events -> input_hint schema):
    conv_id  = 'c' || user_id
    turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
    role     = case event_type: view|click->user, purchase->assistant,
               error->tool, signup->system
    text     = concat_ws(' ', event_type, props)   (NULL-skipping in BOTH
               dialects — DuckDB's || would NULL-propagate and diverge)
    tool     = 'retry' for error, 'checkout' for purchase, else null
    ts       = ts
    val      = value   (extra numeric column feeding windowed functionals,
                        the analog of an eGeMAPS low-level descriptor)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# DuckDB CTE body; oracle queries embed it as `WITH transcript AS (...)`.
TRANSCRIPT_SQL = """
    SELECT
        'c' || CAST(user_id AS VARCHAR)                                        AS conv_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
        CASE event_type
            WHEN 'view' THEN 'user' WHEN 'click' THEN 'user'
            WHEN 'purchase' THEN 'assistant' WHEN 'error' THEN 'tool'
            ELSE 'system' END                                                  AS role,
        concat_ws(' ', event_type, props)                                      AS text,
        CASE event_type WHEN 'error' THEN 'retry'
                        WHEN 'purchase' THEN 'checkout' END                    AS tool,
        ts                                                                     AS ts,
        value                                                                  AS val
    FROM events
"""


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcript_from_events(events: DataFrame) -> DataFrame:
    """Spark twin of :data:`TRANSCRIPT_SQL`.

    conv_id is projected as a real attribute FIRST, then row_number windows
    over that attribute (1:1 with user_id, so values match the SQL twin).
    Windowing over the expression instead would extract it into an internal
    `_w0` column Spark cannot unify with the conv_id alias, so every
    downstream conv_id-keyed window/aggregate would re-shuffle; this way
    the derivation's hash partitioning is reused (one Exchange saved per
    pipeline branch; verified via .explain)."""
    base = events.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        F.when(F.col("event_type").isin("view", "click"), "user")
        .when(F.col("event_type") == "purchase", "assistant")
        .when(F.col("event_type") == "error", "tool")
        .otherwise("system")
        .alias("role"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("text"),
        F.when(F.col("event_type") == "error", "retry")
        .when(F.col("event_type") == "purchase", "checkout")
        .alias("tool"),
        F.col("ts"),
        F.col("value").alias("val"),
        F.col("event_id"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return base.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
        "val",
    )


def load_transcript(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcript_from_events(load_events(spark, sf_dir))
