"""Nested ASR-JSON source (SURVEY.md §2.1 S2/S3/S4).

The reference loads Google Speech-to-Text-shaped JSON per episode
(/root/reference/src/data.py:50-54) and exposes two access paths:

- ``retrieve_timestamped_transcript`` (/root/reference/src/data.py:65-81):
  explode the LAST result's ``alternatives[0].words[]`` into parallel
  arrays, stripping the ``"s"`` suffix off startTime/endTime and casting.
- ``retrieve_full_transcript`` (/root/reference/src/data.py:57-62):
  concatenate ``results[:-1]`` transcripts.

Here both are single declarative projections over an explicit schema —
Spark's nested-schema pruning means a query touching only ``words`` never
decodes the transcripts, and vice versa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from podcast_audio_feature_extraction_spark.schema import ASR_JSON_SCHEMA


def read_asr_json(spark: SparkSession, path: str, id_from_filename: bool = True) -> DataFrame:
    """S2: one row per episode file, explicit schema (no inference pass)."""
    df = spark.read.schema(ASR_JSON_SCHEMA).json(path)
    if id_from_filename:
        # F7 analog: basename without extension as the episode id
        df = df.withColumn(
            "episode_id", F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1)
        )
    return df


def parse_asr_strings(df: DataFrame, json_col: str = "json", id_col: str = "episode_id") -> DataFrame:
    """Same shape for JSON carried in a string column (e.g. from a queue)."""
    return df.select(
        F.col(id_col).alias("episode_id"), F.from_json(F.col(json_col), ASR_JSON_SCHEMA).alias("j")
    ).select("episode_id", "j.results")


def timestamped_words(df: DataFrame) -> DataFrame:
    """S3: words of the LAST result element, exploded + cast.

    Matches data.py:65-81: word-level rows live only in results[-1];
    ``"12.3s"`` strings become double seconds; output keeps arrival order
    via ``posexplode`` (word_idx = stable ordering key, the turn_idx analog).
    """
    words = F.element_at(F.col("results"), -1)["alternatives"][0]["words"]
    return df.select(
        "episode_id",
        F.posexplode(words).alias("word_idx", "w"),
    ).select(
        "episode_id",
        "word_idx",
        F.regexp_replace(F.col("w.startTime"), r"s$", "").cast("double").alias("start_s"),
        F.regexp_replace(F.col("w.endTime"), r"s$", "").cast("double").alias("end_s"),
        F.col("w.word").alias("word"),
        F.col("w.speakerTag").alias("speaker"),
    )


def full_transcript(df: DataFrame) -> DataFrame:
    """S4: concatenation of results[:-1] transcripts (data.py:57-62 joins
    with '' — transcripts carry their own leading spaces)."""
    body = F.slice(F.col("results"), 1, F.greatest(F.size("results") - 1, F.lit(0)))
    return df.select(
        "episode_id",
        F.array_join(F.transform(body, lambda r: r["alternatives"][0]["transcript"]), "").alias("transcript"),
    )


def words_to_transcript_table(words: DataFrame) -> DataFrame:
    """Adapter: ASR word rows -> the engine's canonical transcript schema
    (episode ≈ conv, word ≈ turn, speakerTag ≈ role)."""
    return words.select(
        F.col("episode_id").alias("conv_id"),
        F.col("word_idx").cast("int").alias("turn_idx"),
        F.concat(F.lit("speaker_"), F.col("speaker").cast("string")).alias("role"),
        F.col("word").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_micros((F.col("start_s") * 1_000_000).cast("long")).alias("ts"),
    )
