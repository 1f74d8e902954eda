"""Flat tabular sources (SURVEY.md §2.1 S1, §5 qrels fixtures).

- :func:`read_metadata_tsv` — the reference's episode-metadata scan
  (/root/reference/src/data.py:11-13: ``pd.read_csv(..., delimiter='\\t')``)
  as an explicit-schema TSV read: header row, quote-escaped fields
  (descriptions contain quotes), no type inference pass over the data.
- :func:`read_qrels` — TREC qrels golden judgments
  (/root/reference/data/2020_train_qrels.list: whitespace-delimited
  ``topic iter seg_id grade``), the input to
  :func:`~..operators.evaluation.ranking_metrics`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("episode_uri", T.StringType(), True),
        T.StructField("show_name", T.StringType(), True),
        T.StructField("show_description", T.StringType(), True),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("show_filename_prefix", T.StringType(), True),
        T.StructField("episode_filename_prefix", T.StringType(), True),
        T.StructField("episode_name", T.StringType(), True),
        T.StructField("episode_description", T.StringType(), True),
        T.StructField("duration", T.DoubleType(), True),
    ]
)


def read_metadata_tsv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S1: TSV metadata scan with an explicit schema — a 100 TB catalog
    never pays a schema-inference pass, and `escape` handles quoted
    descriptions the way pandas' default dialect did."""
    return (
        spark.read.options(sep="\t", header=True, escape='"', multiLine=False)
        .schema(schema or METADATA_SCHEMA)
        .csv(path)
    )


QRELS_SCHEMA = T.StructType(
    [
        T.StructField("topic_id", T.IntegerType(), True),
        T.StructField("iteration", T.IntegerType(), True),
        T.StructField("seg_id", T.StringType(), True),
        T.StructField("grade", T.IntegerType(), True),
    ]
)


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-delimited TREC qrels -> (topic_id, iteration, seg_id,
    grade). Split on runs of whitespace (the reference files mix spaces)."""
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(
            parts[0].cast("int").alias("topic_id"),
            parts[1].cast("int").alias("iteration"),
            parts[2].alias("seg_id"),
            parts[3].cast("int").alias("grade"),
        )
    )
