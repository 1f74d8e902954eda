"""Skew handling for viral long conversations (SURVEY.md §4.2).

The reference's analog: one podcast file = one Pool task, so a 3-hour
episode makes one worker a straggler
(/root/reference/src/features/FeatureExtractor.py:28-44). In the engine,
aggregations keyed by conv_id inherit that skew. Two tools:

- ``detect_heavy_keys``: one cheap count pass (map-side combined).
- ``salted_agg``: two-stage aggregation — stage 1 groups on
  (key, salt) so a hot key's rows spread over S reducers, stage 2 merges
  the S partials. Works for any algebraic aggregate (sum/count/min/max and
  combinations like mean = sum/count).

Window/as-of operators stay unsalted by design: they are sequential per
conversation (ordering dependencies), so their skew bound is the longest
single conversation; AQE's skew-join splitting covers the join side.
``repartition_range_sorted`` preps a frame for the cogrouped merge path
so partitions stay balanced by (key, ts) ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def detect_heavy_keys(df: DataFrame, key_col: str = "conv_id", min_rows: int = 100_000) -> DataFrame:
    return df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows")).filter(F.col("n_rows") >= min_rows)


def with_salt(df: DataFrame, n_salts: int = 8, tie_col: str = "turn_idx", out_col: str = "salt") -> DataFrame:
    """Deterministic salt from an existing high-cardinality column (keeps
    re-runs reproducible, unlike rand())."""
    return df.withColumn(out_col, F.pmod(F.xxhash64(F.col(tie_col)), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    tie_col: str = "turn_idx",
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: {out_name: (fn, col)} with fn in {sum, count, min, max}.
    count is re-aggregated with sum in stage 2; the result matches the
    unsalted single-stage plan exactly (all four are algebraic).
    """
    stage1_exprs, stage2_exprs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            stage1_exprs.append(F.count(col).alias(name))
            stage2_exprs.append(F.sum(name).alias(name))
        elif fn == "sum":
            stage1_exprs.append(F.sum(col).alias(name))
            stage2_exprs.append(F.sum(name).alias(name))
        elif fn == "min":
            stage1_exprs.append(F.min(col).alias(name))
            stage2_exprs.append(F.min(name).alias(name))
        elif fn == "max":
            stage1_exprs.append(F.max(col).alias(name))
            stage2_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate for salted_agg: {fn}")
    salted = with_salt(df, n_salts=n_salts, tie_col=tie_col)
    partial = salted.groupBy(key_col, "salt").agg(*stage1_exprs)
    return partial.groupBy(key_col).agg(*stage2_exprs)


def repartition_range_sorted(
    df: DataFrame, key_col: str = "conv_id", ts_col: str = "ts", num_partitions: int | None = None
) -> DataFrame:
    """Range-partition by (key, ts) and sort within partitions — the prep
    step for per-partition sorted merges (as-of cogroup path) and for
    write-time layouts that earn parquet row-group pruning on ts."""
    cols: list[Column] = [F.col(key_col), F.col(ts_col)]
    rp = df.repartitionByRange(num_partitions, *cols) if num_partitions else df.repartitionByRange(*cols)
    return rp.sortWithinPartitions(key_col, ts_col)
