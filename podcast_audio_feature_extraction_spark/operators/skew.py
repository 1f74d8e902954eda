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


def skew_guarded_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    heavy_min_rows: int = 100_000,
    n_salts: int = 8,
    tie_col: str = "turn_idx",
) -> DataFrame:
    """Hybrid skew-safe aggregation: detect heavy keys with one cheap count
    pass, route ONLY them through :func:`salted_agg` (their rows spread
    over ``n_salts`` reducers), aggregate the light majority single-stage,
    union. Everything is in-plan — the heavy-key list travels as a
    broadcast semi/anti join, no driver collect.

    Result is exactly equal to the plain ``groupBy(key).agg`` for every
    supported (algebraic) aggregate. Use when a handful of viral keys
    dominate an otherwise balanced aggregation AND the aggregate state is
    too big for map-side combine to neutralize (ordered/holistic shapes —
    see :func:`salted_collect_sorted`; for plain sum/count/min/max Spark's
    partial aggregation usually already absorbs the skew).
    """
    heavy = F.broadcast(detect_heavy_keys(df, key_col, heavy_min_rows).select(key_col))
    light_part = df.join(heavy, key_col, "left_anti")
    heavy_part = df.join(heavy, key_col, "left_semi")
    plain_exprs = []
    for name, (fn, col) in aggs.items():
        plain_exprs.append(getattr(F, fn)(col).alias(name))
    light_agg = light_part.groupBy(key_col).agg(*plain_exprs)
    heavy_agg = salted_agg(heavy_part, key_col, aggs, n_salts=n_salts, tie_col=tie_col)
    return light_agg.unionByName(heavy_agg)


def salted_collect_sorted(
    df: DataFrame,
    key_cols: list[str] | str,
    struct_cols: list[str],
    out_col: str = "items",
    n_salts: int = 8,
    tie_col: str = "turn_idx",
) -> DataFrame:
    """Skew-safe ORDERED aggregation — the A10 shape
    (``sort_array(collect_list(struct(...)))``) where salting actually
    matters: collect_list is holistic, so a viral conversation's entire
    buffer lands on ONE reducer (straggler + OOM risk) and map-side
    combine cannot help. Two stages: collect per (key, salt) so the hot
    key's rows spread over ``n_salts`` reducers, then flatten the salt
    partials and sort ONCE. The final total sort_array makes the result
    bit-identical to the unsalted plan regardless of salt routing.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salted = with_salt(df, n_salts=n_salts, tie_col=tie_col)
    partial = salted.groupBy(*keys, "salt").agg(
        F.collect_list(F.struct(*[F.col(c) for c in struct_cols])).alias("__p")
    )
    return partial.groupBy(*keys).agg(
        F.sort_array(F.flatten(F.collect_list("__p"))).alias(out_col)
    )


def repartition_range_sorted(
    df: DataFrame, key_col: str = "conv_id", ts_col: str = "ts", num_partitions: int | None = None
) -> DataFrame:
    """Range-partition by (key, ts) and sort within partitions — the prep
    step for per-partition sorted merges (as-of cogroup path) and for
    write-time layouts that earn parquet row-group pruning on ts."""
    cols: list[Column] = [F.col(key_col), F.col(ts_col)]
    rp = df.repartitionByRange(num_partitions, *cols) if num_partitions else df.repartitionByRange(*cols)
    return rp.sortWithinPartitions(key_col, ts_col)
