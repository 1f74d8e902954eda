"""Sliding-window functionals (SURVEY.md §2.4 A1, §2.5 W1/W2).

Analog of the reference's eGeMAPS functionals — aggregations of low-level
descriptors over 0.96 s windows hopped 0.48 s
(/root/reference/data/custom_FrameModeFunctionals.conf.inc:8-11,
/root/reference/src/features/OpenSmileExtractor.py:21-27) and the 120 s /
60 s-step segment windows (/root/reference/src/search/index.py:79-81).

``F.window(ts, length, hop)`` IS the overlapping-window interval join
(each row lands in length/hop windows); origin is epoch 0 and windows are
left-closed right-open, exactly the reference's ``range(0, end, 60)``
segment enumeration. The groupBy is a single shuffle on
(conv_id, window) with map-side partial aggregation — at 100 TB this is
the cheapest possible plan: no self-join, no explode beyond the
length/hop duplication factor.

Parity notes: population stddev (numpy ddof=0); `percentile(col, 0.5)`
is exact linear interpolation (DuckDB twin: quantile_cont).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def window_functionals(
    df: DataFrame,
    length: str = "120 seconds",
    hop: str = "60 seconds",
    val_col: str = "val",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    round_digits: int | None = 6,
) -> DataFrame:
    """Per (conv_id, sliding window) functional aggregates of ``val_col``.

    ``round_digits`` rounds the float aggregates (mean/std/median) so
    cross-engine comparisons (Spark partial-agg vs single-node oracle)
    are stable in the last ulp; pass None for raw doubles.
    """
    win = F.window(F.col(ts_col), length, hop)

    def _r(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return (
        df.groupBy(F.col(conv_col), win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.avg(val_col)).alias("val_mean"),
            _r(F.coalesce(F.stddev_pop(val_col), F.lit(0.0))).alias("val_std"),
            F.min(val_col).alias("val_min"),
            F.max(val_col).alias("val_max"),
            _r(F.percentile(F.col(val_col), F.lit(0.5))).alias("val_median"),
        )
        .select(
            conv_col,
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "val_mean",
            "val_std",
            "val_min",
            "val_max",
            "val_median",
        )
    )


def window_functionals_sql(
    length_s: int = 120,
    hop_s: int = 60,
    src: str = "transcript",
    round_digits: int = 6,
) -> str:
    """DuckDB twin. Spark's F.window(length, hop) assigns each row to the
    length/hop fixed-origin windows covering its ts; for length=2*hop that
    is exactly the two shifted tumbling buckets below."""
    n_shifts = length_s // hop_s
    shifts = ", ".join(f"({i * hop_s})" for i in range(n_shifts))
    # inline subquery (not a CTE) so the fragment can be embedded after a
    # WITH clause; make_timestamp builds TIMESTAMP (ntz) from micros with
    # no session-timezone dependence
    return f"""
        SELECT conv_id,
               win_start,
               win_start + INTERVAL {length_s} SECOND AS win_end,
               count(*) AS n,
               round(avg(val), {round_digits}) AS val_mean,
               round(COALESCE(stddev_pop(val), 0.0), {round_digits}) AS val_std,
               min(val) AS val_min,
               max(val) AS val_max,
               round(quantile_cont(val, 0.5), {round_digits}) AS val_median
        FROM (
            SELECT t.*, make_timestamp((CAST(floor(epoch_us(ts) / 1e6 / {hop_s}) AS BIGINT) * {hop_s} - off.o) * 1000000) AS win_start
            FROM {src} t CROSS JOIN (VALUES {shifts}) AS off(o)
        )
        WHERE epoch_us(ts) >= epoch_us(win_start)
          AND epoch_us(ts) <  epoch_us(win_start) + {length_s} * 1000000
        GROUP BY conv_id, win_start
    """
