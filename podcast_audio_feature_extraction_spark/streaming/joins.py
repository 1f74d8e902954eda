"""Stream-stream event-time joins (SURVEY.md §2.9 extension).

The batch engine's generic interval join (operators/interval.py) has a
Structured Streaming twin: two unbounded inputs joined on key + an
event-time range, with watermarks bounding both sides' join state. This
is the streaming form of the reference's per-candidate ranged fetch
(search.py:311-322): candidate events arrive on one stream, points on the
other, and each candidate collects the points inside its [start,
start+length) slice as both streams advance.

State bound: Spark keeps each side's rows only while the opposite
watermark can still match them — the range condition on both event-time
columns is what lets the engine evict, so it is REQUIRED, not an
optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    points: DataFrame,
    candidates: DataFrame,
    length_s: int = 90,
    watermark: str = "10 minutes",
    on: str = "conv_id",
    pt_ts_col: str = "ts",
    cand_ts_col: str = "start",
) -> DataFrame:
    """Inner join of streaming points to streaming candidates whose
    [start, start+length_s) slice contains the point's event time.

    Both inputs may be streaming (watermarked here) or batch (watermark
    skipped) — the same call is used by the batch-parity test.
    """
    p = points.select(
        F.col(on).alias("__k"), F.col(pt_ts_col).alias("p_ts"), *[c for c in points.columns if c not in (on, pt_ts_col)]
    )
    c = candidates.select(
        F.col(on).alias("__ck"),
        F.col(cand_ts_col).alias("c_start"),
        *[col for col in candidates.columns if col not in (on, cand_ts_col)],
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_start", watermark)
    cond = (
        (p["__k"] == c["__ck"])
        & (p["p_ts"] >= c["c_start"])
        & (p["p_ts"] < c["c_start"] + F.expr(f"INTERVAL {length_s} SECONDS"))
    )
    return p.join(c, cond).drop("__ck").withColumnRenamed("__k", on)
