"""Timestamp helpers.

All gap/duration arithmetic in the engine goes through integer
microseconds: casting a timestamp to double loses ~1e-7 s of precision at
epoch magnitude, which is enough to flip a session-gap comparison at the
boundary. ``ts_micros`` also normalizes TIMESTAMP_NTZ (what plain parquet
columns decode to) to TIMESTAMP first — the session timezone is pinned to
UTC in session.py, so the conversion is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def ts_micros(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
