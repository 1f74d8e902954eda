"""Hypothesis property tests for the core temporal operators (SURVEY §5.3).

The Spark round-trip is slow, so each property drives randomized inputs
through BOTH the engine and the numpy oracle with a modest example budget.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from podcast_audio_feature_extraction_spark.operators.asof import asof_join
from podcast_audio_feature_extraction_spark.operators.sessionize import sessionize
from podcast_audio_feature_extraction_spark.oracle.numpy_oracle import asof_np, sessionize_np

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from podcast_audio_feature_extraction_spark.session import get_spark

        _spark = get_spark(app_name="pytest-props", master="local[4]", shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


ts_lists = st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(offsets=ts_lists, gap=st.integers(min_value=1, max_value=5_000))
def test_sessionize_property(offsets, gap):
    spark = _get_spark()
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(len(offsets), dtype=np.int32),
            "role": "user",
            "text": "x",
            "tool": None,
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(np.sort(offsets), unit="s"),
        }
    )
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=float(gap))
        .toPandas()
        .sort_values(["ts", "turn_idx"], kind="mergesort")["session_id"]
        .to_numpy()
    )
    want = sessionize_np(pdf, gap_s=float(gap))["session_id"].to_numpy()
    np.testing.assert_array_equal(got, want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25),
    rts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25),
    inclusive=st.booleans(),
)
def test_asof_property(lts, rts, inclusive):
    spark = _get_spark()
    lpdf = pd.DataFrame({"conv_id": "k", "ts": pd.to_datetime(sorted(lts), unit="s")})
    rts_sorted = sorted(set(rts))
    rpdf = pd.DataFrame(
        {
            "conv_id": "k",
            "ts": pd.to_datetime(rts_sorted, unit="s"),
            "feat": np.arange(len(rts_sorted), dtype=np.float64),
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            value_cols=["feat"],
            inclusive=inclusive,
        )
        .toPandas()
        .sort_values("ts", kind="mergesort")["feat"]
        .to_numpy(dtype=float)
    )
    want = (
        asof_np(lpdf, rpdf, value_cols=["feat"], inclusive=inclusive)
        .sort_values("ts", kind="mergesort")["feat"]
        .to_numpy(dtype=float)
    )
    both_nan = np.isnan(got) & np.isnan(want)
    assert (both_nan | (got == want)).all()
