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


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pts_ts=st.lists(st.integers(min_value=0, max_value=5_000), min_size=1, max_size=30),
    iv_spec=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000),  # start
            st.integers(min_value=0, max_value=400),    # length (0 = empty)
        ),
        min_size=1,
        max_size=12,
    ),
    bucket_s=st.sampled_from([7, 60, 250]),
)
def test_interval_join_matches_bruteforce(pts_ts, iv_spec, bucket_s):
    """Bucketed-range equi-join == brute-force range predicate, for any
    bucket size (incl. buckets much smaller/larger than the intervals)."""
    from podcast_audio_feature_extraction_spark.operators.interval import interval_join

    spark = _get_spark()
    pts = pd.DataFrame(
        {"conv_id": ["c"] * len(pts_ts), "ts": pd.to_datetime(pts_ts, unit="s"), "pt_id": range(len(pts_ts))}
    )
    iv = pd.DataFrame(
        {
            "conv_id": ["c"] * len(iv_spec),
            "iv_id": range(len(iv_spec)),
            "start": pd.to_datetime([s for s, _ in iv_spec], unit="s"),
            "end": pd.to_datetime([s + l for s, l in iv_spec], unit="s"),
        }
    )
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv), bucket_s=bucket_s
    ).toPandas()
    got_pairs = set(zip(got["pt_id"], got["iv_id"]))
    want_pairs = set()
    for _, p in pts.iterrows():
        for _, v in iv.iterrows():
            if v["start"] <= p["ts"] < v["end"]:
                want_pairs.add((p["pt_id"], v["iv_id"]))
    assert got_pairs == want_pairs
    assert len(got) == len(got_pairs)  # exactly-once per matching pair


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=3_000), min_size=1, max_size=30),
    vals=st.data(),
)
def test_functional_grid_property(offsets, vals):
    """Randomized single-conversation frames: every grid cell must match a
    per-window pandas/numpy recomputation (mean/std/min/max/median/cv/
    range/skew/kurt with the same guards and rounding)."""
    from podcast_audio_feature_extraction_spark.operators.functionals import functional_grid

    spark = _get_spark()
    v = vals.draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=len(offsets),
            max_size=len(offsets),
        )
    )
    pdf = pd.DataFrame(
        {
            "conv_id": "c",
            "ts": pd.to_datetime(np.array(sorted(offsets)) * 1_000_000, unit="us"),
            "val": np.asarray(v, dtype=np.float64),
        }
    )
    stats = ("mean", "std", "min", "max", "median", "cv", "range", "skew", "kurt")
    got = (
        functional_grid(spark.createDataFrame(pdf), ["val"], stats=stats, length="120 seconds", hop="60 seconds")
        .toPandas()
        .set_index("win_start")
        .sort_index()
    )
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    assert len(got) > 0
    for ws, row in got.iterrows():
        lo = int(pd.Timestamp(ws).value // 1000)
        m = pdf[(pdf["us"] >= lo) & (pdf["us"] < lo + 120_000_000)]
        x = m["val"].to_numpy()
        assert row["n"] == len(x) and len(x) > 0
        mean = x.mean()
        std = x.std()
        assert abs(row["val_mean"] - round(mean, 6)) <= 1.1e-6
        assert abs(row["val_std"] - round(std, 6)) <= 1.1e-6
        assert row["val_min"] == x.min() and row["val_max"] == x.max()
        assert abs(row["val_range"] - round(x.max() - x.min(), 6)) <= 1.1e-6
        assert abs(row["val_median"] - round(float(np.percentile(x, 50)), 6)) <= 1.1e-6
        cv = std / mean if mean != 0 else 0.0
        assert abs(row["val_cv"] - round(cv, 6)) <= 1.1e-6
        m1, m2r = x.mean(), (x**2).mean()
        var = m2r - m1 * m1
        # assert only 10x INSIDE the engine's relative guard so a last-ulp
        # disagreement on the branch taken can't flake the property
        if var > 1e-9 * m2r:
            m3c = (x**3).mean() - 3 * m1 * m2r + 2 * m1**3
            m4c = (x**4).mean() - 4 * m1 * (x**3).mean() + 6 * m1**2 * m2r - 3 * m1**4
            assert abs(row["val_skew"] - round(m3c / var**1.5, 6)) <= 2e-6
            assert abs(row["val_kurt"] - round(m4c / var**2 - 3.0, 6)) <= 2e-6
