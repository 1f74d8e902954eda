import pandas as pd

from podcast_audio_feature_extraction_spark.operators.interval import interval_join


def _fixtures(spark):
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1"] * 4 + ["c2"],
                "ts": pd.to_datetime([10, 70, 130, 200, 10], unit="s"),
                "val": [1.0, 2.0, 3.0, 4.0, 9.0],
            }
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c2", "c1"],
                "iv_id": [1, 2, 3, 4],
                "start": pd.to_datetime([0, 65, 100, 300], unit="s"),
                "end": pd.to_datetime([130, 75, 400, 300], unit="s"),  # iv 4 is empty
            }
        )
    )
    return pts, iv


def test_interval_join_membership(spark):
    pts, iv = _fixtures(spark)
    got = interval_join(pts, iv, bucket_s=60).toPandas()
    hits = set(zip(got["iv_id"], got["val"]))
    # iv1 [0,130): ts 10,70 (130 excluded — end-exclusive); iv2 [65,75): 70;
    # iv3 c2 [100,400): none (c2 point at 10); iv4 empty -> dropped
    assert hits == {(1, 1.0), (1, 2.0), (2, 2.0)}
    # exactly once per (point, interval) pair despite multi-cell intervals
    assert len(got) == 3


def test_interval_join_respects_keys(spark):
    pts, iv = _fixtures(spark)
    got = interval_join(pts, iv, bucket_s=60).toPandas()
    assert (got[got["iv_id"] == 3].shape[0]) == 0  # c2 interval never sees c1 points


def test_interval_join_plans_as_equi_join(spark):
    pts, iv = _fixtures(spark)
    plan = interval_join(pts, iv, bucket_s=60)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)
