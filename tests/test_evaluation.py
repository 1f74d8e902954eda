import pandas as pd
import pyspark.sql.functions as F

from podcast_audio_feature_extraction_spark.operators.evaluation import argmax_match_count, ranking_metrics


def test_argmax_match_count(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b"],
            "scores": [
                [9.0, 1.0, 5.0, 2.0],  # max of dims 1..3 is 5.0 at idx 2 -> match
                [9.0, 7.0, 5.0, 2.0],  # max is 7.0 at idx 1 -> no match
                [0.0, 1.0, 8.0, 2.0],  # match
                [0.0, 3.0, 3.0, 1.0],  # tie: scores[2] == max -> match
            ],
        }
    )
    got = (
        spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(argmax_match_count(F.col("scores"), 2, 1, 3).alias("n"))
        .toPandas()
        .set_index("g")["n"]
    )
    assert got["a"] == 2
    assert got["b"] == 1


def test_ranking_metrics_values(spark):
    results = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic_id": [1, 1, 1, 2, 2],
                "seg_id": ["s1", "s2", "s3", "s4", "s5"],
                "rk": [1, 2, 3, 1, 2],
            }
        )
    )
    qrels = spark.createDataFrame(
        pd.DataFrame(
            {
                "topic_id": [1, 1, 2, 3],
                "seg_id": ["s2", "s9", "s9", "s1"],
                "grade": [1, 1, 1, 1],
            }
        )
    )
    got = ranking_metrics(results, qrels, k=2).toPandas().set_index("topic_id")
    # topic 1: s2 relevant at rank 2 within k=2 -> hits 1 of 2 rel
    assert got.loc[1, "hits"] == 1
    assert got.loc[1, "p_at_k"] == 0.5
    assert got.loc[1, "recall_at_k"] == 0.5
    assert got.loc[1, "mrr_at_k"] == 0.5
    # topic 2: no relevant retrieved
    assert got.loc[2, "hits"] == 0 and got.loc[2, "mrr_at_k"] == 0.0
    # topic 3: relevant exists but topic never searched -> still reported
    assert got.loc[3, "hits"] == 0


def test_ndcg_known_values(spark):
    import math
    import pandas as pd
    from podcast_audio_feature_extraction_spark.operators.evaluation import ranking_metrics

    # topic 1: relevant docs at ranks 1 and 3 of 3 relevant total, k=3
    results = spark.createDataFrame(
        pd.DataFrame({"topic_id": [1, 1, 1], "seg_id": ["a", "b", "c"], "rk": [1, 2, 3]})
    )
    qrels = spark.createDataFrame(
        pd.DataFrame({"topic_id": [1, 1, 1], "seg_id": ["a", "c", "d"], "grade": [1, 1, 1]})
    )
    got = ranking_metrics(results, qrels, k=3).toPandas()
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 4))
    assert abs(got.loc[0, "ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9
