import pyspark.sql.functions as F

from podcast_audio_feature_extraction_spark.operators.similarity import (
    brute_force_topk,
    fit_ivf_centroids,
    ivf_topk,
)


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    cents = fit_ivf_centroids(emb, n_centroids=16, iters=8)
    approx = ivf_topk(emb, queries, cents, k=10, nprobe=4).toPandas()

    recall_num, recall_den = 0, 0
    for qid, g in exact.groupby("q_id"):
        truth = set(g["c_id"])
        found = set(approx[approx["q_id"] == qid]["c_id"])
        recall_num += len(truth & found)
        recall_den += len(truth)
    recall = recall_num / recall_den
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"
    # candidates actually pruned: IVF scored pairs << brute-force pairs
    assert len(approx) <= len(exact)


def test_ivf_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1 = fit_ivf_centroids(emb, n_centroids=8, iters=4)
    c2 = fit_ivf_centroids(emb, n_centroids=8, iters=4)
    import numpy as np

    np.testing.assert_array_equal(c1, c2)
