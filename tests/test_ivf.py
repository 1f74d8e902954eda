import pandas as pd
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


def test_pq_adc_recall_and_self_consistency(spark):
    """PQ encode + ADC top-k: a corpus vector queried against the corpus
    must rank vectors sharing its PQ cells first, and recall@10 vs exact
    L2 must be high on clustered data (PQ's operating regime)."""
    import numpy as np

    from podcast_audio_feature_extraction_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    rng = np.random.default_rng(23)
    # clustered corpus: 8 centers, 50 points each, dim 16
    centers = rng.standard_normal((8, 16)) * 5
    pts = np.concatenate([c + rng.standard_normal((50, 16)) * 0.4 for c in centers])
    pdf = pd.DataFrame({"vec_id": range(len(pts)), "embedding": [p.tolist() for p in pts]})
    emb = spark.createDataFrame(pdf)

    books = fit_pq_codebooks(emb, m_sub=8, k_codes=32, sample_rows=1000, iters=10)
    assert books.shape == (8, 32, 2)
    codes = pq_encode(emb, books).localCheckpoint()
    # codes are within range and deterministic
    row = codes.filter("vec_id = 0").collect()[0]["pq_code"]
    assert len(row) == 8 and all(0 <= c < 32 for c in row)

    queries = emb.filter(F.col("vec_id").isin([0, 77, 203, 399]))
    got = pq_topk(codes, queries, books, k=10).toPandas()

    # exact L2 top-10 for recall
    def exact_top(qi):
        d = ((pts - pts[qi]) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")
        return [i for i in order if i != qi][:10]

    recalls = []
    for q_id, grp in got.groupby("q_id"):
        approx = set(grp["c_id"])
        exact = set(exact_top(q_id))
        recalls.append(len(approx & exact) / 10)
    assert np.mean(recalls) >= 0.6, recalls  # measured 0.675 at 8x32 (0.875 at 16x64)
    # every returned neighbour is from the query's own cluster (50-block)
    for q_id, grp in got.groupby("q_id"):
        assert all(c // 50 == q_id // 50 for c in grp["c_id"]), q_id


def test_ivf_pq_subset_of_probed_buckets_and_adc_consistent(spark):
    """IVF-PQ candidates come only from probed centroid buckets, and the
    JVM-side ADC sum must equal the pandas pq_topk ADC on the shared
    candidate set (same LUT arithmetic, two implementations)."""
    import numpy as np

    from podcast_audio_feature_extraction_spark.operators.similarity import (
        fit_ivf_centroids,
        fit_pq_codebooks,
        ivf_pq_topk,
        pq_encode,
        pq_topk,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 16)) * 5
    pts = np.concatenate([c + rng.standard_normal((40, 16)) * 0.4 for c in centers])
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(pts)), "embedding": [p.tolist() for p in pts]})
    )
    cents = fit_ivf_centroids(emb, n_centroids=6, sample_rows=1000, iters=10)
    books = fit_pq_codebooks(emb, m_sub=8, k_codes=32, sample_rows=1000, iters=10)
    queries = emb.filter(F.col("vec_id").isin([0, 100, 239]))

    got = ivf_pq_topk(emb, queries, cents, books, k=5, nprobe=1).toPandas()
    assert set(got["q_id"]) == {0, 100, 239}
    assert (got.groupby("q_id").size() == 5).all()

    # ADC parity with the brute pq_topk on the same codes
    codes = pq_encode(emb, books)
    brute = pq_topk(codes, queries, books, k=len(pts)).toPandas()
    merged = got.merge(brute, on=["q_id", "c_id"], suffixes=("_ivf", "_brute"))
    assert len(merged) == len(got)
    assert (merged["adc_dist_ivf"] - merged["adc_dist_brute"]).abs().max() < 1e-6
    # with nprobe=1 on well-separated clusters, neighbours stay in-cluster
    assert all(c // 40 == q // 40 for q, c in zip(got["q_id"], got["c_id"]))


def test_pq_encode_and_adc_match_independent_numpy(spark):
    """pq_encode codes and pq_topk ADC distances vs an INDEPENDENT numpy
    reimplementation (einsum/broadcast math, i.e. a different summation
    order than the engine's sequential per-dim fold) — agreement to 1e-9
    relative proves the engine computes the PQ spec, not just itself."""
    import numpy as np

    from podcast_audio_feature_extraction_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    rng = np.random.default_rng(23)
    n, dim, m_sub, k_codes = 80, 16, 4, 8
    x = rng.standard_normal((n, dim))
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in x]})
    sdf = spark.createDataFrame(pdf)
    books = fit_pq_codebooks(sdf, m_sub=m_sub, k_codes=k_codes, sample_rows=n)
    sub = dim // m_sub

    codes = (
        pq_encode(sdf, books).select("vec_id", "pq_code").toPandas().sort_values("vec_id")
    )
    got_codes = np.stack([np.asarray(c) for c in codes["pq_code"]])
    # independent encode: full broadcast distance tensor per subspace
    want_codes = np.stack(
        [
            ((x[:, m * sub : (m + 1) * sub, None] - books[m].T[None, :, :]) ** 2)
            .sum(axis=1)
            .argmin(axis=1)
            for m in range(m_sub)
        ],
        axis=1,
    )
    np.testing.assert_array_equal(got_codes, want_codes)

    q = sdf.filter(F.col("vec_id") < 3)
    got = (
        pq_topk(pq_encode(sdf, books), q, books, k=5)
        .select("q_id", "c_id", "adc_dist")
        .toPandas()
        .sort_values(["q_id", "c_id"])
    )
    # independent ADC: dist(q, c) = sum_m ||q_sub - book[m][code_c_m]||^2
    qx = x[:3]
    for _, row in got.iterrows():
        qv, cv = qx[int(row.q_id)], want_codes[int(row.c_id)]
        want = sum(
            float(((qv[m * sub : (m + 1) * sub] - books[m][cv[m]]) ** 2).sum())
            for m in range(m_sub)
        )
        assert abs(row.adc_dist - want) <= 1e-9 * max(1.0, abs(want)), (row, want)


def test_residual_ivfpq_recall_beats_or_matches_raw(spark):
    """Residual IVF-PQ (codes on x - centroid, per-probe LUTs) must reach
    at least the raw composition's recall@10 vs exact L2 on clustered
    data — the residual form models the within-cell distribution, which
    is exactly what raw PQ wastes code budget on when cells are far
    apart (Jégou et al. 2011 §IV)."""
    import numpy as np

    from podcast_audio_feature_extraction_spark.operators.similarity import (
        _fit_pq_books,
        _residualize,
        ivf_pq_topk,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 16)) * 6
    pts = np.concatenate([c + rng.standard_normal((60, 16)) * 0.5 for c in centers])
    pdf = pd.DataFrame({"vec_id": range(len(pts)), "embedding": [p.tolist() for p in pts]})
    emb = spark.createDataFrame(pdf)
    queries = emb.filter(F.col("vec_id") % 60 == 0)
    q_ids = [int(r["vec_id"]) for r in queries.select("vec_id").collect()]

    cents = _fit_pq_books(pts, 1, 6, 8, 42)[0]  # 1 "subspace" over full dim = plain k-means
    raw_books = _fit_pq_books(pts, 8, 16, 8, 42)
    res_books = _fit_pq_books(_residualize(pts, cents)[0], 8, 16, 8, 42)

    # exact L2 ranking (ADC approximates squared L2 — a cosine baseline
    # would mix metric error into the quantization comparison)
    def exact_top(qi):
        d = ((pts - pts[qi]) ** 2).sum(axis=1)
        return [i for i in np.argsort(d, kind="stable") if i != qi][:10]

    def recall(approx):
        num = den = 0
        for qid in q_ids:
            truth = set(exact_top(qid))
            found = set(approx[approx["q_id"] == qid]["c_id"])
            num += len(truth & found)
            den += len(truth)
        return num / den

    raw = recall(ivf_pq_topk(emb, queries, cents, raw_books, k=10, nprobe=3).toPandas())
    res = recall(ivf_pq_topk(emb, queries, cents, res_books, k=10, nprobe=3, residual=True).toPandas())
    # measured sweep (this fixture): raw/res = 0.18/0.38 at 4x8 codes,
    # 0.42/0.60 at 8x16, 0.67/0.75 at 8x32 — residual wins at every budget
    assert res >= 0.55, f"residual IVF-PQ recall too low: {res:.2f}"
    assert res >= raw + 0.05, f"residual {res:.2f} should clearly beat raw {raw:.2f}"


def test_residual_fit_is_deterministic_and_differs_from_raw(spark):
    from podcast_audio_feature_extraction_spark.operators.similarity import (
        fit_ivf_centroids_local,
        fit_pq_codebooks_local,
        fit_residual_pq_codebooks_local,
    )
    import numpy as np

    path = "/root/testdata/sf0.01/embeddings.parquet"
    cents = fit_ivf_centroids_local(path, n_centroids=16, iters=8)
    a = fit_residual_pq_codebooks_local(path, cents, m_sub=8, k_codes=16, iters=8)
    b = fit_residual_pq_codebooks_local(path, cents, m_sub=8, k_codes=16, iters=8)
    np.testing.assert_array_equal(a, b)
    raw = fit_pq_codebooks_local(path, m_sub=8, k_codes=16, iters=8)
    assert not np.array_equal(a, raw)
