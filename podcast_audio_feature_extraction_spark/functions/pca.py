"""PCA-whitening post-processor (SURVEY.md §2.10 E6, §2.1 S13/S14, §2.5 W5/W6).

Analog of the reference's VGGish 3-stage pipeline
(/root/reference/src/features/VGGishExtractor.py:34-128): embed ->
post-process with a PCA whitener (a broadcast matrix multiply + clip) ->
combine with a strided downsample
(/root/reference/src/features/create_vggish_features.py:17-32: frames
``[:6000:5]``).

Stage shape mirrors the reference: the whitening matrix is fitted ONCE on
a bounded sample (driver-side numpy — the reference ships pretrained PCA
params), then broadcast and applied executor-side in an Arrow-vectorized
pandas UDF batch matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType
from pyspark.sql.window import Window


def fit_pca_whitener(df: DataFrame, vec_col: str = "embedding", sample_rows: int = 10_000, clip: float = 2.0):
    """Fit mean + whitening matrix on a bounded sample (deterministic:
    ordered limit over ALL non-vector columns — ordering by a single
    non-unique column would leave orderBy+limit tie order up to the
    partitioning and the fitted matrix could vary between runs)."""
    id_cols = [c for c in df.columns if c != vec_col]
    sample = df.select(vec_col, *id_cols).orderBy(*id_cols) if id_cols else df.select(vec_col)
    pdf = sample.select(vec_col).limit(sample_rows).toPandas()
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    mean = x.mean(axis=0)
    cov = np.cov(x - mean, rowvar=False, ddof=0)
    evals, evecs = np.linalg.eigh(cov)
    # descending eigenvalue order, epsilon-regularized whitening
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    w = evecs @ np.diag(1.0 / np.sqrt(evals + 1e-8)) @ evecs.T
    return {"mean": mean, "matrix": w, "clip": clip}


def apply_pca_whitener(df: DataFrame, params: dict, vec_col: str = "embedding", out_col: str = "whitened") -> DataFrame:
    """Executor-side whitening: broadcast params, batch matmul per Arrow
    batch, clip to [-clip, clip] (VGGishExtractor.py postprocess shape)."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        {"mean": params["mean"].tolist(), "matrix": params["matrix"].tolist(), "clip": params["clip"]}
    )

    @F.pandas_udf(ArrayType(DoubleType()))
    def whiten(vecs: pd.Series) -> pd.Series:
        p = b.value
        mean = np.asarray(p["mean"])
        mat = np.asarray(p["matrix"])
        clip = p["clip"]
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        y = np.clip((x - mean) @ mat.T, -clip, clip)
        return pd.Series(list(y))

    return df.withColumn(out_col, whiten(F.col(vec_col)))


def strided_downsample(
    df: DataFrame,
    every: int = 5,
    max_idx: int = 6000,
    key_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """W6: keep frames [:max_idx:every] per entity
    (create_vggish_features.py:27)."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    idx = F.row_number().over(w) - 1
    return (
        df.withColumn("frame_idx", idx.cast("int"))
        .filter((F.col("frame_idx") % every == 0) & (F.col("frame_idx") < max_idx))
    )


def combine_embeddings(df: DataFrame, vec_col: str = "whitened", key_col: str = "conv_id") -> DataFrame:
    """S14: per-entity ordered list of downsampled embeddings."""
    ordered = F.sort_array(F.collect_list(F.struct(F.col("frame_idx"), F.col(vec_col).alias("v"))))
    return df.groupBy(key_col).agg(
        F.transform(ordered, lambda s: s["v"]).alias("embeddings"),
        F.count(F.lit(1)).cast("int").alias("n_frames"),
    )
