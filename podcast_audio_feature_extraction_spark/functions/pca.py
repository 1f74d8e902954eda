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


def fit_pca_whitener_local(
    parquet_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    clip: float = 2.0,
):
    """Same whitener fit straight from a parquet file with DuckDB+numpy
    (no Spark) — deterministic ordered-limit sample keyed on ``id_col``,
    identical numpy math, so a Spark query and its DuckDB twin fitting
    from the same file get bit-identical params (the
    fit_ivf_centroids_local recipe applied to the whitener)."""
    import duckdb

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT {id_col}, {vec_col} FROM '{parquet_path}' ORDER BY {id_col} LIMIT {sample_rows}"
    ).fetchdf()
    con.close()
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    mean = x.mean(axis=0)
    cov = np.cov(x - mean, rowvar=False, ddof=0)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    w = evecs @ np.diag(1.0 / np.sqrt(evals + 1e-8)) @ evecs.T
    return {"mean": mean, "matrix": w, "clip": clip}


def whiten_component_col(vec_col_name: str, params: dict, j: int) -> Column:
    """Whitened component ``j`` as a PURE-SQL expression (mean + matrix
    row inlined as double literals): y_j = clip(fold_i (x_i - mean_i) *
    W[j,i]). The fold runs sequentially in ascending dimension order from
    a 0.0 init — bit-identical to the DuckDB twin's list_reduce (BLAS
    matmul order would not be). Stays in whole-stage codegen; the
    pandas-UDF batch-matmul path (:func:`apply_pca_whitener`) remains the
    throughput form, this is its oracle-checkable twin."""
    mean = params["mean"]
    w = params["matrix"][j]
    clip = float(params["clip"])
    means = ", ".join(f"{v:.17g}D" for v in mean)
    ws = ", ".join(f"{v:.17g}D" for v in w)
    y = (
        f"aggregate(sequence(0, {len(w) - 1}), cast(0.0 as double), (acc, i) -> "
        f"acc + (cast(element_at({vec_col_name}, i + 1) as double) - element_at(array({means}), i + 1))"
        f" * element_at(array({ws}), i + 1))"
    )
    return F.expr(f"least(greatest({y}, {-clip:.17g}D), {clip:.17g}D)")


def whiten_component_sql(vec_expr: str, params: dict, j: int) -> str:
    """DuckDB twin of :func:`whiten_component_col` (same literals, same
    ascending-dimension fold; 0.0 + e0 == e0 exactly, so the Spark 0-init
    fold and list_reduce's first-element init agree)."""
    from podcast_audio_feature_extraction_spark.functions.sqlfmt import dlit

    mean = params["mean"]
    w = params["matrix"][j]
    clip = float(params["clip"])
    means = ", ".join(dlit(v) for v in mean)
    ws = ", ".join(dlit(v) for v in w)
    y = (
        f"list_reduce(list_transform(range({len(w)}), i -> "
        f"(CAST({vec_expr}[i+1] AS DOUBLE) - ([{means}])[i+1]) * ([{ws}])[i+1]), (a, b) -> a + b)"
    )
    return f"least(greatest({y}, {dlit(-clip)}), {dlit(clip)})"


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
