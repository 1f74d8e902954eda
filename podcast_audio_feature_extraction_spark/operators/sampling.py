"""Dataset splitting + benchmark decontamination for training-data
pipelines.

- ``split_col``: deterministic, engine-portable train/val/test assignment
  by hashed id — the split survives reshuffles, re-runs and engine swaps
  (md5 is identical everywhere), unlike ``randomSplit`` which depends on
  partitioning. Pure projection: no shuffle, works at any scale.
- ``decontaminate_exact``: drop corpus rows whose text hash appears in a
  benchmark/holdout set (broadcast anti-join).
- ``contamination_pairs``: near-duplicate contamination between a corpus
  and a benchmark via the same minhash-LSH banding as
  :func:`~..dedup.minhash_lsh_pairs`, but ACROSS two tables — candidates
  are band-key collisions (equi-join), exact Jaccard verified on
  candidates only. The 100 TB shape: the benchmark side is tiny and
  broadcastable; the corpus side streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from podcast_audio_feature_extraction_spark.operators.dedup import (
    band_keys_col,
    jaccard_col,
    minhash_col,
    shingles_col,
)

SPLIT_BUCKETS = 10_000


def split_col(id_col: Column, fractions: dict[str, float], salt: str = "split") -> Column:
    """Deterministic split label from cumulative hash-bucket ranges.

    ``fractions`` maps label -> fraction (must sum to ~1; the last label
    absorbs rounding). Bucket = first 8 md5 hex chars of ``salt:id`` mod
    10000 — changing ``salt`` re-rolls the split without touching data.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % F.lit(SPLIT_BUCKETS)
    )
    labels = list(fractions)
    expr = F.lit(labels[-1])
    cum = 0.0
    cuts = []
    for lab in labels[:-1]:
        cum += fractions[lab]
        cuts.append((lab, int(round(cum * SPLIT_BUCKETS))))
    for lab, cut in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(lab)).otherwise(expr)
    return expr


def split_sql(id_expr: str, fractions: dict[str, float], salt: str = "split") -> str:
    """DuckDB twin of :func:`split_col` (same md5 bucket math)."""
    bucket = (
        f"CAST('0x' || substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {SPLIT_BUCKETS}"
    )
    labels = list(fractions)
    case = "CASE "
    cum = 0.0
    for lab in labels[:-1]:
        cum += fractions[lab]
        case += f"WHEN {bucket} < {int(round(cum * SPLIT_BUCKETS))} THEN '{lab}' "
    case += f"ELSE '{labels[-1]}' END"
    return case


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 5,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by a
    salted id hash (uniform, reproducible, engine-portable) and keep the
    first n. The distributed form of stratified subsampling — one shuffle
    on the group key, no driver-side sampling state."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return df.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= n_per_group).drop("__rk")


def stratified_sample_sql(
    src: str = "documents",
    group_col: str = "source",
    n_per_group: int = 5,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same salted-hash order)."""
    h = f"md5('{salt}:' || CAST({id_col} AS VARCHAR))"
    return f"""
        SELECT * EXCLUDE (__rk) FROM (
            SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY {h}, {id_col}) AS __rk
            FROM {src}
        ) WHERE __rk <= {n_per_group}
    """


def stratified_sample_approx(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 5,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Skew-safe variant: instead of ranking inside the group (exact n but
    one task sorts the whole group — a straggler when one group dominates
    100 TB), keep rows whose hash bucket falls under n/|group|. One
    group-size aggregate broadcast back, then a pure filter: no per-group
    sort, expected (not exact) n per group."""
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))), 1, 8), 16, 10
        ).cast("long")
        % F.lit(SPLIT_BUCKETS)
    )
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__gn"))
    cut = F.ceil(F.lit(n_per_group * SPLIT_BUCKETS) / F.col("__gn"))
    return (
        df.join(F.broadcast(sizes), group_col)
        .filter(h < cut)
        .drop("__gn")
    )


def decontaminate_exact(
    corpus: DataFrame, benchmark: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus rows whose exact text does NOT appear in the benchmark
    (broadcast anti-join on content hash)."""
    bench_hashes = benchmark.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    return corpus.join(
        F.broadcast(bench_hashes), F.md5(F.col(text_col)) == F.col("__h"), "left_anti"
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """(corpus_id, bench_id, jaccard) for near-duplicate contamination:
    minhash-LSH band collisions across the two tables, exact Jaccard on
    candidates. Returns distinct pairs above the threshold."""
    n_bands = n_hashes // band_size

    def bands(df: DataFrame, out_id: str, out_sh: str) -> DataFrame:
        docs = df.select(
            F.col(id_col).alias(out_id), shingles_col(F.col(text_col)).alias(out_sh)
        ).withColumn("__mh", minhash_col(F.col(out_sh), n_hashes))
        return docs.select(
            out_id,
            out_sh,
            F.posexplode(band_keys_col(F.col("__mh"), n_bands, band_size)).alias("band_idx", "band_key"),
        )

    c = bands(corpus, "corpus_id", "sh_c")
    b = bands(benchmark, "bench_id", "sh_b")
    cand = (
        c.join(F.broadcast(b), ["band_idx", "band_key"])
        .select("corpus_id", "bench_id", "sh_c", "sh_b")
        .dropDuplicates(["corpus_id", "bench_id"])
    )
    return (
        cand.withColumn("jaccard", jaccard_col(F.col("sh_c"), F.col("sh_b")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("corpus_id", "bench_id", "jaccard")
    )


def contamination_pairs_sql(
    corpus_pred: str,
    bench_pred: str,
    src: str = "documents",
    id_col: str = "doc_id",
    n_hashes: int = 12,
    band_size: int = 3,
    jaccard_threshold: float = 0.5,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`contamination_pairs` over one source table
    split by two predicates (how the driver query derives its two sides)."""
    n_bands = n_hashes // band_size
    toks = "list_filter(regexp_split_to_array(COALESCE(text,''), '\\s+'), x -> x <> '')"
    sh = (
        f"list_distinct(CASE WHEN len({toks}) >= {k} THEN list_transform(range(len({toks}) - {k - 1}), "
        f"i -> array_to_string({toks}[i+1:i+{k}], ' ')) ELSE [COALESCE(text,'')] END)"
    )
    return f"""
        , __sh AS (
            SELECT {id_col} AS doc_id, {sh} AS sh,
                   list_transform(range({n_hashes}),
                       i -> list_aggregate(list_transform({sh}, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS mh,
                   {corpus_pred} AS is_corpus, {bench_pred} AS is_bench
            FROM {src}
        ),
        __bands AS (
            SELECT doc_id, sh, is_corpus, is_bench, b.range AS band_idx,
                   md5(array_to_string(mh[b.range * {band_size} + 1 : b.range * {band_size} + {band_size}], '|')) AS band_key
            FROM __sh CROSS JOIN range({n_bands}) b
        ),
        __cand AS (
            SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS bench_id,
                   first(c.sh) AS sh_c, first(b.sh) AS sh_b
            FROM __bands c JOIN __bands b
              ON c.band_idx = b.band_idx AND c.band_key = b.band_key
             AND c.is_corpus AND b.is_bench
            GROUP BY c.doc_id, b.doc_id
        )
        SELECT corpus_id, bench_id,
               round(CAST(len(list_intersect(sh_c, sh_b)) AS DOUBLE)
                     / len(list_distinct(sh_c || sh_b)), 6) AS jaccard
        FROM __cand
        WHERE round(CAST(len(list_intersect(sh_c, sh_b)) AS DOUBLE)
                    / len(list_distinct(sh_c || sh_b)), 6) >= {jaccard_threshold}
    """
