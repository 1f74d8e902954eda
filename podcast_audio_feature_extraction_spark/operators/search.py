"""Engine-side candidate retrieval (SURVEY.md §2.1 S9, §2.6 T1, §2.3 J3).

Replaces the reference's external Elasticsearch dependency
(/root/reference/src/search/search.py:174-214: multi-field BM25 with
``seg_words`` boosted 2x, top ``search_es_num=100``) with an in-engine
scoring expression over the segments table:

    score(seg, q) = sum over query terms of
        2.0 * tf(term, seg_words) + 1.0 * tf(term, conv_name)

tf = term occurrence count (declarative: size(filter(tokens, = term))).
Not BM25-identical — the reference's ES cluster isn't reproducible — but
the same dataflow shape: score expr -> orderBy desc -> limit k, which
Spark executes as TakeOrderedAndProject (no global sort materialization).

J3: seg_id splits back to conv_id (F3: split on '_') and joins the
conversation dimension (broadcast — it is groupBy(conv_id) small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def term_freq(tokens: Column, term: str) -> Column:
    return F.size(F.filter(tokens, lambda x: x == F.lit(term))).cast("int")


def score_expr(text_col: Column, terms: list[str], weight: float = 1.0) -> Column:
    toks = F.filter(F.split(F.lower(F.coalesce(text_col, F.lit(""))), r"\s+"), lambda x: x != "")
    s = F.lit(0)
    for t in terms:
        s = s + term_freq(toks, t.lower())
    return (F.lit(weight) * s).cast("double")


def search_segments(
    segments: DataFrame,
    query: str,
    conv_dim: DataFrame | None = None,
    k: int = 100,
    words_weight: float = 2.0,
    dim_weight: float = 1.0,
) -> DataFrame:
    """Top-k segments for a query string; optional conversation dimension
    joined via seg_id -> conv_id (J3) with its text scored at dim_weight."""
    terms = [t for t in query.lower().split() if t]
    seg = segments.withColumn("conv_id_from_seg", F.split(F.col("seg_id"), "_")[0])
    score = score_expr(F.col("seg_words"), terms, words_weight)
    if conv_dim is not None:
        seg = seg.join(F.broadcast(conv_dim), seg.conv_id_from_seg == conv_dim.dim_conv_id, "left")
        score = score + score_expr(F.col("dim_text"), terms, dim_weight)
    return (
        seg.withColumn("es_score", F.round(score, 6))
        .filter(F.col("es_score") > 0)
        .orderBy(F.desc("es_score"), F.asc("seg_id"))
        .limit(k)
        .select("seg_id", "es_score")
    )


def conv_dimension(transcripts: DataFrame) -> DataFrame:
    """Conversation-level dimension: first texts concatenated (the
    show/episode-description analog, /root/reference/src/search/index.py:151-157)."""
    ordered = F.sort_array(F.collect_list(F.struct(F.col("turn_idx"), F.col("text"))))
    return (
        transcripts.filter(F.col("turn_idx") < 3)
        .groupBy(F.col("conv_id").alias("dim_conv_id"))
        .agg(F.array_join(F.transform(ordered, lambda s: s["text"]), " ").alias("dim_text"))
    )


def search_segments_sql(query: str, k: int = 100, words_weight: float = 2.0, dim_weight: float = 1.0) -> str:
    """DuckDB twin (embed after `WITH transcript AS (...), segments AS (...)`)."""
    terms = [t for t in query.lower().split() if t]

    def tf(expr: str, term: str) -> str:
        toks = f"list_filter(regexp_split_to_array(lower(COALESCE({expr},'')), '\\s+'), x -> x <> '')"
        return f"len(list_filter({toks}, x -> x = '{term}'))"

    seg_score = " + ".join(tf("seg_words", t) for t in terms) or "0"
    dim_score = " + ".join(tf("dim_text", t) for t in terms) or "0"
    return f"""
        , conv_dim AS (
            SELECT conv_id AS dim_conv_id,
                   string_agg(text, ' ' ORDER BY turn_idx) AS dim_text
            FROM transcript WHERE turn_idx < 3 GROUP BY conv_id
        ),
        scored AS (
            SELECT s.seg_id,
                   round({words_weight} * ({seg_score}) + {dim_weight} * (COALESCE({dim_score}, 0)), 6) AS es_score
            FROM segments s
            LEFT JOIN conv_dim d ON string_split(s.seg_id, '_')[1] = d.dim_conv_id
        )
        SELECT seg_id, es_score FROM scored
        WHERE es_score > 0
        ORDER BY es_score DESC, seg_id ASC LIMIT {k}
    """
