"""Engine-side candidate retrieval (SURVEY.md §2.1 S9, §2.6 T1, §2.3 J3).

Replaces the reference's external Elasticsearch dependency
(/root/reference/src/search/search.py:174-214: multi-field BM25 with
``seg_words`` boosted 2x, top ``search_es_num=100``) with an in-engine
scoring expression over the segments table:

    score(seg, q) = sum over query terms of
        2.0 * tf(term, seg_words) + 1.0 * tf(term, conv_name)

tf = term occurrence count (declarative: size(filter(tokens, = term))).
That simple scorer keeps the reference's dataflow shape; :func:`bm25_topk`
below is the full BM25 analog (Lucene idf, k1/b length normalization,
best-fields max with the seg_words^2 boost). Both plan as score expr ->
orderBy desc -> limit k = TakeOrderedAndProject (no global sort
materialization).

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


def _toks(col: Column) -> Column:
    return F.filter(F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"), lambda x: x != "")


def bm25_stats(seg_tokenized: DataFrame, terms: list[str], field_names: list[str]) -> DataFrame:
    """One-pass corpus statistics (N, per-field avgdl, per-term df) as a
    1-row DataFrame. In production this is computed once per index build
    and STORED (the ES-index-stats analog) so each query is a single scan;
    ``bm25_topk`` computes it inline when not supplied."""
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for f in field_names:
        aggs.append(F.avg(F.col(f"__dl_{f}")).alias(f"__avgdl_{f}"))
        for i, t in enumerate(terms):
            aggs.append(
                F.sum(F.array_contains(F.col(f"__toks_{f}"), t).cast("int")).cast("double").alias(f"__df_{f}_{i}")
            )
    return seg_tokenized.agg(*aggs)


def bm25_topk(
    segments: DataFrame,
    query: str,
    conv_dim: DataFrame | None = None,
    k: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
    words_boost: float = 2.0,
    dim_boost: float = 1.0,
    stats: DataFrame | None = None,
) -> DataFrame:
    """In-engine BM25 top-k — the reference's Elasticsearch ``multi_match``
    (/root/reference/src/search/search.py:174-214: fields
    ``seg_words^2, epis_name, epis_desc``, default best_fields = max over
    per-field scores after boost).

    Per field, per term: ``idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with the Lucene idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``; field score =
    sum over query terms; document score = max over boosted fields.

    Scale shape: corpus statistics (N, avgdl, per-term df) come from ONE
    aggregate pass (map-side partial) whose 1-row result is broadcast back
    via crossJoin; scoring is a pure projection; the top-k is
    TakeOrderedAndProject. No per-term join, no shuffle beyond the stats
    agg — the same plan works at any corpus size.
    """
    terms = [t for t in query.lower().split() if t]
    seg = segments.withColumn("conv_id_from_seg", F.split(F.col("seg_id"), "_")[0])
    fields = [("seg_words", words_boost)]
    if conv_dim is not None:
        seg = seg.join(F.broadcast(conv_dim), seg.conv_id_from_seg == conv_dim.dim_conv_id, "left")
        fields.append(("dim_text", dim_boost))
    for f, _ in fields:
        seg = seg.withColumn(f"__toks_{f}", _toks(F.col(f))).withColumn(
            f"__dl_{f}", F.size(F.col(f"__toks_{f}")).cast("double")
        )

    if stats is None:
        stats = bm25_stats(seg, terms, [f for f, _ in fields])
    scored = seg.crossJoin(F.broadcast(stats))

    field_scores = []
    for f, boost in fields:
        contribs = []
        for i, t in enumerate(terms):
            tf = F.size(F.filter(F.col(f"__toks_{f}"), lambda x: x == F.lit(t))).cast("double")
            df = F.col(f"__df_{f}_{i}")
            idf = F.log(F.lit(1.0) + (F.col("__n") - df + F.lit(0.5)) / (df + F.lit(0.5)))
            norm = F.col(f"__dl_{f}") / F.greatest(F.col(f"__avgdl_{f}"), F.lit(1e-9))
            contribs.append(
                F.when(
                    tf > 0,
                    idf * tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm)),
                ).otherwise(F.lit(0.0))
            )
        total = contribs[0]
        for c in contribs[1:]:
            total = total + c
        field_scores.append(F.lit(boost) * total)
    best = field_scores[0] if len(field_scores) == 1 else F.greatest(*field_scores)
    return (
        scored.withColumn("bm25", F.round(best, 6))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("seg_id"))
        .limit(k)
        .select("seg_id", "bm25")
    )


def bm25_topk_sql(
    query: str,
    k: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
    words_boost: float = 2.0,
    dim_boost: float = 1.0,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (embed after
    `WITH transcript AS (...), segments AS (...)`)."""
    terms = [t for t in query.lower().split() if t]

    def toks(expr: str) -> str:
        return f"list_filter(regexp_split_to_array(lower(COALESCE({expr},'')), '\\s+'), x -> x <> '')"

    fields = [("t0", words_boost), ("t1", dim_boost)]
    stats_cols = ["CAST(count(*) AS DOUBLE) AS __n"]
    for f, _ in fields:
        stats_cols.append(f"avg(len({f})) AS __avgdl_{f}")
        for i, t in enumerate(terms):
            stats_cols.append(f"CAST(sum(CAST(list_contains({f}, '{t}') AS INT)) AS DOUBLE) AS __df_{f}_{i}")

    def field_score(f: str) -> str:
        parts = []
        for i, t in enumerate(terms):
            tf = f"CAST(len(list_filter({f}, x -> x = '{t}')) AS DOUBLE)"
            df = f"__df_{f}_{i}"
            idf = f"ln(1.0 + (__n - {df} + 0.5) / ({df} + 0.5))"
            norm = f"CAST(len({f}) AS DOUBLE) / greatest(__avgdl_{f}, 1e-9)"
            parts.append(
                f"CASE WHEN {tf} > 0 THEN {idf} * {tf} * {k1 + 1.0} / "
                f"({tf} + {k1} * ({1.0 - b} + {b} * {norm})) ELSE 0.0 END"
            )
        return " + ".join(parts)

    return f"""
        , conv_dim AS (
            SELECT conv_id AS dim_conv_id,
                   string_agg(text, ' ' ORDER BY turn_idx) AS dim_text
            FROM transcript WHERE turn_idx < 3 GROUP BY conv_id
        ),
        __base AS (
            SELECT s.seg_id, {toks("s.seg_words")} AS t0, {toks("d.dim_text")} AS t1
            FROM segments s
            LEFT JOIN conv_dim d ON string_split(s.seg_id, '_')[1] = d.dim_conv_id
        ),
        __stats AS (SELECT {", ".join(stats_cols)} FROM __base),
        __scored AS (
            SELECT seg_id,
                   round(greatest({words_boost} * ({field_score("t0")}),
                                  {dim_boost} * ({field_score("t1")})), 6) AS bm25
            FROM __base CROSS JOIN __stats
        )
        SELECT seg_id, bm25 FROM __scored
        WHERE bm25 > 0
        ORDER BY bm25 DESC, seg_id ASC LIMIT {k}
    """


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
