"""Flagship pipeline (SURVEY.md §3.1 / §7.2): feature extraction + as-of backfill.

transcripts
  -> sessionize (gap cutoff)
  -> per-turn rolling functionals (native window exprs)
  -> deterministic hash embedding (Arrow pandas UDF)
  -> feature table (conv_id, turn_idx, ts, session_id, functionals, embedding)
  -> as-of backfill join onto a query/point-in-time frame (zero leakage)

Mirrors the reference's create_opensmile_features.py lifecycle
(/root/reference/src/features/create_opensmile_features.py:17-36) with
Spark-native staging: one shuffle for the window pass (conv_id), one for
the as-of union-trick. At 100 TB both shuffles hash-partition on conv_id;
viral-conversation skew is bounded because every operator here is
sequential *within* a conversation and AQE splits oversized partitions
across the remaining stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from podcast_audio_feature_extraction_spark.functions.embedding import with_embedding
from podcast_audio_feature_extraction_spark.operators.asof import asof_join
from podcast_audio_feature_extraction_spark.operators.rolling import assemble_functionals, turn_features
from podcast_audio_feature_extraction_spark.operators.sessionize import sessionize

FEATURE_COLS = ["conv_id", "turn_idx", "ts", "session_id", "functionals", "embedding"]


def build_feature_table(
    transcripts: DataFrame,
    gap_s: float = 1800.0,
    k: int = 5,
    embed_dim: int = 64,
    val_col: str | None = "val",
) -> DataFrame:
    """transcripts -> per-turn feature table (the backfill right side)."""
    df = sessionize(transcripts, gap_s=gap_s)
    df = turn_features(df, k=k, val_col=val_col)
    df = assemble_functionals(df)
    df = with_embedding(df, dim=embed_dim)
    return df.select(*FEATURE_COLS)


def backfill_features(
    frame: DataFrame,
    feature_table: DataFrame,
    strategy: str = "union",
    inclusive: bool = True,
) -> DataFrame:
    """Attach the latest feature vector at or before each frame row's
    (ts, turn_idx).

    ``frame`` needs (conv_id, ts); if it also carries turn_idx the as-of
    uses per-turn paired-tie semantics (a feature from the same second but
    a later turn is never read — zero leakage at turn granularity).
    Feature provenance columns are renamed so they never collide.
    """
    right = (
        feature_table.withColumnRenamed("turn_idx", "feat_turn_idx")
        .withColumnRenamed("session_id", "feat_session_id")
    )
    paired = strategy in ("union", "compact") and "turn_idx" in frame.columns
    if strategy == "compact":
        # two-phase as-of (generic asof_join_compact): the union-trick sort
        # touches only narrow key rows — the wide functionals/embedding
        # arrays move exactly once through the resolving hash join.
        return asof_join(
            frame,
            right,
            on="conv_id",
            ts_col="ts",
            value_cols=["feat_session_id", "functionals", "embedding"],
            inclusive=inclusive,
            strategy="compact",
            right_tie_cols=["feat_turn_idx"],
            left_tie_cols=["turn_idx"] if paired else None,
        )
    return asof_join(
        frame,
        right,
        on="conv_id",
        ts_col="ts",
        value_cols=["feat_turn_idx", "feat_session_id", "functionals", "embedding"],
        inclusive=inclusive,
        strategy=strategy,
        right_tie_cols=["feat_turn_idx"] if strategy == "union" else None,
        left_tie_cols=["turn_idx"] if paired else None,
    )


def build_feature_table_incremental(
    transcripts: DataFrame,
    new_turns: DataFrame,
    stored_features: DataFrame,
    gap_s: float = 1800.0,
    k: int = 5,
    embed_dim: int = 64,
    val_col: str | None = "val",
    collect_filter_threshold: int = 10_000,
) -> DataFrame:
    """Incremental (delta) feature build: when ``new_turns`` arrive,
    recompute features ONLY for the conversations they touch and keep
    every other conversation's stored rows verbatim.

    The unit of incremental work is the CONVERSATION: session ids and
    rolling/lag features depend on a conversation's whole history, so a
    new turn can change its conversation's earlier feature rows
    (session_len, lead context) but can never affect another
    conversation. At 10^12-turn scale this is the difference between
    re-aggregating the world and touching the ~10^-5 of it that moved:

    - ``touched`` is the distinct conv_id set of the delta (small);
    - the rebuild input is one broadcast LEFT-SEMI join (partition-pruned
      further if the transcript table is partitioned/bucketed by conv_id);
    - untouched rows come from the stored table via broadcast LEFT-ANTI —
      a scan + filter, no shuffle of the big side.

    Result is row-identical to a full :func:`build_feature_table` over
    ``transcripts`` (test-pinned).

    ``transcripts`` must already INCLUDE the new turns (it is the current
    snapshot — e.g. the table after the delta's append commit).

    ``collect_filter_threshold``: when the touched set is at most this
    many conversations (the typical delta — it is the POINT of the
    incremental path), the conv_id list is collected and applied as an
    ``isin`` PREDICATE instead of a semi-join. A join cannot move below
    the derivation's Window, but a deterministic predicate on the
    window's own partition key pushes through it (plan-asserted), so
    only the touched conversations' rows ever reach the feature shuffle
    — and when the transcript is a STORED table whose conv_id is a real
    column (the production deployment), the same predicate lands in the
    parquet scan as `PushedFilters: In(conv_id, ...)` / partition
    pruning. The kept side gets the complementary NOT-In pushed into
    the stored table's scan. Set to 0 to force the pure-join form
    (unbounded touched sets). Measured at sf0.1 (~1% touched):
    full 2.05 s, join form 1.60 s, predicate form 1.29 s — the residual
    floor is materializing the kept side's output rows, which a
    partition-overwrite sink does not pay (that shape is
    :func:`delta_rebuild_partitioned` + :func:`commit_rebuilt_partitions`).

    NOTE: with ``collect_filter_threshold > 0`` this function runs an
    EAGER bounded collect job (``touched.limit(threshold + 1).collect()``)
    at plan-construction time, which also evaluates the ``new_turns``
    subtree once here and once via the returned plan. Callers that need a
    pure/lazy builder (plan-shape tooling, cheap new_turns recomputation
    not guaranteed) should pass ``collect_filter_threshold=0``.
    """
    from pyspark.sql import functions as F

    touched = new_turns.select("conv_id").distinct()
    ids = None
    if collect_filter_threshold > 0:
        head = touched.limit(collect_filter_threshold + 1).collect()
        if len(head) <= collect_filter_threshold:
            # drop NULL keys from the In-list: a NULL conv_id matches
            # nothing in the join form either (left_semi never matches
            # NULL), and a None inside isin() would make NOT-In
            # three-valued-NULL for EVERY row and silently empty the
            # kept side
            ids = [r["conv_id"] for r in head if r["conv_id"] is not None]
    if ids is not None:
        rebuild_src = transcripts.filter(F.col("conv_id").isin(ids))
        # keep NULL-keyed stored rows (the anti join keeps them too):
        # ~In is NULL, not TRUE, for a NULL key
        kept = stored_features.filter(
            ~F.col("conv_id").isin(ids) | F.col("conv_id").isNull()
        ).select(*FEATURE_COLS)
    else:
        bt = F.broadcast(touched)
        rebuild_src = transcripts.join(bt, "conv_id", "left_semi")
        kept = stored_features.join(bt, "conv_id", "left_anti").select(*FEATURE_COLS)
    rebuilt = build_feature_table(
        rebuild_src,
        gap_s=gap_s,
        k=k,
        embed_dim=embed_dim,
        val_col=val_col,
    )
    return kept.unionByName(rebuilt)


N_CONV_BUCKETS = 512


def conv_bucket_col(n_buckets: int = N_CONV_BUCKETS):
    """Deterministic conversation -> partition bucket (crc32 of the utf-8
    conv_id, mod ``n_buckets``). crc32 is the same polynomial in Spark and
    Python's zlib, so the driver side can compute a delta's touched-bucket
    list without a Spark job (test-pinned)."""
    from pyspark.sql import functions as F

    return (F.crc32(F.col("conv_id").cast("string")) % n_buckets).cast("int")


def write_conv_partitioned(
    df: DataFrame, path: str, n_buckets: int = N_CONV_BUCKETS, mode: str = "overwrite"
) -> None:
    """Store a conv_id-keyed table hive-partitioned by ``conv_bucket`` —
    the production layout for incremental rebuilds: a delta touching c
    conversations rewrites at most c partitions and the rebuild scan
    reads only those directories (partition pruning, no file row-group
    even opened for untouched buckets).

    Granularity trade: corpus_bytes / n_buckets is the rewrite
    amplification unit (a touched bucket is rebuilt whole). Pick
    n_buckets >> typical delta's conversation count but small enough
    that a bucket is still a healthy parquet file set (e.g. 100 TB /
    8192 buckets = ~12 GB/bucket). repartition by bucket first so each
    bucket is written by one task (one file per bucket, not
    tasks x buckets tiny files)."""
    (
        df.withColumn("conv_bucket", conv_bucket_col(n_buckets))
        .repartition("conv_bucket")
        .write.partitionBy("conv_bucket")
        .mode(mode)
        .parquet(path)
    )


def touched_buckets(new_turns: DataFrame, n_buckets: int = N_CONV_BUCKETS, max_collect: int = 100_000) -> list[int]:
    """Distinct bucket ids the delta touches, computed driver-side with
    zlib.crc32 (== Spark crc32; parity test-pinned). EAGER bounded
    collect of the distinct conv_id set — raises if the delta touches
    more than ``max_collect`` conversations (at that size rebuild the
    table instead of enumerating partitions)."""
    import zlib

    from pyspark.sql import functions as F

    # NULL keys are dropped from the RESULT anyway — filtering before the
    # limit keeps a NULL row from spuriously tripping the max_collect
    # bound when the delta has exactly max_collect real conversations
    rows = (
        new_turns.select("conv_id")
        .filter(F.col("conv_id").isNotNull())
        .distinct()
        .limit(max_collect + 1)
        .collect()
    )
    if len(rows) > max_collect:
        raise ValueError(
            f"delta touches > {max_collect} conversations — use a full rebuild "
            "(partition enumeration no longer pays)"
        )
    return sorted(
        {zlib.crc32(r["conv_id"].encode()) % n_buckets for r in rows if r["conv_id"] is not None}
    )


def delta_rebuild_partitioned(
    spark,
    transcript_path: str,
    new_turns: DataFrame,
    n_buckets: int = N_CONV_BUCKETS,
    gap_s: float = 1800.0,
    k: int = 5,
    embed_dim: int = 64,
    val_col: str | None = "val",
) -> DataFrame:
    """Production-shape delta build over a STORED transcript partitioned
    by conv_bucket (:func:`write_conv_partitioned`): the rebuild reads
    ONLY the delta's touched partitions (PartitionFilters prune the
    directory listing — plan-asserted) and recomputes every conversation
    in them (the bucket is the rewrite unit, so bucket-mates of a touched
    conversation are rebuilt too — identical rows, they land in the same
    overwritten partition).

    The stored transcript must already include the new turns (same
    snapshot contract as :func:`build_feature_table_incremental`).
    Returns the rebuilt feature rows WITH conv_bucket, ready for
    :func:`commit_rebuilt_partitions`; unlike the In-predicate form this
    path never reads — let alone materializes — the untouched ~99%.

    NULL-keyed delta rows touch nothing: a NULL conv_id belongs to no
    conversation (:func:`touched_buckets` drops them — the same semantics
    as the In-predicate/semi-join forms, where NULL matches no key)."""
    from pyspark.sql import functions as F

    buckets = touched_buckets(new_turns, n_buckets)
    src = spark.read.parquet(transcript_path).filter(F.col("conv_bucket").isin(buckets))
    rebuilt = build_feature_table(
        src.drop("conv_bucket"), gap_s=gap_s, k=k, embed_dim=embed_dim, val_col=val_col
    )
    return rebuilt.withColumn("conv_bucket", conv_bucket_col(n_buckets))


def commit_rebuilt_partitions(rebuilt: DataFrame, features_path: str) -> None:
    """Dynamic partition overwrite: replaces exactly the conv_bucket
    partitions present in ``rebuilt``; every other partition's files are
    untouched (no read, no rewrite) — this is why the incremental path's
    cost tracks the touched fraction instead of the kept-side
    materialization floor (build_feature_table_incremental's docstring)."""
    spark = rebuilt.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            rebuilt.repartition("conv_bucket")
            .write.partitionBy("conv_bucket")
            .mode("overwrite")
            .parquet(features_path)
        )
    finally:
        spark.conf.set(key, prev)


def flagship(transcripts: DataFrame, gap_s: float = 1800.0, k: int = 5, strategy: str = "union") -> DataFrame:
    """End-to-end single-plan form: build features then backfill them onto
    the turns frame itself (every turn gets the feature vector visible at
    its own ts).

    strategy="union" keeps one plan with no recomputation. The "compact"
    strategy references the feature table twice, so it belongs with a
    STORED feature table (the production precompute-then-lookup shape,
    search.py:324-353) where the second reference is a column-pruned scan
    — see bench.py's two-phase flagship."""
    feats = build_feature_table(transcripts, gap_s=gap_s, k=k)
    frame = transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
    return backfill_features(frame, feats, strategy=strategy)
