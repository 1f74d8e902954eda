"""Continuous incremental feature maintenance: a stream of new turns
drives the partitioned delta-rebuild loop end to end.

Composition of the two production pieces this engine already has:

- the conv_bucket-partitioned storage layout + partition-pruned delta
  rebuild (``plans.backfill.delta_rebuild_partitioned`` /
  ``commit_rebuilt_partitions``), and
- the exactly-once foreachBatch idempotence pattern
  (``streaming.sink.write_stream_checkpointed``).

Storage is a two-table LSM-style shape, chosen so every write is
IDEMPOTENT without a transactional table format:

- ``base``  — the compacted transcript, hive-partitioned by conv_bucket;
- ``log``   — per-batch append directories ``batch=<id>/`` (overwriting
  the same directory on a re-delivered micro-batch converges to the same
  bytes, so the append needs no two-phase commit);
- a rebuild's input snapshot is base ∪ log, pruned to the batch's
  touched buckets; the feature commit is a dynamic partition overwrite
  (re-committing the same buckets with the same content is idempotent).

A crash at ANY point between the log write, the feature commit, and the
manifest commit therefore re-runs the batch to the identical end state —
the manifest entry only short-circuits clean re-deliveries.

``compact_transcript_log`` folds the log back into base (the LSM merge):
run it on whatever cadence keeps the log small; rebuild results are
identical before and after (test-pinned).

Reference analog: the reference's resumable batch lifecycle
(/root/reference/src/features/FeatureExtractor.py:28-44) run forever on
an arriving stream instead of once over a directory listing.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from podcast_audio_feature_extraction_spark.operators.resume import (
    _commit_manifest,
    load_manifest,
)
from podcast_audio_feature_extraction_spark.plans.backfill import (
    FEATURE_COLS,
    N_CONV_BUCKETS,
    build_feature_table,
    commit_rebuilt_partitions,
    conv_bucket_col,
    touched_buckets,
)


def _bucket_pred(buckets: list[int], n_buckets: int):
    """Touched-bucket membership as an expression over conv_id (for the
    small log side, where there is no conv_bucket directory to prune)."""
    return (F.crc32(F.col("conv_id").cast("string")) % n_buckets).cast("int").isin(buckets)


def _rebuild_batch(
    spark: SparkSession,
    batch_stored: DataFrame,
    base_path: str,
    log_path: str,
    features_path: str,
    n_buckets: int,
    **feature_kwargs,
) -> int:
    """Rebuild + commit every bucket the batch touches; returns the
    touched-bucket count. Snapshot = base (partition-pruned) ∪ log
    (already includes this batch's directory)."""
    buckets = touched_buckets(batch_stored, n_buckets)
    if not buckets:
        return 0
    base = (
        spark.read.parquet(base_path)
        .filter(F.col("conv_bucket").isin(buckets))
        .drop("conv_bucket")
    )
    log = spark.read.parquet(log_path).filter(_bucket_pred(buckets, n_buckets))
    log = log.select(*base.columns)  # drop the batch partition column
    rebuilt = build_feature_table(base.unionByName(log), **feature_kwargs).select(*FEATURE_COLS)
    commit_rebuilt_partitions(
        rebuilt.withColumn("conv_bucket", conv_bucket_col(n_buckets)), features_path
    )
    return len(buckets)


def stream_incremental_feature_build(
    new_turns_stream: DataFrame,
    base_path: str,
    log_path: str,
    features_path: str,
    checkpoint_dir: str,
    n_buckets: int = N_CONV_BUCKETS,
    query_name: str = "delta-build-stream",
    trigger_available_now: bool = True,
    **feature_kwargs,
):
    """Start (and return) the streaming query that keeps the partitioned
    feature table current as new turns arrive.

    Per micro-batch: (1) land the batch in its own overwrite-idempotent
    ``log/batch=<id>`` directory, (2) rebuild ONLY the touched
    conv_bucket partitions from base ∪ log, (3) dynamic-partition-
    overwrite the feature table, (4) record the batch in the feature
    manifest. Re-delivered batchIds short-circuit at (4)'s record; every
    earlier step is idempotent on its own (module docstring).
    """
    os.makedirs(log_path, exist_ok=True)
    os.makedirs(features_path, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        manifest = load_manifest(features_path)
        done = manifest.setdefault("delta_batches", {})
        if str(batch_id) in done:
            return  # clean re-delivery: committed end-to-end already
        bdir = os.path.join(log_path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(bdir)
        batch_stored = spark.read.parquet(bdir)
        n_buckets_touched = _rebuild_batch(
            spark, batch_stored, base_path, log_path, features_path, n_buckets, **feature_kwargs
        )
        done[str(batch_id)] = {
            "rows": int(batch_stored.count()),
            "buckets": n_buckets_touched,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _commit_manifest(features_path, manifest)

    writer = (
        new_turns_stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_transcript_log(spark: SparkSession, base_path: str, log_path: str, n_buckets: int = N_CONV_BUCKETS) -> int:
    """LSM merge: fold every log batch into the base transcript's bucket
    partitions (dynamic overwrite of touched buckets only) and clear the
    log. Returns the number of rows folded in. Feature results are
    unaffected — base ∪ log is unchanged as a multiset (test-pinned)."""
    import glob
    import shutil

    if not glob.glob(os.path.join(log_path, "batch=*")):
        return 0
    log = spark.read.parquet(log_path)
    base_cols = [c for c in log.columns if c != "batch"]
    log = log.select(*base_cols)
    n_rows = log.count()
    if n_rows == 0:
        return 0
    buckets = touched_buckets(log, n_buckets)
    base = (
        spark.read.parquet(base_path)
        .filter(F.col("conv_bucket").isin(buckets))
        .drop("conv_bucket")
    )
    merged = base.unionByName(log).withColumn("conv_bucket", conv_bucket_col(n_buckets))
    commit_rebuilt_partitions(merged, base_path)
    for d in glob.glob(os.path.join(log_path, "batch=*")):
        shutil.rmtree(d, ignore_errors=True)
    return n_rows
