"""Exactly-once streaming sink into the engine's manifest table.

The batch path lands features via run_resumable (bucket checkpoints); the
streaming path uses the canonical foreachBatch idempotence pattern:
Structured Streaming may RE-DELIVER a micro-batch after a failure with the
same batchId, so the sink records committed batchIds in the same JSON
manifest the batch writer uses and skips re-delivered ones — data lands
at most once per batch even across query restarts.

Layout: ``{out_dir}/batch={id}/part-*.parquet`` + ``_manifest.json`` with
a ``stream_batches`` section (rows, committed_at per batch).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame

from podcast_audio_feature_extraction_spark.operators.resume import (
    MANIFEST_NAME,
    _commit_manifest,
    load_manifest,
)


def write_stream_checkpointed(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
    query_name: str = "feature-stream",
):
    """Start (and return) a streaming query landing each micro-batch into
    ``out_dir`` exactly once. ``transform(df) -> df`` runs per batch
    (defaults to identity)."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        manifest = load_manifest(out_dir)
        done = manifest.setdefault("stream_batches", {})
        if str(batch_id) in done:
            return  # re-delivered batch: already committed, skip
        out = transform(batch_df) if transform is not None else batch_df
        path = os.path.join(out_dir, f"batch={batch_id}")
        out.write.mode("overwrite").parquet(path)
        n = out.sparkSession.read.parquet(path).count()  # footer-metadata count
        done[str(batch_id)] = {
            "rows": int(n),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _commit_manifest(out_dir, manifest)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
