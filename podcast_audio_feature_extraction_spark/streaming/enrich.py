"""Streaming as-of enrichment (SURVEY.md §2.9 + §2.3 J4 combined).

Serving-time shape of the backfill: a live turn stream is enriched with
the latest STORED feature vector at or before each event's ts — the same
zero-temporal-leakage contract as the batch as-of
(/root/reference/src/search/search.py:311-353 precompute-then-lookup),
continuously.

Structured Streaming cannot express "latest right row <= ts" as a
stream-static join directly (it needs a per-row aggregate over the static
side), so the engine uses the canonical micro-batch pattern: foreachBatch
hands each micro-batch to the BATCH as-of operator against the stored
feature table. Semantics are therefore exactly the batch operator's
(paired ties, tolerance, struct payload) — one code path, test-pinned —
and exactly-once delivery comes from the same manifest idempotence as
write_stream_checkpointed.

Scale notes: the per-batch as-of shuffles only the micro-batch (small) +
the feature-table partitions it touches; with the feature table stored
bucketed by conv_id the join side is pruned to matching buckets. For
sub-second latency a stateful `transformWithState` keeping the newest
feature per conv_id in state would avoid the per-batch scan; the
micro-batch form is the exactly-once, arbitrary-tolerance default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from podcast_audio_feature_extraction_spark.plans.backfill import backfill_features
from podcast_audio_feature_extraction_spark.streaming.sink import write_stream_checkpointed


def enrich_stream_with_features(
    turn_stream: DataFrame,
    feature_table: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    strategy: str = "union",
    query_name: str = "asof-enrich-stream",
):
    """Start (and return) a streaming query that as-of-enriches each
    micro-batch of ``turn_stream`` against the stored ``feature_table``
    and lands it exactly once under ``out_dir``.

    ``feature_table`` is a BATCH DataFrame (the stored table); re-read it
    per run to pick up new snapshots. The output rows carry the input
    columns plus (feat_turn_idx, feat_session_id, functionals, embedding).
    """
    return write_stream_checkpointed(
        turn_stream,
        out_dir,
        checkpoint_dir,
        transform=lambda batch: backfill_features(batch, feature_table, strategy=strategy),
        query_name=query_name,
    )
