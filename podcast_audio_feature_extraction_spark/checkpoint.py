"""Shared localCheckpoint lifecycle helpers.

``DataFrame.unpersist()`` is a NO-OP for localCheckpoint output (it only
clears SQL-cache-manager entries; the checkpoint persists the internal
RDD directly — verified empirically via ``sc.getPersistentRDDs``). The
checkpointed DataFrame's analyzed plan is a LogicalRDD wrapping exactly
that RDD, so unpersist it there.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_SWAP_LOCK = threading.Lock()


def swap_cached(slot: list, df: DataFrame) -> DataFrame:
    """Single-slot cache lifecycle for operators whose plan references a
    derived table twice (self-joins, stats+scoring passes): persist
    ``df`` (LAZY — no job at plan-construction time; the first action
    computes the subtree once and both references read the cache),
    unpersist the slot's previous occupant, store and return.

    persist — NOT localCheckpoint — on purpose: unpersisting a persisted
    DataFrame that some caller still holds merely degrades that caller
    to recomputation from the intact lineage, whereas unpersisting a
    localCheckpoint (truncated lineage) would make the older result
    UNREADABLE ('checkpoint block not found'). The single slot bounds
    block-manager growth across repeated calls in one session.

    LIMITATION — one live plan per operator slot: constructing a second
    query through the same slot (e.g. two minhash_lsh_pairs plans built
    before either executes) unpersists the first plan's cache before it
    ever fills, so the earlier query silently reverts to full recompute
    of the derived table (correct results, cache win gone). Interleaved
    multi-query builds that need both caches live should persist()/
    unpersist() explicitly at the call site instead.
    """
    with _SWAP_LOCK:  # concurrent plan construction from driver threads
        prev = slot[0]
        if prev is not None:
            try:
                prev.unpersist(False)
            except Exception:
                pass
        out = df.persist()
        slot[0] = out
    return out


def free_local_checkpoint(ckpt_df: DataFrame | None) -> None:
    """Release a localCheckpoint's block-manager storage (best-effort: if
    the internal accessor ever moves, leaking the old behavior —
    checkpoints freed at session end — beats failing the job)."""
    if ckpt_df is None:
        return
    try:
        ckpt_df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
