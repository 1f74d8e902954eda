"""Shared localCheckpoint lifecycle helpers.

``DataFrame.unpersist()`` is a NO-OP for localCheckpoint output (it only
clears SQL-cache-manager entries; the checkpoint persists the internal
RDD directly — verified empirically via ``sc.getPersistentRDDs``). The
checkpointed DataFrame's analyzed plan is a LogicalRDD wrapping exactly
that RDD, so unpersist it there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
