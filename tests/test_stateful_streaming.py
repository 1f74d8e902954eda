import time

import numpy as np
import pyspark.sql.functions as F

from podcast_audio_feature_extraction_spark.operators.sessionize import sessionize
from podcast_audio_feature_extraction_spark.schema import TRANSCRIPT_SCHEMA
from podcast_audio_feature_extraction_spark.streaming.stateful import running_session_features

GAP = 1800.0


def _batch_reference(spark, transcripts_sdf):
    """Batch twin: sessionize + running counts via window functions."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx").rowsBetween(Window.unboundedPreceding, 0)
    tok = F.size(F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"), lambda x: x != ""))
    return (
        sessionize(transcripts_sdf, gap_s=GAP)
        .withColumn("turns_so_far", F.count(F.lit(1)).over(w))
        .withColumn("tokens_so_far", F.sum(tok).over(w))
        .select("conv_id", "turn_idx", "ts", "session_id", "turns_so_far", "tokens_so_far")
    )


def test_stateful_stream_matches_batch(spark, transcripts_pdf, tmp_path):
    """Feed the transcript in 3 time-ordered micro-batches; the stateful
    fold's final outputs must equal the batch sessionize+running-counts."""
    pdf = transcripts_pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    thirds = np.array_split(pdf, 3)
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    for i, chunk in enumerate(thirds):
        # distinct mtimes so the file source discovers them in time order
        spark.createDataFrame(chunk.reset_index(drop=True), schema=TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"batch_{i}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/batch_*")
    )
    q = (
        running_session_features(stream, gap_s=GAP)
        .writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("stateful_sessions")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    sdf = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    want = (
        _batch_reference(spark, sdf)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("session_id", "turns_so_far", "tokens_so_far"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def test_stateful_asof_enrich_matches_batch_asof(spark, transcripts_pdf, tmp_path):
    """The O(1)-state streaming as-of over a tagged feature+query stream
    must equal the batch as-of join on the same data, across time-ordered
    micro-batches (zero leakage evaluated incrementally)."""
    import pandas as pd
    from pyspark.sql import types as T

    from podcast_audio_feature_extraction_spark.operators.asof import asof_join
    from podcast_audio_feature_extraction_spark.streaming.stateful import stateful_asof_enrich

    rng = np.random.default_rng(5)
    pdf = transcripts_pdf.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    # assistant turns publish a feature vector; user turns query
    is_feat = pdf["role"].eq("assistant")
    tagged = pdf.assign(
        side=np.where(is_feat, "f", "q"),
        functionals=[
            [float(i), float(i % 7)] if f else None for i, f in enumerate(is_feat)
        ],
    )[["conv_id", "turn_idx", "ts", "side", "functionals"]]

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("side", T.StringType(), False),
            T.StructField("functionals", T.ArrayType(T.DoubleType()), True),
        ]
    )
    in_dir = tmp_path / "asof_stream_in"
    in_dir.mkdir()
    for i, chunk in enumerate(np.array_split(tagged, 3)):
        spark.createDataFrame(chunk.reset_index(drop=True), schema=schema).coalesce(1).write.parquet(
            str(in_dir / f"batch_{i}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/batch_*")
    )
    q = (
        stateful_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("stateful_asof")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def canon(df):
        return (
            df.select(
                "conv_id", "turn_idx", "feat_turn_idx",
                F.col("functionals").cast("string").alias("functionals"),
            )
            .toPandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    got = canon(spark.table("stateful_asof"))

    all_sdf = spark.createDataFrame(tagged, schema=schema)
    left = all_sdf.filter("side = 'q'").select("conv_id", "turn_idx", "ts")
    right = all_sdf.filter("side = 'f'").select(
        "conv_id", F.col("turn_idx").alias("feat_turn_idx"), "ts", "functionals"
    )
    want = canon(
        asof_join(
            left, right, value_cols=["feat_turn_idx", "functionals"],
            right_tie_cols=["feat_turn_idx"], left_tie_cols=["turn_idx"],
        )
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stateful_asof_tolerance_nulls_stale_features(spark, tmp_path):
    """tolerance_s must null out features older than the bound — same
    semantics as the batch as-of tolerance (batch mode of the fold)."""
    import pandas as pd
    from pyspark.sql import types as T

    from podcast_audio_feature_extraction_spark.streaming.stateful import stateful_asof_enrich

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("side", T.StringType(), False),
            T.StructField("functionals", T.ArrayType(T.DoubleType()), True),
        ]
    )
    rows = [
        ("c", 0, pd.Timestamp(100, unit="s"), "f", [1.0]),
        ("c", 1, pd.Timestamp(130, unit="s"), "q", None),   # 30s old: fresh
        ("c", 2, pd.Timestamp(300, unit="s"), "q", None),   # 200s old: stale
        ("c", 3, pd.Timestamp(310, unit="s"), "f", [2.0]),
        ("c", 4, pd.Timestamp(315, unit="s"), "q", None),   # 5s old: fresh
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=schema.names), schema=schema)
    in_dir = str(tmp_path / "tol_in")
    sdf.coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        stateful_asof_enrich(stream, tolerance_s=60.0)
        .writeStream.format("memory").queryName("tol_asof")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("tol_asof").toPandas().sort_values("turn_idx").reset_index(drop=True)
    assert list(got["turn_idx"]) == [1, 2, 4]
    assert got.loc[0, "functionals"] is not None and list(got.loc[0, "functionals"]) == [1.0]
    assert got.loc[1, "functionals"] is None or pd.isna(got.loc[1, "functionals"])
    assert list(got.loc[2, "functionals"]) == [2.0]


def test_stateful_asof_ordering_violation_raises(spark, tmp_path):
    """A micro-batch regressing below the key's processed (ts, turn_idx)
    watermark violates the cross-batch ordering contract — the fold must
    raise (silently folding it would produce leaky/missing enrichments)."""
    import pandas as pd
    import pyspark.sql.utils
    import pytest
    from pyspark.sql import types as T

    from podcast_audio_feature_extraction_spark.streaming.stateful import stateful_asof_enrich

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("side", T.StringType(), False),
            T.StructField("functionals", T.ArrayType(T.DoubleType()), True),
        ]
    )
    in_dir = tmp_path / "ooo_in"
    in_dir.mkdir()
    b0 = [("c", 0, pd.Timestamp(100, unit="s"), "f", [1.0]),
          ("c", 1, pd.Timestamp(200, unit="s"), "q", None)]
    b1 = [("c", 2, pd.Timestamp(150, unit="s"), "q", None)]  # regression
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=schema.names), schema=schema
        ).coalesce(1).write.parquet(str(in_dir / f"batch_{i}"))
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/batch_*")
    )
    q = (
        stateful_asof_enrich(stream)
        .writeStream.format("memory").queryName("ooo_asof")
        .outputMode("append").trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="ordering contract violated"):
        q.awaitTermination()


def test_stateful_asof_ttl_fold_branches():
    """The TTL fold branches, unit-tested against a fake GroupState (a
    ProcessingTimeTimeout query only terminates under a processing-time
    trigger, so the streaming-e2e form is exercised in continuous runs,
    not under availableNow — see the operator docstring):
    - a timed-out invocation removes state and emits nothing;
    - a live batch sets the timeout duration after updating state."""
    import pandas as pd

    from podcast_audio_feature_extraction_spark.streaming.stateful import _make_asof_fold

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self.removed = False
            self.updated = None
            self.timeout_ms = None

        @property
        def get(self):
            raise AssertionError("get on non-existent state")

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    fold = _make_asof_fold(True, None, ttl_ms=60_000)

    timed_out = FakeState()
    timed_out.hasTimedOut = True
    assert list(fold(("c",), iter([]), timed_out)) == []
    assert timed_out.removed

    live = FakeState()
    batch = pd.DataFrame(
        {
            "conv_id": ["c", "c"],
            "turn_idx": [0, 1],
            "ts": [pd.Timestamp(100, unit="s"), pd.Timestamp(130, unit="s")],
            "side": ["f", "q"],
            "functionals": [[3.0], None],
        }
    )
    out = pd.concat(list(fold(("c",), iter([batch]), live)), ignore_index=True)
    assert list(out["turn_idx"]) == [1] and list(out.loc[0, "functionals"]) == [3.0]
    assert live.timeout_ms == 60_000
    # state carries (feat..., watermark) — 5 fields
    assert len(live.updated) == 5 and live.updated[3] == 130_000_000
