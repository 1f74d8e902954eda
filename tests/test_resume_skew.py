import json
import os

import pyspark.sql.functions as F

from podcast_audio_feature_extraction_spark.operators.resume import load_manifest, run_resumable
from podcast_audio_feature_extraction_spark.operators.skew import (
    detect_heavy_keys,
    salted_agg,
    repartition_range_sorted,
)
from podcast_audio_feature_extraction_spark.plans.backfill import build_feature_table


def _transform(df):
    return build_feature_table(df.drop("bucket"), gap_s=1800.0, k=3, val_col=None)


def test_resume_skips_completed_buckets(spark, transcripts_sdf, tmp_path):
    out = str(tmp_path / "features")
    run1 = run_resumable(_transform, transcripts_sdf, out, n_buckets=4, batch_size=2, run_id="r1")
    assert sorted(run1["computed_buckets"]) == [0, 1, 2, 3]
    total = run1["rows_out"]
    assert total == transcripts_sdf.count()

    # simulate a partial run: drop two buckets from the manifest and delete
    # their data — rerun must recompute exactly those
    mpath = os.path.join(out, "_manifest.json")
    m = json.load(open(mpath))
    removed = ["2", "3"]
    for b in removed:
        del m["buckets"][b]
    json.dump(m, open(mpath, "w"))
    run2 = run_resumable(_transform, transcripts_sdf, out, n_buckets=4, batch_size=2, run_id="r2")
    assert sorted(run2["computed_buckets"]) == [2, 3]
    assert sorted(run2["resumed_buckets"]) == [0, 1]

    # final table identical to a fresh single-shot run
    got = spark.read.parquet(out).drop("bucket")
    fresh = _transform(transcripts_sdf)
    assert got.count() == fresh.count()
    key_sum = lambda df: df.agg(F.sum(F.crc32(F.concat_ws("|", "conv_id", "turn_idx"))).alias("s")).first()["s"]
    assert key_sum(got) == key_sum(fresh)

    man = load_manifest(out)
    assert len(man["runs"]) == 2
    assert all("rows" in v and "wall_s" in v for v in man["buckets"].values())


def test_noop_rerun_computes_nothing(spark, transcripts_sdf, tmp_path):
    out = str(tmp_path / "features2")
    run_resumable(_transform, transcripts_sdf, out, n_buckets=2, batch_size=2)
    run2 = run_resumable(_transform, transcripts_sdf, out, n_buckets=2, batch_size=2)
    assert run2["computed_buckets"] == []
    assert run2["rows_out"] == 0


def test_salted_agg_matches_plain(spark, transcripts_sdf):
    plain = (
        transcripts_sdf.groupBy("conv_id")
        .agg(
            F.count("text").alias("n"),
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.sum(F.length("text")).alias("chars"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            transcripts_sdf,
            "conv_id",
            {"n": ("count", "text"), "mn": ("min", "turn_idx"), "mx": ("max", "turn_idx"),
             "chars": ("sum", F.length("text"))},
            n_salts=4,
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for c in ("n", "mn", "mx", "chars"):
        assert (plain[c].to_numpy() == salted[c].to_numpy()).all(), c


def test_detect_heavy_keys(spark, transcripts_sdf):
    heavy = detect_heavy_keys(transcripts_sdf, min_rows=100).toPandas()
    counts = transcripts_sdf.groupBy("conv_id").count().toPandas()
    assert set(heavy["conv_id"]) == set(counts[counts["count"] >= 100]["conv_id"])


def test_repartition_range_sorted_is_sorted(spark, transcripts_sdf):
    rp = repartition_range_sorted(transcripts_sdf, num_partitions=4)

    def check_sorted(it):
        prev = None
        for row in it:
            key = (row["conv_id"], row["ts"])
            assert prev is None or key >= prev
            prev = key
        return iter([])

    rp.rdd.mapPartitions(lambda it: check_sorted(it)).count()


def test_resume_executes_transform_once_per_batch(spark, transcripts_sdf, tmp_path):
    """The per-bucket row counts must ride the write job (df.observe), not
    re-execute the transform (round-1 paid 2x compute per batch)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import IntegerType

    acc = spark.sparkContext.accumulator(0)

    @F.udf(IntegerType())
    def probe(x):
        acc.add(1)
        return 1

    def counting_transform(df):
        return df.withColumn("probe", probe(df["turn_idx"]))

    out = str(tmp_path / "once")
    run = run_resumable(counting_transform, transcripts_sdf, out, n_buckets=2, batch_size=2)
    assert run["rows_out"] == transcripts_sdf.count()
    # each row crosses the UDF exactly once (small slack for task retries)
    assert acc.value == run["rows_out"]


def test_write_features_zstd_sorted(spark, transcripts_sdf, tmp_path):
    import pyarrow.parquet as pq
    from podcast_audio_feature_extraction_spark.operators.resume import write_features

    out = str(tmp_path / "feat_sink")
    write_features(transcripts_sdf.repartition(2, "conv_id"), out)
    import glob
    files = glob.glob(out + "/*.parquet")
    assert files
    md = pq.ParquetFile(files[0]).metadata
    assert "ZSTD" in str(md.row_group(0).column(0).compression).upper()
    # rows inside each file are (conv_id, turn_idx)-sorted
    pdf = pq.read_table(files[0]).to_pandas()
    key = list(zip(pdf["conv_id"], pdf["turn_idx"]))
    assert key == sorted(key)


def test_compact_buckets_preserves_rows(spark, transcripts_sdf, tmp_path):
    import glob
    from podcast_audio_feature_extraction_spark.operators.resume import compact_buckets

    import os
    import shutil

    out = str(tmp_path / "compactable")
    run_resumable(lambda df: df, transcripts_sdf, out, n_buckets=2, batch_size=1)
    # fragment each bucket into several files (what many small incremental
    # batches would leave behind) without changing its rows
    for b in (0, 1):
        bdir = f"{out}/bucket={b}"
        frag = spark.read.parquet(bdir).repartition(4)
        frag.write.mode("overwrite").parquet(bdir + ".tmp")
        shutil.rmtree(bdir)
        os.replace(bdir + ".tmp", bdir)
    # snapshot BEFORE compaction (materialized: the rewrite invalidates
    # any DataFrame still holding the old file listing)
    a = spark.read.parquet(out).orderBy("conv_id", "turn_idx").toPandas()
    files_before = len(glob.glob(out + "/bucket=*/*.parquet"))
    stats = compact_buckets(spark, out, files_per_bucket=1)
    files_after = len(glob.glob(out + "/bucket=*/*.parquet"))
    assert files_after == 2 and files_before > files_after
    assert sorted(stats["compacted"]) == [0, 1]
    b = spark.read.parquet(out).orderBy("conv_id", "turn_idx").toPandas()
    assert len(a) == len(b)
    assert (a["conv_id"].to_numpy() == b["conv_id"].to_numpy()).all()
    assert (a["turn_idx"].to_numpy() == b["turn_idx"].to_numpy()).all()


def test_compact_buckets_repairs_interrupted_swap(spark, transcripts_sdf, tmp_path):
    import os
    from podcast_audio_feature_extraction_spark.operators.resume import compact_buckets

    out = str(tmp_path / "repairable")
    run_resumable(lambda df: df, transcripts_sdf, out, n_buckets=2, batch_size=2)
    rows = spark.read.parquet(out).count()
    # simulate a crash between the two renames: bucket=0 moved aside, not replaced
    os.rename(f"{out}/bucket=0", f"{out}/bucket=0.old")
    stats = compact_buckets(spark, out, files_per_bucket=1)
    assert stats["repaired"] == ["bucket=0"]
    assert spark.read.parquet(out).count() == rows  # nothing lost


def _zipf_frame(spark):
    """1 viral conversation (600 turns) + 30 light ones (10 turns each)."""
    import pandas as pd

    rows = []
    for conv, n in [("viral", 600)] + [(f"c{i}", 10) for i in range(30)]:
        for t in range(n):
            rows.append((conv, t, "user" if t % 3 else "assistant",
                         f"w{t % 17} x{t % 5}", pd.Timestamp(1_700_000_000 + t * 7, unit="s")))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "ts"])
    )


def test_skew_guarded_agg_matches_plain(spark):
    from podcast_audio_feature_extraction_spark.operators.skew import skew_guarded_agg

    df = _zipf_frame(spark).withColumn("v", F.col("turn_idx").cast("double"))
    aggs = {"n": ("count", "v"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")}
    guarded = (
        skew_guarded_agg(df, "conv_id", aggs, heavy_min_rows=100, n_salts=4)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    plain = (
        df.groupBy("conv_id")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(guarded[plain.columns], plain, check_dtype=False)


def test_salted_collect_sorted_matches_unsalted(spark):
    from podcast_audio_feature_extraction_spark.operators.skew import salted_collect_sorted

    df = _zipf_frame(spark)
    got = (
        salted_collect_sorted(df, "conv_id", ["turn_idx", "text"], out_col="items", n_salts=4)
        .select("conv_id", F.col("items").cast("string").alias("items"))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    want = (
        df.groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(F.struct("turn_idx", "text"))).alias("items"))
        .select("conv_id", F.col("items").cast("string").alias("items"))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_build_segments_salted_matches_unsalted(spark):
    """The viral-conversation guard in build_segments (skew_salts) is a pure
    physical rewrite: identical rows, spread collect buffers."""
    from podcast_audio_feature_extraction_spark.operators.segments import build_segments

    df = _zipf_frame(spark)
    cols = ["seg_id", "seg_words", "seg_length", "n_turns", "seg_speakers"]
    plain = build_segments(df).select(cols).toPandas().sort_values("seg_id").reset_index(drop=True)
    salted = (
        build_segments(df, skew_salts=4).select(cols).toPandas().sort_values("seg_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(salted, plain, check_dtype=False)


def test_build_segments_rejects_approx_speakers_with_salts(spark, transcripts_sdf):
    """exact_speakers=False + skew_salts is a config conflict (salt
    partials merge role sets exactly) — must fail loud, not silently plan
    the more expensive exact form."""
    import pytest

    from podcast_audio_feature_extraction_spark.operators.segments import build_segments

    with pytest.raises(ValueError, match="exact_speakers"):
        build_segments(transcripts_sdf, exact_speakers=False, skew_salts=8)
