"""Ad-hoc measurement harness for optimization work (round 6).

NOT the driver bench (bench.py is frozen for measurement) — this file
exists so individual query paths can be timed in isolation with the noop
sink (guide §1.4), A/B'd under conf overrides, and their
``explain("formatted")`` captured for plans/r06/.

Usage:
    python bench_extra.py grid_exact grid_approx            # time passes
    python bench_extra.py segments --conf spark.foo=bar     # conf override
    python bench_extra.py segments --explain plans/r06/segments_before.txt
    python bench_extra.py --list

Passes mirror the frozen bench.py rows 1:1 (same inputs, same plan
construction) so numbers are comparable; trials are best-of-N (default 3)
with a throttle probe recorded before/after.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _probe():
    import numpy as np

    a = np.random.default_rng(0).standard_normal((3000, 3000))
    out = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = a @ a
        out.append(round(time.perf_counter() - t0, 3))
    return out


def build_passes(spark, sf_dir):
    """Return {name: fn} of zero-arg pass functions (each runs one noop
    materialization identical to the frozen bench's timed body)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from podcast_audio_feature_extraction_spark.sources.events import load_transcript

    t = load_transcript(spark, sf_dir)
    qfns = entrymod.queries()
    passes = {}

    for name in (
        "sessionize", "turn_features", "window_functionals", "segments",
        "asof_backfill", "pricing_summary", "topk_orders", "doc_stats",
        "dedup_exact", "search_bm25", "interval_join",
    ):
        passes[name] = lambda name=name: _noop(qfns[name](spark, sf_dir))

    from podcast_audio_feature_extraction_spark.operators.search import bm25_topk_fused

    passes["search_bm25_fused"] = lambda: _noop(bm25_topk_fused(t, "click error purchase", k=100))

    from podcast_audio_feature_extraction_spark.operators.functionals import functional_grid

    grid_in = entrymod._grid_descriptor_cols(t)

    def _grid_pass(accuracy):
        return lambda: _noop(
            functional_grid(
                grid_in,
                entrymod.GRID_DESCRIPTORS,
                stats=entrymod.GRID_STATS,
                approx_pct_accuracy=accuracy,
            )
        )

    passes["window_functionals_multi"] = _grid_pass(None)
    passes["window_functionals_multi_approx"] = _grid_pass(1000)
    passes["window_functionals_multi_approx200"] = _grid_pass(200)

    # component isolation for the grid: descriptor projection + explode only
    def _grid_expand_only():
        from podcast_audio_feature_extraction_spark.functions.time import ts_micros

        us = ts_micros(F.col("ts"))
        base_s = ((us - F.pmod(us, F.lit(60 * 1_000_000))) / F.lit(1_000_000)).cast("long")
        expanded = (
            grid_in.select(
                F.col("conv_id"),
                *[F.col(c).cast("double").alias(c) for c in entrymod.GRID_DESCRIPTORS],
                us.alias("__us"),
                base_s.alias("__base_s"),
                F.explode(F.array(*[F.lit(i * 60) for i in range(2)])).alias("__shift_s"),
            )
            .select("*", (F.col("__base_s") - F.col("__shift_s")).alias("__ws_s"))
            .filter(
                (F.col("__us") >= F.col("__ws_s") * F.lit(1_000_000))
                & (F.col("__us") < (F.col("__ws_s") + F.lit(120)) * F.lit(1_000_000))
            )
        )
        _noop(expanded)

    passes["grid_expand_only"] = _grid_expand_only

    # grid with ONLY the sorted-array percentile buffers (isolates collect cost)
    def _grid_pcts_only():
        from podcast_audio_feature_extraction_spark.operators.functionals import functional_grid

        _noop(
            functional_grid(
                grid_in, entrymod.GRID_DESCRIPTORS,
                stats=("median", "p20", "p80"),
            )
        )

    passes["grid_pcts_only"] = _grid_pcts_only

    def _grid_moments_only():
        from podcast_audio_feature_extraction_spark.operators.functionals import functional_grid

        _noop(
            functional_grid(
                grid_in, entrymod.GRID_DESCRIPTORS,
                stats=("mean", "std", "min", "max", "cv", "skew", "kurt", "slope", "range"),
            )
        )

    passes["grid_moments_only"] = _grid_moments_only

    passes["transcript_only"] = lambda: _noop(t)
    passes["grid_descriptors_only"] = lambda: _noop(grid_in)

    # stored-table bm25 pair (built once per session, like the frozen bench)
    import shutil
    import tempfile

    from podcast_audio_feature_extraction_spark.operators.search import (
        bm25_index,
        bm25_stats_from_index,
        bm25_topk,
        conv_dimension,
    )
    from podcast_audio_feature_extraction_spark.operators.segments import build_segments

    _tmp = {}

    def _ensure_bm25_stored():
        if "dir" in _tmp:
            return
        d = tempfile.mkdtemp(prefix="bx_bm25_")
        build_segments(t).write.parquet(f"{d}/segs")
        conv_dimension(t).write.parquet(f"{d}/dim")
        _tmp["dir"] = d
        _tmp["segs"] = spark.read.parquet(f"{d}/segs")
        _tmp["dim"] = spark.read.parquet(f"{d}/dim")
        term_df, meta = bm25_index(_tmp["segs"], _tmp["dim"])
        term_df.write.parquet(f"{d}/term_df")
        meta.write.parquet(f"{d}/meta")
        _tmp["term"] = spark.read.parquet(f"{d}/term_df")
        _tmp["meta"] = spark.read.parquet(f"{d}/meta")

    def _stored_pass():
        _ensure_bm25_stored()
        _noop(bm25_topk(_tmp["segs"], "click error purchase", _tmp["dim"], k=100))

    def _indexed_pass():
        _ensure_bm25_stored()
        stats = bm25_stats_from_index(
            _tmp["term"], _tmp["meta"], ["click", "error", "purchase"], ["seg_words", "dim_text"]
        )
        _noop(bm25_topk(_tmp["segs"], "click error purchase", _tmp["dim"], k=100, stats=stats))

    passes["search_bm25_stored"] = _stored_pass
    passes["search_bm25_indexed_stored"] = _indexed_pass

    # skew pair (same construction as the frozen bench)
    def _ensure_skewed():
        if "skewed" in _tmp:
            return
        n_turns = t.count()
        hot_conv = t.select("conv_id").limit(1)
        hot_rows = t.join(F.broadcast(hot_conv), "conv_id", "left_semi").filter(F.col("turn_idx") < 3)
        n_rep = max(1, 30 * n_turns // max(hot_rows.count(), 1))
        hot = (
            hot_rows.repartition(int(CPUS))
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
            .withColumn("turn_idx", F.col("turn_idx") * n_rep + F.col("rep"))
            .drop("rep")
        )
        _tmp["skewed"] = t.unionByName(hot).localCheckpoint()

    def _skew_plain():
        _ensure_skewed()
        _noop(build_segments(_tmp["skewed"]))

    def _skew_salted():
        _ensure_skewed()
        _noop(build_segments(_tmp["skewed"], skew_salts=16))

    passes["segments_skew_plain"] = _skew_plain
    passes["segments_skew_salted"] = _skew_salted

    # dedup family
    from podcast_audio_feature_extraction_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(int(CPUS))
    passes["dedup_minhash_pairs"] = lambda: _noop(minhash_lsh_pairs(d, jaccard_threshold=0.05))
    passes["dedup_clusters"] = lambda: _noop(
        dedup_clusters(d, minhash_lsh_pairs(d, jaccard_threshold=0.05))
    )
    passes["simhash_pairs"] = lambda: _noop(simhash_pairs(d))

    # ann family
    from podcast_audio_feature_extraction_spark.operators.similarity import (
        fit_ivf_centroids_local,
        fit_pq_codebooks_local,
        fit_residual_pq_codebooks_local,
        ivf_pq_topk,
        ivf_topk,
        pq_encode,
        pq_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(int(CPUS))
    eq = e.filter(F.col("vec_id") < 5)

    def _ensure_ann():
        if "cents" in _tmp:
            return
        _tmp["cents"] = fit_ivf_centroids_local(f"{sf_dir}/embeddings.parquet", n_centroids=16, iters=8)
        _tmp["books"] = fit_pq_codebooks_local(f"{sf_dir}/embeddings.parquet", m_sub=8, k_codes=16, iters=8)
        _tmp["res_books"] = fit_residual_pq_codebooks_local(
            f"{sf_dir}/embeddings.parquet", _tmp["cents"], m_sub=8, k_codes=16, iters=8
        )
        _tmp["codes"] = pq_encode(e, _tmp["books"]).localCheckpoint()

    def _ann(name):
        def run():
            _ensure_ann()
            if name == "ann_ivf_topk":
                _noop(ivf_topk(e, eq, _tmp["cents"], k=10, nprobe=4))
            elif name == "ann_pq_encode":
                _noop(pq_encode(e, _tmp["books"]))
            elif name == "ann_pq_topk":
                _noop(pq_topk(_tmp["codes"], eq, _tmp["books"], k=10))
            elif name == "ann_ivf_pq_topk":
                _noop(ivf_pq_topk(e, eq, _tmp["cents"], _tmp["books"], k=10, nprobe=4))
            elif name == "ann_ivf_pq_res_topk":
                _noop(ivf_pq_topk(e, eq, _tmp["cents"], _tmp["res_books"], k=10, nprobe=4, residual=True))

        return run

    for n in ("ann_ivf_topk", "ann_pq_encode", "ann_pq_topk", "ann_ivf_pq_topk", "ann_ivf_pq_res_topk"):
        passes[n] = _ann(n)

    # feature build family
    from podcast_audio_feature_extraction_spark.plans.backfill import (
        build_feature_table,
        build_feature_table_incremental,
        delta_rebuild_partitioned,
        flagship,
        write_conv_partitioned,
    )

    def _ensure_delta():
        if "delta" in _tmp:
            return
        dt = tempfile.mkdtemp(prefix="bx_delta_")
        build_feature_table(t).write.parquet(f"{dt}/feats")
        _tmp["stored_feats"] = spark.read.parquet(f"{dt}/feats")
        _tmp["delta"] = t.join(
            F.broadcast(t.select("conv_id").distinct().filter(F.crc32(F.col("conv_id")) % 100 == 0)),
            "conv_id",
            "left_semi",
        ).localCheckpoint()
        write_conv_partitioned(t, f"{dt}/transcript_parts", n_buckets=128)
        _tmp["tp"] = f"{dt}/transcript_parts"
        _tmp["ddir"] = dt

    passes["feature_build_full"] = lambda: _noop(build_feature_table(t))

    def _delta_1pct():
        _ensure_delta()
        _noop(build_feature_table_incremental(t, _tmp["delta"], _tmp["stored_feats"]))

    def _full_stored():
        _ensure_delta()
        src = spark.read.parquet(_tmp["tp"]).drop("conv_bucket")
        _noop(build_feature_table(src))

    def _delta_stored():
        _ensure_delta()
        _noop(delta_rebuild_partitioned(spark, _tmp["tp"], _tmp["delta"], n_buckets=128))

    passes["feature_build_delta_1pct"] = _delta_1pct
    passes["feature_build_full_stored"] = _full_stored
    passes["feature_build_delta_stored"] = _delta_stored
    passes["flagship_backfill"] = lambda: _noop(flagship(load_transcript(spark, sf_dir)))

    # streaming pair
    from podcast_audio_feature_extraction_spark.streaming.sessions import (
        read_transcript_stream,
        run_stream_to_memory,
        sliding_window_functionals_stream,
    )
    from podcast_audio_feature_extraction_spark.streaming.stateful import stateful_asof_enrich

    def _ensure_stream():
        if "sdir" in _tmp:
            return
        sd = tempfile.mkdtemp(prefix="bx_stream_")
        t.repartition(8).write.parquet(f"{sd}/transcript")
        _tmp["sdir"] = sd
        tagged = t.select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "ts",
            F.when(F.col("role") == "assistant", F.lit("f")).otherwise(F.lit("q")).alias("side"),
            F.when(F.col("role") == "assistant", F.array(F.col("val").cast("double"))).alias("functionals"),
        )
        tagged.repartition(8).write.parquet(f"{sd}/tagged")
        _tmp["tagged_schema"] = spark.read.parquet(f"{sd}/tagged").schema
        _tmp["sctr"] = 0

    def _stream_pass():
        _ensure_stream()
        _tmp["sctr"] += 1
        stream = read_transcript_stream(spark, f"{_tmp['sdir']}/transcript", max_files_per_trigger=2)
        run_stream_to_memory(
            sliding_window_functionals_stream(stream), f"bx_stream_{_tmp['sctr']}", spark
        )

    def _stream_asof_pass():
        _ensure_stream()
        _tmp["sctr"] += 1
        stream = spark.readStream.schema(_tmp["tagged_schema"]).parquet(f"{_tmp['sdir']}/tagged")
        q = (
            stateful_asof_enrich(stream)
            .writeStream.format("memory")
            .queryName(f"bx_asof_{_tmp['sctr']}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    passes["stream_functionals"] = _stream_pass
    passes["stream_asof_enrich"] = _stream_asof_pass

    def build_df(name):
        """Return the DataFrame for explain() where the pass is a plain
        noop materialization (None for streaming/multi-step passes)."""
        if name in qfns:
            return qfns[name](spark, sf_dir)
        if name == "search_bm25_fused":
            return bm25_topk_fused(t, "click error purchase", k=100)
        if name == "window_functionals_multi":
            return functional_grid(grid_in, entrymod.GRID_DESCRIPTORS, stats=entrymod.GRID_STATS)
        if name == "window_functionals_multi_approx":
            return functional_grid(
                grid_in, entrymod.GRID_DESCRIPTORS, stats=entrymod.GRID_STATS, approx_pct_accuracy=1000
            )
        if name == "search_bm25_stored":
            _ensure_bm25_stored()
            return bm25_topk(_tmp["segs"], "click error purchase", _tmp["dim"], k=100)
        if name == "segments_skew_plain":
            _ensure_skewed()
            return build_segments(_tmp["skewed"])
        if name == "segments_skew_salted":
            _ensure_skewed()
            return build_segments(_tmp["skewed"], skew_salts=16)
        if name == "feature_build_full":
            return build_feature_table(t)
        if name == "flagship_backfill":
            return flagship(load_transcript(spark, sf_dir))
        if name == "dedup_minhash_pairs":
            return minhash_lsh_pairs(d, jaccard_threshold=0.05)
        if name == "simhash_pairs":
            return simhash_pairs(d)
        return None

    return passes, build_df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--explain", default=None, help="write explain('formatted') of the first name")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--interleave", action="store_true", help="alternate trials across names")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from podcast_audio_feature_extraction_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    probe0 = _probe()
    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    passes, build_df = build_passes(spark, SF_DIR)

    if args.list:
        print("\n".join(passes))
        return

    if args.explain:
        df = build_df(args.names[0])
        if df is None:
            print(f"no single-DF builder for {args.names[0]}", file=sys.stderr)
            sys.exit(1)
        with open(args.explain, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        print(f"wrote {args.explain}")
        return

    results = {n: [] for n in args.names}
    order = []
    if args.interleave:
        for _ in range(args.n):
            order += list(args.names)
    else:
        for n in args.names:
            order += [n] * args.n
    for name in order:
        spark.sparkContext.setJobDescription(f"bx:{name}")
        t0 = time.perf_counter()
        passes[name]()
        results[name].append(round(time.perf_counter() - t0, 3))
    probe1 = _probe()
    out = {
        "conf": extra,
        "probe": {"start": probe0, "end": probe1},
        "trials": results,
        "best": {n: min(v) for n, v in results.items() if v},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
