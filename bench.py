"""Benchmark harness.

Default mode (what the driver runs): execute the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Scaling mode (north_rule evidence, run manually / by round notes):
    python bench.py --scaling
runs the flagship backfill at local[8] and local[32] in separate JVMs on
the same input and reports throughput at both plus efficiency
(= (thr32/thr8)/4).

Results are materialized through the `noop` datasource so every column
(including pandas-UDF outputs) is fully computed but nothing is written.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_headline(sf_dir: str, cpus: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from podcast_audio_feature_extraction_spark.plans.backfill import flagship
    from podcast_audio_feature_extraction_spark.session import get_spark
    from podcast_audio_feature_extraction_spark.sources.events import load_transcript

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    t = load_transcript(spark, sf_dir)
    n_turns = t.count()

    qfns = entrymod.queries()
    headline = [
        "sessionize",
        "turn_features",
        "window_functionals",
        "segments",
        "asof_backfill",
        "pricing_summary",
        "topk_orders",
        "doc_stats",
        "dedup_exact",
    ]
    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        _materialize(qfns[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship: full feature build + as-of backfill (the north_rule metric)
    t0 = time.perf_counter()
    _materialize(flagship(load_transcript(spark, sf_dir)))
    flagship_s = time.perf_counter() - t0
    timings["flagship_backfill"] = round(flagship_s, 3)

    spark.stop()
    return {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": int(cpus),
        "n_turns": n_turns,
        "turns_per_sec_backfill": round(n_turns / flagship_s, 1),
    }


def run_scaling() -> dict:
    """Same flagship job at two parallelism levels, separate JVMs."""
    out = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR)
        res = subprocess.run(
            [sys.executable, __file__, "--flagship-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        out[cpus] = json.loads(res.stdout.strip().splitlines()[-1])
    thr8 = out["8"]["turns_per_sec_backfill"]
    thr32 = out["32"]["turns_per_sec_backfill"]
    eff = round((thr32 / thr8) / 4.0, 3)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "throughput_8": thr8,
        "throughput_32": thr32,
        "sf": SF_DIR,
        "queries": {"flagship_8": out["8"]["queries"], "flagship_32": out["32"]["queries"]},
    }


def run_flagship_only(sf_dir: str, cpus: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from podcast_audio_feature_extraction_spark.plans.backfill import flagship
    from podcast_audio_feature_extraction_spark.session import get_spark
    from podcast_audio_feature_extraction_spark.sources.events import load_transcript

    spark = get_spark(app_name="bench-flagship", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_transcript(spark, sf_dir)
    n_turns = t.count()
    # warm-up pass so JVM/JIT + Arrow worker startup is excluded from both
    # sides of the scaling comparison
    _materialize(flagship(t).limit(1))
    t0 = time.perf_counter()
    _materialize(flagship(load_transcript(spark, sf_dir)))
    dt = time.perf_counter() - t0
    spark.stop()
    return {
        "metric": "flagship_backfill_sec",
        "value": round(dt, 3),
        "unit": "sec",
        "queries": {"flagship_backfill": round(dt, 3)},
        "sf": sf_dir,
        "cpus": int(cpus),
        "n_turns": n_turns,
        "turns_per_sec_backfill": round(n_turns / dt, 1),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--flagship-only" in sys.argv:
        print(json.dumps(run_flagship_only(SF_DIR, CPUS)))
    else:
        print(json.dumps(run_headline(SF_DIR, CPUS)))
