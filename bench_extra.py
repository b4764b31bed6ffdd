"""Extra (non-frozen) benchmarks for the optimization rounds.

bench.py is FROZEN (driver contract). This file holds the guide-§1
measurement harnesses: per-stage attribution of the flagship, noop-sink
isolation for individual suite queries, and plan capture helpers.

Usage:
  python bench_extra.py flagship [sf_dir] [cpus] [repeats]
      per-stage wall times of pipeline.run (big or small path chosen by
      the same input_rows rule the flagship query uses)
  python bench_extra.py suite [sf_dir] [cpus] [repeats]
      each non-flagship suite query timed against the noop sink
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cpus):
    from logjuicer_spark.session import get_spark

    spark = get_spark("logjuicer-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, eq):
    spark.range(1000).count()
    if os.path.isdir("/root/testdata/sf0.001"):
        eq.q_pipeline_anomalies(spark, "/root/testdata/sf0.001").count()


def flagship(sf_dir, cpus, repeats):
    from logjuicer_spark import entry_queries as eq
    from logjuicer_spark import pipeline
    from pyspark.sql import functions as F

    spark = _spark(cpus)
    _warm(spark, eq)
    results = []
    for r in range(repeats):
        stage_times: dict = {}
        t0 = time.perf_counter()
        t = eq.turns_view(spark, sf_dir)
        n_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        t_cache = time.perf_counter() - t0
        baseline = t.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
            "is_baseline", "etype"
        )
        target = t.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
        out = pipeline.run(
            spark, target, baseline_turns=baseline, input_rows=n_rows,
            stage_times=stage_times,
        )
        t1 = time.perf_counter()
        n = (
            out["anomalies"]
            .select("conv_id", "turn_idx", "tool", "text", F.round("score", 4).alias("score"))
            .count()
        )
        total = time.perf_counter() - t0
        stage_times["_cache_turns"] = round(t_cache, 3)
        stage_times["_final_count"] = round(time.perf_counter() - t1, 3)
        stage_times["_total"] = round(total, 3)
        stage_times["_anomalies"] = n
        results.append(stage_times)
        print(json.dumps(stage_times))
    spark.stop()
    return results


def suite(sf_dir, cpus, repeats):
    from logjuicer_spark import entry_queries as eq

    spark = _spark(cpus)
    _warm(spark, eq)
    names = [
        "q_tokenize", "q_turns_parse", "q_context_window", "q_agg_counts",
        "q_enrich_join", "q_ann_cosine",
    ]
    runs = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            fn = getattr(eq, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({n: {"min": min(v), "runs": v} for n, v in runs.items()}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    if mode == "flagship":
        flagship(sf_dir, cpus, repeats)
    elif mode == "suite":
        suite(sf_dir, cpus, repeats)
    else:
        raise SystemExit(f"unknown mode {mode}")
