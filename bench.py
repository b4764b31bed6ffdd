"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

The flagship is the full parse->enrich->route->aggregate anomaly pipeline
(north rule: turns/sec end-to-end); the other entries time individual
operator classes. scripts/scaling_bench.py produces the N-vs-4N scaling
evidence recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    # per-process oracle staging dir (some queries stage intermediates):
    # a bench running next to an oracle gate must not race on the files
    os.environ.setdefault("LJ_ORACLE_STAGE", f"/tmp/lj_oracle_{os.getpid()}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from logjuicer_spark.session import get_spark
    from logjuicer_spark import entry_queries as eq

    spark = get_spark("logjuicer-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + the python UDF workers (imports numpy/pandas + our
    # modules once per worker) so timings measure steady-state throughput,
    # not cluster cold-start. The sf0.001 flagship pass exercises every
    # stage shape once (tokenize/score/context UDFs, broadcasts, parquet
    # sink) — JIT and worker spin-up otherwise dominate the first measured
    # run by ~2x
    spark.range(1000).count()
    eq.q_tokenize(spark, sf_dir).count()
    # flagship warmup wants a tiny fixture (sf0.001 or a sibling of
    # SPARK_GRAFT_SF_DIR); if neither exists, skip it rather than crash —
    # the first measured run then includes worker spin-up
    sibling = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for warm_dir in ("/root/testdata/sf0.001", sibling):
        if os.path.isdir(warm_dir):
            eq.q_pipeline_anomalies(spark, warm_dir).count()
            break

    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # the host's CPU delivery swings 1.5-2x run to run (CLAUDE.md): the
    # WHOLE suite is repeated SPARK_GRAFT_BENCH_REPEATS times (default 3)
    # and each query is scored by its best run — the same protocol
    # scripts/scaling_bench.py uses — with every raw run published under
    # "runs" so a reader can see the noise band, not just the headline
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    suite = [
        ("pipeline_flagship", lambda: eq.q_pipeline_anomalies(spark, sf_dir)),
        ("tokenize", lambda: eq.q_tokenize(spark, sf_dir)),
        ("turns_parse", lambda: eq.q_turns_parse(spark, sf_dir)),
        ("context_window", lambda: eq.q_context_window(spark, sf_dir)),
        ("agg_counts", lambda: eq.q_agg_counts(spark, sf_dir)),
        ("enrich_join", lambda: eq.q_enrich_join(spark, sf_dir)),
        ("ann_cosine", lambda: eq.q_ann_cosine(spark, sf_dir)),
    ]
    runs: dict[str, list[float]] = {name: [] for name, _ in suite}
    anomaly_count = None
    for _ in range(repeats):
        for name, build in suite:
            t0 = time.perf_counter()
            n = build().count()
            runs[name].append(round(time.perf_counter() - t0, 3))
            if name == "pipeline_flagship":
                anomaly_count = n
    timings = {name: min(rs) for name, rs in runs.items()}

    total = round(sum(timings.values()), 3)
    turns_per_sec = round(n_turns / timings["pipeline_flagship"], 1)
    print(
        json.dumps(
            {
                "metric": "headline queries wall time (flagship anomaly pipeline + operator suite)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "flagship_runs": runs["pipeline_flagship"],
                "runs": runs,
                "repeats": repeats,
                "anomalies": anomaly_count,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
