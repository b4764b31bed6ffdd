"""Multi-JVM control for the 8→32 scaling residual: is it the plan, or
local mode's single shared JVM?

A real 4N-executor cluster gives every executor its own heap, GC and
python workers; local[32] shares ONE 8g JVM across all 32 threads. This
control approximates the cluster regime on one host: TWO INDEPENDENT
local[16] sessions (separate JVMs, separate heaps) each report HALF the
target conversations concurrently, against the same pre-trained model —
versus ONE local[32] session reporting the full target. Total work and
parallelism are identical; only the JVM sharing differs. If 2×local[16]
beats 1×local[32], the residual is the shared-JVM platform, not operator
design.

Caveat (honest): global dedup is corpus-global, so conversation-split
halves are only output-equivalent when anomalous token-sets are unique
per occurrence — true for gen_spark's tagged corpus (the script asserts
half-counts sum to the full count). This is a THROUGHPUT control.

Usage: python scripts/multi_jvm_control.py [n_turns]
Worker mode (internal): ... --worker CORES HALF PQ MODEL_PATH
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, half: int, pq: str, model_path: str) -> None:
    from pyspark.sql import functions as F

    from logjuicer_spark import model as M, pipeline
    from logjuicer_spark.session import get_spark

    spark = get_spark(f"mjvm-{cores}-{half}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    turns = spark.read.parquet(pq)
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")
    if half >= 0:
        target = target.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == half)
    model_df = M.load(spark, model_path)
    t0 = time.perf_counter()
    out = pipeline.run(spark, target, model_df=model_df, input_rows=10_000_000)
    n = out["anomalies"].count()
    wall = time.perf_counter() - t0
    print(json.dumps({"cores": cores, "half": half, "anomalies": int(n),
                      "wall": round(wall, 2)}))
    spark.stop()


def run_worker(cores: int, half: int, pq: str, model_path: str):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), str(half), pq, model_path],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, cwd=REPO,
    )


def last_json(proc) -> dict:
    out = proc.communicate()[0].decode()
    return json.loads(out.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    pq = f"/tmp/logjuicer_scaling_{n}.parquet"
    model_path = f"/tmp/mjvm_model_{n}.parquet"

    from pyspark.sql import functions as F

    from logjuicer_spark import model as M, pipeline
    from logjuicer_spark.gen_spark import generate_turns
    from logjuicer_spark.session import get_spark

    spark = get_spark("mjvm-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(pq):
        generate_turns(spark, n).repartition(64).write.mode("overwrite").parquet(pq)
    if not os.path.exists(model_path):
        baseline = (
            spark.read.parquet(pq).filter(F.col("is_baseline")).drop("is_baseline")
        )
        M.save(pipeline.train_model(spark, baseline), model_path)
    spark.stop()

    repeats = int(os.environ.get("MJVM_REPEATS", "2"))

    def once_single():
        t0 = time.perf_counter()
        r = last_json(run_worker(32, -1, pq, model_path))
        return time.perf_counter() - t0, r

    def once_dual():
        t0 = time.perf_counter()
        p0 = run_worker(16, 0, pq, model_path)
        p1 = run_worker(16, 1, pq, model_path)
        r0, r1 = last_json(p0), last_json(p1)
        return time.perf_counter() - t0, r0, r1

    singles = [once_single() for _ in range(repeats)]
    duals = [once_dual() for _ in range(repeats)]
    bs = min(singles, key=lambda x: x[0])
    bd = min(duals, key=lambda x: x[0])
    n_target = n // 2
    full_anoms = bs[1]["anomalies"]
    half_sum = bd[1]["anomalies"] + bd[2]["anomalies"]
    print(
        json.dumps(
            {
                "n_turns": n,
                "single_local32": {
                    "wall": round(bs[0], 2),
                    "report_wall": bs[1]["wall"],
                    "turns_per_sec": round(n_target / bs[1]["wall"], 1),
                    "anomalies": full_anoms,
                },
                "dual_local16": {
                    "wall": round(bd[0], 2),
                    "report_walls": [bd[1]["wall"], bd[2]["wall"]],
                    "turns_per_sec": round(
                        n_target / max(bd[1]["wall"], bd[2]["wall"]), 1
                    ),
                    "anomalies_sum": half_sum,
                },
                "anomaly_sum_matches": half_sum == full_anoms,
                "dual_vs_single_speedup": round(
                    bs[1]["wall"] / max(bd[1]["wall"], bd[2]["wall"]), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
