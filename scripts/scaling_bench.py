"""North-rule scaling evidence: run the identical flagship pipeline on the
identical synthetic corpus at two parallelism levels (local[N] and local[4N])
and report throughput at both plus scaling efficiency
eff = (thr_4N / thr_N) / 4. Results go into BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_turns] [small_cores] [big_cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, n_turns: int, parquet_dir: str) -> dict:
    from pyspark.sql import functions as F

    from logjuicer_spark import model as M, pipeline
    from logjuicer_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warm JVM + workers

    turns = spark.read.parquet(parquet_dir)
    baseline = turns.filter(F.col("is_baseline")).drop("is_baseline")
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")

    stage_times: dict = {}
    t0 = time.perf_counter()
    out = pipeline.run(spark, target, baseline_turns=baseline, stage_times=stage_times)
    t1 = time.perf_counter()
    n_anom = out["anomalies"].count()
    totals = out["totals"].collect()[0]
    wall = time.perf_counter() - t0
    stage_times["aggregate_sinks"] = round(wall - (t1 - t0), 3)
    n_target = totals.total_line_count
    res = {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "target_turns": int(n_target),
        "turns_per_sec": round(n_target / wall, 1),
        "anomalies": int(n_anom),
    }
    if os.environ.get("SCALING_STAGES"):
        res["stages"] = stage_times
    spark.stop()
    return res


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i * i
    return x


def hw_control(cores: int) -> float:
    """Pure-CPU multiprocessing control: how much aggregate compute the host
    actually provides at this worker count (sandbox hosts stop scaling
    linearly past ~16 procs regardless of framework)."""
    import multiprocessing as mp
    import time as _t

    t0 = _t.perf_counter()
    with mp.Pool(cores) as p:
        p.map(_burn, range(cores))
    return cores / (_t.perf_counter() - t0)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # materialize the corpus once so both runs read identical parquet input
    from logjuicer_spark.gen_spark import generate_turns
    from logjuicer_spark.session import get_spark

    pq = f"/tmp/logjuicer_scaling_{n_turns}.parquet"
    if not os.path.exists(pq):
        spark = get_spark("gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        generate_turns(spark, n_turns).repartition(64).write.mode("overwrite").parquet(pq)
        spark.stop()

    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    # shared-host interference swings wall times by 1.5-2x run to run; take
    # the best (least-interfered) run per configuration
    r_small = max(
        (run_once(small, n_turns, pq) for _ in range(repeats)),
        key=lambda r: r["turns_per_sec"],
    )
    r_big = max(
        (run_once(big, n_turns, pq) for _ in range(repeats)),
        key=lambda r: r["turns_per_sec"],
    )
    eff = (r_big["turns_per_sec"] / r_small["turns_per_sec"]) / (big / small)
    hw_small = hw_control(small)
    hw_big = hw_control(big)
    hw_eff = (hw_big / hw_small) / (big / small)
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "small": r_small,
                "big": r_big,
                "scaling_efficiency": round(eff, 3),
                "hw_control_units_per_sec": {str(small): round(hw_small, 2), str(big): round(hw_big, 2)},
                "hw_ceiling_efficiency": round(hw_eff, 3),
                "efficiency_vs_hw_ceiling": round(eff / hw_eff, 3) if hw_eff else None,
            }
        )
    )


if __name__ == "__main__":
    main()
