"""32M-turn run with executor/stage metrics (round-5 verdict ask #3).

Runs the flagship pipeline on a 32M-turn corpus at local[32] with the UI
enabled, then reads the Spark REST API for per-stage spill / GC / shuffle
totals so the 16M->32M throughput dip can be attributed (engine vs
platform). Re-run with a larger heap via SPARK_DRIVER_MEM for the heap
experiment. Prints one JSON line per run.

Usage: python scripts/metrics32m.py [n_turns=32000000]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(port, path):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=10) as r:
        return json.load(r)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    from pyspark.sql import functions as F

    from logjuicer_spark import pipeline
    from logjuicer_spark.gen_spark import generate_turns
    from logjuicer_spark.session import get_spark

    pq = f"/tmp/logjuicer_scaling_{n}.parquet"
    spark = get_spark(
        "metrics32m", master="local[32]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(pq):
        generate_turns(spark, n).repartition(128).write.mode("overwrite").parquet(pq)

    turns = spark.read.parquet(pq)
    baseline = turns.filter(F.col("is_baseline")).drop("is_baseline")
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")

    st: dict = {}
    t0 = time.perf_counter()
    out = pipeline.run(spark, target, baseline_turns=baseline, stage_times=st)
    n_anom = out["anomalies"].count()
    wall = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    stages = rest(4055, f"/api/v1/applications/{app_id}/stages?status=complete")
    execs = rest(4055, f"/api/v1/applications/{app_id}/executors")
    tot = {
        "memory_spilled_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in stages) / 2**20, 1),
        "disk_spilled_mb": round(sum(s.get("diskBytesSpilled", 0) for s in stages) / 2**20, 1),
        "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 1),
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 2**20, 1),
        "executor_run_time_s": round(sum(s.get("executorRunTime", 0) for s in stages) / 1000, 1),
        "jvm_gc_time_s": round(sum(s.get("jvmGcTime", 0) for s in stages) / 1000, 1),
        "n_stages": len(stages),
    }
    top_spill = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "spill_mb": round(s.get("memoryBytesSpilled", 0) / 2**20, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000, 1),
            }
            for s in stages
        ),
        key=lambda d: -d["spill_mb"],
    )[:5]
    mem = [
        {
            "id": e["id"],
            "max_mem_mb": round(e.get("maxMemory", 0) / 2**20, 1),
            "mem_used_mb": round(e.get("memoryUsed", 0) / 2**20, 1),
            "gc_s": round(e.get("totalGCTime", 0) / 1000, 1),
        }
        for e in execs
    ]
    print(
        json.dumps(
            {
                "n_turns": n,
                "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
                "wall_sec": round(wall, 2),
                "turns_per_sec": round((n // 2) / wall, 1),
                "anomalies": n_anom,
                "stages": st,
                "totals": tot,
                "top_spill_stages": top_spill,
                "executors": mem,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
