"""Monster-conversation skew bench: one conversation far larger than
cfg.max_task_lines, routed (a) single-task and (b) through chunk-aligned
range splitting. Reports wall times and asserts anomaly-set equality —
the BENCH.md evidence that the route-stage escape hatch is both exact and
faster under extreme conversation skew.

Usage: python scripts/monster_bench.py [monster_turns] [regular_turns] [max_task_lines] [mode]
mode: both (default) | split | single — split-only is for scales where the
single-task control would itself be the bottleneck being demonstrated.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    monster = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    regular = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    max_task_lines = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    from pyspark.sql import functions as F

    from logjuicer_spark import pipeline
    from logjuicer_spark.gen_spark import generate_turns
    from logjuicer_spark.session import get_spark

    spark = get_spark("monster-bench", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
    spark.sparkContext.setLogLevel("ERROR")

    pq = f"/tmp/logjuicer_monster_{regular}_{monster}.parquet"
    if not os.path.exists(pq):
        generate_turns(spark, regular, skew_conv_turns=monster).repartition(
            64
        ).write.mode("overwrite").parquet(pq)

    turns = spark.read.parquet(pq)
    baseline = turns.filter(F.col("is_baseline")).drop("is_baseline")
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")

    def run(cfg, label):
        t0 = time.perf_counter()
        out = pipeline.run(spark, target, baseline_turns=baseline, cfg=cfg)
        anoms = sorted(
            (r.conv_id, r.turn_idx, r.sub_idx)
            for r in out["anomalies"].select("conv_id", "turn_idx", "sub_idx").collect()
        )
        wall = time.perf_counter() - t0
        n_target = regular // 2 + monster
        return {
            "mode": label,
            "wall_sec": round(wall, 2),
            "turns_per_sec": round(n_target / wall, 1),
            "anomalies": len(anoms),
        }, anoms

    mode = sys.argv[4] if len(sys.argv) > 4 else "both"
    single_cfg = pipeline.PipelineConfig(max_task_lines=None)
    split_cfg = pipeline.PipelineConfig(max_task_lines=max_task_lines)
    report = {
        "monster_turns": monster,
        "regular_turns": regular,
        "max_task_lines": max_task_lines,
    }
    a_single = a_split = None
    if mode in ("both", "single"):
        report["single"], a_single = run(single_cfg, "single-task")
    if mode in ("both", "split"):
        report["split"], a_split = run(split_cfg, f"range-split@{max_task_lines}")
    if mode == "both":
        assert a_single == a_split, (
            f"anomaly sets differ: {len(a_single)} vs {len(a_split)}"
        )
        report["anomaly_sets_equal"] = True
        report["speedup"] = round(
            report["single"]["wall_sec"] / report["split"]["wall_sec"], 2
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
