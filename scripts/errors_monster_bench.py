"""Errors entry point: monster-conversation range split vs single task.

Builds a corpus of regular conversations plus one monster conversation
(error lines + python tracebacks sprinkled deterministically), runs
errors_run both ways on the identical parquet input, asserts row-set
equality (before/after included), prints one JSON line.

Usage: python scripts/errors_monster_bench.py [monster_turns] [regular_turns] [max_task_lines]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, monster, regular):
    from pyspark.sql import functions as F

    reg = spark.range(regular).select(
        F.concat(F.lit("conv-"), F.expr("id div 2000").cast("string")).alias("conv_id"),
        (F.expr("id % 2000") + 1).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.when(
            F.expr("id % 211") == 3,
            F.concat(F.lit("ERROR 1234 failure tag"), F.expr("translate(hex(xxhash64(id)), '0123456789', 'ghijklmnop')")),
        )
        .when(
            F.expr("id % 997") == 5,
            F.lit("Traceback (most recent call last):"),
        )
        .when(
            F.expr("id % 997") == 6,
            F.lit('  File "mod.py", line 1, in caller'),
        )
        .when(F.expr("id % 997") == 7, F.lit("RuntimeError: kaboom"))
        .otherwise(
            F.concat(F.lit("routine heartbeat line "), (F.col("id") % 37).cast("string"))
        )
        .alias("text"),
        F.concat(F.lit("node-"), (F.col("id") % 4).cast("string")).alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    mon = spark.range(monster).select(
        F.lit("conv-monster").alias("conv_id"),
        (F.col("id") + 1).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.when(
            F.expr("id % 4021") == 3,
            F.concat(F.lit("ERROR 9876 monster fault tag"), F.expr("translate(hex(xxhash64(id * 31)), '0123456789', 'ghijklmnop')")),
        )
        .when(F.expr("id % 8999") == 10, F.lit("Traceback (most recent call last):"))
        .when(F.expr("id % 8999") == 11, F.lit('  File "deep.py", line 9, in walk'))
        .when(F.expr("id % 8999") == 12, F.lit("ValueError: deep kaboom"))
        .otherwise(
            F.concat(F.lit("monster steady line "), (F.col("id") % 53).cast("string"))
        )
        .alias("text"),
        F.concat(F.lit("node-"), (F.col("id") % 4).cast("string")).alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    return reg.unionByName(mon)


def snap(df):
    return sorted(
        (
            r.conv_id, r.turn_idx, r.sub_idx, r.text,
            tuple(r.before or ()), tuple(r.after or ()),
        )
        for r in df.collect()
    )


def main():
    monster = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    regular = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    mtl = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000

    from logjuicer_spark.errors import errors_run
    from logjuicer_spark.pipeline import PipelineConfig
    from logjuicer_spark.session import get_spark

    spark = get_spark("errors-monster", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pq = f"/tmp/errors_monster_{monster}_{regular}.parquet"
    if not os.path.exists(pq):
        build(spark, monster, regular).repartition(64).write.mode("overwrite").parquet(pq)
    turns = spark.read.parquet(pq)

    t0 = time.perf_counter()
    single = snap(errors_run(spark, turns, cfg=PipelineConfig(max_task_lines=None)))
    t_single = time.perf_counter() - t0

    t0 = time.perf_counter()
    split = snap(
        errors_run(
            spark, turns, cfg=PipelineConfig(max_task_lines=mtl), allow_split=True
        )
    )
    t_split = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "monster_turns": monster,
                "regular_turns": regular,
                "max_task_lines": mtl,
                "single_task_sec": round(t_single, 2),
                "split_sec": round(t_split, 2),
                "speedup": round(t_single / t_split, 2),
                "rows": len(single),
                "row_sets_equal": single == split,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
