"""Execution-level evidence for the conv_id-bucketing design claim: the
route stage on a conv_id-bucketed enriched table (Spark native bucketBy,
standing in for Iceberg's bucket(conv_id) transform) vs the identical
data as plain parquet. The bucketed plan reads bucket files directly (no
Exchange — plan-asserted in tests/test_bucketing.py); this script
measures what that is worth in wall time and asserts output equality.

Usage: python scripts/bucketed_route_bench.py [n_turns] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from logjuicer_spark import model as M, pipeline
    from logjuicer_spark.gen_spark import generate_turns
    from logjuicer_spark.session import get_spark

    spark = get_spark("bucket-route", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    pq = f"/tmp/logjuicer_scaling_{n}.parquet"
    if not os.path.exists(pq):
        generate_turns(spark, n).repartition(64).write.mode("overwrite").parquet(pq)
    turns = spark.read.parquet(pq)
    baseline = turns.filter(F.col("is_baseline")).drop("is_baseline")
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")

    cfg = pipeline.PipelineConfig()
    model_df = pipeline.train_model(spark, baseline)
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    enriched = pipeline.enrich(pipeline.parse(target, cfg, columns="dkey"), bc, cfg)
    sel = enriched.select(*pipeline._ROUTE_COLS)

    # materialize the SAME enriched rows twice: plain parquet vs bucketed
    plain = "/tmp/bucket_route_plain"
    sel.write.mode("overwrite").parquet(plain)
    spark.sql("DROP TABLE IF EXISTS lj_bucket_route")
    (
        spark.read.parquet(plain)
        .write.bucketBy(cores, "conv_id")
        .sortBy("conv_id")
        .option("path", "/tmp/bucket_route_bucketed")
        .mode("overwrite")
        .saveAsTable("lj_bucket_route")
    )

    def route_wall(df):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = pipeline._route_single(df, cfg, clean_split=False)
            n_anom = out.filter(F.col("route") == "anomaly").count()
            w = time.perf_counter() - t0
            best = (w, n_anom) if best is None or w < best[0] else best
        return best

    w_plain, a_plain = route_wall(spark.read.parquet(plain))
    w_bucketed, a_bucketed = route_wall(spark.table("lj_bucket_route"))
    plan = pipeline._route_single(
        spark.table("lj_bucket_route"), cfg, clean_split=False
    )._jdf.queryExecution().executedPlan().toString()

    print(
        json.dumps(
            {
                "n_turns": n,
                "cores": cores,
                "plain_route_sec": round(w_plain, 2),
                "bucketed_route_sec": round(w_bucketed, 2),
                "speedup": round(w_plain / w_bucketed, 3),
                "anomalies_equal": a_plain == a_bucketed,
                "anomalies": int(a_plain),
                "bucketed_plan_has_exchange": "Exchange hashpartitioning" in plan,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS lj_bucket_route")
    spark.stop()


if __name__ == "__main__":
    main()
