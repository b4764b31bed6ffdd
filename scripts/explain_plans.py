"""Capture the physical plans of the engine's hot paths into PLANS.md —
the evidence that the declarative formulation actually compiles to the
intended strategies (pushed filters/pruned scans, map-side partial
aggregation for the winners, broadcast joins for dims,
TakeOrderedAndProject for top-k, no exchange under conv_id bucketing).

Usage: python scripts/explain_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def trim(plan: str, max_lines: int = 60) -> str:
    lines = plan.splitlines()
    if len(lines) > max_lines:
        lines = lines[:max_lines] + [f"... ({len(plan.splitlines()) - max_lines} more lines)"]
    return "\n".join(lines)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from logjuicer_spark import entry_queries as eq, model as M, pipeline as P
    from logjuicer_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    print("# PLANS — captured physical plans of the hot paths\n")
    print(f"`python scripts/explain_plans.py {sf_dir}` (regenerate after plan-affecting changes)\n")

    tv = eq.turns_view(spark, sf_dir)
    baseline = tv.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = tv.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
    cfg = P.PipelineConfig()

    def section(title, note, df):
        print(f"## {title}\n\n{note}\n\n```\n{trim(explain(df))}```\n")

    section(
        "parse (scan -> sub-line explode -> tokenize UDF -> dkey)",
        "Watch for: single parquet scan, filters before the Python stage "
        "(length cap evaluated JVM-side), ArrowEvalPython only for tokenize.",
        P.parse(target, cfg),
    )

    section(
        "parse FUSED (flagship: ONE text->dkey UDF, no per-row tokens column)",
        "Watch for: a single ArrowEvalPython emitting dkey directly, no "
        "JVM split/array_sort projection over a tokens column, same pushed "
        "filters as the full mode (round-5 fused parse).",
        P.parse(target, cfg, columns="dkey"),
    )

    parsed = P.parse(target, cfg)
    model_df = M.train(P.parse(baseline, cfg))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    enriched = P.enrich(parsed, bc, cfg, count_scored=False)
    section(
        "enrich (winners partial-agg -> scoring -> broadcast joins)",
        "Watch for: partial+final SortAggregate pairs around the Exchange "
        "for the first-occurrence winners (string min buffers are not "
        "HashAggregate-mutable; the map-side partial combine is the scale "
        "property — duplicates collapse before the shuffle); "
        "BroadcastHashJoin for the scored dim and the global-dedup dim.",
        enriched,
    )
    P.release_stage_caches()

    from logjuicer_spark.score import explode_model, score_join, vectorize_entries

    winners = (
        parsed.filter(~F.col("is_ignored"))
        .withColumn("_skey", P._skey())
        .groupBy("tool", "dkey")
        .agg(F.min("_skey").alias("skey"), F.min_by("tokens", "_skey").alias("tokens"))
    )
    section(
        "distributed scoring join (oversized-model escape hatch)",
        "Watch for: the (group, bucket) join feeding two HashAggregates "
        "(partial per (dkey,row) dot sums, then per-line max) — the sparse "
        "matmul with map-side combine, no driver collect.",
        score_join(vectorize_entries(winners), explode_model(model_df), winners, False),
    )

    from logjuicer_spark.score import load_exploded_model, save_exploded_model

    spark.sql("DROP TABLE IF EXISTS lj_plans_bucketed_model")
    save_exploded_model(model_df, "lj_plans_bucketed_model", buckets=8)
    old_conf = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    section(
        "distributed scoring against the BUCKETED model table (repeat-run reuse)",
        "Watch for: the model-side FileScan reads `Bucketed: true` with NO "
        "`Exchange hashpartitioning(group_key, bucket)` above it — the "
        "storage layout IS the join partitioning, so a repeat run against "
        "the same baseline skips the explode and the model-side shuffle "
        "(save_exploded_model; salting disabled on this path by design — "
        "an extra salt join key would defeat the co-partitioning).",
        score_join(
            vectorize_entries(winners),
            load_exploded_model(spark, "lj_plans_bucketed_model"),
            winners,
            False,
            hot_bucket_rows=None,
        ),
    )
    for k, v in old_conf.items():
        spark.conf.set(k, v)
    spark.sql("DROP TABLE IF EXISTS lj_plans_bucketed_model")

    # route with a sparse anomaly set: the clean branch must be a map-only
    # select (no exchange, no python), the dirty branch a broadcast
    # semi-join into the pandas walk
    section(
        "route (clean/dirty split: anomaly-free conversations stay JVM-side)",
        "Watch for: the clean branch has NO Exchange hashpartitioning and "
        "no pandas stage — a BroadcastHashJoin(LeftAnti) plus a column "
        "select; only the dirty branch (broadcast LeftSemi) feeds the "
        "conv-batched MapInPandas behind a Window(conv_id) that REQUIRES "
        "the hash distribution (elided on bucketed inputs) instead of "
        "forcing a repartition. With zero anomalies the whole stage is "
        "map-only.",
        P.route(enriched, cfg, allow_split=False),
    )
    P.release_stage_caches()

    empty_routed = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, sub_idx int, role string, tool string, "
        "ts timestamp, text string, route string, score float, "
        "before array<string>, after array<string>",
    )
    section(
        "aggregate (per-conv counters)",
        "Watch for: one shuffle on conv_id with partial_* aggregates map-side.",
        P.aggregate(empty_routed)["agg_conv"],
    )

    from logjuicer_spark import discovery

    section(
        "top-k discovery (TakeOrderedAndProject, no global window)",
        "Watch for: TakeOrderedAndProject instead of a single-partition "
        "window sort.",
        discovery.discover_baselines(
            {"project": "p", "uuid": "u", "change": 1, "ref_url": "r", "branch": "b"},
            spark.createDataFrame(
                [],
                "uuid string, project string, branch string, pipeline string, "
                "change long, ref_url string, voting boolean, log_url string, "
                "end_time timestamp, result string",
            ),
            max_builds=5,
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
