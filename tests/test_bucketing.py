"""Physical-plan evidence for the 10^12-turn claim that conv_id bucketing
eliminates the route-stage shuffle (README 'Design for 10^12 turns'): a
table bucketed by conv_id satisfies the groupBy's ClusteredDistribution,
so the applyInPandas stage reads bucket files directly — no Exchange.
With Iceberg the same property comes from the bucket(conv_id) partition
transform + storage-partitioned joins."""

import pytest
from pyspark.sql import functions as F

from logjuicer_spark import pipeline

SCHEMA = (
    "conv_id string, turn_idx int, sub_idx int, role string, tool string, "
    "ts timestamp, text string, is_ignored boolean, is_known boolean, "
    "is_target boolean, score float, emit_ok boolean"
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_route_has_no_exchange(spark, tmp_path):
    # anomalous rows: the dirty branch (pandas walk) must engage, so the
    # groupBy's distribution requirement is what the plan shows
    rows = [
        (f"c{i % 10}", i, 0, "log", "bash", None, f"line {i}",
         False, True, True, 0.9, True)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    spark.sql("DROP TABLE IF EXISTS lj_enriched_bucketed")
    (df.write.bucketBy(8, "conv_id").sortBy("conv_id")
       .option("path", str(tmp_path / "bucketed_tbl"))
       .mode("overwrite").saveAsTable("lj_enriched_bucketed"))
    try:
        bucketed = spark.table("lj_enriched_bucketed")
        routed_b = pipeline._route_single(
            bucketed, pipeline.PipelineConfig(), clean_split=True
        )
        routed_u = pipeline._route_single(
            df, pipeline.PipelineConfig(), clean_split=True
        )
        # shuffle exchanges only (the dirty-conv dim is a BroadcastExchange
        # by design, which must not count)
        assert "Exchange hashpartitioning" not in _plan(routed_b)
        assert "Exchange hashpartitioning" in _plan(routed_u)
        # and the shuffle-free plan still computes the right thing
        assert routed_b.count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS lj_enriched_bucketed")


def test_clean_route_never_shuffles_or_enters_python(spark):
    """Round-3 route split: a corpus with no anomalous target rows routes
    entirely JVM-side — no conv_id exchange, no pandas stage at all."""
    rows = [
        (f"c{i % 10}", i, 0, "log", "bash", None, f"line {i}",
         False, i % 3 != 0, True, 0.1, True)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    routed = pipeline._route_single(
        df, pipeline.PipelineConfig(), clean_split=True
    )
    plan = _plan(routed)
    assert "FlatMapGroupsInPandas" not in plan
    assert "Exchange hashpartitioning" not in plan
    got = {r.route for r in routed.collect()}
    assert got == {"normal", "unknown"}
    assert routed.count() == 200
