"""Streaming front-end tests (file stream -> foreachBatch routing)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from logjuicer_spark import gen, pipeline, streaming
from logjuicer_spark.schemas import TURNS


def test_score_stream(spark):
    baseline_rows, target_rows, expected = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=4, turns_per_conv=25, seed=5
    )
    baseline = gen.to_spark_df(spark, baseline_rows)
    model_df = pipeline.train_model(spark, baseline)

    in_dir = tempfile.mkdtemp(prefix="stream_in_")
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    gen.to_spark_df(spark, target_rows).write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(TURNS).parquet(in_dir)
    q = streaming.score_stream(spark, stream, model_df, out_dir)
    q.awaitTermination(300)

    routed = spark.read.parquet(f"{out_dir}/routed")
    got = {
        (r.conv_id, r.turn_idx)
        for r in routed.filter(F.col("route") == "anomaly").collect()
    }
    want = {(c, t) for c, t, _ in expected}
    # batch-scoped dedup: every injected anomaly has a unique token-set, so
    # the streaming result matches the batch result exactly here
    assert got == want
    assert routed.count() == len(target_rows)

    # windowed aggregate over the routed sink (batch DF exercises the same
    # expression tree the streaming variant uses)
    agg = (
        spark.read.parquet(f"{out_dir}/routed")
        .filter(F.col("route") == "anomaly")
        .groupBy(F.window("ts", "5 minutes"), "tool")
        .agg(F.count(F.lit(1)).alias("anomaly_count"))
    )
    assert agg.agg(F.sum("anomaly_count")).collect()[0][0] == len(want)
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
