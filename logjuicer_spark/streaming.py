"""Structured Streaming front-end for the anomaly pipeline.

The reference is a batch tool, but it processes sources as streams with
state (SURVEY.md §2.10); this module is the engine-native streaming shape:

- score_stream: readStream -> foreachBatch(enrich + route against the
  broadcast model). Each micro-batch is routed transactionally into the
  sinks; per-group dedup state is scoped to the micro-batch (a stream at
  10^12-turn scale cannot hold the all-time token-set; the batch engine
  remains the source of truth for exact golden parity).
- anomaly_counts_stream: watermarked sliding-window anomaly counts per
  tool — the aggregate stage as a live metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import model as model_mod
from .pipeline import PipelineConfig, enrich, parse, route


def score_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    model_df: DataFrame,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    checkpoint_dir: str | None = None,
):
    """Start a streaming query routing each micro-batch of turns.

    stream_df: a streaming DataFrame in the TURNS shape (readStream).
    Returns the StreamingQuery; sinks land under out_dir/{anomalies,normal}.
    """
    indexes = model_mod.collect_indexes(model_df)
    bc = model_mod.broadcast_indexes(spark, indexes)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parse(batch_df, cfg)
        routed = route(enrich(parsed, bc, cfg), cfg)
        (
            routed.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .partitionBy("route")
            .parquet(f"{out_dir}/routed")
        )

    q = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir or f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    return q


def anomaly_counts_stream(
    stream_routed: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed anomaly counts per tool over a routed stream."""
    return (
        stream_routed.filter(F.col("route") == "anomaly")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "tool")
        .agg(F.count(F.lit(1)).alias("anomaly_count"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "tool",
            "anomaly_count",
        )
    )
