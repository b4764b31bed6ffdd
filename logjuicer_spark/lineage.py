"""Per-partition lineage records + checkpoint/resume (north_rule; the
reference has no analog — its web service simply resets pending jobs,
CHANGELOG 0.9.4 — so this is engine-native functionality).

Design: the route stage is bucketed by a stable hash of conv_id. Each
completed bucket writes (a) its routed rows under route=<bucket> and (b) a
lineage row (run_id, stage, bucket, conv range, row count, order-insensitive
xxhash64 checksum). A resumed run anti-joins the completed buckets and only
processes the remainder — producing byte-identical sink contents.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SUBDIR = "_lineage"


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str, stage: str) -> set[int]:
    path = f"{out_dir}/{LINEAGE_SUBDIR}"
    try:
        # probe through Spark, not os.path: out_dir can live on ANY
        # filesystem scheme (s3a/hdfs — the design point of this module);
        # a driver-local exists() check would silently report "nothing
        # completed" there and a resume would restart from scratch
        # (round-4 review finding)
        df = spark.read.parquet(path)
    except Exception:  # missing path on whichever filesystem backs out_dir
        return set()
    rows = (
        df.filter((F.col("run_id") == run_id) & (F.col("stage") == stage))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def lineage_rows(routed_bucketed: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Aggregate one lineage row per bucket from the routed output."""
    now = _dt.datetime.now(tz=_dt.timezone.utc)
    return routed_bucketed.groupBy(F.col("bucket").alias("partition_id")).agg(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.min("conv_id").alias("conv_min"),
        F.max("conv_id").alias("conv_max"),
        F.count(F.lit(1)).alias("rows"),
        F.expr(
            "bit_xor(xxhash64(conv_id, turn_idx, sub_idx, text, route))"
        ).alias("checksum"),
        F.lit(now).alias("completed_at"),
    ).select(
        "run_id", "stage", "partition_id", "conv_min", "conv_max",
        "rows", "checksum", "completed_at",
    )


def run_routed_with_resume(
    spark: SparkSession,
    enriched: DataFrame,
    cfg,
    out_dir: str,
    run_id: str,
    n_buckets: int = 64,
    _bucket_filter=None,
    conv_sizes: DataFrame | None = None,
) -> DataFrame:
    """Route with bucket-level checkpointing. Re-invoking with the same
    run_id resumes: completed buckets are skipped. `_bucket_filter` is a
    test hook simulating a crash after a subset of buckets.

    conv_sizes: precomputed (conv_id, n) counts for the monster-conv probe
    (see pipeline.route) so it doesn't re-evaluate the enriched plan.

    Returns the full routed DataFrame read back from the sink (only
    complete once every bucket is processed).
    """
    from .pipeline import route

    done = completed_buckets(spark, out_dir, run_id, "route")
    work = enriched.withColumn("bucket", bucket_col(n_buckets))
    todo = work.filter(~F.col("bucket").isin(list(done))) if done else work
    if _bucket_filter is not None:
        todo = todo.filter(F.col("bucket").isin(list(_bucket_filter)))

    # clean_split=False: the enriched input here is not checkpointed, so
    # the split's stats pass + per-branch evaluation would re-run the whole
    # upstream DAG several times per resumed bucket batch
    routed = route(
        todo.drop("bucket"), cfg, conv_sizes=conv_sizes, clean_split=False
    ).withColumn("bucket", bucket_col(n_buckets))
    # bucket-idempotent sink (round-4 review): dynamic partition OVERWRITE
    # instead of append — a crash between the data write and the lineage
    # record below leaves the bucket uncommitted, and the resume then
    # REPLACES that bucket's partition instead of appending a duplicate
    # copy. The lineage record is the commit point; the sink write is
    # repeatable.
    (
        routed.write.mode("overwrite")
        .partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{out_dir}/routed")
    )
    # checksum WHAT WAS WRITTEN: reading the sink back (pruned to the
    # buckets this invocation processed) both avoids re-running the whole
    # upstream DAG a second time just for the lineage aggregation and
    # guarantees the recorded checksum describes the bytes in the sink,
    # not a potentially distinct re-evaluation
    sink = spark.read.parquet(f"{out_dir}/routed")
    new_part = sink.filter(~F.col("bucket").isin(list(done))) if done else sink
    if _bucket_filter is not None:
        new_part = new_part.filter(F.col("bucket").isin(list(_bucket_filter)))
    lineage_rows(new_part, run_id, "route").write.mode("append").parquet(
        f"{out_dir}/{LINEAGE_SUBDIR}"
    )
    return spark.read.parquet(f"{out_dir}/routed")


def verify_lineage(spark: SparkSession, out_dir: str, run_id: str) -> bool:
    """Recompute per-bucket checksums from the sink and compare with the
    lineage records (exactness check after a resumed run)."""
    routed = spark.read.parquet(f"{out_dir}/routed")
    actual = routed.groupBy(F.col("bucket").alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, sub_idx, text, route))").alias("checksum"),
    )
    recorded = (
        spark.read.parquet(f"{out_dir}/{LINEAGE_SUBDIR}")
        .filter((F.col("run_id") == run_id) & (F.col("stage") == "route"))
        .select("partition_id", "rows", "checksum")
    )
    diff = (
        actual.join(recorded, "partition_id", "full")
        .filter(
            (actual["rows"] != recorded["rows"])
            | (actual["checksum"] != recorded["checksum"])
            | actual["rows"].isNull()
            | recorded["rows"].isNull()
        )
        .count()
    )
    return diff == 0
