"""Spark-native deterministic transcript generator for benchmarks.

Generates N turns entirely JVM-side (spark.range + hash arithmetic, no
Python UDFs, no RNG state) so corpus generation never bottlenecks the
benchmark. Deterministic: same N -> same rows. Plays the role of the
reference's seeded `logjuicer-generate` corpus at bench scale
(/root/reference/crates/generate/src/generate.rs).

Layout: conversations of `turns_per_conv` turns; even conversations are the
baseline; odd conversations are targets carrying injected anomaly lines
every `anomaly_stride` turns (unique letters-only tag per anomaly so each
emits exactly once under global dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_TEMPLATE_SQL = """
CASE CAST(id % 7 AS INT)
  WHEN 0 THEN concat('2024-03-01 10:', lpad(cast(id % 60 as string), 2, '0'),
               ':17,123 INFO worker request id=req-', hex(xxhash64(id)),
               ' from 10.0.', id % 256, '.', (id * 3) % 256, ' completed cleanly')
  WHEN 1 THEN concat('starting container unit pod-', hex(xxhash64(id * 31)),
               ' image registry.example.com/app:', id % 997, ' pulled fine')
  WHEN 2 THEN concat('GET https://api.example.com/v1/items/', hex(xxhash64(id * 7)),
               ' returned status ok after ', id % 977, 'ms latency')
  WHEN 3 THEN concat('writing scratch file /tmp/build-', hex(xxhash64(id * 13)),
               '/out.log with ', id % 9973, ' bytes payload')
  WHEN 4 THEN concat('session token=tok', hex(xxhash64(id * 17)),
               ' refreshed for account holder expires soon')
  WHEN 5 THEN concat('heartbeat received from peer 192.168.', id % 256, '.',
               (id * 5) % 256, ' sequence ', id % 99991, ' nominal')
  ELSE concat('database checkpoint ', hex(xxhash64(id * 23)), ' flushed ',
               id % 499, ' pages during maintenance window')
END
"""

# letters-only unique tag derived from the row id (digits would be masked)
_TAG_SQL = "translate(hex(xxhash64(id)), '0123456789', 'ghijklmnop')"

_ANOMALY_SQL = f"""
CASE CAST(id % 3 AS INT)
  WHEN 0 THEN concat('Traceback oops unexpected marker omega', {_TAG_SQL},
               ' raised inside handler routine')
  WHEN 1 THEN concat('FATAL disk corruption detected on volume omega', {_TAG_SQL},
               ' sector unreadable halting')
  ELSE concat('connection refused repeatedly omega', {_TAG_SQL},
               ' upstream gateway unreachable giving up')
END
"""


def generate_turns(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 200,
    n_tools: int = 8,
    anomaly_stride: int = 211,
    skew_conv_turns: int = 0,
    unique_tokens: bool = False,
) -> DataFrame:
    """Returns a turns DataFrame with an ``is_baseline`` marker column.

    Target conversations carry an anomaly roughly every `anomaly_stride`
    turns. With ``skew_conv_turns`` > 0, one extra monster conversation of
    that many turns is unioned in (long-conversation skew exercise).
    """
    df = spark.range(n_turns)
    conv = F.expr(f"id div {turns_per_conv}")
    is_baseline = (conv % 2) == 0
    is_anom = (~is_baseline) & (F.expr(f"id % {anomaly_stride}") == 3)
    base = df.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 9, "0")).alias("conv_id"),
        (F.expr(f"id % {turns_per_conv}") + 1).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.expr("id % 3") + 1).cast("int"),
        ).alias("role"),
        F.when(is_anom, F.expr(_ANOMALY_SQL))
        .otherwise(
            F.concat(
                F.expr(_TEMPLATE_SQL),
                # unique-token mode: a letters-only per-row word survives
                # masking, making every line a distinct token-set (the
                # scoring-stage worst case: zero dedup leverage)
                F.expr(f" concat(' uniq', {_TAG_SQL})") if unique_tokens else F.lit(""),
            )
        )
        .alias("text"),
        F.concat(F.lit("node-"), F.expr(f"id % {n_tools}").cast("string")).alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        is_baseline.alias("is_baseline"),
    )
    if skew_conv_turns:
        skew = spark.range(skew_conv_turns).select(
            F.lit("conv-monster").alias("conv_id"),
            (F.col("id") + 1).cast("int").alias("turn_idx"),
            F.lit("tool").alias("role"),
            F.when(F.expr("id % 100000") == 7, F.expr(_ANOMALY_SQL))
            .otherwise(F.expr(_TEMPLATE_SQL))
            .alias("text"),
            F.concat(F.lit("node-"), F.expr(f"id % {n_tools}").cast("string")).alias("tool"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            F.lit(False).alias("is_baseline"),
        )
        base = base.unionByName(skew)
    return base
