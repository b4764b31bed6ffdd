"""Pinned schemas for every table the engine reads or writes.

Reference data model: SURVEY.md §1; the input table shape is fixed by
BASELINE.json.input_hint: (conv_id, turn_idx, role, text, tool, ts).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input -------------------------------------------------------------------

TURNS = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# --- parse stage output (sub-line grain) --------------------------------------

PARSED = T.StructType(
    TURNS.fields
    + [
        T.StructField("sub_idx", T.IntegerType()),
        T.StructField("tokens", T.StringType()),
        T.StructField("dkey", T.StringType()),
        T.StructField("is_ignored", T.BooleanType()),
    ]
)

# --- persisted model (FIXTURES.md §2; Index ~ model.rs:97-104) -----------------

MODEL = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("row_id", T.IntegerType()),
        T.StructField("indices", T.ArrayType(T.IntegerType())),
        T.StructField("values", T.ArrayType(T.FloatType())),
        T.StructField("model_version", T.IntegerType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("line_count", T.LongType()),
        T.StructField("byte_count", T.LongType()),
    ]
)

# --- routed output (route stage; FIXTURES.md §4) -------------------------------

ROUTED = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("sub_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("route", T.StringType()),  # anomaly | normal | unknown
        T.StructField("score", T.FloatType()),
        T.StructField("before", T.ArrayType(T.StringType())),
        T.StructField("after", T.ArrayType(T.StringType())),
    ]
)

ANOMALIES = ROUTED  # filtered on route == 'anomaly'

# --- aggregates ----------------------------------------------------------------

AGG_CONV = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("line_count", T.LongType()),
        T.StructField("byte_count", T.LongType()),
        T.StructField("anomaly_count", T.LongType()),
        T.StructField("mean_score", T.DoubleType()),
    ]
)

AGG_TOOL = T.StructType(
    [
        T.StructField("tool", T.StringType()),
        T.StructField("line_count", T.LongType()),
        T.StructField("anomaly_count", T.LongType()),
    ]
)

SCORE_HIST = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ]
)

# --- lineage / checkpoint (north_rule; no reference analog) ---------------------

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("conv_min", T.StringType()),
        T.StructField("conv_max", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("completed_at", T.TimestampType()),
    ]
)
