"""Cross-target similarity report (J4/U3/K2 in SURVEY.md §2).

Reference: /root/reference/crates/model/src/similarity.rs:16-129 —
group per-index anomalies across N target runs, dedup by tokenized form
(first target wins), attach the co-occurring sources of LATER targets
(the reference's skip(target+1) quirk is preserved), order groups by
source count descending (similarity.rs:42-44).

Deterministic deviation (documented): within a target, "first" is resolved
by (conv_id, turn_idx, sub_idx) instead of the reference's
report-sort-dependent iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def similarity_report(labeled_anomalies: DataFrame, group_col: str = "tool") -> DataFrame:
    """labeled_anomalies: union of anomaly sinks with a ``target_id`` int
    column identifying the run. Requires columns: target_id, conv_id,
    turn_idx, sub_idx, text, tokens, <group_col>.

    Returns one row per kept anomaly: (group, tokens, text, first_target,
    conv_id, turn_idx, sources array<struct<target_id,conv_id>>, n_sources).
    """
    a = labeled_anomalies.select(
        F.col(group_col).alias("group"),
        "target_id",
        "conv_id",
        "turn_idx",
        "sub_idx",
        "text",
        "tokens",
    )
    first = (
        a.groupBy("group", "tokens")
        .agg(F.min(F.struct("target_id", "conv_id", "turn_idx", "sub_idx")).alias("f"))
        .select(
            "group",
            "tokens",
            F.col("f.target_id").alias("first_target"),
            F.col("f.conv_id").alias("first_conv"),
            F.col("f.turn_idx").alias("first_turn"),
            F.col("f.sub_idx").alias("first_sub"),
        )
    )
    j = a.join(first, on=["group", "tokens"])
    is_first = (
        (F.col("target_id") == F.col("first_target"))
        & (F.col("conv_id") == F.col("first_conv"))
        & (F.col("turn_idx") == F.col("first_turn"))
        & (F.col("sub_idx") == F.col("first_sub"))
    )
    # the first occurrence's own source, plus sources from strictly later
    # targets (similarity.rs:105-114)
    contrib = j.filter(is_first | (F.col("target_id") > F.col("first_target")))
    # reference ordering (similarity.rs:42-44): GROUPS sort by the group's
    # own source count (sorted_by_key(-slr.sources.len())) — the distinct
    # (target, conversation) log reports contributing to the index group —
    # so a group's rows stay contiguous in the sink. A round-4 review found
    # this transcribed as per-anomaly n_sources ordering, which interleaves
    # groups. The group total orders; it is not part of the output schema.
    group_sources = a.groupBy("group").agg(
        F.count_distinct(F.struct("target_id", "conv_id")).alias("_group_sources")
    )
    rows = (
        contrib.groupBy("group", "tokens")
        .agg(
            F.min(F.struct("first_target", "first_conv", "first_turn")).alias("f"),
            # pin the FIRST occurrence's text deterministically (F.first is
            # order-dependent across partitionings; min_by honors the
            # ordering-discipline contract)
            F.min_by(
                "text", F.struct("target_id", "conv_id", "turn_idx", "sub_idx")
            ).alias("text"),
            F.collect_set(F.struct("target_id", "conv_id")).alias("sources"),
        )
        .select(
            "group",
            "tokens",
            "text",
            F.col("f.first_target").alias("first_target"),
            F.col("f.first_conv").alias("conv_id"),
            F.col("f.first_turn").alias("turn_idx"),
            F.array_sort("sources").alias("sources"),
            F.size("sources").alias("n_sources"),
        )
    )
    return (
        rows.join(F.broadcast(group_sources), "group")
        .orderBy(F.desc("_group_sources"), "group", F.desc("n_sources"), "tokens")
        .drop("_group_sources")
    )
