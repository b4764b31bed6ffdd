"""Baseline discovery as a relational operator (S9/W5/K3 in SURVEY.md §2).

The reference queries a CI API for up to 500 successful builds and scores
candidates imperatively (/root/reference/crates/model/src/zuul.rs:110-176):
same project +50 (but same change/ref -500), same branch +50, gate/periodic
pipeline +50, voting +10, minus age in days; missing URLs disqualify; best
candidate wins. Here the builds listing is a DataFrame (a dim table at
scale) and discovery is a scored filter + top-1-per-target rank —
partition-prunable, broadcast-joinable, and testable with SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

BUILDS_COLS = (
    "uuid project branch pipeline change ref_url voting log_url end_time "
    "result job_name"
)  # job_name drives discover_baselines_per_job's join (zuul.rs per-job query)


def baseline_score(target, candidates: DataFrame, now_col=None) -> DataFrame:
    """Score candidate builds for one target build dict.

    target: dict with keys project/branch/change/ref_url/uuid.
    candidates: DataFrame of builds (successful candidates).
    Returns candidates + a ``score`` column; disqualified rows dropped.
    """
    now = now_col if now_col is not None else F.current_date()
    same_project = F.col("project") == F.lit(target["project"])
    same_change = (F.col("change") == F.lit(target.get("change"))) | (
        F.col("ref_url") == F.lit(target.get("ref_url"))
    )
    score = (
        F.when(same_project & same_change, -500)
        .when(same_project, 50)
        .otherwise(0)
        + F.when(F.col("branch") == F.lit(target.get("branch")), 50).otherwise(0)
        + F.when(
            F.col("pipeline").contains("gate") | F.col("pipeline").contains("periodic"),
            50,
        ).otherwise(0)
        + F.when(F.col("voting"), 10).otherwise(0)
        - F.datediff(now, F.to_date("end_time"))
    )
    return (
        candidates.filter(
            (F.col("result") == "SUCCESS")
            & F.col("log_url").isNotNull()
            & F.col("ref_url").isNotNull()
            & (F.col("uuid") != F.lit(target["uuid"]))
        )
        .withColumn("score", score)
    )


def discover_baselines(target, candidates: DataFrame, max_builds: int = 1) -> DataFrame:
    """Top-scored candidate(s), deterministic tie-break on uuid.

    orderBy + limit compiles to TakeOrderedAndProject (distributed per-
    partition top-k, driver merge of k rows) — a global row_number window
    here would pull every candidate into one partition."""
    scored = baseline_score(target, candidates)
    return scored.orderBy(F.desc("score"), F.asc("uuid")).limit(max_builds)


def discover_baselines_per_job(targets: DataFrame, candidates: DataFrame) -> DataFrame:
    """Vectorized variant: best baseline per target job — a broadcast join
    of the targets dim against the builds table + rank within target
    (zuul.rs does this one target at a time over an API; at table scale it
    is one shuffle on job_name)."""
    t = targets.select(
        F.col("uuid").alias("t_uuid"),
        F.col("project").alias("t_project"),
        F.col("branch").alias("t_branch"),
        F.col("change").alias("t_change"),
        F.col("ref_url").alias("t_ref_url"),
        F.col("job_name").alias("t_job"),
    )
    c = candidates.filter(
        (F.col("result") == "SUCCESS")
        & F.col("log_url").isNotNull()
        & F.col("ref_url").isNotNull()
    )
    j = c.join(F.broadcast(t), c["job_name"] == t["t_job"]).filter(
        F.col("uuid") != F.col("t_uuid")
    )
    same_project = F.col("project") == F.col("t_project")
    same_change = (F.col("change") == F.col("t_change")) | (
        F.col("ref_url") == F.col("t_ref_url")
    )
    score = (
        F.when(same_project & same_change, -500).when(same_project, 50).otherwise(0)
        + F.when(F.col("branch") == F.col("t_branch"), 50).otherwise(0)
        + F.when(
            F.col("pipeline").contains("gate") | F.col("pipeline").contains("periodic"),
            50,
        ).otherwise(0)
        + F.when(F.col("voting"), 10).otherwise(0)
        - F.datediff(F.current_date(), F.to_date("end_time"))
    )
    w = Window.partitionBy("t_uuid").orderBy(F.desc("score"), F.asc("uuid"))
    return (
        j.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("t_uuid", "t_job", "uuid", "score", "log_url")
    )
