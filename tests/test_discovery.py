"""Baseline-discovery scoring tests (zuul.rs:110-176 semantics)."""

import datetime as dt

from logjuicer_spark.discovery import discover_baselines, discover_baselines_per_job

SCHEMA = (
    "uuid string, job_name string, project string, branch string, "
    "pipeline string, change long, ref_url string, voting boolean, "
    "log_url string, end_time timestamp, result string"
)


def _builds(spark):
    now = dt.datetime.now(tz=dt.timezone.utc)

    def b(uuid, project="p1", branch="main", pipeline="check", change=1,
          ref_url=None, voting=True, log_url="http://x/", days_old=1,
          result="SUCCESS", job="job-a"):
        return (uuid, job, project, branch, pipeline, change,
                ref_url or f"http://r/{uuid}", voting, log_url,
                now - dt.timedelta(days=days_old), result)

    rows = [
        b("same-change", change=42, ref_url="http://r/target"),  # -500 + ...
        b("best", pipeline="gate", days_old=1),                  # 50+50+50+10-1
        b("old-gate", pipeline="gate", days_old=40),             # ... -40
        b("other-project", project="p2", pipeline="gate"),       # no +50 project
        b("failed", result="FAILURE", pipeline="gate"),          # filtered
        b("no-log", log_url=None, pipeline="gate"),              # filtered
        b("t-uuid", pipeline="gate"),                            # self, filtered
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_discover_baselines(spark):
    target = {
        "uuid": "t-uuid", "project": "p1", "branch": "main",
        "change": 42, "ref_url": "http://r/target", "job_name": "job-a",
    }
    builds = _builds(spark)
    got = discover_baselines(target, builds, max_builds=1).collect()
    assert len(got) == 1
    assert got[0].uuid == "best"
    # the same-change candidate is heavily penalized, not excluded
    all_scored = {r.uuid: r.score for r in discover_baselines(target, builds, 10).collect()}
    assert all_scored["same-change"] < -300
    assert "failed" not in all_scored and "no-log" not in all_scored
    assert "t-uuid" not in all_scored


def test_discover_per_job(spark):
    target = {
        "uuid": "t-uuid", "project": "p1", "branch": "main",
        "change": 42, "ref_url": "http://r/target", "job_name": "job-a",
    }
    targets = spark.createDataFrame(
        [(target["uuid"], target["project"], target["branch"], target["change"],
          target["ref_url"], target["job_name"])],
        "uuid string, project string, branch string, change long, ref_url string, job_name string",
    )
    got = discover_baselines_per_job(targets, _builds(spark)).collect()
    assert len(got) == 1
    assert got[0].uuid == "best" and got[0].t_uuid == "t-uuid"
