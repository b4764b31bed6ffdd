"""Spark-level test for the errors entry point (errors_run)."""

from pyspark.sql import functions as F

from logjuicer_spark import gen
from logjuicer_spark.errors import errors_run


def test_errors_run(spark):
    rows = []

    def add(conv, i, text, tool="bash"):
        rows.append(
            {"conv_id": conv, "turn_idx": i, "role": "tool", "text": text,
             "tool": tool, "ts": None}
        )

    add("c1", 1, "starting the run")
    add("c1", 2, "Traceback (most recent call last):")
    add("c1", 3, '  File "x.py", line 1, in <module>')
    add("c1", 4, "RuntimeError: kaboom")
    add("c1", 5, "continuing after failure")
    add("c2", 1, "all good here")
    add("c2", 2, "controller | controller-0 | FAILED | rc=2 >>")
    add("c2", 3, "done")
    # duplicate of c2's error in c3 -> globally deduped
    add("c3", 1, "controller | controller-1 | FAILED | rc=2 >>")

    df = gen.to_spark_df(spark, rows)
    out = errors_run(spark, df).orderBy("conv_id", "turn_idx").collect()
    got = [(r.conv_id, r.turn_idx, r.text) for r in out]
    assert ("c1", 4, "RuntimeError: kaboom") in got
    assert ("c2", 2, "controller | controller-0 | FAILED | rc=2 >>") in got
    # c3's error has the same token-set (digits masked) -> deduped
    assert not any(c == "c3" for c, _, _ in got)
    a = [r for r in out if r.conv_id == "c1"][0]
    assert list(a.before) == [
        "starting the run",
        "Traceback (most recent call last):",
        '  File "x.py", line 1, in <module>',
    ]
    assert list(a.after) == ["continuing after failure"]
    assert abs(a.score - 0.5) < 1e-6


def test_errors_run_with_model_filter(spark):
    from logjuicer_spark import model as M, pipeline

    # baseline contains the recurring error -> filtered out of the report
    base = [
        {"conv_id": "b1", "turn_idx": 1, "role": "tool", "tool": "bash",
         "ts": None, "text": "controller | controller-0 | FAILED | rc=2 >>"},
        {"conv_id": "b1", "turn_idx": 2, "role": "tool", "tool": "bash",
         "ts": None, "text": "ordinary quiet line flowing"},
    ]
    target = [
        {"conv_id": "t1", "turn_idx": 1, "role": "tool", "tool": "bash",
         "ts": None, "text": "controller | controller-9 | FAILED | rc=2 >>"},
        {"conv_id": "t1", "turn_idx": 2, "role": "tool", "tool": "bash",
         "ts": None, "text": "FAIL: totally novel breakage omegafresh here"},
    ]
    model_df = pipeline.train_model(spark, gen.to_spark_df(spark, base))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    out = errors_run(
        spark, gen.to_spark_df(spark, target), model_indexes_bc=bc
    ).collect()
    texts = [r.text for r in out]
    assert any("totally novel breakage" in t for t in texts)
    assert not any("rc=2" in t for t in texts)  # matches baseline -> filtered


def test_ansible_sources_skip_dedup_and_keep_others(spark):
    """round-4 review / errors.rs:289-294: ansible sources neither consult
    nor feed the global dedup — every error emits from them, and their
    token-sets don't claim first-occurrence for other sources."""
    from logjuicer_spark import errors as E

    err = "ERROR 1234 database exploded during checkpoint replay"
    pad = "routine heartbeat message with stable content and padding"

    def turn(conv, i, text):
        return {"conv_id": conv, "turn_idx": i, "role": "tool",
                "tool": "bash", "ts": None, "text": text}

    rows = (
        [turn("ci/job-output.txt", i, t) for i, t in
         enumerate([err, pad, err], start=1)]
        + [turn("svc-log", i, t) for i, t in
           enumerate([err, pad, err], start=1)]
    )
    from logjuicer_spark import gen
    out = E.errors_run(spark, gen.to_spark_df(spark, rows)).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conv_id, []).append(r.turn_idx)
    # ansible conv: BOTH occurrences (no dedup)
    assert sorted(by_conv.get("ci/job-output.txt", [])) == [1, 3]
    # plain conv: its own first occurrence still emits (the ansible conv
    # did not claim the token-set), duplicates within it dedup
    assert sorted(by_conv.get("svc-log", [])) == [1]
