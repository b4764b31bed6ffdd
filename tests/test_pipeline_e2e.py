"""End-to-end pipeline tests: Spark engine vs (a) the injected anomaly set
and (b) the naive sequential oracle (tests/reference_impl.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, pipeline
from logjuicer_spark.pipeline import PipelineConfig

from reference_impl import naive_report


@pytest.fixture(scope="module")
def corpus():
    return gen.generate_corpus(
        n_baseline_convs=4, n_target_convs=6, turns_per_conv=40, seed=42
    )


@pytest.fixture(scope="module")
def result(spark, corpus):
    baseline_rows, target_rows, expected = corpus
    baseline = gen.to_spark_df(spark, baseline_rows)
    target = gen.to_spark_df(spark, target_rows)
    out = pipeline.run(spark, target, baseline_turns=baseline)
    routed = out["routed"].cache()
    anomalies = (
        routed.filter(F.col("route") == "anomaly")
        .orderBy("conv_id", "turn_idx", "sub_idx")
        .collect()
    )
    return out, routed, anomalies


def test_anomaly_set_matches_injected(result, corpus):
    _, _, anomalies = result
    expected = corpus[2]
    got = {(a.conv_id, a.turn_idx, a.text) for a in anomalies}
    assert got == set(expected)


def test_matches_naive_oracle(result, corpus):
    baseline_rows, target_rows, _ = corpus
    _, _, anomalies = result
    oracle = naive_report(baseline_rows, target_rows)
    oracle_sorted = sorted(oracle, key=lambda a: (a["conv_id"], a["pos"]))
    assert len(anomalies) == len(oracle_sorted)
    for got, exp in zip(anomalies, oracle_sorted):
        assert got.conv_id == exp["conv_id"]
        assert got.turn_idx == exp["pos"]
        assert got.text == exp["line"]
        assert got.score == pytest.approx(exp["distance"], abs=1e-6)
        assert list(got.before) == exp["before"]
        assert list(got.after) == exp["after"]


def test_routed_partition(result, corpus, spark):
    _, routed, _ = result
    target_rows = corpus[1]
    # sub-line explode is a no-op on this corpus (no newlines) -> row parity
    assert routed.count() == len(target_rows)
    # per-turn text equality under stable turn ordering (input_hint's
    # per-row invariant): the routed sink preserves every turn verbatim
    got_rows = routed.select("conv_id", "turn_idx", "text").collect()
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in got_rows)
    want = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in target_rows)
    assert got == want
    routes = {r.route for r in routed.select("route").distinct().collect()}
    assert routes <= {"anomaly", "normal", "unknown"}
    assert routed.filter(F.col("route") == "unknown").count() == 0


def test_aggregates(result, corpus):
    out, routed, anomalies = result
    agg_conv = {r.conv_id: r for r in out["agg_conv"].collect()}
    by_conv = {}
    for a in anomalies:
        by_conv[a.conv_id] = by_conv.get(a.conv_id, 0) + 1
    for conv_id, row in agg_conv.items():
        assert row.anomaly_count == by_conv.get(conv_id, 0)
        assert row.line_count == 40
    totals = out["totals"].collect()[0]
    assert totals.total_anomaly_count == len(anomalies)
    assert totals.total_line_count == routed.count()
    hist = out["score_hist"].agg(F.sum("count")).collect()[0][0]
    assert hist == len(anomalies)


def test_scores_above_threshold(result):
    _, _, anomalies = result
    for a in anomalies:
        assert a.score > 0.3


def test_extended_context_conv(result):
    # tgt-001 has anomalies at turns 10 and 15 (< 12 apart): the second one
    # must carry the extended before-context chained after the first's after
    _, _, anomalies = result
    conv = [a for a in anomalies if a.conv_id == "tgt-001"]
    assert [a.turn_idx for a in conv] == [10, 15]
    first, second = conv
    # first anomaly is < 12 lines from conv start -> extended window reaches
    # back to the start: all 9 preceding turns; after-context is 3
    assert len(first.before) == 9 and len(first.after) == 3
    # second anomaly chains: first's after-context consumed turns 11-13, so
    # only turn 14 is available as (extended) before-context
    assert len(second.before) == 1
    assert len(second.after) == 3


def test_sublines_and_length_cap(spark):
    rows = [
        {
            "conv_id": "c1",
            "turn_idx": 1,
            "role": "user",
            "text": "first line\nsecond piece\\nthird piece",
            "tool": "bash",
            "ts": None,
        },
        {
            "conv_id": "c1",
            "turn_idx": 2,
            "role": "user",
            "text": "x" * 7000,
            "tool": "bash",
            "ts": None,
        },
    ]
    df = gen.to_spark_df(spark, rows)
    parsed = pipeline.parse(df)
    got = parsed.orderBy("turn_idx", "sub_idx").collect()
    assert [r.text for r in got] == ["first line", "second piece", "third piece"]
    assert [r.sub_idx for r in got] == [0, 1, 2]


def test_self_ref_cut(spark):
    from logjuicer_spark.pipeline import PipelineConfig, parse

    rows = [
        {"conv_id": "c1", "turn_idx": i, "role": "tool", "tool": "bash",
         "ts": None, "text": t}
        for i, t in enumerate(
            ["alpha line", "TASK [run-logjuicer here]", "beta line"], start=1
        )
    ]
    df = gen.to_spark_df(spark, rows)
    cfg = PipelineConfig(self_ref_marker="TASK [run-logjuicer")
    got = [r.text for r in parse(df, cfg).orderBy("turn_idx").collect()]
    assert got == ["alpha line"]


def test_fileset_config():
    from logjuicer_spark.config import FileSetConfig

    c = FileSetConfig()
    assert c.is_fp_valid("controller/logs/screen-n-api.txt.gz")
    assert not c.is_fp_valid("job-output.json")
    assert not c.is_fp_valid("etc/hosts.gz".replace("etc", "/etc"))
    assert not c.is_fp_valid("x/.hidden-file")
    assert not c.is_fp_valid("tox/unit.py")
    c2 = FileSetConfig(includes=("screen-",))
    assert c2.is_fp_valid("logs/screen-api.txt")
    assert not c2.is_fp_valid("logs/other.txt")


def test_log_file_table_adapter(spark):
    from logjuicer_spark.config import FileSetConfig
    from logjuicer_spark.pipeline import from_log_table, run

    def file_rows(source, lines):
        return [
            {"source": source, "line_nr": i, "text": t}
            for i, t in enumerate(lines, start=1)
        ]

    base_lines = [
        "2024-03-01 10:00:01,123 INFO api request id=req-8f3a2b1c served quickly",
        "2024-03-01 10:00:02,456 INFO api request id=req-77ab12ef served quickly",
        "worker heartbeat sequence 42 nominal",
    ]
    fail_lines = [
        "2024-03-01 11:00:01,123 INFO api request id=req-99ff00aa served quickly",
        "Traceback oops unexpected failure in request handler",
        "worker heartbeat sequence 43 nominal",
    ]
    baseline = spark.createDataFrame(
        file_rows("builds/2/api.log", base_lines)
        + file_rows("builds/2/ignored.py", ["python code not logs"]),
        "source string, line_nr long, text string",
    )
    target = spark.createDataFrame(
        file_rows("builds/7/api.log", fail_lines),
        "source string, line_nr long, text string",
    )
    fs = FileSetConfig()
    b = from_log_table(baseline, fileset=fs)
    t = from_log_table(target, fileset=fs)
    # both api.log files group under the same IndexName despite build ids
    assert b.select("tool").distinct().collect()[0].tool == "builds/api.log"
    out = run(spark, t, baseline_turns=b)
    anoms = out["anomalies"].collect()
    assert len(anoms) == 1
    assert anoms[0].turn_idx == 2 and "Traceback oops" in anoms[0].text
    assert anoms[0].tool == "builds/api.log"


def test_unknown_route(spark):
    # a tool with no baseline index routes to 'unknown' untouched
    # (model.rs:665-673); needs >= 2 trained groups so the single-index
    # fallback does not kick in
    rows_b = []
    for i, tool in [(1, "bash"), (2, "read"), (3, "bash"), (4, "read")]:
        rows_b.append({"conv_id": "b1", "turn_idx": i, "role": "tool",
                       "tool": tool, "ts": None,
                       "text": f"steady state line alpha beta {tool}"})
    rows_t = [
        {"conv_id": "t1", "turn_idx": 1, "role": "tool", "tool": "bash",
         "ts": None, "text": "steady state line alpha beta bash"},
        {"conv_id": "t1", "turn_idx": 2, "role": "tool", "tool": "mystery",
         "ts": None, "text": "completely unheard of failure gamma delta"},
    ]
    out = pipeline.run(
        spark,
        gen.to_spark_df(spark, rows_t),
        baseline_turns=gen.to_spark_df(spark, rows_b),
    )
    routed = {r.turn_idx: r.route for r in out["routed"].collect()}
    assert routed == {1: "normal", 2: "unknown"}


def test_json_file_type_parse(spark):
    from logjuicer_spark.pipeline import PipelineConfig, parse

    rows = [
        {"conv_id": "c1", "turn_idx": 1, "role": "tool", "tool": "bash",
         "ts": None, "text": '[42, 43,\n {"key": "value", o:[1,2]}]'},
    ]
    df = gen.to_spark_df(spark, rows)
    got = [
        r.text
        for r in parse(df, PipelineConfig(file_type="json"))
        .orderBy("sub_idx")
        .collect()
    ]
    # iterator.rs:424-442 golden pieces (empty pieces dropped by parse)
    assert got == ["42", " 43", " ", '"key": "value"', " o:", "1", "2"]
