"""Regression tests for the round-2 ADVICE findings and VERDICT point fixes:

1. route() must not crash on parse_timestamps + oversized conversations
   (ADVICE r2 #1): fall back to single-task routing instead of letting
   route_split raise NotImplementedError.
2. MatcherConfig.matches(None) is True for ANY matcher (config.rs:241-248
   `_ => true`): content without a job name takes the first entry.
3. Distributed scorer rounding order matches the broadcast kernel:
   cast the f64 dot to f32 FIRST, then subtract in f32 (ADVICE r2 #3).
4. Connected components iterate to fixpoint: a chain of diameter > 5
   groups correctly (VERDICT "What's wrong" #2).
5. Self-ref marker broadcast is count-guarded: forcing the fallback
   (threshold 0) produces identical output (VERDICT "What's wrong" #1).
6. Known-group membership in the distributed-model path is a broadcast
   join on the group dim, not a collected isin (VERDICT "What's wrong" #3).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline
from logjuicer_spark.targetconfig import MatcherConfig


_TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


# ------------------------------------------------- 1. parse_timestamps split


def test_route_parse_ts_oversized_conv_falls_back(spark, caplog):
    import logging

    b = spark.createDataFrame(
        [("b", i, "log", f"steady {w}", "bash", None)
         for i, w in enumerate(["alpha", "bravo", "charlie"])],
        _TURNS_SCHEMA,
    )
    t = spark.createDataFrame(
        [("t", i, "log", txt, "bash", None)
         for i, txt in enumerate(
             ["steady alpha", "novel explosion one", "steady bravo",
              "steady charlie", "novel detonation two"])],
        _TURNS_SCHEMA,
    )
    cfg = pipeline.PipelineConfig(parse_timestamps=True, max_task_lines=2)
    model_df = M.train(pipeline.parse(b, cfg))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    enriched = pipeline.enrich(pipeline.parse(t, cfg), bc, cfg, count_scored=False)

    def snap(df):
        return sorted(
            (r.conv_id, r.turn_idx, r.sub_idx, r.route) for r in df.collect()
        )

    # the conversation has 5 lines > max_task_lines=2: pre-fix this raised
    # NotImplementedError from route_split
    with caplog.at_level(logging.WARNING, logger="logjuicer_spark.pipeline"):
        got = snap(pipeline.route(enriched, cfg, allow_split=True))
    assert got == snap(pipeline._route_single(enriched, cfg))
    assert any("skipping the monster-conversation split" in r.message
               for r in caplog.records)
    pipeline.release_stage_caches()


# ---------------------------------------------- 2. matcher without job name


def test_matcher_matches_content_without_job_name():
    # config.rs:241-248: `_ => true` — content with no job name matches ANY
    # matcher, so the FIRST entry's config applies (not the default fallback)
    assert MatcherConfig(job_re="^gate-.*$").matches(None) is True
    assert MatcherConfig(job_re=None).matches(None) is True
    assert MatcherConfig(job_re="^gate-.*$").matches("gate-py312") is True
    assert MatcherConfig(job_re="^gate-.*$").matches("periodic-x") is False


def test_config_first_matcher_wins_without_job_name():
    from logjuicer_spark.targetconfig import Config

    cfg = Config.from_data(
        [
            {"match_job": "^gate-.*$",
             "config": {"ignore_patterns": ["FIRST"]}},
            {"config": {"ignore_patterns": ["SECOND"]}},
        ]
    )
    assert cfg.get_target_config(None).ignore_patterns == ("FIRST",)


# ------------------------------------------ 3. distributed scorer rounding


def _find_rounding_witness():
    """A double d in (0,1) where f32(1.0 - d) != f32(1.0) - f32(d): proves
    the assertion below discriminates the two formula orders."""
    rng = np.random.default_rng(7)
    for _ in range(20000):
        d = float(rng.uniform(0.05, 0.95))
        old = np.float32(1.0 - d)
        new = np.float32(1.0) - np.float32(d)
        if old != new:
            return d
    raise AssertionError("no rounding witness found")


def test_distributed_score_casts_dot_to_f32_before_subtract(spark):
    from logjuicer_spark.score import score_join

    d = _find_rounding_witness()
    # one target entry x one model coordinate in the same bucket: the dot is
    # the single product tval*mval with no sum-order ambiguity
    tval = float(np.float32(np.sqrt(d)))
    mval = float(np.float32(d / tval))
    t = spark.createDataFrame(
        [("bash", "k", "s0", 1, tval)],
        "tool string, dkey string, skey string, bucket int, tval float",
    )
    m = spark.createDataFrame(
        [("bash", 0, 1, mval)],
        "group_key string, row_id int, bucket int, mval float",
    )
    winners = spark.createDataFrame(
        [("bash", "k", "s0")], "tool string, dkey string, skey string"
    )
    [row] = score_join(t, m, winners, single_index=False).collect()
    dot = float(np.float64(np.float32(tval)) * np.float64(np.float32(mval)))
    want = np.float32(1.0) - np.float32(dot)  # the kernel's order
    assert np.float32(row.score) == want
    # and the test is a real discriminator whenever the witness transfers
    # through the product (it does for the vast majority of draws)
    if np.float32(1.0 - dot) != want:
        assert np.float32(row.score) != np.float32(1.0 - dot)


def test_kernel_and_distributed_agree_exactly_single_product():
    # pure-numpy mirror of the kernel's tail: f32(1) - f32(dot), clamped
    d = _find_rounding_witness()
    assert np.float32(1.0) - np.float32(d) == np.float32(
        min(np.float32(1.0), np.float32(1.0) - np.float32(d))
    )


# ----------------------------------------------- 4. fixpoint min-label CC


def test_dedup_groups_chain_diameter_8(spark):
    from logjuicer_spark.extras import dedup

    n = 10  # path graph d0-d1-...-d9: diameter 9, needs >5 rounds
    sigs = spark.createDataFrame([(f"d{i}",) for i in range(n)], "id string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    groups = dedup.minhash_dedup_groups(pairs, sigs)
    got = {r.id: r.keep_id for r in groups.collect()}
    assert got == {f"d{i}": "d0" for i in range(n)}


def test_dedup_groups_logs_residual_when_bound_trips(spark, caplog):
    import logging

    from logjuicer_spark.extras import dedup

    n = 8
    sigs = spark.createDataFrame([(f"d{i}",) for i in range(n)], "id string")
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    with caplog.at_level(logging.WARNING, logger="logjuicer_spark.extras.dedup"):
        dedup.minhash_dedup_groups(pairs, sigs, max_iters=2).collect()
    assert any("did not converge" in r.message for r in caplog.records)


# ------------------------------------- 5. self-ref marker broadcast guard


def test_self_ref_guard_fallback_identical(spark):
    rows = [
        {"conv_id": f"c{k}", "turn_idx": i, "role": "tool", "tool": "bash",
         "ts": None, "text": t}
        for k in range(3)
        for i, t in enumerate(
            [f"alpha {k}", "TASK [run-logjuicer here]", f"beta {k}"], start=1
        )
    ]
    df = gen.to_spark_df(spark, rows)
    cfg = pipeline.PipelineConfig(self_ref_marker="TASK [run-logjuicer")

    def snap():
        return sorted(
            (r.conv_id, r.turn_idx, r.sub_idx, r.text)
            for r in pipeline.parse(df, cfg).collect()
        )

    want = snap()
    assert [t for _, _, _, t in want] == ["alpha 0", "alpha 1", "alpha 2"]
    # AQE runtime stats (not a static hint) pick the join strategy, so the
    # cut must be identical with AQE forced off (plain shuffle join)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert snap() == want
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_self_ref_parse_is_lazy(spark):
    """round-4: parse() with self_ref_marker set must run ZERO Spark jobs
    at plan-construction time (the round-3 count-guard fired a full input
    scan per parse() call — illegal under streaming composition). Jobs
    submitted from this thread during parse() would carry the job group."""
    rows = [
        {"conv_id": "c0", "turn_idx": 1, "role": "tool", "tool": "bash",
         "ts": None, "text": "alpha"},
        {"conv_id": "c0", "turn_idx": 2, "role": "tool", "tool": "bash",
         "ts": None, "text": "TASK [run-logjuicer here]"},
    ]
    df = gen.to_spark_df(spark, rows)
    cfg = pipeline.PipelineConfig(self_ref_marker="TASK [run-logjuicer")
    sc = spark.sparkContext
    sc.setJobGroup("lazy_parse_probe", "plan construction must run no jobs")
    try:
        plan = pipeline.parse(df, cfg)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("lazy_parse_probe")) == []
    # and the plan still evaluates correctly afterwards
    assert [r.text for r in plan.collect()] == ["alpha"]


# ------------------------------------- 7. small-input driver-side trainer


def test_train_collected_equals_distributed(spark):
    b, t, _ = gen.generate_corpus(
        n_baseline_convs=4, n_target_convs=2, turns_per_conv=40, seed=23
    )
    cfg = pipeline.PipelineConfig()
    parsed_b = pipeline.parse(gen.to_spark_df(spark, b), cfg)
    dist_df = M.train(parsed_b, group_col=cfg.group_col)
    dist_idx = M.collect_indexes(dist_df)
    loc_idx, loc_df = M.train_collected(spark, parsed_b, group_col=cfg.group_col)

    def snap(df):
        return sorted(
            (r.group_key, r.row_id, tuple(r.indices),
             tuple(round(v, 7) for v in r.values),
             r.model_version, r.line_count, r.byte_count)
            for r in df.collect()
        )

    assert snap(loc_df) == snap(dist_df)
    assert set(loc_idx) == set(dist_idx)
    for g in dist_idx:
        a, b_ = dist_idx[g], loc_idx[g]
        assert a.nrows == b_.nrows and a.nnz == b_.nnz
        probe = ["totally novel probe line", "login channel alpine bucket-3 x=1"]
        assert list(a.score(probe)) == list(b_.score(probe))


# --------------------------------- 6. broadcast join for known-group dim


def test_known_groups_broadcast_join_multi_group(spark):
    b = spark.createDataFrame(
        [("b1", 0, "log", "steady alpha", "bash", None),
         ("b1", 1, "log", "steady bravo", "bash", None),
         ("b2", 0, "log", "calm delta", "zsh", None),
         ("b2", 1, "log", "calm echo", "zsh", None)],
        _TURNS_SCHEMA,
    )
    t = spark.createDataFrame(
        [("t", 0, "log", "steady alpha", "bash", None),
         ("t", 1, "log", "calm delta", "zsh", None),
         ("t", 2, "log", "mystery line", "fish", None)],
        _TURNS_SCHEMA,
    )
    cfg = pipeline.PipelineConfig()
    model_df = M.train(pipeline.parse(b, cfg))
    enriched = pipeline.enrich(
        pipeline.parse(t, cfg), None, cfg, count_scored=False, model_df=model_df
    )
    # the membership tag must be a broadcast join on the group dim, not a
    # driver-collected isin burned into the plan
    plan = enriched._jdf.queryExecution().toString()
    assert "_known_g" in plan
    assert "isin" not in plan.lower()
    rows = {r.turn_idx: r.is_known for r in enriched.collect()}
    pipeline.release_stage_caches()
    assert rows == {0: True, 1: True, 2: False}
