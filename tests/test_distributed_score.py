"""Distributed scoring join (the oversized-model escape hatch) must agree
with the broadcast numpy kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dist"))
    b, t, exp = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=4, turns_per_conv=30, seed=11
    )
    gen.to_spark_df(spark, b).write.mode("overwrite").parquet(f"{d}/baseline")
    gen.to_spark_df(spark, t).write.mode("overwrite").parquet(f"{d}/target")
    return d, sorted((c, i) for c, i, _ in exp)


def _snap(out):
    return sorted(
        (r.conv_id, r.turn_idx, round(float(r.score), 5))
        for r in out["anomalies"].collect()
    )


def test_run_falls_back_to_distributed_scoring(spark, corpus, monkeypatch):
    d, expected = corpus
    b = spark.read.parquet(f"{d}/baseline")
    t = spark.read.parquet(f"{d}/target")
    want = _snap(pipeline.run(spark, t, baseline_turns=b))
    assert [(c, i) for c, i, _ in want] == expected
    # force the driver-collect budget to zero ON THE BIG PATH
    # (small_input_rows=0 — the small path's driver trainer is bounded by
    # construction and exempt from the nnz budget): run() must fall back
    # to the join formulation and produce the same anomalies and scores
    monkeypatch.setenv("LOGJUICER_MAX_MODEL_NNZ", "0")
    got = _snap(pipeline.run(spark, t, baseline_turns=b, small_input_rows=0))
    assert got == want


def test_small_target_big_baseline_guard(spark, monkeypatch):
    """A small TARGET must not let an over-threshold BASELINE be collected
    by the driver-side trainer: run()'s small decision probes BOTH sides,
    so a big baseline routes to the big path (distributed trainer +
    budgeted collect). Also asserts the positive case: with both sides
    small the driver trainer runs exactly once."""
    b_rows, t_rows, _ = gen.generate_corpus(
        n_baseline_convs=5, n_target_convs=1, turns_per_conv=30, seed=17
    )
    b = gen.to_spark_df(spark, b_rows)   # ~150 rows
    t = gen.to_spark_df(spark, t_rows)   # ~30 rows
    n_b, n_t = b.count(), t.count()
    assert n_t <= 100 < n_b  # the scenario the test names must exist

    calls = []
    orig = M.train_collected

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(M, "train_collected", spy)
    want = _snap(pipeline.run(spark, t, baseline_turns=b, small_input_rows=300))
    assert calls == [1]  # both sides small: driver trainer ran once

    calls.clear()
    monkeypatch.setenv("LOGJUICER_MAX_MODEL_NNZ", "0")
    got = _snap(pipeline.run(spark, t, baseline_turns=b, small_input_rows=100))
    assert calls == []  # big baseline: big path, no driver collect
    assert got == want  # ... and the budget-forced distributed fallback agrees


def test_scored_outputs_bit_close(spark, corpus):
    """Compare the scored dims directly: every (tool, dkey) distance within
    f32 tolerance between the two formulations, including no-overlap rows
    (distance exactly 1.0)."""
    d, _ = corpus
    cfg = pipeline.PipelineConfig()
    b = pipeline.parse(spark.read.parquet(f"{d}/baseline"), cfg)
    t = pipeline.parse(spark.read.parquet(f"{d}/target"), cfg)
    model_df = M.train(b)
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))

    def scored_map(enriched):
        scored = pipeline._SCORED_REFS[-1]
        rows = {(r.tool, r.dkey): float(r.score) for r in scored.collect()}
        pipeline.release_stage_caches()
        return rows

    e1 = pipeline.enrich(t, bc, cfg, count_scored=False)
    e1.count()
    s1 = scored_map(e1)
    e2 = pipeline.enrich(t, None, cfg, count_scored=False, model_df=model_df)
    e2.count()
    s2 = scored_map(e2)
    assert set(s1) == set(s2) and len(s1) > 0
    for k, v in s1.items():
        assert abs(v - s2[k]) < 1e-6, (k, v, s2[k])
    # exact 1.0 distances (no bucket overlap) must be exactly 1.0 both ways
    ones = [k for k, v in s1.items() if v == 1.0]
    assert all(s2[k] == 1.0 for k in ones)


def test_single_index_fallback_distributed(spark):
    """A one-group model matches every tool (lookup_or_single,
    model.rs:857-869) — the distributed join must honor it too."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    b = spark.createDataFrame(
        [("b", i, "log", f"baseline {w} steady", "solo", None)
         for i, w in enumerate(["alpha", "bravo", "charlie"])],
        schema,
    )
    t = spark.createDataFrame(
        [("t", 0, "log", "baseline alpha steady", "other-tool", None),
         ("t", 1, "log", "genuinely novel explosion", "third-tool", None)],
        schema,
    )
    cfg = pipeline.PipelineConfig()
    model_df = M.train(pipeline.parse(b, cfg))
    enriched = pipeline.enrich(
        pipeline.parse(t, cfg), None, cfg, count_scored=False, model_df=model_df
    )
    rows = {r.turn_idx: r for r in enriched.collect()}
    pipeline.release_stage_caches()
    assert rows[0].is_known and rows[1].is_known
    assert float(rows[0].score) < 0.3 < float(rows[1].score)


def test_hot_bucket_salting_preserves_scores(spark, corpus):
    """Force salting on every bucket (threshold 0, 4 salts): the dot sums
    are a repartitioning of the same pair multiset, so scores must match
    the unsalted join within f32 tolerance."""
    from logjuicer_spark.score import explode_model, score_join, vectorize_entries

    d, _ = corpus
    cfg = pipeline.PipelineConfig()
    b = pipeline.parse(spark.read.parquet(f"{d}/baseline"), cfg)
    t = pipeline.parse(spark.read.parquet(f"{d}/target"), cfg)
    model_df = M.train(b)
    winners = (
        t.filter(~F.col("is_ignored"))
        .withColumn("_skey", F.expr("concat_ws(char(0), conv_id, lpad(turn_idx, 10, '0'), lpad(sub_idx, 6, '0'))"))
        .groupBy("tool", "dkey")
        .agg(F.min("_skey").alias("skey"), F.min_by("tokens", "_skey").alias("tokens"))
    )
    tv = vectorize_entries(winners)
    m = explode_model(model_df)
    plain = {(r.tool, r.dkey): float(r.score)
             for r in score_join(tv, m, winners, False, hot_bucket_rows=10**9).collect()}
    salted = {(r.tool, r.dkey): float(r.score)
              for r in score_join(tv, m, winners, False, hot_bucket_rows=0, hot_salts=4).collect()}
    assert set(plain) == set(salted) and len(plain) > 0
    for k, v in plain.items():
        assert abs(v - salted[k]) < 1e-6


def test_bucketed_model_reuse_no_model_exchange(spark, corpus):
    """save_exploded_model persists the join-side layout bucketed by the
    join keys: a repeat scoring run reads it with NO model-side exchange
    (storage-partitioned join) and produces identical scores."""
    from logjuicer_spark.score import (
        explode_model, load_exploded_model, save_exploded_model,
        score_join, vectorize_entries,
    )

    d, _ = corpus
    cfg = pipeline.PipelineConfig()
    b = pipeline.parse(spark.read.parquet(f"{d}/baseline"), cfg)
    t = pipeline.parse(spark.read.parquet(f"{d}/target"), cfg)
    model_df = M.train(b)
    winners = (
        t.filter(~F.col("is_ignored"))
        .withColumn("_skey", F.expr("concat_ws(char(0), conv_id, lpad(turn_idx, 10, '0'), lpad(sub_idx, 6, '0'))"))
        .groupBy("tool", "dkey")
        .agg(F.min("_skey").alias("skey"), F.min_by("tokens", "_skey").alias("tokens"))
    )
    tv = vectorize_entries(winners)

    table = "lj_test_bucketed_model"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    save_exploded_model(model_df, table, buckets=8)
    try:
        mb = load_exploded_model(spark, table)
        # static plans (no AQE, no auto-broadcast) make the exchange count
        # deterministic: the ad-hoc exploded model must shuffle; the
        # bucketed one must not
        old = {
            "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
            "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        }
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = score_join(tv, explode_model(model_df), winners, False,
                               hot_bucket_rows=None)
            bucketed = score_join(tv, mb, winners, False, hot_bucket_rows=None)
            p_plain = plain._jdf.queryExecution().executedPlan().toString()
            p_bucketed = bucketed._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in p_bucketed
            # the model side hashes on (group_key, bucket): the ad-hoc
            # exploded model must exchange on it, the bucketed table must
            # NOT (its storage layout IS that partitioning)
            assert "Exchange hashpartitioning(group_key" in p_plain
            assert "Exchange hashpartitioning(group_key" not in p_bucketed
            assert p_bucketed.count("Exchange") < p_plain.count("Exchange")
            s_plain = {(r.tool, r.dkey): float(r.score) for r in plain.collect()}
            s_bucketed = {(r.tool, r.dkey): float(r.score) for r in bucketed.collect()}
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
        assert set(s_plain) == set(s_bucketed) and len(s_plain) > 0
        for k, v in s_plain.items():
            assert abs(v - s_bucketed[k]) < 1e-6, k
        # exact 1.0 (no overlap) rows stay exactly 1.0
        assert all(s_bucketed[k] == 1.0 for k, v in s_plain.items() if v == 1.0)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
