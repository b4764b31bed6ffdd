"""Round-4 regression tests.

1. The route stage's dirty-conversation dim derived from the scored
   winners (skey -> conv) must produce IDENTICAL routed output to the
   enriched-scan stats pass it replaces, on corpora with anomalies,
   skip_duplicate on, and unknown tools present.
2. The dim is safe on a filtered input (monster-split shape): extra conv
   ids that are absent from the input must not change the output.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline


def _corpus(spark, seed=5):
    b, t, exp = gen.generate_corpus(
        n_baseline_convs=4, n_target_convs=6, turns_per_conv=40, seed=seed
    )
    return gen.to_spark_df(spark, b), gen.to_spark_df(spark, t), exp


def _routed_rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.sub_idx, r.route, r.text,
         None if r.score is None else round(float(r.score), 6),
         tuple(r.before or []), tuple(r.after or []))
        for r in df.collect()
    )


def _enrich_both(spark, baseline, target, cfg):
    parsed_b = pipeline.parse(baseline, cfg)
    model_df = M.train(parsed_b)
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    parsed_t = pipeline.parse(target, cfg)
    return pipeline.enrich(parsed_t, bc, cfg, return_scored=True)


def test_dirty_dim_routing_equals_stats_routing(spark):
    baseline, target, exp = _corpus(spark)
    cfg = pipeline.PipelineConfig()
    enriched, scored = _enrich_both(spark, baseline, target, cfg)

    dirty_dim = pipeline._dirty_conv_dim(scored, cfg)
    via_stats = pipeline._route_single(enriched, cfg, clean_split=True)
    via_dim = pipeline._route_single(
        enriched, cfg, clean_split=True, dirty_conv_dim=dirty_dim, n_convs=6
    )
    want = _routed_rows(via_stats)
    assert _routed_rows(via_dim) == want
    # and the anomaly set matches the generator's expectations
    anoms = sorted({(r[0], r[1]) for r in want if r[3] == "anomaly"})
    assert anoms == sorted({(c, i) for c, i, _ in exp})


def test_dirty_dim_with_absent_convs_is_harmless(spark):
    baseline, target, _ = _corpus(spark, seed=9)
    cfg = pipeline.PipelineConfig()
    enriched, scored = _enrich_both(spark, baseline, target, cfg)
    dirty_dim = pipeline._dirty_conv_dim(scored, cfg)
    # keep only half the conversations in the input (the monster-split
    # shape: _route_single(small, ...) receives the GLOBAL dim)
    keep = [r[0] for r in sorted(
        {(r.conv_id,) for r in enriched.select("conv_id").distinct().collect()}
    )][:3]
    sub = enriched.filter(F.col("conv_id").isin(keep))
    via_stats = pipeline._route_single(sub, cfg, clean_split=True)
    via_dim = pipeline._route_single(
        sub, cfg, clean_split=True, dirty_conv_dim=dirty_dim, n_convs=3
    )
    assert _routed_rows(via_dim) == _routed_rows(via_stats)


def test_run_big_path_uses_dim_and_matches_small_path(spark):
    """run() forced onto the big path (input_rows above the small bound)
    must emit the same anomaly set as the small path on the same corpus."""
    baseline, target, exp = _corpus(spark, seed=13)
    small = pipeline.run(spark, target, baseline_turns=baseline)
    big = pipeline.run(
        spark, target, baseline_turns=baseline,
        input_rows=10**9, small_input_rows=0,
    )
    k = lambda out: sorted(
        (r.conv_id, r.turn_idx, r.text) for r in out["anomalies"].collect()
    )
    assert k(big) == k(small)
    assert {(c, t) for c, t, _ in k(big)} == {(c, i) for c, i, _ in exp}


def test_known_groups_dim_single_index_covers_target_tools(spark):
    """Oracle-staging parity with lookup_or_single (model.rs:857-869): a
    single-group model makes EVERY tool known, so the staged membership
    dim must be the target's group universe, not the model's one key."""
    from logjuicer_spark.entry_queries import _known_groups_dim

    model_single = spark.createDataFrame(
        [("bash", 0)], "group_key string, row_id int"
    )
    model_multi = spark.createDataFrame(
        [("bash", 0), ("python", 0)], "group_key string, row_id int"
    )
    parsed = spark.createDataFrame(
        [("c0", "bash"), ("c0", "web"), ("c1", "web")], "conv_id string, tool string"
    )
    got_single = sorted(
        r.group_key for r in _known_groups_dim(model_single, parsed).collect()
    )
    assert got_single == ["bash", "web"]
    got_multi = sorted(
        r.group_key for r in _known_groups_dim(model_multi, parsed).collect()
    )
    assert got_multi == ["bash", "python"]
