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


# ------------------------- third review round (model/similarity/ts/cli) --


def test_model_load_rejects_empty_and_null_version(spark, tmp_path):
    import pyspark.sql.types as T

    from logjuicer_spark.model import MODEL, load

    empty = str(tmp_path / "empty_model")
    spark.createDataFrame([], MODEL).write.parquet(empty)
    with pytest.raises(ValueError, match="empty"):
        load(spark, empty)

    nullver = str(tmp_path / "nullver_model")
    fields = [
        T.StructField(f.name, T.StringType() if f.name == "model_version" else f.dataType)
        for f in MODEL.fields
    ]
    row = {f.name: None for f in MODEL.fields}
    row.update(group_key="g", row_id=0, indices=[1], values=[1.0])
    spark.createDataFrame([tuple(row[f.name] for f in MODEL.fields)],
                          T.StructType(fields)).write.parquet(nullver)
    with pytest.raises(ValueError, match="model_version"):
        load(spark, nullver)


def test_merge_keeps_first_model_internal_duplicates(spark):
    """nub_vstack parity (vstack.rs:38-41): rows of the FIRST matrix append
    unconditionally (internal duplicates kept); later models dedup against
    everything already accepted."""
    import datetime as dt

    from logjuicer_spark.model import MODEL, MODEL_VERSION, merge

    now = dt.datetime.now(dt.timezone.utc)

    def mk(rows, lc, bc):
        return spark.createDataFrame(
            [("g", i, inds, vals, MODEL_VERSION, now, lc, bc)
             for i, (inds, vals) in enumerate(rows)],
            MODEL,
        )

    dup = ([1, 2], [1.0, -1.0])
    a = mk([dup, dup, ([3], [1.0])], 10, 100)       # internal duplicate
    b = mk([dup, ([4], [-1.0])], 5, 50)             # dup vs A + one new
    got = sorted(
        (r.row_id, tuple(r.indices)) for r in merge([a, b]).collect()
    )
    # A keeps BOTH duplicate rows; B contributes only [4]
    assert [t for _, t in got] == [(1, 2), (1, 2), (3,), (4,)]
    meta = merge([a, b]).select("line_count", "byte_count").first()
    assert (meta.line_count, meta.byte_count) == (15, 150)


def test_timestamp_unpadded_and_leap_second():
    from logjuicer_spark.timestamps import FULL, TIME, parse_timestamp

    # chrono numeric specifiers accept 1-2 digits
    k, v = parse_timestamp("2024-2-7 9:15:54 worker ready")
    assert k == FULL
    import calendar
    assert v == calendar.timegm((2024, 2, 7, 9, 15, 54)) * 1000
    # leap second lands in the next minute's .000 (+1000ms), not a clamp
    k59, v59 = parse_timestamp("2024-01-01 23:59:59")
    k60, v60 = parse_timestamp("2024-01-01 23:59:60")
    assert v60 - v59 == 1000
    # syslog TIME path too
    _, t60 = parse_timestamp("Feb 27 11:06:60 ")
    _, t59 = parse_timestamp("Feb 27 11:06:59 ")
    assert t60 - t59 == 1000


def test_similarity_orders_by_group_source_count(spark):
    """similarity.rs:42-44: GROUPS order by their own source count, rows
    of one group contiguous — not interleaved by per-anomaly n_sources."""
    from logjuicer_spark.similarity import similarity_report

    rows = [
        # group big: 3 sources, but its second anomaly appears in 1 source
        dict(target_id=0, conv_id="a", turn_idx=1, sub_idx=0, tool="big",
             text="x", tokens="x"),
        dict(target_id=1, conv_id="b", turn_idx=1, sub_idx=0, tool="big",
             text="x2", tokens="x"),
        dict(target_id=2, conv_id="c", turn_idx=1, sub_idx=0, tool="big",
             text="y", tokens="y"),
        # group small: 2 sources, single anomaly in both
        dict(target_id=0, conv_id="d", turn_idx=1, sub_idx=0, tool="small",
             text="z", tokens="z"),
        dict(target_id=1, conv_id="e", turn_idx=1, sub_idx=0, tool="small",
             text="z2", tokens="z"),
    ]
    out = similarity_report(spark.createDataFrame(rows)).collect()
    assert [r.group for r in out] == ["big", "big", "small"]
