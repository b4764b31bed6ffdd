"""Regression tests for the round-1 ADVICE findings:

1. cfg.threshold must reach the context walk (not the module constant)
2. model merge sums line/byte counters and takes MAX created_at
   (model.rs:118-155 mappend/mconcat)
3. literal backslash-r is NOT a sub-line separator (iterator.rs:255-261)
4. the dense and sparse scoring accumulators are bit-identical
5. similarity_report pins the first occurrence's text deterministically
"""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from logjuicer_spark import model as M, pipeline
from logjuicer_spark.context import find_anomalies
from logjuicer_spark.hashing import SparseIndex, build_matrix
from logjuicer_spark.similarity import similarity_report
from logjuicer_spark.splitter import split_lines


# ---------------------------------------------------------------- threshold

def _run_thresh(threshold):
    texts = ["a", "b", "c", "d", "e"]
    positions = np.arange(5)
    is_ignored = np.zeros(5, dtype=bool)
    is_target = np.ones(5, dtype=bool)
    scores = np.array([0.0, 0.6, 0.0, 0.4, 0.0], dtype=np.float32)
    return find_anomalies(
        texts, positions, is_ignored, is_target, scores, threshold=threshold
    )


def test_threshold_param_reaches_context_walk():
    # default 0.3: both 0.6 and 0.4 are anomalies
    assert sorted(a["idx"] for a in _run_thresh(0.3)) == [1, 3]
    # raised to 0.5: the 0.4 line must NOT leak through just because the
    # conversation contains a >0.5 line (the round-1 bug)
    assert sorted(a["idx"] for a in _run_thresh(0.5)) == [1]
    # lowered to 0.2: scores in (0.2, 0.3] must not be silently dropped
    scores_mid = np.array([0.25, 0.0, 0.0, 0.0, 0.0], dtype=np.float32)
    out = find_anomalies(
        ["a", "b", "c", "d", "e"], np.arange(5), np.zeros(5, bool),
        np.ones(5, bool), scores_mid, threshold=0.2,
    )
    assert [a["idx"] for a in out] == [0]


def test_pipeline_cfg_threshold_end_to_end(spark):
    # two target lines: one scores ~1.0 (novel), one is in the baseline
    # (score 0). With threshold raised past 1.0 nothing is an anomaly.
    rows_b = [("b-0", i, "log", f"steady line {w}", "bash", None)
              for i, w in enumerate(["x", "y", "z"])]
    rows_t = [("t-0", 0, "log", "steady line x", "bash", None),
              ("t-0", 1, "log", "totally novel explosion", "bash", None)]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    b = spark.createDataFrame(rows_b, schema)
    t = spark.createDataFrame(rows_t, schema)
    out_lo = pipeline.run(spark, t, baseline_turns=b)
    assert out_lo["anomalies"].count() == 1
    cfg_hi = pipeline.PipelineConfig(threshold=1.5)
    out_hi = pipeline.run(spark, t, baseline_turns=b, cfg=cfg_hi)
    assert out_hi["anomalies"].count() == 0


# ------------------------------------------------------------- model merge

def test_merge_sums_counters_and_takes_max_created_at(spark):
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    # words long enough to survive tokenizer masking (short tokens mask to %ID)
    w1 = ["alpha", "bravo", "charlie"]
    w2 = ["delta", "echo", "foxtrot", "golf", "alpha"]  # 'alpha' overlaps m1
    b1 = spark.createDataFrame(
        [("c1", i, "log", f"first {w}", "bash", None) for i, w in enumerate(w1)], schema
    )
    b2 = spark.createDataFrame(
        [("c2", i, "log", f"second {w}", "bash", None) for i, w in enumerate(w2)], schema
    )
    m1 = M.train(pipeline.parse(b1))
    m2 = M.train(pipeline.parse(b2))
    old = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    new = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    m1 = m1.withColumn("created_at", F.lit(old))
    m2 = m2.withColumn("created_at", F.lit(new))
    merged = M.merge([m1, m2])
    meta = (
        merged.select("group_key", "line_count", "byte_count", "created_at")
        .distinct()
        .collect()
    )
    assert len(meta) == 1
    r = meta[0]
    # mappend SUMS counters across constituent indexes (model.rs:118-127)
    assert r.line_count == 3 + 5
    b1_bytes = sum(len(f"first {w}") for w in w1)
    b2_bytes = sum(len(f"second {w}") for w in w2)
    assert r.byte_count == b1_bytes + b2_bytes
    # ... and takes the NEWEST created_at (max), so merged models do not
    # spuriously fail the max_age_days check
    assert r.created_at.replace(tzinfo=dt.timezone.utc) == new
    # row payloads: union of distinct token-set rows
    assert merged.count() == 8


# ---------------------------------------------------------------- splitter

def test_literal_backslash_r_is_not_subline():
    assert split_lines("a\\rb") == [("a\\rb", 1)]
    assert split_lines("a\\nb") == [("a", 1), ("b", 1)]


def test_jvm_subline_regex_matches_reference(spark):
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    df = spark.createDataFrame(
        [("c", 0, "log", "x\\ry", "bash", None), ("c", 1, "log", "x\\ny", "bash", None)],
        schema,
    )
    parsed = pipeline.parse(df).select("turn_idx", "sub_idx", "text").collect()
    got = sorted((r.turn_idx, r.sub_idx, r.text) for r in parsed)
    assert got == [(0, 0, "x\\ry"), (1, 0, "x"), (1, 1, "y")]


# ------------------------------------------------------------ f32 discipline

def test_dense_and_sparse_score_paths_bit_identical(monkeypatch):
    rng = np.random.default_rng(7)
    base = [f"alpha beta w{rng.integers(0, 40)} t{i % 97}" for i in range(500)]
    idx = build_matrix(base)
    targets = [f"alpha beta w{i % 40} t{i % 97} extra{i % 5}" for i in range(300)]
    dense = idx.score(targets)
    monkeypatch.setattr(SparseIndex, "_DENSE_CELLS", 0)
    sparse = idx.score(targets)
    assert dense.dtype == np.float32 and sparse.dtype == np.float32
    assert np.array_equal(dense, sparse)


# ------------------------------------------------------------- similarity

def test_similarity_first_text_pinned(spark):
    rows = [
        dict(target_id=1, conv_id="z", turn_idx=2, sub_idx=0, tool="bash",
             text="boom LATER", tokens="boom alpha"),
        dict(target_id=0, conv_id="x", turn_idx=3, sub_idx=0, tool="bash",
             text="boom FIRST", tokens="boom alpha"),
        dict(target_id=0, conv_id="y", turn_idx=1, sub_idx=0, tool="bash",
             text="boom SECOND", tokens="boom alpha"),
    ]
    # shuffle across partitions so F.first would be free to pick any row
    df = spark.createDataFrame(rows).repartition(4)
    out = similarity_report(df).collect()
    assert len(out) == 1
    assert out[0].text == "boom FIRST"
    assert out[0].conv_id == "x" and out[0].first_target == 0


def test_human_duration_reference_goldens():
    # cli/main.rs:833-840
    from logjuicer_spark.cli import human_duration

    assert human_duration(0.320) == "320ms"
    assert human_duration(2.300) == "2.30s"
    assert human_duration(90.0) == "1m30s"
    assert human_duration(42 * 3600 + 2) == "42h00m"
