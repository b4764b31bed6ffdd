"""Tests for the similarity report and lineage/resume."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline
from logjuicer_spark.lineage import run_routed_with_resume, verify_lineage
from logjuicer_spark.similarity import similarity_report


def test_similarity_report(spark):
    rows = [
        # target 0: anomaly A in conv x (tool bash), anomaly B in conv y
        dict(target_id=0, conv_id="x", turn_idx=3, sub_idx=0, tool="bash",
             text="boom alpha", tokens="boom alpha"),
        dict(target_id=0, conv_id="y", turn_idx=5, sub_idx=0, tool="bash",
             text="crash beta", tokens="crash beta"),
        # target 1: anomaly A again (co-occurrence), plus C
        dict(target_id=1, conv_id="z", turn_idx=2, sub_idx=0, tool="bash",
             text="boom alpha2", tokens="boom alpha"),
        dict(target_id=1, conv_id="z", turn_idx=9, sub_idx=0, tool="bash",
             text="gamma fail", tokens="gamma fail"),
    ]
    df = spark.createDataFrame(rows)
    out = similarity_report(df).collect()
    by_tokens = {r.tokens: r for r in out}
    assert len(out) == 3
    a = by_tokens["boom alpha"]
    assert a.first_target == 0 and a.conv_id == "x"
    assert a.n_sources == 2  # x@t0 + z@t1
    assert by_tokens["crash beta"].n_sources == 1
    # ordering: most shared first (similarity.rs:42-44)
    assert out[0].tokens == "boom alpha"


@pytest.fixture(scope="module")
def lineage_setup(spark):
    baseline_rows, target_rows, expected = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=8, turns_per_conv=30, seed=7
    )
    baseline = gen.to_spark_df(spark, baseline_rows)
    target = gen.to_spark_df(spark, target_rows)
    cfg = pipeline.PipelineConfig()
    model_df = pipeline.train_model(spark, baseline, cfg)
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    parsed = pipeline.parse(target, cfg)
    enriched = pipeline.enrich(parsed, bc, cfg)
    return enriched, cfg


def test_lineage_resume_exactness(spark, lineage_setup):
    enriched, cfg = lineage_setup
    nb = 8

    # reference run: single pass
    full_dir = tempfile.mkdtemp(prefix="lineage_full_")
    run_routed_with_resume(spark, enriched, cfg, full_dir, "run1", n_buckets=nb)
    full = (
        spark.read.parquet(f"{full_dir}/routed")
        .drop("bucket")
        .orderBy("conv_id", "turn_idx", "sub_idx")
        .collect()
    )

    # crashed run: only half the buckets complete, then resume
    part_dir = tempfile.mkdtemp(prefix="lineage_part_")
    run_routed_with_resume(
        spark, enriched, cfg, part_dir, "run2", n_buckets=nb,
        _bucket_filter=set(range(nb // 2)),
    )
    partial_count = spark.read.parquet(f"{part_dir}/routed").count()
    assert partial_count < len(full)
    # resume: completes only the missing buckets
    run_routed_with_resume(spark, enriched, cfg, part_dir, "run2", n_buckets=nb)
    resumed = (
        spark.read.parquet(f"{part_dir}/routed")
        .drop("bucket")
        .orderBy("conv_id", "turn_idx", "sub_idx")
        .collect()
    )
    assert resumed == full
    assert verify_lineage(spark, part_dir, "run2")
    # idempotence: a third invocation adds nothing
    run_routed_with_resume(spark, enriched, cfg, part_dir, "run2", n_buckets=nb)
    assert spark.read.parquet(f"{part_dir}/routed").count() == len(full)
    shutil.rmtree(full_dir, ignore_errors=True)
    shutil.rmtree(part_dir, ignore_errors=True)
