"""Scale-guard tests: the global-dedup join's broadcast fallback and the
model driver-collect nnz budget."""

import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("guards"))
    b, t, exp = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=4, turns_per_conv=30, seed=11
    )
    gen.to_spark_df(spark, b).write.mode("overwrite").parquet(f"{d}/baseline")
    gen.to_spark_df(spark, t).write.mode("overwrite").parquet(f"{d}/target")
    return d, sorted((c, i) for c, i, _ in exp)


def _anoms(out):
    return sorted(
        (r.conv_id, r.turn_idx, round(float(r.score), 6))
        for r in out["anomalies"].collect()
    )


def test_global_dedup_shuffle_fallback_identical(spark, corpus, monkeypatch):
    d, expected = corpus
    b = spark.read.parquet(f"{d}/baseline")
    t = spark.read.parquet(f"{d}/target")
    base = _anoms(pipeline.run(spark, t, baseline_turns=b))
    assert [(c, i) for c, i, _ in base] == expected
    # force the non-broadcast path for BOTH the scored dim and the
    # global-dedup dim: routed output must be identical
    monkeypatch.setattr(pipeline, "_BROADCAST_SCORED_ROWS", 0)
    fallback = _anoms(pipeline.run(spark, t, baseline_turns=b))
    assert fallback == base


def test_model_collect_nnz_guard(spark):
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    b = spark.createDataFrame(
        [("c", i, "log", f"guard line {w}", "bash", None)
         for i, w in enumerate(["alpha", "bravo", "charlie"])],
        schema,
    )
    m = M.train(pipeline.parse(b))
    with pytest.raises(ValueError, match="nonzeros > budget"):
        M.collect_indexes(m, max_nnz=1)
    idx = M.collect_indexes(m)  # default budget: fine
    assert set(idx) == {"bash"} and idx["bash"].nrows == 3
