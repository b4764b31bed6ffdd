"""CLI round-trip + model persistence/merge tests."""

import json
import shutil
import tempfile

import pytest

from logjuicer_spark import MODEL_VERSION, gen, model as M, pipeline
from logjuicer_spark.cli import main as cli_main


@pytest.fixture(scope="module")
def corpus_dirs(spark):
    baseline_rows, target_rows, expected = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=4, turns_per_conv=25, seed=9
    )
    d = tempfile.mkdtemp(prefix="cli_")
    gen.to_spark_df(spark, baseline_rows).write.parquet(f"{d}/baseline")
    gen.to_spark_df(spark, target_rows).write.parquet(f"{d}/target")
    yield d, expected
    shutil.rmtree(d, ignore_errors=True)


def test_model_roundtrip_and_merge(spark, corpus_dirs):
    d, _ = corpus_dirs
    baseline = spark.read.parquet(f"{d}/baseline")
    model_df = pipeline.train_model(spark, baseline)
    M.save(model_df, f"{d}/model")
    loaded = M.load(spark, f"{d}/model")
    assert loaded.filter(f"model_version != {MODEL_VERSION}").count() == 0
    idx1 = M.collect_indexes(model_df)
    idx2 = M.collect_indexes(loaded)
    assert set(idx1) == set(idx2)
    for k in idx1:
        import numpy as np

        assert idx1[k].nrows == idx2[k].nrows
        targets = ["boom failure xyz", "starting container unit done"]
        assert np.allclose(idx1[k].score(targets), idx2[k].score(targets))
    # merge with itself: row-dedup keeps the same matrix (A4/U1 semantics)
    merged = M.merge([loaded, loaded])
    idx3 = M.collect_indexes(merged)
    for k in idx1:
        assert idx3[k].nrows == idx1[k].nrows

    # stale / wrong-version detection
    with pytest.raises(ValueError):
        M.load(spark, f"{d}/model", max_age_days=0.0)


def test_cli_diff_and_errors(spark, corpus_dirs, capsys):
    d, expected = corpus_dirs
    out_dir = f"{d}/out"
    cli_main(["--master", "local[4]", "--out", out_dir, "diff",
              f"{d}/baseline", f"{d}/target"])
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["anomalies"] == len(expected)
    anoms = spark.read.parquet(f"{out_dir}/anomalies")
    got = {(r.conv_id, r.turn_idx) for r in anoms.collect()}
    assert got == {(c, t) for c, t, _ in expected}

    cli_main(["--out", f"{d}/out2", "train", f"{d}/baseline",
              "--model", f"{d}/model2"])
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["groups"] == 4

    cli_main(["--out", f"{d}/out3", "run", f"{d}/target",
              "--model", f"{d}/model2"])
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["anomalies"] == len(expected)


def test_model_metrics_columns(spark, corpus_dirs):
    d, _ = corpus_dirs
    model_df = pipeline.train_model(spark, spark.read.parquet(f"{d}/baseline"))
    rows = model_df.select("group_key", "line_count", "byte_count").distinct().collect()
    # trainer counters: every non-ignored read line, pre-dedup
    # (3 convs x 25 turns, 4 tools cycling -> 18-19 lines per tool per conv)
    per_group = {r.group_key: (r.line_count, r.byte_count) for r in rows}
    assert set(per_group) == {"bash", "read", "http", "search"}
    assert sum(lc for lc, _ in per_group.values()) == 75
    assert all(bc > 0 for _, bc in per_group.values())
