"""parse() column modes: the fused text->dkey path ("dkey") and the
no-tokenize path ("light") must be exactly equivalent to the full parse
wherever they promise equivalence:

- per-row dkey: identical between the JVM expression over UDF tokens
  ("full") and the fused Python dedup_key(process(text)) UDF ("dkey");
- enrich: identical enriched rows (winner tokens are re-derived from the
  winner's text at winner scale in fused mode);
- train: identical model rows.

Corpus includes the hostile shapes: consume-next lines (password=,
id= with empty value), %-masked words feeding the dkey filter, unicode,
duplicate token-sets across conversations.
"""

import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as M, pipeline
from logjuicer_spark.pipeline import PipelineConfig

LINES = [
    "2024-03-01 10:22:17,123 INFO worker request id=req-abc123f from 10.0.3.9",
    "session password= secretword should consume next",
    "volume id= 77fa8e mounted at /tmp/build-x1/out.log",
    "connection refused repeatedly omegaqq upstream gateway unreachable",
    "naïve café line with unicode ünïcode-page fault",
    "ERROR failed assertion traceback in module alpha",
    "plain short msg",
    "a       b\\ttab\\nseparated payload items",
    'u"quoted" (parens) [brackets] {braces} trailing',
    "key:value pair and path/segment/thing and dash-joined-word-here",
]


def _turns(spark, n_convs=4):
    rows = []
    for c in range(n_convs):
        for i, t in enumerate(LINES):
            rows.append(
                {
                    "conv_id": f"conv-{c:02d}",
                    "turn_idx": i + 1,
                    "role": "tool",
                    "text": f"{t} tail{(c * 7 + i) % 3}",
                    "tool": f"node-{c % 2}",
                    "ts": None,
                }
            )
    return gen.to_spark_df(spark, rows)


def test_fused_dkey_equals_jvm_dkey(spark):
    df = _turns(spark)
    cfg = PipelineConfig()
    key = ["conv_id", "turn_idx", "sub_idx"]
    full = {
        tuple(r[k] for k in key): r["dkey"]
        for r in pipeline.parse(df, cfg).select(*key, "dkey").collect()
    }
    fused = {
        tuple(r[k] for k in key): r["dkey"]
        for r in pipeline.parse(df, cfg, columns="dkey")
        .select(*key, "dkey")
        .collect()
    }
    assert full == fused and len(full) > 0


def test_parse_mode_schemas(spark):
    df = _turns(spark, n_convs=1)
    assert "tokens" in pipeline.parse(df).columns
    fused = pipeline.parse(df, columns="dkey")
    assert "tokens" not in fused.columns and "dkey" in fused.columns
    light = pipeline.parse(df, columns="light")
    assert "tokens" not in light.columns and "dkey" not in light.columns
    with pytest.raises(ValueError):
        pipeline.parse(df, columns="nope")


def _snap(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_enrich_identical_across_parse_modes(spark):
    b, t, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=3, turns_per_conv=30, seed=11
    )
    cfg = PipelineConfig()
    bdf, tdf = gen.to_spark_df(spark, b), gen.to_spark_df(spark, t)
    cols = [
        "conv_id", "turn_idx", "sub_idx", "text",
        "is_known", "is_target", "score", "emit_ok",
    ]
    model_full = M.train(pipeline.parse(bdf, cfg))
    bc_full = M.broadcast_indexes(spark, M.collect_indexes(model_full))
    e_full = pipeline.enrich(
        pipeline.parse(tdf, cfg), bc_full, cfg, count_scored=False
    )
    model_fused = M.train(pipeline.parse(bdf, cfg, columns="dkey"))
    bc_fused = M.broadcast_indexes(spark, M.collect_indexes(model_fused))
    e_fused = pipeline.enrich(
        pipeline.parse(tdf, cfg, columns="dkey"), bc_fused, cfg, count_scored=False
    )
    assert _snap(e_full, cols) == _snap(e_fused, cols)


def test_train_identical_across_parse_modes(spark):
    b, _, _ = gen.generate_corpus(
        n_baseline_convs=4, n_target_convs=0, turns_per_conv=25, seed=5
    )
    bdf = gen.to_spark_df(spark, b)
    cols = ["group_key", "row_id", "indices", "values", "line_count", "byte_count"]

    def snap(df):
        return sorted(
            (r["group_key"], r["row_id"], tuple(r["indices"]),
             tuple(r["values"]), r["line_count"], r["byte_count"])
            for r in df.select(*cols).collect()
        )

    assert snap(M.train(pipeline.parse(bdf))) == snap(
        M.train(pipeline.parse(bdf, columns="dkey"))
    )


def test_train_collected_fused_equals_full(spark):
    b, _, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=0, turns_per_conv=20, seed=9
    )
    bdf = gen.to_spark_df(spark, b)
    idx_full, _ = M.train_collected(spark, pipeline.parse(bdf))
    idx_fused, _ = M.train_collected(
        spark, pipeline.parse(bdf, columns="dkey")
    )
    assert set(idx_full) == set(idx_fused)
    import numpy as np

    for g in idx_full:
        a, c = idx_full[g], idx_fused[g]
        assert a.nrows == c.nrows
        assert np.array_equal(a.cols, c.cols)
        assert np.array_equal(a.rows, c.rows)
        assert np.array_equal(a.vals, c.vals)
