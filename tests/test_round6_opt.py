"""Round-6 optimization equivalence tests.

The optimizations restructure WHERE work happens (overlapped winners
aggregation with a post-aggregation is_known filter; the middle trainer's
driver-side matrix build) — these tests pin that the results are identical
to the round-5 shapes.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, model as model_mod, pipeline


@pytest.fixture(scope="module")
def corpus(spark):
    b, t, exp = gen.generate_corpus(
        n_baseline_convs=4, n_target_convs=5, turns_per_conv=40, seed=23
    )
    return (
        gen.to_spark_df(spark, b),
        gen.to_spark_df(spark, t),
        sorted((c, i) for c, i, _ in exp),
    )


def test_train_winners_collected_equals_distributed(spark, corpus):
    baseline_df, _, _ = corpus
    cfg = pipeline.PipelineConfig()
    parsed = pipeline.parse(baseline_df, cfg, columns="dkey")

    indexes, model_a = model_mod.train_winners_collected(spark, parsed)
    assert indexes is not None
    model_b = model_mod.train(parsed)
    indexes_b = model_mod.collect_indexes(model_b)
    pipeline.release_stage_caches()

    assert set(indexes) == set(indexes_b)
    for g in indexes:
        a, b = indexes[g], indexes_b[g]
        assert a.nrows == b.nrows
        za = sorted(a.to_rows())
        zb = sorted(b.to_rows())
        for (ra, ia, va), (rb, ib, vb) in zip(za, zb):
            assert ra == rb
            assert list(ia) == list(ib)
            np.testing.assert_array_equal(
                np.asarray(va, dtype=np.float32), np.asarray(vb, dtype=np.float32)
            )

    cols = ["group_key", "row_id", "indices", "values", "line_count", "byte_count"]
    rows_a = sorted(map(tuple, model_a.select(cols).collect()))
    rows_b = sorted(map(tuple, model_b.select(cols).collect()))
    assert rows_a == rows_b


def test_train_winners_collected_budget_fallback(spark, corpus):
    baseline_df, _, _ = corpus
    parsed = pipeline.parse(baseline_df, pipeline.PipelineConfig(), columns="dkey")
    indexes, model_df = model_mod.train_winners_collected(
        spark, parsed, max_rows=1
    )
    assert indexes is None  # over budget -> distributed trainer
    # the fallback model must still round-trip through collect_indexes
    got = model_mod.collect_indexes(model_df)
    pipeline.release_stage_caches()
    assert got  # non-empty


def test_winners_raw_postfilter_equals_prefiltered(spark, corpus):
    """_winners_raw + is_known post-filter == is_known pre-filter winners
    (tool is a group key, so the two commute)."""
    _, target_df, _ = corpus
    cfg = pipeline.PipelineConfig()
    parsed = pipeline.parse(target_df, cfg, columns="dkey")
    known = ["b-0", "b-1"]

    raw = pipeline._winners_raw(parsed, cfg)
    post = raw.filter(F.col("tool").isin(known))

    pre_rows = parsed.filter(F.col("tool").isin(known) & ~F.col("is_ignored"))
    pre = (
        pre_rows.withColumn("_skey", pipeline._skey())
        .groupBy(F.col(cfg.group_col).alias("tool"), "dkey")
        .agg(
            F.min("_skey").alias("skey"),
            F.min_by("text", "_skey").alias("wtext"),
        )
    )
    a = sorted(map(tuple, post.collect()))
    b = sorted(map(tuple, pre.collect()))
    assert a == b


def test_assemble_region_equals_per_conv():
    """_assemble_region over a multi-conversation region must equal the
    per-conversation _assemble_conv outputs concatenated in order —
    including anomalous conversations with contexts, unknown rows,
    ignored rows and global-dedup suppressions."""
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    for c in range(12):
        n = int(rng.integers(3, 60))
        for t in range(n):
            is_known = bool(rng.random() > 0.1)
            is_ignored = bool(rng.random() < 0.05)
            # engine invariant (enrich): is_target => is_known & ~is_ignored
            is_target = bool(rng.random() > 0.5) and is_known and not is_ignored
            score = float(rng.choice([0.0, 0.2, 0.45, 0.9]))
            rows.append(
                {
                    "conv_id": f"c-{c:03d}",
                    "turn_idx": t + 1,
                    "sub_idx": 0,
                    "role": "tool",
                    "tool": "node-0",
                    "ts": pd.Timestamp("2024-01-01"),
                    "text": f"line {c} {t} payload",
                    "is_ignored": is_ignored,
                    "is_known": is_known,
                    "is_target": is_target,
                    "score": np.float32(score) if is_target else np.nan,
                    "emit_ok": bool(rng.random() > 0.1),
                }
            )
    pdf = pd.DataFrame(rows)
    thr = 0.3

    per_conv = pd.concat(
        [
            pipeline._assemble_conv(g, thr)
            for _, g in pdf.groupby("conv_id", sort=False)
        ],
        ignore_index=True,
    )
    region = pipeline._assemble_region(pdf, thr).reset_index(drop=True)
    assert len(per_conv) == len(region)
    for col in ("conv_id", "turn_idx", "sub_idx", "role", "tool", "text", "route"):
        assert list(per_conv[col]) == list(region[col]), col
    np.testing.assert_array_equal(
        per_conv["score"].to_numpy(), region["score"].to_numpy()
    )
    assert list(per_conv["before"]) == list(region["before"])
    assert list(per_conv["after"]) == list(region["after"])


def test_route_dense_slim_equals_region(spark, corpus):
    """The decision-only dense route (_route_dense_slim: slim Python
    input, anomalies-only output, JVM reassembly) must produce the same
    routed rows as the region-assembler pandas pass."""
    baseline_df, target_df, _ = corpus
    cfg = pipeline.PipelineConfig()
    from logjuicer_spark import model as M

    indexes, model_df = M.train_winners_collected(
        spark, pipeline.parse(baseline_df, cfg, columns="dkey")
    )
    bc = M.broadcast_indexes(spark, indexes)
    parsed = pipeline.parse(target_df, cfg, columns="dkey").persist()
    w = pipeline._winners_raw(parsed, cfg).persist()
    nw = w.count()
    enriched = pipeline.enrich(
        parsed, bc, cfg, count_scored=False, model_df=model_df,
        winners=w, n_winners=nw,
    )
    sel = enriched.select(*pipeline._ROUTE_COLS)

    dense_pandas = pipeline._apply_per_conv(
        sel,
        lambda g: pipeline._assemble_conv(g, cfg.threshold, False),
        pipeline.ROUTED,
        region_fn=lambda g: pipeline._assemble_region(g, cfg.threshold, False),
    )
    dense_slim = pipeline._route_dense_slim(sel, cfg.threshold, False)

    def norm(df):
        rows = df.collect()
        return sorted(
            (
                r["conv_id"], r["turn_idx"], r["sub_idx"], r["role"], r["tool"],
                r["ts"], r["text"], r["route"],
                None if r["score"] is None else round(float(r["score"]), 6),
                tuple(r["before"]) if r["before"] is not None else None,
                tuple(r["after"]) if r["after"] is not None else None,
            )
            for r in rows
        )

    a = norm(dense_pandas)
    b = norm(dense_slim)
    pipeline.release_stage_caches()
    parsed.unpersist()
    assert a == b and len(a) > 0
    assert any(r[7] == "anomaly" for r in a)


def test_flagship_small_and_big_paths_agree(spark, corpus):
    """run() via the big path (winners overlap + middle trainer) and the
    small path produce the same anomaly set."""
    baseline_df, target_df, expected = corpus

    def anoms(small_thresh):
        out = pipeline.run(
            spark, target_df, baseline_turns=baseline_df,
            small_input_rows=small_thresh,
        )
        rows = sorted(
            (r["conv_id"], r["turn_idx"])
            for r in out["anomalies"].select("conv_id", "turn_idx").collect()
        )
        pipeline.release_stage_caches()
        return rows

    big = anoms(1)          # force big path
    small = anoms(10_000_000)  # force small path
    assert big == small == expected
