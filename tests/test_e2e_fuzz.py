"""Randomized end-to-end differential test: Spark pipeline vs the naive
sequential transcription (reference_impl) on corpora with cross-conversation
duplicate anomalies (global dedup), duplicate normals, multi-tool turns and
ignore patterns."""

import random

import pytest
from pyspark.sql import functions as F

from logjuicer_spark import gen, pipeline
from logjuicer_spark.pipeline import PipelineConfig

from reference_impl import naive_report

ANOM = [
    "Traceback oops unexpected marker {tag} raised inside handler routine",
    "FATAL disk corruption detected on volume {tag} sector unreadable halting",
    "connection refused repeatedly {tag} upstream gateway unreachable giving up",
]


def build_corpus(seed):
    rng = random.Random(seed)
    baseline_rows, _, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=0, turns_per_conv=35, seed=seed
    )
    target_rows = []
    tags = [f"omega{gen._alpha_tag(i)}" for i in range(4)]
    for c in range(5):
        conv = f"tgt-{c:03d}"
        n_turns = rng.randint(8, 45)
        for i in range(1, n_turns + 1):
            tool = gen.TOOLS[(i - 1) % len(gen.TOOLS)]
            if rng.random() < 0.12:
                # anomaly, possibly a duplicate tag across convs/positions
                text = rng.choice(ANOM).format(tag=rng.choice(tags))
            else:
                tpl = (i * 3 + gen.TOOLS.index(tool)) % len(gen._TEMPLATES)
                text = gen._noise_line(rng, tpl)
            target_rows.append(
                {"conv_id": conv, "turn_idx": i, "role": "tool",
                 "text": text, "tool": tool, "ts": None}
            )
    return baseline_rows, target_rows


@pytest.mark.parametrize("seed", [3, 17])
def test_e2e_differential(spark, seed):
    baseline_rows, target_rows = build_corpus(seed)
    ignore = ("scratch file",) if seed % 2 else ()
    cfg = PipelineConfig(ignore_patterns=ignore)
    out = pipeline.run(
        spark,
        gen.to_spark_df(spark, target_rows),
        baseline_turns=gen.to_spark_df(spark, baseline_rows),
        cfg=cfg,
    )
    got = (
        out["anomalies"].orderBy("conv_id", "turn_idx", "sub_idx").collect()
    )
    want = sorted(
        naive_report(baseline_rows, target_rows, ignore_patterns=ignore),
        key=lambda a: (a["conv_id"], a["pos"]),
    )
    assert len(got) == len(want), (
        [(g.conv_id, g.turn_idx, g.text) for g in got],
        [(w["conv_id"], w["pos"], w["line"]) for w in want],
    )
    for g, w in zip(got, want):
        assert (g.conv_id, g.turn_idx, g.text) == (w["conv_id"], w["pos"], w["line"])
        assert g.score == pytest.approx(w["distance"], abs=1e-6)
        assert list(g.before) == w["before"]
        assert list(g.after) == w["after"]
