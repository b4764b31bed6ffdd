"""Range-split errors entry point: split-vs-single-task equality.

The split's exactness protocol (scan_error_window docstring) says the
ranged walk equals the single-task walk for EVERY input — converging
boundaries run ranged, non-converging ones flag their conversation into
the single-task fallback. These tests pin both halves:

- window-level: scan_error_window over hand-built windows reproduces
  find_error_anomalies' body anomalies, and flags exactly the
  longer-than-pad spans crossing a boundary;
- Spark-level: errors_run(allow_split=True, small max_task_lines) equals
  the default single-task errors_run row-for-row (before/after included)
  on corpora with tracebacks, go panics, cross-conversation duplicates,
  ansible sources and ignored lines — including a monster traceback that
  forces the flagged fallback.
"""

import random

import numpy as np
import pytest

from logjuicer_spark import gen
from logjuicer_spark.errors import (
    errors_run,
    find_error_anomalies,
    scan_error_window,
)
from logjuicer_spark.pipeline import PipelineConfig

NORMALS = [
    "routine heartbeat message with stable content number {i}",
    "copying workspace artifact bundle into cache slot {i}",
    "scheduler tick processed batch of jobs cleanly {i}",
]
ERRORS_1L = [
    "ERROR 1234 database exploded during checkpoint {tag}",
    "controller | controller-{i} | FAILED | rc=2 >>",
    "FAIL: unit test broke badly {tag}",
]


def _py_tb(n_frames):
    lines = ["Traceback (most recent call last):"]
    for f in range(n_frames):
        lines.append(f'  File "mod{f}.py", line {f + 1}, in caller')
        lines.append(f"    call_site_{f}()")
    lines.append("RuntimeError: kaboom deep stack")
    return lines


def _go_tb():
    return [
        "panic: runtime error: index out of range [3]",
        "",
        "goroutine 17 [running]:",
        "main.main()",
        "\t/go/src/app/main.go:42 +0x1a",
    ]


def _corpus(seed, n_convs=4, conv_len=140):
    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        conv = (
            f"ci/job-output-{c}.txt" if c == n_convs - 1 else f"svc-{c:02d}/run.log"
        )
        pending = []
        i = 1
        while i <= conv_len:
            if pending:
                text = pending.pop(0)
            else:
                roll = rng.random()
                if roll < 0.06:
                    pending = _py_tb(rng.randint(1, 6))
                    text = pending.pop(0)
                elif roll < 0.09:
                    pending = _go_tb()
                    text = pending.pop(0)
                elif roll < 0.22:
                    tpl = rng.choice(ERRORS_1L)
                    text = tpl.format(i=rng.randint(0, 3), tag=f"t{rng.randint(0, 2)}")
                else:
                    text = rng.choice(NORMALS).format(i=i)
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": i,
                    "role": "tool",
                    "text": text,
                    "tool": f"node-{c % 2}",
                    "ts": None,
                }
            )
            i += 1
    return rows


def _snap(df):
    return sorted(
        (
            r.conv_id, r.turn_idx, r.sub_idx, r.tool, r.text,
            round(float(r.score), 6),
            tuple(r.before) if r.before is not None else None,
            tuple(r.after) if r.after is not None else None,
        )
        for r in df.collect()
    )


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_split_equals_single_task(spark, seed):
    rows = _corpus(seed)
    df = gen.to_spark_df(spark, rows)
    single = errors_run(spark, df)
    cfg = PipelineConfig(max_task_lines=40)
    split = errors_run(spark, df, cfg=cfg, allow_split=True, range_pad=12)
    assert _snap(split) == _snap(single) and len(_snap(single)) > 0


def test_split_with_ignore_patterns(spark):
    rows = _corpus(3)
    df = gen.to_spark_df(spark, rows)
    cfg1 = PipelineConfig(ignore_patterns=("controller-1",))
    cfg2 = PipelineConfig(ignore_patterns=("controller-1",), max_task_lines=40)
    single = errors_run(spark, df, cfg=cfg1)
    split = errors_run(spark, df, cfg=cfg2, allow_split=True, range_pad=12)
    assert _snap(split) == _snap(single)


def test_monster_traceback_flags_and_falls_back(spark):
    """A traceback far longer than the pad crossing every boundary: ranges
    cannot verify convergence, the conversation is flagged, and the
    fallback still produces the exact single-task rows."""
    rows = []
    texts = (
        [f"routine setup line {i}" for i in range(20)]
        + _py_tb(60)  # 122-line multiline span
        + ["ERROR 9999 post-traceback failure omega"]
        + [f"routine teardown line {i}" for i in range(20)]
    )
    for i, t in enumerate(texts, start=1):
        rows.append(
            {"conv_id": "svc-x/run.log", "turn_idx": i, "role": "tool",
             "text": t, "tool": "bash", "ts": None}
        )
    df = gen.to_spark_df(spark, rows)
    single = errors_run(spark, df)
    cfg = PipelineConfig(max_task_lines=50)
    split = errors_run(spark, df, cfg=cfg, allow_split=True, range_pad=10)
    assert _snap(split) == _snap(single) and len(_snap(single)) > 0


def test_window_scan_matches_full_walk():
    rng = random.Random(5)
    texts = []
    pending = []
    for i in range(200):
        if pending:
            texts.append(pending.pop(0))
            continue
        r = rng.random()
        if r < 0.05:
            pending = _py_tb(rng.randint(1, 4))
            texts.append(pending.pop(0))
        elif r < 0.2:
            texts.append(f"ERROR 1234 boom number {rng.randint(0, 4)}")
        else:
            texts.append(f"quiet line {i}")
    n = len(texts)
    positions = np.arange(1, n + 1)
    ignored = np.zeros(n, dtype=bool)
    emit = np.ones(n, dtype=bool)
    want = find_error_anomalies(texts, positions, ignored, emit_ok=emit)
    pad = 12
    got = []
    bounds = list(range(0, n, 40))
    any_flag = False
    for k, b in enumerate(bounds):
        last = k == len(bounds) - 1
        nb = n if last else bounds[k + 1]
        w_lo = max(b - pad, 0)
        w_hi = min(nb + pad, n)
        body, flag = scan_error_window(
            texts[w_lo:w_hi],
            positions[w_lo:w_hi],
            ignored[w_lo:w_hi],
            emit[w_lo:w_hi],
            None,
            b - w_lo,
            nb - w_lo,
            pad,
            has_successor=not last,
            tail_end=last or (nb + pad >= n),
        )
        any_flag |= flag
        for a in body:
            got.append((a["pos"], a["line"], tuple(a["before"]), tuple(a["after"])))
    assert not any_flag
    want_t = [(a["pos"], a["line"], tuple(a["before"]), tuple(a["after"])) for a in want]
    assert sorted(got) == sorted(want_t) and len(want_t) > 0


def test_split_with_model_filter(spark):
    """Range split + model post-filter (report_errors semantics): the
    per-anomaly filter runs inside each window task, so split and single
    must agree with a baseline model attached too."""
    from logjuicer_spark import model as M, pipeline

    rows = _corpus(13, n_convs=3, conv_len=120)
    base = [
        {"conv_id": "b1", "turn_idx": i + 1, "role": "tool",
         "tool": f"node-{i % 2}", "ts": None, "text": t}
        for i, t in enumerate(
            ["ERROR 1234 database exploded during checkpoint t0",
             "ordinary quiet line flowing one",
             "ordinary quiet line flowing two"]
        )
    ]
    model_df = pipeline.train_model(spark, gen.to_spark_df(spark, base))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    df = gen.to_spark_df(spark, rows)
    single = errors_run(spark, df, model_indexes_bc=bc)
    cfg = PipelineConfig(max_task_lines=40)
    split = errors_run(
        spark, df, cfg=cfg, allow_split=True, range_pad=12, model_indexes_bc=bc
    )
    assert _snap(split) == _snap(single)


def test_flagged_windows_with_zero_output_rows(spark):
    """A conversation that is one enormous traceback and nothing else:
    every range flags (the span crosses every boundary) while most windows
    emit ZERO candidate/anomaly rows — the sentinel-emission path must not
    hit the deprecated empty-frame concat, and the fallback must equal the
    single-task walk."""
    texts = ["setup line"] * 5 + _py_tb(120) + ["teardown line"] * 5
    rows = [
        {"conv_id": "svc-y/run.log", "turn_idx": i, "role": "tool",
         "text": t, "tool": "bash", "ts": None}
        for i, t in enumerate(texts, start=1)
    ]
    df = gen.to_spark_df(spark, rows)
    single = errors_run(spark, df)
    cfg = PipelineConfig(max_task_lines=40)
    split = errors_run(spark, df, cfg=cfg, allow_split=True, range_pad=10)
    assert _snap(split) == _snap(single)


def test_window_scan_flags_long_span_crossing_boundary():
    texts = (
        ["quiet line"] * 30
        + _py_tb(40)  # span covers the boundary at 50 and far beyond the pad
        + ["quiet tail"] * 60
    )
    n = len(texts)
    positions = np.arange(1, n + 1)
    ignored = np.zeros(n, dtype=bool)
    emit = np.ones(n, dtype=bool)
    pad = 10
    _, flag = scan_error_window(
        texts[:60],  # window of range 0: body [0, 50) + 10 tail
        positions[:60], ignored[:60], emit[:60], None,
        0, 50, pad, has_successor=True, tail_end=False,
    )
    assert flag
