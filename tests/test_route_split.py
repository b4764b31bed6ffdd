"""Split-vs-unsplit equality for intra-conversation range splitting.

The exactness argument (context.find_anomalies_ranged) requires the
production invariant CHUNK_SIZE >= PAD_LINES (512 >> 20): the replicated pad
must be a suffix of ONE chunk. The fuzz scales the chunk economics down to
CHUNK_SIZE=30 / FLUSH_GUARD=90, which preserves that invariant while making
every random sequence cross several chunk and range boundaries.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import logjuicer_spark.context as ctx
from logjuicer_spark import model as M, pipeline
from pyspark.sql import functions as F


def ranged_reference(texts, positions, ignored, is_target, scores, emit, max_task_lines):
    """Drive find_anomalies_ranged exactly like pipeline.route_split does
    (plan ranges over the buffered mask, pad each with the previous tail,
    combine under the emission protocol) — pure python, no Spark."""
    n = len(texts)
    ignored = np.asarray(ignored, dtype=bool)
    is_target = np.asarray(is_target, dtype=bool)
    scores = np.asarray(scores, dtype=np.float32)
    emit = np.asarray(emit, dtype=bool)
    positions = np.asarray(positions)
    buf_idx = np.flatnonzero(~ignored)
    if len(buf_idx) == 0:
        return []
    ends = ctx.chunk_flush_points((is_target & ~ignored)[buf_idx])
    bounds = [0]
    prev = 0
    for e in ends:
        if e - bounds[-1] > max_task_lines and prev > bounds[-1]:
            bounds.append(prev)
        prev = e
    out = []
    for k, sb in enumerate(bounds):
        last = k == len(bounds) - 1
        start_row = 0 if k == 0 else int(buf_idx[sb])
        end_row = n if last else int(buf_idx[bounds[k + 1]])
        pad_lo_row = (
            start_row if k == 0 else int(buf_idx[max(sb - ctx.PAD_LINES, 0)])
        )
        sel = np.arange(pad_lo_row, end_row)
        n_pad = start_row - pad_lo_row
        anoms, carried, suppressed = ctx.find_anomalies_ranged(
            [texts[i] for i in sel],
            positions[sel],
            ignored[sel],
            is_target[sel],
            scores[sel],
            emit[sel],
            n_pad=n_pad,
            is_last=last,
        )
        for a in anoms:
            out.append({**a, "idx": int(pad_lo_row + a["idx"])})
    return sorted(out, key=lambda a: a["idx"])


line_st = st.tuples(
    st.integers(0, 60),
    st.sampled_from([0.0, 0.25, 0.31, 0.9, 1.0]),
    st.booleans(),
    st.booleans(),
)


def _mk_inputs(lines, salt):
    n = len(lines)
    texts = [f"line-{i}-k{k}" for i, (k, _, _, _) in enumerate(lines)]
    positions = np.arange(1, n + 1)
    ignored = np.array(
        [ig and (i % 7 == salt) for i, (_, _, ig, _) in enumerate(lines)]
    )
    seen = set()
    is_target = np.zeros(n, dtype=bool)
    scores = np.zeros(n, dtype=np.float32)
    emit = np.ones(n, dtype=bool)
    for i, (k, sc, _, em) in enumerate(lines):
        scores[i] = np.float32(sc)
        emit[i] = em
        if not ignored[i] and k not in seen:
            seen.add(k)
            is_target[i] = True
    return texts, positions, ignored, is_target, scores, emit


@settings(max_examples=150, deadline=None)
@given(
    st.lists(line_st, min_size=0, max_size=400),
    st.integers(0, 3),
    st.sampled_from([30, 45, 95]),
)
def test_ranged_equals_single(lines, salt, max_task_lines):
    texts, positions, ignored, is_target, scores, emit = _mk_inputs(lines, salt)
    old = (ctx.CHUNK_SIZE, ctx.FLUSH_GUARD)
    ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = 30, 90  # keeps CHUNK_SIZE >= PAD_LINES
    try:
        want = ctx.find_anomalies(texts, positions, ignored, is_target, scores, emit)
        got = ranged_reference(
            texts, positions, ignored, is_target, scores, emit, max_task_lines
        )
    finally:
        ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = old
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["idx"] == w["idx"]
        assert g["pos"] == w["pos"]
        assert g["line"] == w["line"]
        assert g["before"] == w["before"]
        assert g["after"] == w["after"]
        assert g["distance"] == w["distance"]


def test_carried_open_anchor_across_boundary():
    """An anomaly anchored at the very last buffered line of a chunk stays
    open across the flush; the NEXT range must emit it with after-context
    from its own first lines."""
    old = (ctx.CHUNK_SIZE, ctx.FLUSH_GUARD)
    ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = 30, 90
    try:
        n = 75
        texts = [f"t{i}" for i in range(n)]
        positions = np.arange(n)
        ignored = np.zeros(n, dtype=bool)
        is_target = np.ones(n, dtype=bool)  # all targets: chunks of exactly 30
        scores = np.zeros(n, dtype=np.float32)
        scores[29] = np.float32(0.9)  # anchor at chunk-0 flush line
        scores[31] = np.float32(0.9)  # a second anomaly right after the boundary
        emit = np.ones(n, dtype=bool)
        want = ctx.find_anomalies(texts, positions, ignored, is_target, scores, emit)
        got = ranged_reference(texts, positions, ignored, is_target, scores, emit, 30)
    finally:
        ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = old
    assert [a["idx"] for a in want] == [29, 31]
    assert got == want


def test_spark_route_split_equality(spark):
    """End-to-end with production chunk economics: a >1000-target
    conversation forced through multiple range tasks must produce a routed
    output identical to the single-task path."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    combos = [f"{a} {b} {c}" for a in words for b in words for c in words]
    baseline_lines = combos  # every combo's token-set is known
    # inject novel anomaly lines (words absent from the baseline) every 6th
    # position — 288 anomalies spread across all chunks and range boundaries
    target_lines = list(combos)
    for i in range(5, len(target_lines), 6):
        j = i // 6  # 0..287: encode as 12 x 12 x 2 letter-only compounds
        w = words[j % 12] + words[(j // 12) % 12] + ("one" if j < 144 else "two")
        target_lines[i] = f"panic {w} failure"
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    b = spark.createDataFrame(
        [("base", i, "log", t, "bash", None) for i, t in enumerate(baseline_lines)],
        schema,
    )
    t = spark.createDataFrame(
        [("mono", i, "log", t_, "bash", None) for i, t_ in enumerate(target_lines)],
        schema,
    )
    cfg = pipeline.PipelineConfig()
    bc = M.broadcast_indexes(spark, M.collect_indexes(pipeline.train_model(spark, b)))
    enriched = pipeline.enrich(pipeline.parse(t, cfg), bc, cfg, count_scored=False)

    # sanity: the conversation really spans several chunks and ranges
    n_chunks = len(ctx.chunk_flush_points(np.ones(len(target_lines), dtype=bool)))
    assert n_chunks >= 3

    single = pipeline._route_single(enriched, cfg)
    split = pipeline.route_split(enriched, pipeline.PipelineConfig(max_task_lines=600))

    def snap(df):
        return [
            (r.conv_id, r.turn_idx, r.sub_idx, r.route,
             None if r.score is None or np.isnan(r.score) else round(float(r.score), 6),
             r.before, r.after, r.text)
            for r in sorted(
                df.collect(), key=lambda r: (r.conv_id, r.turn_idx, r.sub_idx)
            )
        ]

    a, b_ = snap(single), snap(split)
    assert len(a) == 1728 and a == b_
    n_anom = sum(1 for r in a if r[3] == "anomaly")
    assert n_anom == 288  # every 6th of 1728 lines is an injected novelty
    pipeline.release_stage_caches()


def test_route_dispatch_splits_only_oversized(spark):
    """route() sends oversized conversations through route_split and the
    rest through the single-task path; output equals the unsplit run."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    lines = [f"{a} {b} {c}" for a in words for b in words for c in words][:160]
    rows = [
        # interleave rows from an UNKNOWN tool (model has two groups, so
        # lookup_or_single does not apply): they must route 'unknown'
        # identically through both paths
        ("big", i, "log", t, "bash" if i % 5 else "mystery", None)
        for i, t in enumerate(lines)
    ]
    rows += [("tiny", 0, "log", "alpha bravo charlie", "bash", None)]
    t = spark.createDataFrame(rows, schema)
    b = spark.createDataFrame(
        [("base", i, "log", x, "bash" if i % 2 else "zsh", None)
         for i, x in enumerate(lines[:100])],
        schema,
    )
    cfg = pipeline.PipelineConfig(max_task_lines=50)
    bc = M.broadcast_indexes(spark, M.collect_indexes(pipeline.train_model(spark, b)))
    enriched = pipeline.enrich(pipeline.parse(t, cfg), bc, cfg, count_scored=False)
    got = pipeline.route(enriched, cfg).collect()
    ref = pipeline._route_single(enriched, cfg).collect()

    def key(rs):
        return sorted((r.conv_id, r.turn_idx, r.route, r.before, r.after) for r in rs)

    assert key(got) == key(ref)
    assert len(got) == 161
    assert any(r.route == "unknown" for r in got)  # mystery-tool rows
    assert any(r.route == "anomaly" for r in got)
    pipeline.release_stage_caches()
