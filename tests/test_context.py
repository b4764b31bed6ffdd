"""Golden tests for per-conversation context assembly.

Transcribed from /root/reference/crates/model/src/process.rs tests
(test_chunk_processor :538-606, test_extended_context :608-695,
test_process_config :697-736) driven through the real tokenizer + index.
"""

import numpy as np

from logjuicer_spark.context import _collect_before, find_anomalies
from logjuicer_spark.hashing import build_matrix
from logjuicer_spark.tokenizer import dedup_key, process


def run_pipeline_on_lines(baseline_lines, target_lines, ignore_res=()):
    """Single-source mini pipeline mirroring IndexTrainer + ChunkProcessor."""
    import re

    ignore = [re.compile(p) for p in ignore_res]

    def is_ignored(line):
        return any(r.search(line) for r in ignore)

    # train: tokenize -> KnownLines dedup -> index (process.rs:63-83)
    seen = set()
    train_tokens = []
    for line in baseline_lines:
        if is_ignored(line):
            continue
        t = process(line)
        k = dedup_key(t)
        if k not in seen:
            seen.add(k)
            train_tokens.append(t)
    index = build_matrix(train_tokens)

    # target: tokenize, per-source dedup, score unique lines
    n = len(target_lines)
    ignored = np.array([is_ignored(l) for l in target_lines])
    tokens = [process(l) for l in target_lines]
    keys = [dedup_key(t) for t in tokens]
    seen = set()
    is_target = np.zeros(n, dtype=bool)
    for i in range(n):
        if ignored[i]:
            continue
        if keys[i] not in seen:
            seen.add(keys[i])
            is_target[i] = True
    scores = np.zeros(n, dtype=np.float32)
    t_idx = np.flatnonzero(is_target)
    if len(t_idx):
        scores[t_idx] = index.score([tokens[i] for i in t_idx])
    positions = np.arange(1, n + 1)
    return find_anomalies(target_lines, positions, ignored, is_target, scores)


def test_chunk_processor_golden():
    # process.rs:538-606
    anomalies = run_pipeline_on_lines(
        ["001: regular log line", "in-between line"],
        [
            "001: regular log line",
            "002: regular log line",
            "Traceback oops",
            "in-between line",
            "another Traceback",
            "003: regular log line",
        ],
    )
    assert len(anomalies) == 2
    a0, a1 = anomalies
    assert a0["line"] == "Traceback oops"
    assert a0["pos"] == 3
    assert abs(a0["distance"] - 1.0) < 0.001
    assert a0["before"] == ["001: regular log line", "002: regular log line"]
    assert a0["after"] == ["in-between line"]
    assert a1["line"] == "another Traceback"
    assert a1["pos"] == 5
    assert abs(a1["distance"] - 1.0) < 0.001
    assert a1["before"] == []
    assert a1["after"] == ["003: regular log line"]


def test_extended_context_golden():
    # process.rs:608-695
    anomalies = run_pipeline_on_lines(
        ["001: regular log line", "in-between line", "extra context line"],
        [
            "001: regular log line",
            "Traceback oops",
            "in-between line",
            "in-between line",
            "in-between line",
            "extra context line",
            "in-between line",
            "in-between line",
            "in-between line",
            "another Traceback",
            "003: regular log line",
        ],
    )
    assert len(anomalies) == 2
    a0, a1 = anomalies
    assert a0["pos"] == 2 and a0["line"] == "Traceback oops"
    assert a0["before"] == ["001: regular log line"]
    assert a0["after"] == ["in-between line"] * 3
    assert a1["pos"] == 10 and a1["line"] == "another Traceback"
    assert a1["before"] == ["extra context line"] + ["in-between line"] * 3
    assert a1["after"] == ["003: regular log line"]


def test_ignore_patterns_golden():
    # process.rs:697-736: ignored lines are invisible to context + scoring
    anomalies = run_pipeline_on_lines(
        ["001: regular log line", "in-between line", "extra context line"],
        [
            "001: regular log line",
            "TASK fetch logs",
            "2024-03-19 get logs done",
            "Traceback oops",
        ],
        ignore_res=["fetch logs", "get logs"],
    )
    assert len(anomalies) == 1
    assert anomalies[0]["line"] == "Traceback oops"


def test_collect_before_leftovers():
    # process.rs:476-536 (test_leftovers)
    texts = [f"00{i} log line" for i in range(1, 6)]
    assert _collect_before(0, 0, texts, []) == []
    assert _collect_before(1, 0, texts, []) == ["001 log line"]
    assert _collect_before(1, 1, texts, []) == []
    assert _collect_before(2, 2, texts, []) == []
    assert _collect_before(4, 0, texts, []) == texts[:4]
    # with left-overs: reset(3) on a 5-line buffer keeps lines 4..5
    left = texts[3:]
    assert _collect_before(1, 0, ["006 log line"], left) == [
        "004 log line",
        "005 log line",
        "006 log line",
    ]


def test_global_dedup_drops_silently():
    texts = ["base line alpha", "some weird failure", "base line alpha2",
             "some weird failure", "closing line here"]
    n = len(texts)
    positions = np.arange(1, n + 1)
    ignored = np.zeros(n, dtype=bool)
    is_target = np.array([True, True, True, False, True])
    scores = np.array([0.0, 0.9, 0.0, 0.0, 0.0], dtype=np.float32)
    # without emit_ok: one anomaly
    a = find_anomalies(texts, positions, ignored, is_target, scores)
    assert len(a) == 1 and a[0]["pos"] == 2
    # emit_ok false -> dropped entirely
    emit = np.array([True, False, True, True, True])
    a = find_anomalies(texts, positions, ignored, is_target, scores, emit)
    assert a == []


def test_chunk_boundary_extended_context():
    # an anomaly near a 512-target chunk start re-arms the 12-line context
    # window and backfills from the previous chunk's left-overs
    n_pre = 512
    texts = [f"unique line number {i} padding" for i in range(n_pre)]
    texts += ["boom failure here"]  # first target of chunk 2
    n = len(texts)
    positions = np.arange(1, n + 1)
    ignored = np.zeros(n, dtype=bool)
    is_target = np.ones(n, dtype=bool)
    scores = np.zeros(n, dtype=np.float32)
    scores[-1] = 1.0
    a = find_anomalies(texts, positions, ignored, is_target, scores)
    assert len(a) == 1
    # chunk 2 buffer = [boom]; before backfilled from 12 left-over lines
    assert a[0]["before"] == texts[n_pre - 12 : n_pre]
    assert a[0]["pos"] == n


def test_parse_mode_timestamps():
    # W3: parse ts from the line, else backward scan; time-only + gl_date
    from logjuicer_spark.timestamps import parse_timestamp

    texts = [
        "2024-02-20 09:06:57,036 starting the quiet service run",
        "plain middle line without any stamp",
        "weird failure omegaxyzq detected here",     # anomaly, no own ts
        "another quiet line flowing by",
        "I0220 09:45:08.004 timeonly failure omegaxyzr here",  # anomaly, time-only
    ]
    n = len(texts)
    positions = np.arange(1, n + 1)
    is_target = np.ones(n, dtype=bool)
    scores = np.array([0, 0, 0.9, 0, 0.9], dtype=np.float32)
    gl_date = parse_timestamp("2024-02-20 09:06:57,036")[1]
    a = find_anomalies(
        texts, positions, np.zeros(n, bool), is_target, scores,
        parse_ts=True, gl_date=gl_date,
    )
    assert len(a) == 2
    # backward scan finds the full stamp two lines up
    assert a[0]["timestamp_ms"] == 1708420017036
    # time-only resolves against gl_date (same day)
    assert a[1]["timestamp_ms"] == gl_date - gl_date % 86400000 + (9 * 3600 + 45 * 60 + 8) * 1000 + 4
