"""Golden tests for the errors entry point (E3), transcribed from
/root/reference/crates/errors/src/errors_parser.rs:206-289,
/root/reference/crates/model/src/errors.rs:215-280 and
/root/reference/crates/model/src/filter.rs:72-147."""

import numpy as np
import pytest

from logjuicer_spark.errors import (
    COMPLETED,
    ERROR_RE,
    FsmState,
    classify_lines,
    filter_anomalies,
    find_error_anomalies,
)
from logjuicer_spark.hashing import build_matrix
from logjuicer_spark.tokenizer import dedup_key, process


def fsm_completes(body: str) -> bool:
    s = FsmState()
    completed = False
    for line in body.splitlines():
        assert not completed
        if s.parse(line) == COMPLETED:
            completed = True
    return completed


def test_python_tb():
    assert fsm_completes(
        "\nTraceback (most recent call last):\n"
        '  File "test.py", line 5, in <module>\n'
        "    test()\n"
        '  File "test.py", line 2, in test\n'
        '    raise RuntimeError("oops")\n'
        "RuntimeError: oops\n"
    )
    assert fsm_completes(
        "\n2025-07-07 - Traceback (most recent call last):\n"
        '2025-07-07 -   File "test.py", line 7, in <module>\n'
        '2025-07-07 -     raise RuntimeError("bam")\n'
        "2025-07-07 - RuntimeError: bam\n"
    )


def test_go_tb():
    assert fsm_completes(
        "\npanic: runtime error: invalid memory address or nil pointer dereference\n"
        "[signal SIGSEGV: segmentation violation code=0x1 addr=0x0 pc=0x47b081]\n"
        "\n"
        "goroutine 1 [running]:\n"
        "main.main()\n"
        "\ttest.go:14 +0x61\n"
        "exit status 2\n"
    )


ERROR_LINES = [
    "ERROR 2002 (HY000): Can't connect to server on '127.0.0.1' (115)",
    "2025-07-07T21:21:52Z   Warning   Failed                  Pod                     logserver-0                           Error: ImagePullBackOff",
    '2025-07-07T17:03:05.595305798-04:00 stderr F time="2025-07-07T21:03:05Z" level=warning msg="an error was encountered ',
    "2025-07-07T17:09:04.148248939-04:00 stderr F E0707 21:09:04.148229       1 queueinformer_",
    '2025-07-07T17:09:26.167025939-04:00 stderr F time="2025-07-07T21:09:26Z" level=info msg="error updating ',
    '2025-07-07T17:02:55.673388956-04:00 stderr F time="2025-07-07T21:02:55Z" level=warning msg="error adding',
    '2025-07-07T17:02:55.753817892-04:00 stderr F {"level":"error","ts"',
    "{2} neutron.tests.unit.agent.test_plug_with_ns [0.034190s] ... FAILED",
    "E4242 oops",
    "test.go] E4242 bam",
    "13 ERROR neutron",
    "Z  ERROR  setup",
    "Z\tERROR\ttest",
    "fail level=error",
    "ovsdb_log(log_fsync3)|WARN|fsync failed (Invalid argument)",
    "BGP: [KTE2S-GTBDA][EC 100663301] INTERFACE_ADDRESS_DEL: Cannot find IF",
    "controller | controller-0 | FAILED | rc=2 >>",
    "[gw0] [ 97%] FAILED tobiko/tests",
    "job.batch/validate-edpm    Failed     0/1           67m        67m",
    "pod/cinder-backup-0  1/2     CrashLoopBackOff   17 (2m43s ago)   87m",
]


@pytest.mark.parametrize("line", ERROR_LINES, ids=range(len(ERROR_LINES)))
def test_is_error_line(line):
    assert ERROR_RE.search(line) is not None


def test_not_error_line():
    assert ERROR_RE.search("2025-07-07 - Running a script") is None


def _run_processor(raw: str, dedup=True):
    # BytesLines drops empty lines but counts them (iterator.rs:236-241)
    all_lines = raw.split("\n")
    texts, positions = [], []
    for i, l in enumerate(all_lines):
        if l:
            texts.append(l)
            positions.append(i + 1)
    emit = None
    if dedup:
        seen = set()
        emit = []
        res = classify_lines(texts)
        for i, t in enumerate(texts):
            if res[i] in (1, 3):
                k = dedup_key(process(t))
                emit.append(k not in seen)
                seen.add(k)
            else:
                emit.append(True)
    return find_error_anomalies(
        texts, np.array(positions), np.zeros(len(texts), bool), emit_ok=emit
    )


def test_errors_processor_golden():
    # errors.rs:215-251
    raw = (
        "\n2025-07-07 - Running a script\n"
        "2025-07-07 - Traceback (most recent call last):\n"
        '2025-07-07 -   File "test.py", line 7, in <module>\n'
        '2025-07-07 -     raise RuntimeError("bam")\n'
        "2025-07-07 - RuntimeError: bam\n"
        "2025-07-07 - Something went wrong\n"
    )
    anomalies = _run_processor(raw)
    assert len(anomalies) == 1
    a = anomalies[0]
    assert a["pos"] == 6
    assert a["line"] == "2025-07-07 - RuntimeError: bam"
    assert a["timestamp_ms"] is None
    assert a["before"] == [
        "2025-07-07 - Running a script",
        "2025-07-07 - Traceback (most recent call last):",
        '2025-07-07 -   File "test.py", line 7, in <module>',
        '2025-07-07 -     raise RuntimeError("bam")',
    ]
    assert a["after"] == ["2025-07-07 - Something went wrong"]


def test_errors_timestamps_golden():
    # errors.rs:253-280
    raw = "\n2025-08-14 13:23:14 message\n| fatal: oops\n"
    anomalies = _run_processor(raw)
    assert len(anomalies) == 1
    a = anomalies[0]
    assert a["pos"] == 3
    assert a["line"] == "| fatal: oops"
    assert a["timestamp_ms"] == 1755177794000
    assert a["before"] == ["2025-08-14 13:23:14 message"]
    assert a["after"] == []


def test_filter_anomalies_golden():
    # filter.rs:72-147
    raw = (
        "\n2025-10-22 10:02:43.255665 | TASK [Susbscription manager check]\n"
        "2025-10-22 10:02:43.304194 | primary | ERROR\n"
        "2025-10-22 10:02:43.304485 | primary | {\n"
        "nop\nnop\n"
        "2025-10-23 10:02:43.255665 | TASK [Second task]\n"
        "2025-10-23 10:02:43.304194 | primary | ERROR\n"
        "2025-10-23 10:02:43.304485 | primary | {\n"
    )
    anomalies = _run_processor(raw, dedup=False)
    assert len(anomalies) == 2
    a0, a1 = anomalies
    assert a0["pos"] == 3 and a0["timestamp_ms"] == 1761127363304
    assert a0["before"] == ["2025-10-22 10:02:43.255665 | TASK [Susbscription manager check]"]
    assert a0["after"] == ["2025-10-22 10:02:43.304485 | primary | {", "nop", "nop"]
    assert a1["pos"] == 8 and a1["timestamp_ms"] == 1761213763304
    assert a1["before"] == ["2025-10-23 10:02:43.255665 | TASK [Second task]"]
    assert a1["after"] == ["2025-10-23 10:02:43.304485 | primary | {"]

    # baseline trained via add_errors with ansible add_before semantics
    # (process.rs:85-116: before lines + anomaly lines are indexed); the
    # source is ansible ("job-output") so check_before applies: an anomaly
    # survives if its line OR any before line is novel. The first target
    # anomaly fully matches the baseline; the second's TASK header is new.
    baseline_raw = (
        "\n2025-10-22 10:02:43.255665 | TASK [Susbscription manager check]\n"
        "2025-10-22 10:02:43.304194 | primary | ERROR\n"
        "2025-10-22 10:02:43.304485 | primary | {\n"
    )
    base_anoms = _run_processor(baseline_raw, dedup=False)
    train_tokens = []
    for a in base_anoms:
        train_tokens.extend(process(b) for b in a["before"])
        train_tokens.append(process(a["line"]))
    index = build_matrix(train_tokens)
    filtered = filter_anomalies(index, anomalies, check_before=True)
    assert filtered == [a1]


def test_fsm_needmore_closes_open_anomaly():
    # errors.rs:140-144: a NeedMore line returns the pending anomaly
    texts = ["FAIL: boom", "follow", "Traceback (most recent call last):", "  x", "Err: y"]
    res = classify_lines(texts)
    a = find_error_anomalies(texts, np.arange(1, 6), np.zeros(5, bool), fsm_results=res)
    assert a[0]["line"] == "FAIL: boom"
    assert a[0]["after"] == ["follow"]
    # the traceback completion line is the second anomaly, with the pending
    # traceback body in its before-context
    assert a[1]["line"] == "Err: y"
    assert a[1]["before"] == ["Traceback (most recent call last):", "  x"]


def test_go_panic_mid_line_tab_check_matches_reference():
    """round-4 review: errors_parser.rs:130-145 slices l = &line[pos..]
    then tests l.chars().nth(pos) — the tab call-location check reads
    index pos WITHIN the slice. For a panic found at pos>0 (prefixed CI
    logs) a tab-indented call location must COMPLETE the traceback (the
    slice's nth(pos) is not the tab), not keep consuming."""
    from logjuicer_spark.errors import COMPLETED, NEED_MORE, FsmState

    fsm = FsmState()
    assert fsm.parse("ts | panic: runtime error: oops") == NEED_MORE
    assert fsm.parse("") == NEED_MORE  # header -> routine (empty separator)
    assert fsm.parse("ts | goroutine 1 [running]:") == NEED_MORE  # -> threads
    assert fsm.parse("ts | main.main()") == NEED_MORE  # function call
    assert fsm.parse("ts | \t/go/src/main.go:12") == COMPLETED


def test_is_ansible_source():
    from logjuicer_spark.errors import is_ansible_source

    assert is_ansible_source("ci/logs/job-output.txt")
    assert is_ansible_source("build.tar.gz?entry=x/ansible-run.log")
    assert not is_ansible_source("job-output.txt")  # no '/': rsplit fails
    assert not is_ansible_source("ci/logs/service.log")
