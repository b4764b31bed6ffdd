"""Dataset test harness — the reference's `logjuicer test DATASET_DIR`
format (/root/reference/crates/cli/src/dataset.rs:17-127): each dataset dir
holds one *.good file (baseline), one *.fail file (target) and an inf.yaml
listing expected anomaly substrings (plus an optional skip flag). Train on
good, report on fail, assert per-anomaly line containment in order and an
exact anomaly count."""

from __future__ import annotations

import os
import re


def load_inf(path: str) -> dict:
    """Minimal parser for the inf.yaml subset the datasets use:
    anomalies: [- line: <str>]* and skip: bool."""
    inf = {"anomalies": [], "skip": False}
    with open(os.path.join(path, "inf.yaml")) as f:
        for raw in f:
            line = raw.rstrip("\n")
            s = line.strip()
            if s.startswith("- line:"):
                val = s[len("- line:"):].strip()
                if val and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                inf["anomalies"].append(val)
            elif s.startswith("skip:"):
                inf["skip"] = s.split(":", 1)[1].strip() in ("true", "True")
    return inf


def run_dataset(spark, path: str, turns_per_file=None) -> tuple[list, dict]:
    """Run the pipeline on one dataset dir; returns (anomaly rows, inf)."""
    from pyspark.sql import functions as F

    from . import gen, pipeline

    inf = load_inf(path)
    files = sorted(os.listdir(path))
    good = [f for f in files if f.endswith(".good")]
    fail = [f for f in files if f.endswith(".fail")]
    if not good or not fail:
        raise FileNotFoundError(f"need .good and .fail files in {path}")

    def to_rows(fname, conv_id):
        rows = []
        with open(os.path.join(path, fname)) as f:
            for i, line in enumerate(f.read().splitlines(), start=1):
                rows.append(
                    {"conv_id": conv_id, "turn_idx": i, "role": "tool",
                     "text": line, "tool": "log", "ts": None}
                )
        return rows

    baseline_rows = []
    for g in good:
        baseline_rows.extend(to_rows(g, g))
    target_rows = to_rows(fail[0], fail[0])
    baseline = gen.to_spark_df(spark, baseline_rows)
    target = gen.to_spark_df(spark, target_rows)
    out = pipeline.run(spark, target, baseline_turns=baseline)
    anomalies = (
        out["anomalies"].orderBy("turn_idx", "sub_idx").collect()
    )
    return anomalies, inf


def check_dataset(spark, path: str) -> str:
    """Returns 'ok' | 'skip' or raises AssertionError (dataset.rs:109-120)."""
    inf = load_inf(path)
    if inf["skip"]:
        return "skip"
    anomalies, inf = run_dataset(spark, path)
    for expected, anomaly in zip(inf["anomalies"], anomalies):
        assert expected in anomaly.text, (
            f"anomaly {anomaly.text!r} does not include {expected!r}"
        )
    assert len(anomalies) == len(inf["anomalies"]), (
        f"expected {len(inf['anomalies'])} anomalies, got {len(anomalies)}: "
        f"{[a.text for a in anomalies]}"
    )
    return "ok"
