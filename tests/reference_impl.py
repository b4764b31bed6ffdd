"""A deliberately naive, sequential transcription of the reference pipeline,
used ONLY as a differential-testing oracle for the Spark engine.

Mirrors ChunkProcessor (/root/reference/crates/model/src/process.rs:126-436)
line-by-line per conversation, with per-group KnownLines shared across
conversations in sorted (conv_id, turn_idx, sub_idx) order and a global
KnownLines for anomaly emission — the engine's documented deterministic
ordering of the reference's thread-racy global dedup.
"""

from __future__ import annotations

import re

import numpy as np

from logjuicer_spark.hashing import build_matrix
from logjuicer_spark.tokenizer import dedup_key, process

THRESHOLD = np.float32(0.3)
CTX = 3
BETWEEN = 12
CHUNK = 512


class NaiveChunkProcessor:
    """One per conversation; state mirrors the Rust struct."""

    def __init__(self, index, group_seen: dict, gl_seen, ignore_res):
        self.index = index  # {tool: SparseIndex} accessor fn
        self.group_seen = group_seen  # {tool: set(dkey)}
        self.gl_seen = gl_seen  # set(dkey) or None
        self.ignore_res = ignore_res
        self.buffer = []  # (text, pos, tool, tokens)
        self.targets = []  # (buffer_idx, tokens, tool)
        self.left_overs = []
        self.current = None
        self.anomalies = []

    def push_line(self, text, pos, tool):
        if any(r.search(text) for r in self.ignore_res):
            return
        tokens = process(text)
        self.buffer.append((text, pos, tool))
        seen = self.group_seen.setdefault(tool, set())
        k = dedup_key(tokens)
        if k not in seen:
            seen.add(k)
            self.targets.append((len(self.buffer) - 1, tokens, tool, k))
            if len(self.targets) == CHUNK:
                self.do_search()
        elif len(self.buffer) > CHUNK * 10:
            self.do_search()

    def finish(self):
        if self.targets:
            self.do_search()
        if self.current is not None:
            self.anomalies.append(self.current)
            self.current = None
        return self.anomalies

    def do_search(self):
        # score each target against its tool's index
        distances = []
        for bt, tokens, tool, k in self.targets:
            idx = self.index(tool)
            d = idx.score([tokens])[0] if idx is not None else np.float32(1.0)
            distances.append(np.float32(d))

        buffer_pos = 0
        last_context_pos = 0
        for (bt, tokens, tool, k), dist in zip(self.targets, distances):
            is_anomaly = dist > THRESHOLD
            target_str = None
            while buffer_pos <= bt:
                j = buffer_pos
                buffer_pos += 1
                found = j == bt
                if found and is_anomaly:
                    target_str = j
                elif self.current is not None:
                    self.current["after"].append(self.buffer[j][0])
                    if len(self.current["after"]) >= CTX:
                        self.anomalies.append(self.current)
                        self.current = None
                    last_context_pos = buffer_pos
                if found:
                    break
            if target_str is not None:
                if self.current is not None:
                    self.anomalies.append(self.current)
                    self.current = None
                if self.gl_seen is not None:
                    if k in self.gl_seen:
                        continue
                    self.gl_seen.add(k)
                before = self.collect_before(bt, last_context_pos)
                last_context_pos = bt + 1
                self.current = {
                    "pos": self.buffer[bt][1],
                    "line": self.buffer[bt][0],
                    "distance": float(dist),
                    "before": before,
                    "after": [],
                }
        if self.current is not None and last_context_pos < len(self.buffer):
            for j in range(last_context_pos, len(self.buffer)):
                self.current["after"].append(self.buffer[j][0])
                if len(self.current["after"]) >= CTX:
                    self.anomalies.append(self.current)
                    self.current = None
                    break
        # reset
        m = len(self.buffer)
        min_lo = 0 if m < BETWEEN else m - BETWEEN
        lo = max(last_context_pos, min_lo)
        self.left_overs = [t for (t, _, _) in self.buffer[lo:]]
        self.buffer = []
        self.targets = []

    def collect_before(self, bt, last_context_pos):
        ctx = BETWEEN if bt - last_context_pos < BETWEEN else CTX
        min_pos = bt - ctx if bt >= ctx else 0
        start = max(last_context_pos, min_pos)
        before = [t for (t, _, _) in self.buffer[start:bt]]
        if start == 0 and len(before) < ctx:
            need = ctx - len(before)
            want = min(need, len(self.left_overs))
            if want:
                before = self.left_overs[-want:] + before
        return before


def naive_report(
    baseline_rows,
    target_rows,
    group_col="tool",
    ignore_patterns=(),
    skip_duplicate=True,
):
    """Train on baseline rows, report on target rows. Rows are TURNS dicts.
    Returns list of anomaly dicts with conv_id added, in conv order."""
    ignore_res = [re.compile(p) for p in ignore_patterns]

    # --- train (IndexTrainer per group, KnownLines dedup) ---
    train_tokens: dict = {}
    seen: dict = {}
    for r in sorted(baseline_rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        text = r["text"]
        if any(rx.search(text) for rx in ignore_res):
            continue
        t = process(text)
        k = dedup_key(t)
        s = seen.setdefault(r[group_col], set())
        if k not in s:
            s.add(k)
            train_tokens.setdefault(r[group_col], []).append(t)
    indexes = {g: build_matrix(toks) for g, toks in train_tokens.items()}

    def lookup(tool):
        idx = indexes.get(tool)
        if idx is None and len(indexes) == 1:
            return next(iter(indexes.values()))
        return idx

    # --- report (sequential convs, shared per-group + global dedup) ---
    group_seen: dict = {}
    gl_seen = set() if skip_duplicate else None
    out = []
    by_conv: dict = {}
    for r in target_rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv_id in sorted(by_conv):
        rows = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        known = [r for r in rows if lookup(r[group_col]) is not None]
        cp = NaiveChunkProcessor(lookup, group_seen, gl_seen, ignore_res)
        for r in known:
            cp.push_line(r["text"], r["turn_idx"], r[group_col])
        for a in cp.finish():
            a["conv_id"] = conv_id
            out.append(a)
    return out
