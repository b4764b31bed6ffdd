"""Model-free error extraction (the reference's `logjuicer errors` entry
point, E3 in SURVEY.md §3).

Semantic re-implementation of:
- the multiline FSM (python traceback / go panic)
  /root/reference/crates/errors/src/errors_parser.rs:46-145
- the single-line error regex set                     errors_parser.rs:148-198
- the ErrorsProcessor (3-line History before-context, up-to-3 after-context,
  fixed distance 0.5, global token-set dedup)
  /root/reference/crates/model/src/errors.rs:65-213
- filter-by-model (re-score error lines against a baseline index,
  ansible sources also test before-context lines)
  /root/reference/crates/model/src/filter.rs:34-70

Spark realization mirrors the main pipeline: a vectorized candidate scan
(the error regex runs as a pandas str op; the sequential FSM walk only runs
for conversations containing a multiline marker), a global-dedup winner
aggregation, then a per-conversation assembly pass.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .timestamps import FULL, parse_timestamp
from .tokenizer import dedup_key, process

DISTANCE = 0.5  # errors.rs:206
CTX = 3

# errors_parser.rs:148-198 ((?-u:..) -> ASCII semantics)
ERROR_RE = re.compile(
    r"(?:"
    r"ERROR [0-9]{4}"
    r"|<title>503 Service Unavailable</title>"
    r"| ERROR$"
    r'|\|   "msg": "'
    r"|: FAILED!"
    r"|\| FAILED \|"
    r"|\| (?:fatal|failed|error): "
    r"| The error appears to be in "
    r"| failed: [1-9][0-9]*[ \t]"
    r"|stderr: 'error:"
    r"|\|WARN\|"
    r"|\[EC [0-9]+\]"
    r"| \[Error\] "
    r"|[0-9Z][ \t]+ERROR[ \t]+[a-zA-Z]"
    r"|^FAIL: "
    r"|^(?:ERROR|FAILED): "
    r"|\.\.\. FAILED$"
    r'|^<(?:failure|error) message='
    r"|^E       "
    r"|%\] FAILED "
    r"|\] ERROR: "
    r'|"level":"ERROR"'
    r"|[ \t]{2,}(?:Failed|Error|CrashLoopBackOff)[ \t]{2,}[0-9]"
    r"|Warning[ \t]+Failed[ \t]+"
    r"|\bE[0-9]{4}\b"
    r'|msg="error'
    r'|msg="an error'
    r'|"level":"error"'
    r"|\blevel=error\b"
    r")",
    re.ASCII,
)

_PY_NEEDLE = "Traceback (most recent call last):"
_GO_NEEDLE = "panic:"
_GO_FUNC_RE = re.compile(r"^[a-z].*\(.*\)$")

NO_ERROR, ERROR, NEED_MORE, COMPLETED = 0, 1, 2, 3


def _start_find(line: str, needle: str):
    # errors_parser.rs:103-118: needle at start, or preceded by a separator
    if line.startswith(needle):
        return 0
    pos = line.find(needle)
    if pos > 0 and line[pos - 1] in " \t:|":
        return pos
    return None


def _go_tb_completed(pos: int, line: str) -> bool:
    # errors_parser.rs:130-145: the reference slices l = &line[pos..] and
    # then tests l.chars().nth(pos) — i.e. the tab call-location check
    # reads index pos WITHIN THE SLICE (full-line offset ~2*pos), not the
    # slice's first char. Odd, but parity means reproducing it exactly:
    # a round-4 review found this transcribed as line[pos] (== sub[0]),
    # which diverges for any panic found at pos > 0 (prefixed CI logs).
    if len(line) > pos:
        sub = line[pos:]
        return not (
            sub.startswith("goroutine ")
            or sub.startswith("created by")
            or _GO_FUNC_RE.match(sub) is not None
            or sub[pos : pos + 1] == "\t"
        )
    return False


def is_ansible_source(source: str) -> bool:
    """Source::is_ansible (report.rs:479-486): the file NAME (after the
    last '/') starts with job-output or contains ansible; sources without
    a '/' are never ansible (the reference requires rsplit_once to
    succeed). Ansible sources change the errors flow twice
    (errors.rs:289-294, process.rs:93-99): global dedup is DISABLED for
    them (skip_lines = None) and the model filter checks the
    before-context too (filter.rs:40 check_before)."""
    if "/" not in source:
        return False
    name = source.rsplit("/", 1)[1]
    return name.startswith("job-output") or "ansible" in name


class FsmState:
    """Parser state (errors_parser.rs:15-100). None | ('py', pos) |
    ('go', pos, 'header'|'routine'|'threads')."""

    __slots__ = ("s",)

    def __init__(self):
        self.s = None

    def parse(self, line: str) -> int:
        s = self.s
        if s is None:
            pos = _start_find(line, _PY_NEEDLE)
            if pos is not None:
                self.s = ("py", pos)
                return NEED_MORE
            pos = _start_find(line, _GO_NEEDLE)
            if pos is not None:
                self.s = ("go", pos, "header")
                return NEED_MORE
            return ERROR if ERROR_RE.search(line) else NO_ERROR
        if s[0] == "py":
            pos = s[1]
            ch = line[pos] if len(line) > pos else None
            if ch is None or ch == " ":
                return NEED_MORE
            self.s = None
            return COMPLETED
        # go
        pos, phase = s[1], s[2]
        if phase == "header":
            ch = line[pos] if len(line) > pos else None
            if ch == "[":
                return NEED_MORE
            if ch is None:
                self.s = ("go", pos, "routine")
                return NEED_MORE
            self.s = None
            return NO_ERROR
        if phase == "routine":
            if len(line) > pos and line[pos:].startswith("goroutine "):
                self.s = ("go", pos, "threads")
                return NEED_MORE
            self.s = None
            return NO_ERROR
        # threads
        if _go_tb_completed(pos, line):
            self.s = None
            return COMPLETED
        return NEED_MORE


def classify_lines(texts) -> np.ndarray:
    """Per-line FSM results for one conversation (vectorized fast path when
    no multiline marker is present)."""
    n = len(texts)
    has_ml = any((_PY_NEEDLE in t or _GO_NEEDLE in t) for t in texts)
    if not has_ml:
        out = np.empty(n, dtype=np.int8)
        for i, t in enumerate(texts):
            out[i] = ERROR if ERROR_RE.search(t) else NO_ERROR
        return out
    fsm = FsmState()
    out = np.empty(n, dtype=np.int8)
    for i, t in enumerate(texts):
        out[i] = fsm.parse(t)
    return out


def find_error_anomalies(
    texts,
    positions,
    is_ignored,
    emit_ok=None,
    fsm_results=None,
    native_ts=None,
):
    """Sequential assembly mirroring ErrorsProcessor (errors.rs:116-194).

    emit_ok: per-line global-dedup verdict (None = no dedup / all ok).
    native_ts: optional per-line epoch-ms to use instead of text parsing.
    Returns anomaly dicts (idx, pos, line, before, after, timestamp_ms).
    """
    n = len(texts)
    res = classify_lines(texts) if fsm_results is None else fsm_results
    anomalies = []
    history: list[int] = []  # indices of history lines (cap 3 + ml overflow)
    current = None
    for i in range(n):
        r = res[i]
        if r == NEED_MORE:
            history.append(i)  # uncapped push (errors.rs:137)
            if current is not None:
                anomalies.append(current)
                current = None
            continue
        is_error = r in (ERROR, COMPLETED)
        if is_ignored[i]:
            continue
        if is_error:
            if emit_ok is not None and not emit_ok[i]:
                continue
            if native_ts is not None:
                ts = native_ts[i]
            else:
                ts = None
                t = parse_timestamp(texts[i])
                if t is None:
                    # History::last_timestamp (errors.rs:43-52): oldest first
                    for h in history:
                        t = parse_timestamp(texts[h])
                        if t is not None:
                            break
                ts = t[1] if (t is not None and t[0] == FULL) else None
            if current is not None:
                # return current; this error starts with an empty before
                anomalies.append(current)
                current = {
                    "idx": i,
                    "pos": int(positions[i]),
                    "line": texts[i],
                    "before": [],
                    "after": [],
                    "timestamp_ms": ts,
                }
            else:
                current = {
                    "idx": i,
                    "pos": int(positions[i]),
                    "line": texts[i],
                    "before": [texts[h] for h in history],
                    "after": [],
                    "timestamp_ms": ts,
                }
                history = []
        elif current is not None:
            current["after"].append(texts[i])
            if len(current["after"]) > 2:
                anomalies.append(current)
                current = None
        else:
            history.append(i)
            if len(history) > 3:
                history = history[-3:]
    if current is not None:
        anomalies.append(current)
    return anomalies


def filter_anomalies(index, anomalies, check_before=False):
    """filter.rs:34-70: drop anomalies whose line (or, with check_before,
    any before line) is within threshold of the baseline index."""
    from .hashing import THRESHOLD

    lines = []
    for a in anomalies:
        if check_before:
            lines.extend(process(b) for b in a["before"])
        lines.append(process(a["line"]))
    if not lines:
        return []
    distances = index.score(lines)
    fresh = []
    pos = 0
    for a in anomalies:
        skip = True
        if check_before:
            for _ in a["before"]:
                if skip and distances[pos] > THRESHOLD:
                    skip = False
                pos += 1
        if not skip or distances[pos] > THRESHOLD:
            fresh.append(a)
        pos += 1
    return fresh


# --------------------------------------------------------------------------
# Spark wiring
# --------------------------------------------------------------------------

ERRORS_SCHEMA = (
    "conv_id string, turn_idx int, sub_idx int, tool string, role string, "
    "ts timestamp, text string, score float, "
    "before array<string>, after array<string>"
)

CAND_SCHEMA = (
    "conv_id string, turn_idx int, sub_idx int, tool string, text string, dkey string"
)


def error_candidates(parsed) -> "pd.DataFrame":
    """Per-conversation FSM classification -> error-classified lines with
    their token-set dedup keys (the UDF half of the errors report; the
    dedup + emit logic downstream is relational and SQL-oracle-able over a
    staged copy of this output)."""

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable")
        texts = pdf["text"].tolist()
        res = classify_lines(texts)
        err = (res == ERROR) | (res == COMPLETED)
        err &= ~pdf["is_ignored"].to_numpy(dtype=bool)
        sel = pdf.loc[err]
        return pd.DataFrame(
            {
                "conv_id": sel["conv_id"],
                "turn_idx": sel["turn_idx"],
                "sub_idx": sel["sub_idx"],
                "tool": sel["tool"],
                "text": sel["text"],
                "dkey": [dedup_key(process(t)) for t in sel["text"]],
            }
        )

    return parsed.groupBy("conv_id").applyInPandas(_scan, CAND_SCHEMA)


def errors_run(spark, turns, cfg=None, skip_duplicate=True, model_indexes_bc=None):
    """Full errors report over a turns DataFrame.

    Mirrors errors_report (errors.rs:341-377): per-conversation FSM scan,
    global dedup of identical error token-sets (deterministic first
    occurrence by (conv_id, turn_idx, sub_idx)), fixed 0.5 distance.
    With model_indexes_bc (broadcast {group: SparseIndex}), anomalies are
    post-filtered by the model (report_errors, model.rs:755-790).

    Ansible sources (is_ansible_source on the conv id) follow the
    reference's special-casing (errors.rs:289-294, process.rs:93-99,
    filter.rs:40): they neither consult nor feed the global dedup
    (skip_lines = None — every error emits, and their token-sets don't
    claim first-occurrence for other sources), and the model filter runs
    with check_before=True (an anomaly whose before-context is novel
    survives even when its error line matches the baseline).
    """
    from pyspark.sql import functions as F

    from . import pipeline as P
    from .model import lookup

    cfg = cfg or P.PipelineConfig()
    parsed = P.parse(turns, cfg)
    candidates = error_candidates(parsed)
    _src_name = F.substring_index("conv_id", "/", -1)
    ansible_expr = F.col("conv_id").contains("/") & (
        _src_name.startswith("job-output") | _src_name.contains("ansible")
    )
    if skip_duplicate:
        gl = (
            candidates.filter(~ansible_expr)
            .groupBy("dkey")
            .agg(F.min(F.struct("conv_id", "turn_idx", "sub_idx")).alias("g"))
            .select(
                F.col("g.conv_id").alias("_g_conv"),
                F.col("g.turn_idx").alias("_g_turn"),
                F.col("g.sub_idx").alias("_g_sub"),
            )
            .withColumn("_g_ok", F.lit(True))
        )
        parsed = parsed.join(
            F.broadcast(gl),
            on=[
                parsed["conv_id"] == F.col("_g_conv"),
                parsed["turn_idx"] == F.col("_g_turn"),
                parsed["sub_idx"] == F.col("_g_sub"),
            ],
            how="left",
        ).drop("_g_conv", "_g_turn", "_g_sub")
    else:
        parsed = parsed.withColumn("_g_ok", F.lit(True))

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(
            drop=True
        )
        texts = pdf["text"].tolist()
        ansible = len(pdf) > 0 and is_ansible_source(str(pdf["conv_id"].iloc[0]))
        if skip_duplicate and not ansible:
            emit = pdf["_g_ok"].fillna(False).to_numpy(dtype=bool)
        else:
            # ansible sources bypass dedup entirely (skip_lines = None,
            # errors.rs:289-294): every error line emits
            emit = np.ones(len(pdf), dtype=bool)
        anomalies = find_error_anomalies(
            texts,
            pdf["turn_idx"].to_numpy(),
            pdf["is_ignored"].to_numpy(dtype=bool),
            emit_ok=emit,
            # the emitted rows carry the turn's NATIVE ts column below;
            # handing it to the walk skips the per-error-line regex
            # timestamp parse whose result was discarded here anyway
            native_ts=pdf["ts"].tolist(),
        )
        if model_indexes_bc is not None and anomalies:
            # report_errors (model.rs:755-790): filter per anomaly against
            # the index of its own group
            idx_map = model_indexes_bc.value
            tools = pdf["tool"].tolist()
            kept = []
            by_tool: dict = {}
            for a in anomalies:
                by_tool.setdefault(tools[a["idx"]], []).append(a)
            for tool, group in by_tool.items():
                idx = lookup(idx_map, tool)
                kept.extend(
                    filter_anomalies(idx, group, check_before=ansible)
                    if idx is not None
                    else group
                )
            anomalies = sorted(kept, key=lambda a: a["idx"])
        rows = []
        for a in anomalies:
            r = pdf.iloc[a["idx"]]
            rows.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": int(r["turn_idx"]),
                    "sub_idx": int(r["sub_idx"]),
                    "tool": r["tool"],
                    "role": r["role"],
                    "ts": r["ts"],
                    "text": a["line"],
                    "score": np.float32(DISTANCE),
                    "before": a["before"],
                    "after": a["after"],
                }
            )
        cols = [
            "conv_id", "turn_idx", "sub_idx", "tool", "role", "ts", "text",
            "score", "before", "after",
        ]
        return pd.DataFrame(rows, columns=cols)

    return parsed.groupBy("conv_id").applyInPandas(_assemble, ERRORS_SCHEMA)
