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
    return _classify_window(texts)[0]


class _Assembler:
    """Step-wise ErrorsProcessor state machine (errors.rs:116-194): the
    single source of the assembly semantics, shared by the whole-conversation
    walk (find_error_anomalies) and the range-split window scan
    (scan_error_window) so the two can never diverge."""

    __slots__ = ("texts", "positions", "is_ignored", "emit_ok", "native_ts",
                 "history", "current", "anomalies")

    def __init__(self, texts, positions, is_ignored, emit_ok, native_ts):
        self.texts = texts
        self.positions = positions
        self.is_ignored = is_ignored
        self.emit_ok = emit_ok
        self.native_ts = native_ts
        self.history: list[int] = []  # history line indices (cap 3 + ml overflow)
        self.current = None
        self.anomalies: list[dict] = []

    def step(self, i: int, r: int) -> None:
        texts = self.texts
        if r == NEED_MORE:
            self.history.append(i)  # uncapped push (errors.rs:137)
            if self.current is not None:
                self.anomalies.append(self.current)
                self.current = None
            return
        is_error = r in (ERROR, COMPLETED)
        if self.is_ignored[i]:
            return
        if is_error:
            if self.emit_ok is not None and not self.emit_ok[i]:
                return
            if self.native_ts is not None:
                ts = self.native_ts[i]
            else:
                t = parse_timestamp(texts[i])
                if t is None:
                    # History::last_timestamp (errors.rs:43-52): oldest first
                    for h in self.history:
                        t = parse_timestamp(texts[h])
                        if t is not None:
                            break
                ts = t[1] if (t is not None and t[0] == FULL) else None
            if self.current is not None:
                # return current; this error starts with an empty before
                self.anomalies.append(self.current)
                self.current = {
                    "idx": i,
                    "pos": int(self.positions[i]),
                    "line": texts[i],
                    "before": [],
                    "after": [],
                    "timestamp_ms": ts,
                }
            else:
                self.current = {
                    "idx": i,
                    "pos": int(self.positions[i]),
                    "line": texts[i],
                    "before": [texts[h] for h in self.history],
                    "after": [],
                    "timestamp_ms": ts,
                }
                self.history = []
        elif self.current is not None:
            self.current["after"].append(texts[i])
            if len(self.current["after"]) > 2:
                self.anomalies.append(self.current)
                self.current = None
        else:
            self.history.append(i)
            if len(self.history) > 3:
                self.history = self.history[-3:]

    def finish(self) -> None:
        if self.current is not None:
            self.anomalies.append(self.current)
            self.current = None

    def state_key(self):
        """Comparable snapshot of the carry-over state (history indices +
        the open anomaly's identity/content) — what the range-split
        convergence verification compares between the true walk and the
        successor's warm-up replay."""
        cur = None
        if self.current is not None:
            c = self.current
            cur = (c["idx"], tuple(c["before"]), tuple(c["after"]))
        return (tuple(self.history), cur)


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
    asm = _Assembler(texts, positions, is_ignored, emit_ok, native_ts)
    for i in range(n):
        asm.step(i, res[i])
    asm.finish()
    return asm.anomalies


def _classify_window(texts):
    """(per-line FSM results, FSM state after the last line). Same results
    as classify_lines; additionally exposes the end state for the
    range-split successor verification."""
    n = len(texts)
    has_ml = any((_PY_NEEDLE in t or _GO_NEEDLE in t) for t in texts)
    out = np.empty(n, dtype=np.int8)
    if not has_ml:
        for i, t in enumerate(texts):
            out[i] = ERROR if ERROR_RE.search(t) else NO_ERROR
        return out, None
    fsm = FsmState()
    for i, t in enumerate(texts):
        out[i] = fsm.parse(t)
    return out, fsm.s


def scan_error_window(
    texts,
    positions,
    is_ignored,
    emit_ok,
    native_ts,
    lo_i: int,
    hi_i: int,
    pad: int,
    has_successor: bool,
    tail_end: bool,
):
    """One range task's walk over its window (pad + body [lo_i, hi_i) +
    tail): returns (anomalies owned by the body, flag).

    Exactness protocol (induction over ranges of one conversation):
    - The task replays FSM + assembly from its window start with EMPTY
      state. Range 0's window starts at line 0, so its replay is the true
      walk; range k's replay is exact over its body because range k-1
      VERIFIED it: while scanning (exactly, by induction), range k-1 runs a
      second empty-state replay over [hi_i - pad, hi_i) — byte-identical to
      what range k will compute over its own pad — and compares (FSM state,
      assembly history indices, open-anomaly content) against the true
      state at hi_i. Any mismatch (a traceback/goroutine span or history
      run longer than the pad crossing the boundary) flags the conversation
      and the caller recomputes it single-task — so the split is exact for
      EVERY input, with the pad only deciding how often the fallback fires.
    - Anomalies are owned by the range whose body contains their error
      line; pad/tail copies are dropped (the neighbor emits them).
    - An anomaly still open at the window end would need lines the window
      doesn't have: flagged, unless the window reaches the conversation end
      (tail_end), where the reference's end-of-input flush applies.
    """
    n = len(texts)
    asm = _Assembler(texts, positions, is_ignored, emit_ok, native_ts)
    has_ml = any((_PY_NEEDLE in t or _GO_NEEDLE in t) for t in texts)
    snap = None
    if has_ml:
        fsm = FsmState()
        for i in range(n):
            if has_successor and i == hi_i:
                snap = (fsm.s, asm.state_key())
            asm.step(i, fsm.parse(texts[i]))
        end_fsm = fsm.s
    else:
        for i in range(n):
            if has_successor and i == hi_i:
                snap = (None, asm.state_key())
            asm.step(i, ERROR if ERROR_RE.search(texts[i]) else NO_ERROR)
        end_fsm = None
    if has_successor and snap is None:  # hi_i == n (clamped tail)
        snap = (end_fsm, asm.state_key())

    flag = False
    if has_successor:
        sv = max(hi_i - pad, 0)
        wfsm = FsmState()
        wasm = _Assembler(texts, positions, is_ignored, emit_ok, native_ts)
        for i in range(sv, hi_i):
            wasm.step(i, wfsm.parse(texts[i]))
        if (wfsm.s, wasm.state_key()) != snap:
            flag = True
    if asm.current is not None:
        if tail_end:
            asm.finish()
        elif lo_i <= asm.current["idx"] < hi_i:
            flag = True  # body anomaly's after-context needs unseen lines
    body = [a for a in asm.anomalies if lo_i <= a["idx"] < hi_i]
    return body, flag


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

    from .pipeline import _apply_per_conv

    return _apply_per_conv(parsed, _scan, CAND_SCHEMA)


# ------------------------- intra-conversation range splitting -------------
#
# Mirror of pipeline.route_split for the errors entry point (round-4 verdict
# item: a monster conversation in `errors` mode was a single straggler
# task). Ranges are arbitrary row intervals (the errors flow has no chunk
# machinery); exactness comes from the warm-up-convergence verification in
# scan_error_window — any conversation where a boundary crosses a
# longer-than-pad FSM span or history run is flagged and recomputed
# single-task, so the output equals the single-task walk for EVERY input.

_ERR_RANGES_SCHEMA = (
    "conv_id string, range_id int, lo string, hi string, pad_lo string, "
    "tail_hi string, has_successor boolean, tail_end boolean"
)

_CAND_FLAG_SCHEMA = CAND_SCHEMA + ", flagged boolean"
_ERRORS_FLAG_SCHEMA = ERRORS_SCHEMA + ", flagged boolean"


def _plan_error_ranges(pdf: "pd.DataFrame", max_task_lines: int, pad: int) -> "pd.DataFrame":
    """Per-conversation range plan over (conv_id, skey): bodies of
    max_task_lines rows; each non-first range gets a pad-row warm-up
    prefix, each non-last range a pad-row tail (after-context completion +
    successor verification window)."""
    pdf = pdf.sort_values("skey", kind="stable").reset_index(drop=True)
    conv = pdf["conv_id"].iloc[0]
    skeys = pdf["skey"].to_numpy()
    n = len(pdf)
    cols = [
        "conv_id", "range_id", "lo", "hi", "pad_lo", "tail_hi",
        "has_successor", "tail_end",
    ]
    if n <= max_task_lines:
        return pd.DataFrame([(conv, 0, "", None, None, None, False, True)], columns=cols)
    bounds = list(range(0, n, max_task_lines))
    rows = []
    for k, b in enumerate(bounds):
        last = k == len(bounds) - 1
        nb = n if last else bounds[k + 1]
        rows.append(
            (
                conv,
                k,
                "" if k == 0 else skeys[b],
                None if last else skeys[nb],
                None if k == 0 else skeys[max(b - pad, 0)],
                None if (last or nb + pad >= n) else skeys[nb + pad],
                not last,
                last or nb + pad >= n,
            )
        )
    return pd.DataFrame(rows, columns=cols)


def _error_ranges(big_parsed, max_task_lines: int, pad: int):
    from .pipeline import _skey

    light = big_parsed.select("conv_id", _skey().alias("skey"))

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        return _plan_error_ranges(pdf, max_task_lines, pad)

    return light.groupBy("conv_id").applyInPandas(plan, _ERR_RANGES_SCHEMA)


def _window_join(lines, ranges, include_tail: bool):
    """Replicate each line into the range windows that need it (body +
    pad prefix + optional tail), via a broadcast interval join on the
    sortable skey — the same mechanic as pipeline.route_split."""
    from pyspark.sql import functions as F

    from .pipeline import _skey

    lines = lines.withColumn("skey", _skey())

    def part(flt, lo_col, hi_col, is_pad, is_tail):
        src = ranges.filter(flt) if flt is not None else ranges
        return src.select(
            F.col("conv_id").alias("_r_conv"), "range_id",
            "has_successor", "tail_end",
            F.col(lo_col).alias("_w_lo"), F.col(hi_col).alias("_w_hi"),
            F.lit(is_pad).alias("is_pad"), F.lit(is_tail).alias("is_tail"),
        )

    dim = part(None, "lo", "hi", False, False).unionByName(
        part(F.col("pad_lo").isNotNull(), "pad_lo", "lo", True, False)
    )
    if include_tail:
        dim = dim.unionByName(
            part(F.col("hi").isNotNull(), "hi", "tail_hi", False, True)
        )
    return lines.join(
        F.broadcast(dim),
        on=[
            lines["conv_id"] == F.col("_r_conv"),
            F.col("skey") >= F.col("_w_lo"),
            F.col("_w_hi").isNull() | (F.col("skey") < F.col("_w_hi")),
        ],
    ).drop("_r_conv", "_w_lo", "_w_hi", "skey")


def _candidates_ranged(big_parsed, ranges, pad: int):
    """FSM candidate scan per (conv, range) window (pad + body; the FSM is
    causal, so no tail is needed), with the successor warm-up verification.
    Returns the CAND_FLAG_SCHEMA DataFrame (persisted by the caller)."""

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(
            drop=True
        )
        texts = pdf["text"].tolist()
        lo_i = int(pdf["is_pad"].to_numpy(dtype=bool).sum())
        has_succ = bool(pdf["has_successor"].iloc[0])
        res, end_state = _classify_window(texts)
        n = len(pdf)
        flag = False
        if has_succ:
            wfsm = FsmState()
            for i in range(max(n - pad, 0), n):
                wfsm.parse(texts[i])
            flag = wfsm.s != end_state
        err = (res == ERROR) | (res == COMPLETED)
        err &= ~pdf["is_ignored"].to_numpy(dtype=bool)
        if lo_i:
            err[:lo_i] = False  # pad rows: the predecessor owns them
        sel = pdf.loc[err]
        out = pd.DataFrame(
            {
                "conv_id": sel["conv_id"],
                "turn_idx": sel["turn_idx"],
                "sub_idx": sel["sub_idx"],
                "tool": sel["tool"],
                "text": sel["text"],
                "dkey": [dedup_key(process(t)) for t in sel["text"]],
                "flagged": False,
            }
        )
        if flag:
            sentinel = pd.DataFrame(
                [
                    {
                        "conv_id": pdf["conv_id"].iloc[0],
                        "turn_idx": -1, "sub_idx": -1,
                        "tool": "", "text": "", "dkey": "",
                        "flagged": True,
                    }
                ]
            )
            # never concat with a zero-row frame: its all-object columns
            # hit the deprecated empty/all-NA dtype-resolution path
            out = (
                sentinel
                if len(out) == 0
                else pd.concat([out, sentinel], ignore_index=True)
            )
        return out

    return _window_join(big_parsed, ranges, include_tail=False).groupBy(
        "conv_id", "range_id"
    ).applyInPandas(scan, _CAND_FLAG_SCHEMA)


def errors_run(
    spark,
    turns,
    cfg=None,
    skip_duplicate=True,
    model_indexes_bc=None,
    input_rows=None,
    allow_split=None,
    range_pad=256,
    return_candidates=False,
    candidates_df=None,
):
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

    Monster-conversation guard (mirrors pipeline.route): conversations
    with more than cfg.max_task_lines parsed lines are processed as
    range windows (pad + body + tail) instead of one giant task, exactly
    (scan_error_window's verification + single-task fallback). The probe
    runs Spark jobs, so it is OPT-IN to keep the default lazy:
    ``allow_split=True`` forces the probe (cheap: it aggregates the
    LIGHT parse, which has no Python stage); ``input_rows`` (a
    caller-known upper bound on the PARSED SUB-LINE row count — a raw
    turn count under-estimates it whenever sub-lines explode) engages it
    only when the input could contain an oversized conversation.
    ``range_pad`` is the warm-up/verification
    window (flags, and thus the fallback, fire only when an FSM span or
    history run longer than this crosses a range boundary).

    ``candidates_df``: a caller-materialized copy of
    ``error_candidates(parse(turns, cfg, columns="light"))`` — honored only
    on the non-split path (the split path derives its candidates from the
    range windows); must be value-identical to the internal expression.

    Cache ownership: the split path persists three SMALL intermediates
    (range plan, candidate scan, ranged output) registered with
    pipeline._SCORED_REFS — after consuming the returned DataFrame, call
    pipeline.release_stage_caches() (pipeline.run and the CLI do this;
    long-lived sessions composing errors_run directly should too).
    """
    from pyspark.sql import functions as F

    from . import pipeline as P
    from .model import lookup

    cfg = cfg or P.PipelineConfig()
    # "light": the errors flow classifies lines with its own FSM and
    # computes dedup keys per ERROR line only (error_candidates) — the
    # per-row tokenize UDF of the full parse would be pure waste here
    parsed = P.parse(turns, cfg, columns="light")

    engage = cfg.max_task_lines is not None and (
        allow_split is True
        or (
            allow_split is None
            and input_rows is not None
            and input_rows > cfg.max_task_lines
        )
    )
    big_ids: list = []
    ranges = None
    pad = max(8, min(range_pad, cfg.max_task_lines or range_pad))
    if engage:
        sizes = parsed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        big_ids = [
            r[0]
            for r in sizes.filter(F.col("n") > cfg.max_task_lines)
            .select("conv_id")
            .collect()
        ]
    if big_ids:
        big_parsed = parsed.filter(F.col("conv_id").isin(big_ids))
        ranges = _error_ranges(big_parsed, cfg.max_task_lines, pad).persist()
        P._SCORED_REFS.append(ranges)
        cand_all = _candidates_ranged(big_parsed, ranges, pad).persist()
        P._SCORED_REFS.append(cand_all)
        flagged_c = [
            r[0]
            for r in cand_all.filter("flagged").select("conv_id").distinct().collect()
        ]
        cand_big = cand_all.filter(
            ~F.col("flagged") & ~F.col("conv_id").isin(flagged_c)
        ).drop("flagged")
        if flagged_c:
            cand_big = cand_big.unionByName(
                error_candidates(
                    big_parsed.filter(F.col("conv_id").isin(flagged_c))
                )
            )
        candidates = error_candidates(
            parsed.filter(~F.col("conv_id").isin(big_ids))
        ).unionByName(cand_big)
    else:
        # a caller-staged candidate relation (e.g. the oracle queries
        # materialize it to parquet anyway) spares the plan one FSM pass:
        # the global-dedup dim below otherwise embeds a second
        # error_candidates subtree next to the per-conv assembly's own scan
        candidates = (
            candidates_df if candidates_df is not None
            else error_candidates(parsed)
        )
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

    def _emit_mask(pdf: pd.DataFrame, ansible: bool) -> np.ndarray:
        if skip_duplicate and not ansible:
            # nullable-boolean fill (NOT object-dtype fillna(False), whose
            # silent downcast is deprecated in pandas 2.2 and flips behavior
            # under pandas 3 — round-4 verdict item)
            return (
                pdf["_g_ok"].astype("boolean").fillna(False).to_numpy(dtype=bool)
            )
        # ansible sources bypass dedup entirely (skip_lines = None,
        # errors.rs:289-294): every error line emits
        return np.ones(len(pdf), dtype=bool)

    _OUT_COLS = [
        "conv_id", "turn_idx", "sub_idx", "tool", "role", "ts", "text",
        "score", "before", "after",
    ]

    def _finish(pdf: pd.DataFrame, anomalies: list, ansible: bool) -> pd.DataFrame:
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
        return pd.DataFrame(rows, columns=_OUT_COLS)

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(
            drop=True
        )
        texts = pdf["text"].tolist()
        ansible = len(pdf) > 0 and is_ansible_source(str(pdf["conv_id"].iloc[0]))
        anomalies = find_error_anomalies(
            texts,
            pdf["turn_idx"].to_numpy(),
            pdf["is_ignored"].to_numpy(dtype=bool),
            emit_ok=_emit_mask(pdf, ansible),
            # the emitted rows carry the turn's NATIVE ts column below;
            # handing it to the walk skips the per-error-line regex
            # timestamp parse whose result was discarded here anyway
            native_ts=pdf["ts"].tolist(),
        )
        return _finish(pdf, anomalies, ansible)

    if not big_ids:
        out = P._apply_per_conv(parsed, _assemble, ERRORS_SCHEMA)
        return (out, candidates) if return_candidates else out

    def _assemble_window(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(
            drop=True
        )
        n = len(pdf)
        lo_i = int(pdf["is_pad"].to_numpy(dtype=bool).sum())
        hi_i = n - int(pdf["is_tail"].to_numpy(dtype=bool).sum())
        ansible = n > 0 and is_ansible_source(str(pdf["conv_id"].iloc[0]))
        anomalies, flag = scan_error_window(
            pdf["text"].tolist(),
            pdf["turn_idx"].to_numpy(),
            pdf["is_ignored"].to_numpy(dtype=bool),
            _emit_mask(pdf, ansible),
            pdf["ts"].tolist(),
            lo_i,
            hi_i,
            pad,
            bool(pdf["has_successor"].iloc[0]),
            bool(pdf["tail_end"].iloc[0]),
        )
        out = _finish(pdf, anomalies, ansible)
        out["flagged"] = False
        if flag:
            # typed NaT keeps the ts column datetime64 on both sides, and
            # a zero-row out is replaced rather than concatenated — the
            # deprecated empty/all-NA concat path (pandas-3 durability)
            sentinel = pd.DataFrame(
                [
                    {
                        "conv_id": pdf["conv_id"].iloc[0],
                        "turn_idx": -1, "sub_idx": -1, "tool": "",
                        "role": "", "ts": pd.NaT, "text": "",
                        "score": np.float32(0.0),
                        "before": None, "after": None, "flagged": True,
                    }
                ]
            )
            out = (
                sentinel
                if len(out) == 0
                else pd.concat([out, sentinel], ignore_index=True)
            )
        return out

    small_out = P._apply_per_conv(
        parsed.filter(~F.col("conv_id").isin(big_ids)), _assemble, ERRORS_SCHEMA
    )
    big_rows = parsed.filter(F.col("conv_id").isin(big_ids))
    ranged_out = (
        _window_join(big_rows, ranges, include_tail=True)
        .groupBy("conv_id", "range_id")
        .applyInPandas(_assemble_window, _ERRORS_FLAG_SCHEMA)
        .persist()
    )
    P._SCORED_REFS.append(ranged_out)
    flagged_a = [
        r[0]
        for r in ranged_out.filter("flagged").select("conv_id").distinct().collect()
    ]
    big_out = ranged_out.filter(
        ~F.col("flagged") & ~F.col("conv_id").isin(flagged_a)
    ).drop("flagged")
    if flagged_a:
        big_out = big_out.unionByName(
            P._apply_per_conv(
                big_rows.filter(F.col("conv_id").isin(flagged_a)),
                _assemble,
                ERRORS_SCHEMA,
            )
        )
    out = small_out.unionByName(big_out)
    return (out, candidates) if return_candidates else out
