"""Per-conversation anomaly extraction with context assembly.

This reproduces, per conversation, the observable semantics of the
reference's ChunkProcessor (/root/reference/crates/model/src/process.rs:126-436):

- lines stream in order; non-ignored lines enter a raw buffer
- lines whose token-set is new to the (tool-)group are "targets"; a chunk is
  flushed when 512 targets accumulate, when a duplicate arrives with more
  than 5120 buffered lines, or at end of stream        (process.rs:26,283-295)
- an anomaly is a target with cosine distance > 0.3    (process.rs:20,320)
- before-context: up to 3 lines, extended to 12 when the previous
  anomaly/context ended fewer than 12 buffered lines back, never overlapping
  the previous context; backfilled from the previous chunk's left-overs at
  buffer start                                         (process.rs:443-474,419-436)
- after-context: up to 3 lines, truncated by the next anomaly
                                                       (process.rs:334-357,402-415)
- a globally duplicate anomaly is silently dropped (it still consumed its
  buffer slot but leaves no context trace)             (process.rs:359-363)

Scores arrive precomputed (the enrich stage scored each distinct
(group, tokens) once against the broadcast index), so this stage is pure
bookkeeping: numpy mask work plus a Python walk that only touches chunk
boundaries and anomaly neighbourhoods.

Chunk boundaries are OBSERVABLE in the reference's output (a chunk start
resets the buffer-relative context positions, re-arming the 12-line extended
context), so we emulate them exactly rather than pretending the buffer is
infinite.
"""

from __future__ import annotations

import numpy as np

CTX_LENGTH = 3  # process.rs:22
BETWEEN_CTX_LENGTH = 12  # process.rs:24
CHUNK_SIZE = 512  # process.rs:26
FLUSH_GUARD = CHUNK_SIZE * 10  # process.rs:289
THRESHOLD = np.float32(0.3)  # process.rs:20


class _ChunkState:
    """Mutable cross-chunk state (current open anomaly + left-overs +
    last-known-timestamp tracking for parse-mode W3)."""

    __slots__ = ("current", "left_overs", "anomalies", "last_ts", "parse_ts", "gl_date")

    def __init__(self, parse_ts=False, gl_date=None):
        self.current = None  # open anomaly dict
        self.left_overs: list[str] = []
        self.anomalies: list[dict] = []
        # LastTS (process.rs:159-163): ('known', epoch_or_None, pos) | 'missing'
        self.last_ts = ("known", None, 0)
        self.parse_ts = parse_ts
        self.gl_date = gl_date

    def close_current(self):
        if self.current is not None:
            self.anomalies.append(self.current)
            self.current = None

    def get_timestamp(self, bt, buf_texts, positions):
        """process.rs:210-244: parse from the line, else scan <= 32 lines
        backward in the chunk buffer until the previously known ts position;
        time-only stamps resolve against gl_date."""
        from .timestamps import FULL, parse_timestamp, set_date

        if self.last_ts == "missing":
            return None
        _, _, last_pos = self.last_ts
        t = None
        count = 0
        j = bt  # reference scans from buffer_pos - 1 == the target itself
        while True:
            t = parse_timestamp(buf_texts[j]) if j >= 0 else None
            if t is not None or j < 0:
                break
            count += 1
            if count > 32:
                t = None
                break
            j -= 1
            if j >= 0 and positions[j] <= last_pos:
                t = None
                break
        if t is None:
            return None
        if t[0] == FULL:
            return t[1]
        if self.gl_date is not None:
            return set_date(self.gl_date, t[1])
        return None

    def update_last_ts(self, ts, pos):
        # process.rs:367-371
        if self.last_ts != "missing":
            _, known, _ = self.last_ts
            if known is None and ts is None and pos > 42:
                self.last_ts = "missing"
                return
        self.last_ts = ("known", ts, pos)


def _collect_before(bt, last_context_pos, buf_texts, left_overs):
    # process.rs:443-474
    ctx = BETWEEN_CTX_LENGTH if bt - last_context_pos < BETWEEN_CTX_LENGTH else CTX_LENGTH
    min_pos = bt - ctx if bt >= ctx else 0
    start = max(last_context_pos, min_pos)
    before = list(buf_texts[start:bt])
    if start == 0 and len(before) < ctx:
        need = ctx - len(before)
        want = min(need, len(left_overs))
        if want:
            before = list(left_overs[len(left_overs) - want :]) + before
    return before


def _process_chunk(
    state, buf_local, buf_texts, tgt_bpos, tgt_scores, tgt_emit, positions,
    threshold=THRESHOLD,
):
    """One do_search_anomalies pass (process.rs:311-436).

    buf_local: local line indices of buffered lines (conv-relative)
    buf_texts: their raw texts
    tgt_bpos:  buffer positions of this chunk's targets (unique lines)
    tgt_scores/tgt_emit: distance + global-dedup verdict per target
    positions: line numbers (pos) per buffered line
    threshold: anomaly cutoff (f32; configurable via PipelineConfig)
    """
    m = len(buf_local)
    last_context_pos = 0
    buffer_pos = 0
    anomalous = tgt_scores > threshold

    for k in range(len(tgt_bpos)):
        bt = int(tgt_bpos[k])
        is_anomaly = bool(anomalous[k])
        # fast path: nothing open and target not anomalous -> the scan would
        # only advance buffer_pos
        if state.current is None and not is_anomaly:
            buffer_pos = bt + 1
            continue
        target_found = False
        while buffer_pos <= bt:
            j = buffer_pos
            buffer_pos += 1
            found = j == bt
            if found and is_anomaly:
                target_found = True
            elif state.current is not None:
                cur = state.current
                cur["after"].append(buf_texts[j])
                if len(cur["after"]) >= CTX_LENGTH:
                    state.close_current()
                last_context_pos = buffer_pos
            if found:
                break
        if target_found:
            state.close_current()
            if not tgt_emit[k]:
                continue  # global duplicate: silently dropped
            timestamp = None
            if state.parse_ts:
                timestamp = state.get_timestamp(bt, buf_texts, positions)
                state.update_last_ts(timestamp, int(positions[bt]))
            before = _collect_before(bt, last_context_pos, buf_texts, state.left_overs)
            last_context_pos = bt + 1
            state.current = {
                "idx": int(buf_local[bt]),
                "pos": int(positions[bt]),
                "distance": float(tgt_scores[k]),
                "line": buf_texts[bt],
                "before": before,
                "after": [],
                "timestamp_ms": timestamp,
            }

    # trailing after-context for the still-open anomaly (process.rs:401-415)
    if state.current is not None and last_context_pos < m:
        for j in range(last_context_pos, m):
            state.current["after"].append(buf_texts[j])
            if len(state.current["after"]) >= CTX_LENGTH:
                state.close_current()
                break

    # reset: keep left-overs (process.rs:419-436)
    min_lo = 0 if m < BETWEEN_CTX_LENGTH else m - BETWEEN_CTX_LENGTH
    lo = max(last_context_pos, min_lo)
    state.left_overs = list(buf_texts[lo:m])


def chunk_flush_points(tgt_mask_buf) -> list[int]:
    """Chunk flush boundaries over the buffered-line mask (process.rs:283-295).

    Returns the exclusive END index (into the buffered-line sequence) of each
    flushed chunk, in order: a chunk flushes after its 512th target line, at
    a duplicate line once the buffer holds > 5120 lines, or at end of stream
    (that last flush only happens when un-flushed targets remain; a trailing
    targetless buffer is discarded).

    Key scale property: every non-final chunk is >= CHUNK_SIZE lines long
    (the earliest flush is the 512th target), and <= FLUSH_GUARD + CHUNK_SIZE
    lines (past 5120 lines any duplicate flushes, and 512 consecutive
    targets flush) — chunks are BOUNDED, which is what makes chunk-aligned
    range splitting exact (see find_anomalies_ranged).
    """
    tgt_mask_buf = np.asarray(tgt_mask_buf, dtype=bool)
    nbuf = len(tgt_mask_buf)
    if nbuf == 0:
        return []
    tgt_cum = np.cumsum(tgt_mask_buf)
    dup_pos = np.flatnonzero(~tgt_mask_buf)
    ends: list[int] = []
    start = 0
    while start < nbuf:
        base = tgt_cum[start - 1] if start > 0 else 0
        k = np.searchsorted(tgt_cum, base + CHUNK_SIZE)
        d_i = np.searchsorted(dup_pos, start + FLUSH_GUARD)
        flush_at = None
        if k < nbuf:
            flush_at = int(k)
        if d_i < len(dup_pos):
            cand = int(dup_pos[d_i])
            if flush_at is None or cand < flush_at:
                flush_at = cand
        if flush_at is None:
            if tgt_cum[nbuf - 1] - base > 0:
                ends.append(nbuf)
            break
        ends.append(flush_at + 1)
        start = flush_at + 1
    return ends


def _coerce_walk_inputs(texts, positions, is_ignored, is_target, scores, emit_ok):
    """Shared input normalization of the two context-walk entry points
    (find_anomalies / find_anomalies_ranged): the is_target & ~is_ignored
    masking and the f32 score cast are part of the walk's contract, so a
    single definition keeps the ranged/full equivalence structural."""
    n = len(texts)
    is_ignored = np.asarray(is_ignored, dtype=bool)
    is_target = np.asarray(is_target, dtype=bool) & ~is_ignored
    scores = np.asarray(scores, dtype=np.float32)
    emit = (
        np.ones(n, dtype=bool) if emit_ok is None
        else np.asarray(emit_ok, dtype=bool)
    )
    positions = np.asarray(positions)
    texts_arr = texts if isinstance(texts, list) else list(texts)
    return texts_arr, positions, is_ignored, is_target, scores, emit


def find_anomalies(
    texts,
    positions,
    is_ignored,
    is_target,
    scores,
    emit_ok=None,
    parse_ts=False,
    gl_date=None,
    threshold=THRESHOLD,
):
    """Run the full per-conversation extraction.

    Parameters (parallel arrays over the conversation's lines, in order):
      texts      raw line texts (list[str])
      positions  line numbers (turn_idx), may repeat for sub-lines
      is_ignored bool array -- ignore_patterns matches (skipped entirely,
                 they consume a position but never enter the buffer)
      is_target  bool array -- first occurrence of the token-set within the
                 group (per-group KnownLines dedup, process.rs:270-277)
      scores     f32 array -- distance of the line's tokens to the baseline
                 (only read where is_target)
      emit_ok    bool array or None -- global-dedup verdict (None = all ok)
      threshold  anomaly cutoff, compared in f32 (default process.rs:20's 0.3;
                 a non-default PipelineConfig.threshold must reach here so the
                 context walk agrees with enrich's global-dedup gate)

    Returns list of anomaly dicts: idx (line offset in the conv), pos,
    distance, line, before[], after[].
    """
    texts_arr, positions, is_ignored, is_target, scores, emit = (
        _coerce_walk_inputs(texts, positions, is_ignored, is_target, scores, emit_ok)
    )

    # buffered lines = non-ignored lines, in order
    buf_all = np.flatnonzero(~is_ignored)
    if len(buf_all) == 0:
        return []
    tgt_mask_buf = is_target[buf_all]  # per buffered line
    state = _ChunkState(parse_ts=parse_ts, gl_date=gl_date)

    # --- chunk boundary computation (process.rs:283-295) ---
    _run_chunks(
        state, texts_arr, positions, scores, emit, buf_all, tgt_mask_buf, threshold
    )

    # end of stream: close the open anomaly without more context
    # (process.rs:302-306)
    state.close_current()
    return state.anomalies


# replicated-tail length for range splitting: must cover the previous
# chunk's left_overs window (BETWEEN_CTX_LENGTH=12) + an open anomaly's
# anchor zone (CTX_LENGTH=3) + the entry-state error margin (<=3 lines the
# pad simulation cannot know about, which must stay clear of every decision
# window; see find_anomalies_ranged for the argument)
PAD_LINES = 20


def find_anomalies_ranged(
    texts,
    positions,
    is_ignored,
    is_target,
    scores,
    emit_ok,
    n_pad,
    is_last,
    threshold=THRESHOLD,
):
    """Process ONE chunk-aligned range of a conversation, exactly.

    Range splitting relies on three structural facts of the chunk machinery:

    1. every non-final chunk is >= CHUNK_SIZE (512) buffered lines (see
       chunk_flush_points), so cross-chunk state never propagates further
       than a bounded window around the boundary;
    2. the state carried across a chunk flush is only (open anomaly with
       <= 3 pending after-lines, left_overs = the <=12-line tail), both
       fully determined by the last ~15 buffered lines of the flushed chunk
       plus their per-line verdicts — which are position-independent
       (is_target & score > threshold & emit_ok);
    3. chunk segmentation restarts fresh at each flush, so a range that
       starts at a flush boundary recomputes its internal boundaries
       locally and identically.

    The caller therefore replays the previous range's last PAD_LINES
    buffered lines (the "pad", rows [0, n_pad) of the input arrays) through
    one priming _process_chunk call: the entry state the pad itself cannot
    know about only influences its first <=3 lines, while every decision
    that survives into the body (left_overs window start at pad_len-12 >= 8,
    kept-anchor context windows >= pad_len-15 = 5) reads strictly later pad
    positions, so the primed state equals the true carried state.

    Emission protocol (ranges must not double-emit across the boundary):
    - anomalies fully inside the pad are dropped here (the previous range
      emitted them);
    - an anomaly still OPEN at pad end (anchor in the pad's last <=3
      buffered lines) is emitted HERE once its after-context completes —
      the previous range suppressed it (returned as suppressed_open_idx
      there, carried_pad_idx here);
    - symmetrically, an anomaly still open at the end of a NON-final range
      is suppressed and reported via suppressed_open_idx so the caller can
      also withhold that line's routed row (the next range emits it).

    Returns (anomalies, carried_pad_idx, suppressed_open_idx); anomaly
    ``idx`` values are offsets into the passed arrays (pad included).
    W3 parse-mode timestamps are not supported here: LastTS state crosses
    chunk boundaries unbounded (32-line scans), so the caller must split
    only conversations with native timestamps.
    """
    texts_arr, positions, is_ignored, is_target, scores, emit = (
        _coerce_walk_inputs(texts, positions, is_ignored, is_target, scores, emit_ok)
    )

    state = _ChunkState()
    carried_pad_idx = None
    n_pad_anoms = 0
    if n_pad:
        pad_buf = np.flatnonzero(~is_ignored[:n_pad])
        if len(pad_buf):
            tpos = np.flatnonzero(is_target[pad_buf])
            tloc = pad_buf[tpos]
            _process_chunk(
                state,
                pad_buf,
                [texts_arr[i] for i in pad_buf],
                tpos,
                scores[tloc],
                emit[tloc],
                positions[pad_buf],
                threshold=np.float32(threshold),
            )
        n_pad_anoms = len(state.anomalies)
        if state.current is not None:
            carried_pad_idx = int(state.current["idx"])

    body_buf = n_pad + np.flatnonzero(~is_ignored[n_pad:])
    _run_chunks(
        state, texts_arr, positions, scores, emit,
        body_buf, is_target[body_buf], threshold,
    )

    suppressed_open_idx = None
    if is_last:
        state.close_current()
    elif state.current is not None:
        suppressed_open_idx = int(state.current["idx"])
        state.current = None
    return state.anomalies[n_pad_anoms:], carried_pad_idx, suppressed_open_idx


def _run_chunks(state, texts_arr, positions, scores, emit, buf_all, tgt_mask_buf, threshold):
    """Feed every flushed chunk of the buffered-line sequence through
    _process_chunk, carrying state across chunks."""
    start = 0
    for end in chunk_flush_points(tgt_mask_buf):
        sel = buf_all[start:end]
        buf_texts = [texts_arr[i] for i in sel]
        tpos = np.flatnonzero(tgt_mask_buf[start:end])
        tloc = sel[tpos]
        _process_chunk(
            state,
            sel,
            buf_texts,
            tpos,
            scores[tloc],
            emit[tloc],
            positions[sel],
            threshold=np.float32(threshold),
        )
        start = end
