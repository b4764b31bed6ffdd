"""Property-based differential test: the vectorized chunk/context engine
(context.find_anomalies) against a straight-line transcription of
ChunkProcessor, with tiny chunk sizes so every random sequence crosses
chunk boundaries (the reference's observable 512-target / 5120-line flush
semantics scaled down to 8 / 24)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import logjuicer_spark.context as ctx


def naive_chunk_processor(texts, positions, ignored, is_target, scores, emit,
                          chunk, guard):
    THRESH = np.float32(0.3)
    buffer: list[int] = []
    targets: list[int] = []
    left_overs: list[str] = []
    current = None
    anomalies = []

    def collect_before(bt, lcp):
        c = 12 if bt - lcp < 12 else 3
        start = max(lcp, max(0, bt - c))
        before = [texts[buffer[j]] for j in range(start, bt)]
        if start == 0 and len(before) < c:
            want = min(c - len(before), len(left_overs))
            if want:
                before = left_overs[-want:] + before
        return before

    def do_search():
        nonlocal buffer, targets, left_overs, current
        buffer_pos = 0
        lcp = 0
        for bt in targets:
            li = buffer[bt]
            is_anom = scores[li] > THRESH
            found = False
            while buffer_pos <= bt:
                j = buffer_pos
                buffer_pos += 1
                f = j == bt
                if f and is_anom:
                    found = True
                elif current is not None:
                    current["after"].append(texts[buffer[j]])
                    if len(current["after"]) >= 3:
                        anomalies.append(current)
                        current = None
                    lcp = buffer_pos
                if f:
                    break
            if found:
                if current is not None:
                    anomalies.append(current)
                    current = None
                if not emit[li]:
                    continue
                before = collect_before(bt, lcp)
                lcp = bt + 1
                current = {
                    "idx": li,
                    "pos": int(positions[li]),
                    "distance": float(scores[li]),
                    "line": texts[li],
                    "before": before,
                    "after": [],
                }
        if current is not None and lcp < len(buffer):
            for j in range(lcp, len(buffer)):
                current["after"].append(texts[buffer[j]])
                if len(current["after"]) >= 3:
                    anomalies.append(current)
                    current = None
                    break
        lo = max(lcp, 0 if len(buffer) < 12 else len(buffer) - 12)
        left_overs = [texts[buffer[j]] for j in range(lo, len(buffer))]
        buffer = []
        targets = []

    for i in range(len(texts)):
        if ignored[i]:
            continue
        buffer.append(i)
        if is_target[i]:
            targets.append(len(buffer) - 1)
            if len(targets) == chunk:
                do_search()
        elif len(buffer) > guard:
            do_search()
    if targets:
        do_search()
    if current is not None:
        anomalies.append(current)
    return anomalies


line_st = st.tuples(
    st.integers(0, 30),      # dedup-key id (controls is_target via first-seen)
    st.sampled_from([0.0, 0.25, 0.31, 0.9, 1.0]),  # score bucket
    st.booleans(),           # ignored (rare-ish via filter below)
    st.booleans(),           # emit flag when anomalous
)


@settings(max_examples=120, deadline=None)
@given(st.lists(line_st, min_size=0, max_size=220), st.integers(0, 3))
def test_differential(lines, salt):
    n = len(lines)
    texts = [f"line-{i}-k{k}" for i, (k, _, _, _) in enumerate(lines)]
    positions = np.arange(1, n + 1)
    ignored = np.array([ig and (i % 7 == salt) for i, (_, _, ig, _) in enumerate(lines)])
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

    chunk, guard = 8, 24
    old = (ctx.CHUNK_SIZE, ctx.FLUSH_GUARD)
    ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = chunk, guard
    try:
        got = ctx.find_anomalies(texts, positions, ignored, is_target, scores, emit)
    finally:
        ctx.CHUNK_SIZE, ctx.FLUSH_GUARD = old
    want = naive_chunk_processor(
        texts, positions, ignored, is_target, scores, emit, chunk, guard
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["idx"] == w["idx"]
        assert g["pos"] == w["pos"]
        assert g["line"] == w["line"]
        assert g["before"] == w["before"]
        assert g["after"] == w["after"]
