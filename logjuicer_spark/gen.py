"""Deterministic synthetic transcript corpus (seed-42 style, mirroring the
reference's logjuicer-generate: /root/reference/crates/generate/src/generate.rs
uses a seeded RNG for reproducible benchmark/test inputs).

Produces rows in the input_hint shape
(conv_id, turn_idx, role, text, tool, ts) with:
- a baseline subset (nominal convs) and a target subset with injected
  anomalies at known positions -> the expected anomaly set is exact
- high-entropy noise (timestamps, uuids, hex, ips, tmp paths, key=value ids)
  that the tokenizer must mask identically across baseline and target
- duplicate turns (same masked form, different raw noise) for dedup
- one long conv (skew) and one conv with anomalies < 12 turns apart
  (extended-context rule)
"""

from __future__ import annotations

import datetime as _dt
import random

ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "read", "http", "search"]

_TEMPLATES = [
    "2024-03-{d:02d} 10:{m:02d}:{s:02d},123 INFO worker request id=req-{hex8} from 10.0.{a}.{b} completed without incident",
    "starting container runtime unit pod-{hex8} image registry.example.com/app:{n} pulled successfully today",
    "GET request https://api.example.com/v1/items/{hex8} returned status code ok after {n}ms latency",
    "writing scratch file /tmp/build-{hex8}/output.log with {n} bytes payload done",
    "session token=tok{hex8} refreshed for account {name} expires in {n} minutes window",
    "scheduler assigned task {name} onto node compute-{n} with affinity score {n2} points",
    "database checkpoint {hex8} flushed {n} pages in {n2} milliseconds during maintenance",
    "cache lookup for bucket {name} returned {n} entries with hit ratio stable behaviour",
    "heartbeat received from peer 192.168.{a}.{b} sequence {n} round trip nominal values",
    "configuration reload finished successfully revision {hex8} applied across {n} workers smoothly",
]

_NAMES = ["amber", "copper", "violet", "indigo", "maroon", "silver"]


def _alpha_tag(n: int) -> str:
    """Letters-only tag (digits would be masked to N by the tokenizer,
    collapsing distinct tags into one token-set)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for _ in range(4):
        out.append(letters[n % 26])
        n //= 26
    return "".join(out)

ANOMALY_TEXTS = [
    "Traceback oops unexpected marker {tag} raised inside handler routine",
    "FATAL disk corruption detected on volume {tag} sector unreadable halting",
    "assertion mismatch observed {tag} invariant violated in consensus module",
    "connection refused repeatedly {tag} upstream gateway unreachable giving up",
    "panic runtime stack overflow {tag} goroutine deadlock suspected abort",
]


def _noise_line(rng: random.Random, template_idx: int | None = None) -> str:
    t = _TEMPLATES[template_idx if template_idx is not None else rng.randrange(len(_TEMPLATES))]
    return t.format(
        d=rng.randint(1, 28),
        m=rng.randint(0, 59),
        s=rng.randint(0, 59),
        a=rng.randint(0, 255),
        b=rng.randint(0, 255),
        n=rng.randint(2, 9999),
        n2=rng.randint(2, 9999),
        hex8=f"{rng.getrandbits(32):08x}",
        name=rng.choice(_NAMES),
    )


def generate_corpus(
    n_baseline_convs: int = 4,
    n_target_convs: int = 6,
    turns_per_conv: int = 40,
    seed: int = 42,
    long_conv_turns: int = 0,
    anomalies_per_conv: int = 2,
):
    """Returns (baseline_rows, target_rows, expected) where rows are dicts in
    the TURNS shape and expected is a list of (conv_id, turn_idx, text) for
    every injected anomaly (each with a unique token-set -> the emitted
    anomaly set equals this list under default config)."""
    rng = random.Random(seed)
    t0 = _dt.datetime(2024, 3, 1, tzinfo=_dt.timezone.utc)

    def mk_conv(conv_id, n_turns, inject_at=()):
        rows = []
        expected = []
        inject_at = dict(inject_at)
        for i in range(1, n_turns + 1):
            tool = TOOLS[(i - 1) % len(TOOLS)]
            role = ROLES[(i - 1) % len(ROLES)]
            ts = t0 + _dt.timedelta(seconds=i * 7)
            if i in inject_at:
                text = inject_at[i]
                expected.append((conv_id, i, text))
            else:
                # template choice tied to tool so each group's baseline
                # vocabulary is stable
                tpl = (i * 3 + TOOLS.index(tool)) % len(_TEMPLATES)
                text = _noise_line(rng, tpl)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": i,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )
        return rows, expected

    baseline_rows = []
    for c in range(n_baseline_convs):
        rows, _ = mk_conv(f"base-{c:03d}", turns_per_conv)
        baseline_rows.extend(rows)

    target_rows = []
    expected = []
    tag_counter = 0
    for c in range(n_target_convs):
        n_turns = turns_per_conv
        inject = {}
        if c == 1:
            # two anomalies < 12 turns apart (extended-context rule)
            positions = [10, 15]
        elif c == 2:
            positions = []  # clean conv
        else:
            positions = sorted(
                rng.sample(range(5, n_turns - 3), k=min(anomalies_per_conv, n_turns // 10))
            )
        for p in positions:
            a = ANOMALY_TEXTS[tag_counter % len(ANOMALY_TEXTS)]
            inject[p] = a.format(tag="omega" + _alpha_tag(tag_counter))
            tag_counter += 1
        rows, exp = mk_conv(f"tgt-{c:03d}", n_turns, inject)
        target_rows.extend(rows)
        expected.extend(exp)

    if long_conv_turns:
        rows, exp = mk_conv(
            "tgt-long",
            long_conv_turns,
            {long_conv_turns // 2: ANOMALY_TEXTS[0].format(tag="omegalong")},
        )
        target_rows.extend(rows)
        expected.extend(exp)
    return baseline_rows, target_rows, expected


def to_spark_df(spark, rows):
    from .schemas import TURNS

    return spark.createDataFrame(rows, schema=TURNS)
