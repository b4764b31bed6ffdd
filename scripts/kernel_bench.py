"""Broadcast-kernel throughput bench (pure numpy, no Spark).

Two corpus shapes, the kernel's best and worst regimes:
- zero-dedup: per-line-unique vocabulary -> ~0% bucket-cache hits, the
  cold-vocabulary path (vectorized fxhash32, round 4) dominates;
- template: 40 shared words per corpus -> overlap-heavy pair streams,
  the accumulator loop dominates.

Prints one JSON line with build+score wall times (best of 3) and line
throughputs. Round-4 A/B vs the round-3 kernel (same host, same session,
measured before/after): zero-dedup 2.89x, template 1.21x, scores
bit-identical on both (tests/test_hashing.py pins the hash parity).

Usage: python scripts/kernel_bench.py [n_base] [n_target]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logjuicer_spark import hashing as H


def bench(base, tgt):
    times = []
    for _ in range(3):
        H._BUCKET_CACHE.clear()
        H.word_bucket.cache_clear()
        t0 = time.perf_counter()
        idx = H.SparseIndex.from_token_lines(base)
        idx.score(tgt)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_tgt = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    def uniq(i):
        return " ".join(f"w{i}_{j}x{j * 7 % 13}" for j in range(10))

    zb = [uniq(i) for i in range(n_base)]
    zt = [uniq(i + 10 * n_base) for i in range(n_tgt)]
    t_zero = bench(zb, zt)

    rng = np.random.default_rng(7)
    shared = [f"tmpl{i}" for i in range(40)]

    def tmpl(i):
        return " ".join(
            list(rng.choice(shared, 8, replace=False)) + [f"u{i}_{j}" for j in range(2)]
        )

    tb = [tmpl(i) for i in range(min(n_base, 30_000))]
    tt = [tmpl(10 * n_base + i) for i in range(min(n_tgt, 8_000))]
    t_tmpl = bench(tb, tt)

    print(
        json.dumps(
            {
                "zero_dedup_sec": round(t_zero, 3),
                "zero_dedup_lines_per_sec": round((len(zb) + len(zt)) / t_zero),
                "template_sec": round(t_tmpl, 3),
                "template_lines_per_sec": round((len(tb) + len(tt)) / t_tmpl),
                "n_base": n_base,
                "n_target": n_tgt,
            }
        )
    )


if __name__ == "__main__":
    main()
