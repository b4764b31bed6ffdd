"""Broadcast-kernel vs distributed-join scoring bench.

Corpus: every line is a handful of per-line-unique hex words (uniform
vocabulary, no shared template tokens) — the "model too big to collect"
scenario the distributed path exists for, with bounded bucket sizes. Runs
the full pipeline twice: once with the normal driver-collect + broadcast
numpy kernel, once forced onto the distributed join
(LOGJUICER_MAX_MODEL_NNZ=0). Anomaly-set equality is asserted; the
wall-time ratio is the price of not fitting the model in one process's RAM.

Known worst case (measured, documented in BENCH.md): with hot shared
tokens AND zero dedup leverage (generate_turns(unique_tokens=True)), the
join's intermediate pair volume is the full Σ bucket-collision count —
the broadcast kernel bounds that with pair-budgeted flushes, the join
exhausts the shared local-mode heap even with hot-bucket salting (which
is implemented and equality-tested; it spreads the pair stream across
salted tasks — the right mechanic on per-executor cluster heaps). The
fallback targets oversized models; overlap-pathological corpora remain
kernel territory.

Usage: python scripts/score_path_bench.py [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from logjuicer_spark import pipeline
    from logjuicer_spark.session import get_spark

    spark = get_spark(
        "score-path-bench", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    pq = f"/tmp/logjuicer_scorebench_{n_turns}.parquet"
    if not os.path.exists(pq):
        df = spark.range(n_turns)
        conv = F.expr("id div 200")
        is_baseline = conv % 2 == 0
        # pair id: each target line reuses the words of exactly one baseline
        # line (distance 0 for normal lines) while every line's vocabulary
        # is otherwise unique -> the model is maximal for the corpus size
        # and bucket sizes stay uniform (no hot shared tokens)
        words = F.concat_ws(
            " ",
            *[
                F.expr(
                    f"translate(hex(xxhash64({k} * "
                    "(id - CASE WHEN CAST(id div 200 AS INT) % 2 = 1 THEN 200 ELSE 0 END)"
                    ")), '0123456789', 'ghijklmnop')"
                )
                for k in (31, 37, 41, 43, 47, 53)
            ],
        )
        anomaly = (F.expr("id % 211") == 3) & ~is_baseline
        base = df.select(
            F.concat(F.lit("conv-"), conv.cast("string")).alias("conv_id"),
            (F.expr("id % 200") + 1).cast("int").alias("turn_idx"),
            F.lit("tool").alias("role"),
            F.when(
                anomaly,
                F.concat(
                    F.lit("omgpanic unseen"),
                    F.expr(
                        "translate(hex(xxhash64(id * 977)), '0123456789', 'ghijklmnop')"
                    ),
                ),
            ).otherwise(words).alias("text"),
            # one tool per conversation pair so baseline/target share an index
            F.concat(F.lit("node-"), (F.expr("(id div 400) % 8")).cast("string")).alias("tool"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            is_baseline.alias("is_baseline"),
        )
        base.repartition(32).write.mode("overwrite").parquet(pq)
    turns = spark.read.parquet(pq)
    baseline = turns.filter(F.col("is_baseline")).drop("is_baseline")
    target = turns.filter(~F.col("is_baseline")).drop("is_baseline")

    def run(label):
        t0 = time.perf_counter()
        out = pipeline.run(spark, target, baseline_turns=baseline)
        anoms = sorted(
            (r.conv_id, r.turn_idx) for r in out["anomalies"].collect()
        )
        return {"mode": label, "wall_sec": round(time.perf_counter() - t0, 2),
                "anomalies": len(anoms)}, anoms

    r_bc, a_bc = run("broadcast-kernel")
    os.environ["LOGJUICER_MAX_MODEL_NNZ"] = "0"
    try:
        r_dj, a_dj = run("distributed-join")
    finally:
        del os.environ["LOGJUICER_MAX_MODEL_NNZ"]
    assert a_bc == a_dj, f"anomaly sets differ: {len(a_bc)} vs {len(a_dj)}"
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "unique_tokens": True,
                "broadcast": r_bc,
                "distributed": r_dj,
                "anomaly_sets_equal": True,
                "slowdown": round(r_dj["wall_sec"] / r_bc["wall_sec"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
