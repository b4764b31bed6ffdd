"""Capture `.explain("formatted")` plans of the round-6-touched query paths.

Runs against EITHER the round-start code or the optimized code (feature-
detects the round-6 APIs), so the same script produces the
plans/r06/<name>_{before,after}.txt evidence pair:

    # in a worktree at the round-start commit
    python <repo>/scripts/capture_plans_r06.py <out_dir> before
    # at HEAD
    python scripts/capture_plans_r06.py plans/r06 after

Capture set (the paths whose plans round 6 changed):
- turns_parse: the events->turns window view (project/window order).
- flagship_target_branch: the target slice of the view (is_baseline
  filter placement relative to the Window).
- flagship_parse: the fused-dkey parse of the target branch.
- flagship_winners: the winners aggregation as the flagship builds it.
- flagship_model: the trained model relation.
- flagship_route: the route stage's full plan (clean/dirty split shape).
- dedup_groups_pairs: the minhash pairs relation as q_dedup_groups
  builds its staged input (sig-UDF duplication vs staged scans).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    out_dir = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "after"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault("LJ_ORACLE_STAGE", f"/tmp/lj_plans_{os.getpid()}")

    from pyspark.sql import functions as F

    from logjuicer_spark import entry_queries as eq, model as M, pipeline as P
    from logjuicer_spark.session import get_spark
    from logjuicer_spark.extras.dedup import minhash_lsh_pairs, minhash_signatures

    spark = get_spark("plans-r06", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name, df):
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain(df))
        print("wrote", path)

    tv = eq.turns_view(spark, sf_dir)
    dump("turns_parse", eq.q_turns_parse(spark, sf_dir))
    target = tv.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
    baseline = tv.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    dump("flagship_target_branch", target)

    cfg = P.PipelineConfig()
    parsed_plan = P.parse(target, cfg, columns="dkey")
    dump("flagship_parse", parsed_plan)

    work = f"/tmp/plans_r06_parsed_{os.getpid()}"
    parsed_plan.write.mode("overwrite").parquet(work)
    parsed = spark.read.parquet(work)

    new_api = hasattr(P, "_winners_raw")
    if new_api:
        # round-6 shape: middle trainer + overlapped winners + collected
        # dirty ids + isin route fast path
        indexes, model_df = M.train_winners_collected(
            spark, P.parse(baseline, cfg, columns="dkey")
        )
        bc = (
            M.broadcast_indexes(spark, indexes)
            if indexes is not None
            else M.broadcast_indexes(spark, M.collect_indexes(model_df))
        )
        dump("flagship_model", model_df)
        winners = P._winners_raw(parsed, cfg).persist()
        n_winners = winners.count()
        dump("flagship_winners", winners)
        enriched, scored = P.enrich(
            parsed, bc, cfg, model_df=model_df, return_scored=True,
            winners=winners, n_winners=n_winners,
        )
        ids = P._dirty_ids_collected(scored, cfg, n_winners)
        routed_plan = P.route(
            enriched, cfg, allow_split=False, clean_split=True,
            dirty_conv_dim=ids, n_convs=lambda: 10_000, n_dirty=len(ids),
        )
    else:
        model_df = M.train(P.parse(baseline, cfg, columns="dkey"))
        bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
        dump("flagship_model", model_df)
        enriched, scored = P.enrich(
            parsed, bc, cfg, model_df=model_df, return_scored=True
        )
        dump("flagship_winners", scored)
        dim = P._dirty_conv_dim(scored, cfg)
        routed_plan = P.route(
            enriched, cfg, allow_split=False, clean_split=True,
            dirty_conv_dim=dim, n_convs=lambda: 10_000,
        )
    dump("flagship_route", routed_plan)

    # q_dedup_groups pairs input, replicating the query's construction
    import inspect

    src = inspect.getsource(eq.q_dedup_groups)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if "cc_sigs" in src:
        sigs = eq._stage(spark, minhash_signatures(docs), "cc_sigs")
    else:
        sigs = minhash_signatures(docs)
    dump("dedup_groups_pairs", minhash_lsh_pairs(sigs, threshold=0.5))

    P.release_stage_caches()
    spark.stop()


if __name__ == "__main__":
    main()
