"""spark-submit entry point mirroring the reference CLI surface
(/root/reference/crates/cli/src/main.rs:51-144):

  diff     BASELINE TARGET       train on baseline table, report target
  run      TARGET --model M      report with a persisted model
  train    BASELINE --model M    train + persist
  errors   TARGET                model-free error extraction
  similarity R1 R2 ...           cross-run anomaly co-occurrence
  check-model M [--max-age D]    validate a persisted model

Inputs are parquet paths / catalog identifiers (default), or with
--input-format logs|tar raw log-file globs and tarball globs (sources.py;
the F1 default exclude fileset applies to file inputs exactly like the
reference's path filtering). Outputs land under --out as parquet sinks:
routed/ anomalies/ normal/ agg_conv/ agg_tool/ score_hist/ plus a lineage
table.

Example:
  spark-submit --py-files logjuicer_spark.zip cli.py diff \\
      lake.db.baseline_turns lake.db.target_turns --out /sinks/run1
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cfg(args) -> "PipelineConfig":
    """Resolve the effective PipelineConfig: --config file (per-job matcher
    selection via --job-name, config.rs:108-133 / env.rs:107-121) first,
    then explicit CLI flags layered on top."""
    from .pipeline import PipelineConfig

    base = PipelineConfig()
    if getattr(args, "config", None):
        from .targetconfig import Config

        tc = Config.from_path(args.config).get_target_config(
            getattr(args, "job_name", None)
        )
        base = tc.to_pipeline_config()
    extra = tuple(args.ignore_pattern or ())
    return PipelineConfig(
        ignore_patterns=tuple(base.ignore_patterns) + extra,
        skip_duplicate=base.skip_duplicate and not args.keep_duplicate,
    )


def _fileset(args):
    """The resolved target config's FileSetConfig for file-world inputs
    (is_source_valid applies the matcher's includes/excludes to sources,
    config.rs — a round-4 review found the CLI dropping them and always
    using the defaults for --input-format logs/tar)."""
    if getattr(args, "config", None):
        from .targetconfig import Config

        return Config.from_path(args.config).get_target_config(
            getattr(args, "job_name", None)
        ).fileset
    from .config import FileSetConfig

    return FileSetConfig()


def human_duration(seconds: float) -> str:
    """X7 (cli/main.rs:842-854): 320ms / 2.30s / 1m30s / 42h00m."""
    secs = int(seconds)
    if secs < 1:
        return f"{int(seconds * 1000)}ms"
    if secs < 60:
        return f"{seconds:.2f}s"
    if secs < 3600:
        return f"{secs // 60}m{secs % 60:02d}s"
    return f"{secs // 3600}h{(secs % 3600) // 60:02d}m"


def _write_outputs(out, out_dir, t0=None):
    from .storage import write_table

    for name in ("anomalies", "normal", "unknown", "agg_conv", "agg_tool",
                 "score_hist", "totals", "log_reports"):
        write_table(out[name], f"{out_dir}/{name}")
    _write_report_json(out, out_dir, t0)
    if "/" in out_dir:  # path (not catalog identifier): browsable artifact
        from .htmlreport import write_html

        write_html(out, f"{out_dir}/report.html")


def _write_report_json(out, out_dir, t0=None):
    """Consolidated JSON report (S11; the reference's Report struct,
    report.rs:104-115 / main.rs:146-185)."""
    import datetime as _dt
    import os

    if "/" not in out_dir:
        return  # catalog identifier: sinks only
    from . import MODEL_VERSION

    totals = out["totals"].collect()[0]
    report = {
        "created_at": _dt.datetime.now(tz=_dt.timezone.utc).isoformat(),
        "run_time_s": round(time.time() - t0, 2) if t0 else None,
        "model_version": MODEL_VERSION,
        "total_line_count": totals.total_line_count,
        "total_anomaly_count": totals.total_anomaly_count,
        "log_reports": [r.asDict() for r in out["log_reports"].collect()],
        "index_reports": [
            r.asDict() for r in out["agg_tool"].orderBy("tool").collect()
        ],
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/report.json", "w") as f:
        json.dump(report, f, indent=1, default=str)


def main(argv=None):
    p = argparse.ArgumentParser(prog="logjuicer-spark")
    p.add_argument("--master", default=None)
    p.add_argument("--out", default="./logjuicer-out")
    p.add_argument("--ignore-pattern", action="append")
    p.add_argument("--keep-duplicate", action="store_true",
                   help="disable token-set dedup (LOGJUICER_KEEP_DUPLICATE)")
    p.add_argument("--config", default=None,
                   help="YAML/JSON target config file (static mapping or "
                        "match_job matcher list, config.rs:31-37)")
    p.add_argument("--input-format", choices=("table", "logs", "tar"),
                   default="table",
                   help="how to read BASELINE/TARGET: parquet/catalog "
                        "table (default), raw log-file glob, or tarball "
                        "glob (source.rs:50-161)")
    p.add_argument("--job-name", default=None,
                   help="job name used to select a matcher from --config")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diff")
    d.add_argument("baseline")
    d.add_argument("target")

    r = sub.add_parser("run")
    r.add_argument("target")
    r.add_argument("--model", required=True)
    r.add_argument("--max-age-days", type=float, default=None)

    t = sub.add_parser("train")
    t.add_argument("baseline")
    t.add_argument("--model", required=True)

    e = sub.add_parser("errors")
    e.add_argument("target")
    e.add_argument("--model", default=None)

    s = sub.add_parser("similarity")
    s.add_argument("anomaly_tables", nargs="+")

    c = sub.add_parser("check-model")
    c.add_argument("model")
    c.add_argument("--max-age-days", type=float, default=None)

    ds = sub.add_parser("test", help="dataset harness (dataset.rs layout)")
    ds.add_argument("dataset_dirs", nargs="+")

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from . import model as M, pipeline
    from .session import get_spark
    from .storage import read_table, write_table

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("logjuicer-spark-cli", master=args.master)
    t0 = time.time()
    cfg = _cfg(args)
    status = {"cmd": args.cmd}

    def read_input(ident):
        fmt = getattr(args, "input_format", "table")
        if fmt == "table":
            return read_table(spark, ident)
        from . import sources

        # file-world inputs get the resolved config's fileset (per-job
        # includes/excludes layered on the F1 defaults, like the reference)
        fileset = _fileset(args)
        if fmt == "logs":
            return sources.turns_from_files(spark, ident, fileset=fileset)
        return sources.turns_from_tarballs(spark, ident, fileset=fileset)

    if args.cmd == "diff":
        out = pipeline.run(
            spark,
            read_input(args.target),
            baseline_turns=read_input(args.baseline),
            cfg=cfg,
        )
        _write_outputs(out, args.out, t0)
        totals = out["totals"].collect()[0]
        byte_count = out["agg_conv"].agg({"byte_count": "sum"}).collect()[0][0] or 0
        status.update(
            lines=totals.total_line_count,
            anomalies=totals.total_anomaly_count,
            mb=round(byte_count / 2**20, 2),
        )
    elif args.cmd == "run":
        model_df = M.load(spark, args.model, max_age_days=args.max_age_days)
        out = pipeline.run(
            spark, read_input(args.target), model_df=model_df, cfg=cfg
        )
        _write_outputs(out, args.out, t0)
        totals = out["totals"].collect()[0]
        status.update(
            lines=totals.total_line_count, anomalies=totals.total_anomaly_count
        )
    elif args.cmd == "train":
        model_df = pipeline.train_model(spark, read_input(args.baseline), cfg)
        M.save(model_df, args.model)
        # count from the just-written sink (a pruned scan), not model_df —
        # whose lineage would re-run the tokenize UDF and the whole model
        # build a second time just for this counter
        status.update(
            groups=M.load(spark, args.model).select("group_key").distinct().count()
        )
        # the trainer persisted its winners relation (registered with the
        # shared stage-cache list); the model sink is written, release it
        # so long-lived callers embedding the CLI don't accumulate cache
        from .pipeline import release_stage_caches

        release_stage_caches()
    elif args.cmd == "errors":
        from .errors import errors_run

        bc = None
        if args.model:
            bc = M.broadcast_indexes(
                spark, M.collect_indexes(M.load(spark, args.model))
            )
        t = read_input(args.target)
        # always arm the monster-conversation split probe at the CLI: the
        # probe aggregates the LIGHT parse (no tokenize UDF — a JVM-only
        # scan), so it is cheap even on small inputs, and a turn count
        # would under-estimate the parsed row count whenever sub-lines
        # explode (the guard is measured in parsed sub-line rows)
        out = errors_run(
            spark, t, cfg, model_indexes_bc=bc, allow_split=True,
        )
        write_table(out, f"{args.out}/errors")
        status.update(anomalies=read_table(spark, f"{args.out}/errors").count())
        # the split path persists small intermediates (ranges, candidate
        # scan, ranged output) registered with the shared stage-cache
        # list; release them now that the sink is written
        from .pipeline import release_stage_caches

        release_stage_caches()
    elif args.cmd == "similarity":
        from functools import reduce

        from pyspark.sql import DataFrame, functions as F

        from .similarity import similarity_report
        from .tokenizer import tokenize_udf

        labeled = reduce(
            DataFrame.unionByName,
            [
                read_table(spark, t)
                .withColumn("target_id", F.lit(i))
                .withColumn("tokens", tokenize_udf()(F.col("text")))
                for i, t in enumerate(args.anomaly_tables)
            ],
        )
        rep = similarity_report(labeled)
        write_table(rep, f"{args.out}/similarity")
        status.update(groups=read_table(spark, f"{args.out}/similarity").count())
    elif args.cmd == "check-model":
        M.load(spark, args.model, max_age_days=args.max_age_days)
        status.update(ok=True)
    elif args.cmd == "test":
        from .dataset import check_dataset

        results = {}
        failed = 0
        for d in args.dataset_dirs:
            try:
                results[d] = check_dataset(spark, d)
            except AssertionError as e:
                results[d] = f"FAIL: {e}"
                failed += 1
        status.update(results=results, failed=failed)

    # the reference's live throughput metric (main.rs:593-603): MB/s +
    # the human-readable duration it prints alongside
    status["seconds"] = round(time.time() - t0, 2)
    status["duration"] = human_duration(status["seconds"])
    if "mb" in status and status["seconds"]:
        status["mb_per_sec"] = round(status["mb"] / status["seconds"], 2)
    print(json.dumps(status))
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    main()
