"""Baseline model: train / persist / load / merge / broadcast.

Reference semantics (/root/reference/crates/model/src/model.rs):
- train: group baseline sources by IndexName (here: the ``tool`` column),
  tokenize, dedup by unordered token-set (KnownLines, first occurrence
  wins), build one L2-normalized hashed-feature matrix per group
  (model.rs:475-540, process.rs:29-121, index.rs:130-148)
- persist with a model version cookie, refuse mismatched versions on load
  (MODEL_VERSION, model.rs:50-53,793-852) -> parquet rows + version column
- merge (mappend/mconcat, model.rs:118-217): union of rows with
  duplicate-row elimination; we merge at token-set level before
  vectorizing, which yields the same matrix rows (vstack.rs:10-47)
- lookup: a model with exactly ONE index matches any group key
  (lookup_or_single, model.rs:857-869)

Spark realization: the dedup is a partial-aggregatable groupBy (min-struct
per (group, dkey) -- map-side combine keeps hot token-sets from skewing a
window sort), matrix building is applyInPandas per group, and the trained
model is broadcast to executors for the scoring stage.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import MODEL_VERSION
from .hashing import SparseIndex
from .schemas import MODEL


def _winners_full_agg(parsed_baseline: DataFrame, group_col: str) -> DataFrame:
    """The trainer's single aggregation pass: KnownLines dedup (first
    occurrence of each unordered token-set within the group, under stable
    (conv_id, turn_idx, sub_idx) order — the sortable _skey keeps it a
    partial-aggregatable min) AND the per-group line/byte counters
    (trainer counts every non-ignored read line, pre-dedup:
    process.rs:68-69): count/bytes partial-aggregate at (group, dkey)
    grain and re-sum to group grain from the TINY winners relation.
    Round 5: the previous two-pass shape (counters pass + winners pass
    over a persisted parse) made the parse output a two-consumer plan —
    the persist build plus a second full scan were ~half the measured
    train_bc wall at 16M turns (BENCH.md stage attribution)."""
    from .pipeline import _skey

    rows = parsed_baseline.filter(~F.col("is_ignored"))
    if "tokens" in parsed_baseline.columns:
        return (
            rows.withColumn("_skey", _skey())
            .groupBy(F.col(group_col).alias("group_key"), "dkey")
            .agg(
                F.min("_skey").alias("skey"),
                F.min_by("tokens", "_skey").alias("tokens"),
                F.count(F.lit(1)).alias("_cnt"),
                F.sum(F.octet_length("text")).alias("_bytes"),
            )
        )
    # fused-dkey parse mode (pipeline.parse columns="dkey"): the
    # winner's TEXT rides out as ``wtext`` and the row-build UDF
    # tokenizes it in-batch (score._token_lines) — exact, since
    # tokenizer.process is a pure per-line function, and no extra
    # Python stage or Arrow hop exists for winner tokens
    return rows.withColumn("_skey", _skey()).groupBy(
        F.col(group_col).alias("group_key"), "dkey"
    ).agg(
        F.min("_skey").alias("skey"),
        F.min_by("text", "_skey").alias("wtext"),
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.octet_length("text")).alias("_bytes"),
    )


def train(parsed_baseline: DataFrame, group_col: str = "tool") -> DataFrame:
    """Build the model table from a parsed baseline DataFrame.

    Input columns (from pipeline.parse): conv_id, turn_idx, sub_idx, text,
    tokens, dkey, is_ignored, <group_col>.
    Returns a DataFrame with the MODEL schema.

    Cache ownership: the tiny winners relation is persisted and
    registered with pipeline._SCORED_REFS; pipeline.run releases it after
    its sinks are written — callers driving train() directly in long
    sessions should call pipeline.release_stage_caches() when done with
    the model DataFrame.
    """
    # winners feeds two branches (counters re-sum + matrix build); persist
    # the TINY relation instead of the full parse output so the tokenize
    # UDF and the wide aggregation run exactly once (released with the
    # pipeline stage caches after the run's sinks are written)
    winners_full = _winners_full_agg(parsed_baseline, group_col).persist()
    from . import pipeline as _P

    _P._SCORED_REFS.append(winners_full)
    return _train_distributed_tail(winners_full)


def _train_distributed_tail(winners_full: DataFrame) -> DataFrame:
    """The distributed matrix build over an (already persisted) winners
    relation: counters re-sum, per-group row ranks, vectorize mapInPandas,
    counters join."""
    counters = winners_full.groupBy("group_key").agg(
        F.sum("_cnt").alias("line_count"),
        F.sum("_bytes").alias("byte_count"),
    )
    line_col = "tokens" if "tokens" in winners_full.columns else "wtext"
    winners = winners_full.select("group_key", "skey", line_col)

    build_schema = (
        "group_key string, row_id int, indices array<int>, values array<float>"
    )

    # Row ids are the per-group rank under the skey order (what the old
    # per-group builder produced implicitly); the vectorization itself is
    # ROW-LOCAL (duplicate-bucket drop and L2 normalization happen within a
    # line), so it runs as mapInPandas over ANY partitioning. The previous
    # formulation (applyInPandas per group) was one task per group — with a
    # handful of groups that stage ran at parallelism 4 no matter how many
    # cores, a measured ~25s serial chunk on an 8M-line baseline that
    # capped N->4N scaling (Amdahl). Only the lightweight row_number sort
    # remains per-group; the python work is spread over all cores.
    from pyspark.sql import Window

    w_order = Window.partitionBy("group_key").orderBy("skey")
    ranked = winners.withColumn(
        "row_id", (F.row_number().over(w_order) - 1).cast("int")
    ).select("group_key", "row_id", line_col)

    def _vec_rows(batches):
        import numpy as np

        from .hashing import _vectorize_batch
        from .score import _token_lines

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows, cols, vals = _vectorize_batch(_token_lines(pdf))
            bounds = np.searchsorted(rows, np.arange(len(pdf) + 1))
            yield pd.DataFrame(
                {
                    "group_key": pdf["group_key"],
                    "row_id": pdf["row_id"],
                    "indices": [
                        cols[bounds[i]:bounds[i + 1]].astype(np.int32).tolist()
                        for i in range(len(pdf))
                    ],
                    "values": [
                        vals[bounds[i]:bounds[i + 1]].tolist()
                        for i in range(len(pdf))
                    ],
                }
            )

    built = ranked.mapInPandas(_vec_rows, schema=build_schema)
    created = _dt.datetime.now(tz=_dt.timezone.utc)
    return (
        built.join(counters, "group_key", "left")
        .withColumn("model_version", F.lit(MODEL_VERSION))
        .withColumn("created_at", F.lit(created))
        .select([f.name for f in MODEL.fields])
    )


def train_collected(
    spark: SparkSession, parsed_baseline: DataFrame, group_col: str = "tool"
) -> tuple[dict[str, SparseIndex], DataFrame]:
    """Small-input trainer: ONE collect job, the model built driver-side.

    Semantically identical to ``train`` + ``collect_indexes`` (same
    first-occurrence winners dedup under the _skey order, the same
    SparseIndex.from_token_lines build over the same skey-sorted input, the
    same per-group counters) — equality is pinned by
    tests/test_round3_fixes.py::test_train_collected_equals_distributed.
    The difference is WHERE the aggregation runs: for inputs under
    pipeline.run's small-input threshold the whole parsed baseline is a few
    MB, so collecting it once and aggregating in pandas skips three shuffle
    stages and two python-UDF stages of the distributed trainer (about half
    the train chain's wall clock at that size). Returns
    ``(indexes, model_df)`` where model_df is createDataFrame-backed (no
    executor lineage, so nothing to unpersist)."""
    from .pipeline import _skey

    has_tokens = "tokens" in parsed_baseline.columns
    rows = parsed_baseline.filter(~F.col("is_ignored")).select(
        F.col(group_col).alias("group_key"),
        _skey().alias("skey"),
        "dkey",
        # fused-dkey parse mode ships the raw text instead and tokenizes
        # only the winners driver-side (strictly less work: the tokenize
        # UDF no longer runs over every baseline row before the collect)
        F.col("tokens") if has_tokens else F.col("text").alias("tokens"),
        F.octet_length("text").alias("nbytes"),
    )
    pdf = rows.toPandas()
    created = _dt.datetime.now(tz=_dt.timezone.utc)
    indexes: dict[str, SparseIndex] = {}
    out_rows = []
    for group, g in pdf.groupby("group_key", sort=False):
        line_count = int(len(g))
        byte_count = int(g["nbytes"].sum())
        winners = g.sort_values("skey", kind="stable").drop_duplicates(
            subset=["dkey"], keep="first"
        )
        token_lines = winners["tokens"].tolist()
        if not has_tokens:
            from .tokenizer import process

            token_lines = [process(t) for t in token_lines]
        idx = SparseIndex.from_token_lines(token_lines)
        indexes[group] = idx
        for row_id, inds, vals in idx.to_rows():
            out_rows.append(
                (group, int(row_id), inds, vals, MODEL_VERSION, created,
                 line_count, byte_count)
            )
    model_df = spark.createDataFrame(out_rows, MODEL)
    return indexes, model_df


# winner-row budget for the big path's collected trainer: above this the
# distributed matrix-build tail is the right shape (driver tokenize of the
# winners would serialize), below it one collect + numpy replaces five
# shuffle/UDF mini-jobs. Row-count parameterised, env-overridable.
MAX_COLLECT_WINNERS = 100_000


def train_winners_collected(
    spark: SparkSession,
    parsed_baseline: DataFrame,
    group_col: str = "tool",
    max_rows: int | None = None,
) -> tuple[dict[str, SparseIndex] | None, DataFrame]:
    """Middle trainer (round 6): distributed winners dedup, driver matrix
    build.

    The heavy half of training — the per-(group, token-set) first-occurrence
    winners aggregation with its map-side combine over the whole parsed
    baseline — runs distributed exactly as in :func:`train`. The TINY
    winners relation is then collected once and the matrix build (ordering,
    vectorization, counters) happens driver-side, which collapses the
    distributed tail (ranked window, vectorize mapInPandas, counters join,
    model persist, nnz aggregation, toPandas — five scheduling round-trips
    over a handful of rows) into one collect job plus numpy. Semantically
    identical to ``train`` + ``collect_indexes``: same winners under the
    same _skey order, the same SparseIndex.from_token_lines build, the same
    per-group counters (equality pinned by tests/test_round6_opt.py).

    Returns ``(indexes, model_df)`` with model_df createDataFrame-backed.
    When the winner count exceeds ``max_rows`` (default
    LOGJUICER_MAX_COLLECT_WINNERS or 100k) this is the wrong shape; the
    distributed tail then runs over the SAME persisted winners relation
    (no re-aggregation, no second parse pass), signalled by
    ``(None, model_df)``.
    """
    import os

    if max_rows is None:
        max_rows = int(
            os.environ.get("LOGJUICER_MAX_COLLECT_WINNERS", MAX_COLLECT_WINNERS)
        )
    has_tokens = "tokens" in parsed_baseline.columns
    # the same persist train() itself performs (the winners relation feeds
    # either the collect or the distributed tail's two branches); released
    # with the pipeline stage caches
    winners_full = _winners_full_agg(parsed_baseline, group_col).persist()
    from . import pipeline as _P

    _P._SCORED_REFS.append(winners_full)
    n = winners_full.count()
    if n > max_rows:
        return None, _train_distributed_tail(winners_full)
    pdf = winners_full.toPandas()

    from .tokenizer import process

    line_col = "tokens" if has_tokens else "wtext"
    created = _dt.datetime.now(tz=_dt.timezone.utc)
    indexes: dict[str, SparseIndex] = {}
    out_rows = []
    for group, g in pdf.groupby("group_key", sort=False):
        g = g.sort_values("skey", kind="stable")
        token_lines = (
            g[line_col].tolist() if has_tokens
            else [process(t) for t in g[line_col]]
        )
        idx = SparseIndex.from_token_lines(token_lines)
        indexes[group] = idx
        line_count = int(g["_cnt"].sum())
        byte_count = int(g["_bytes"].sum())
        for row_id, inds, vals in idx.to_rows():
            out_rows.append(
                (group, int(row_id), inds, vals, MODEL_VERSION, created,
                 line_count, byte_count)
            )
    model_df = spark.createDataFrame(out_rows, MODEL)
    return indexes, model_df


def save(model_df: DataFrame, path: str) -> None:
    from .storage import write_table

    write_table(model_df, path, partition_by=["group_key"])


def load(spark: SparkSession, path: str, max_age_days: float | None = None) -> DataFrame:
    """Load + validate a persisted model (version cookie, optional max age:
    model.rs:793-852, report.rs:519-535)."""
    from .storage import read_table

    df = read_table(spark, path)
    if df.limit(1).count() == 0:
        # the reference refuses a model whose version cookie cannot be
        # read (model.rs:806-816); an empty table has no cookie at all
        raise ValueError(f"model at {path} is empty (no version cookie to validate)")
    # NULL-safe comparison: `!=` evaluates to NULL for NULL model_version
    # rows, which the filter would silently drop — letting a partially
    # written model pass validation (round-4 review finding)
    bad = (
        df.filter(~F.col("model_version").eqNullSafe(F.lit(MODEL_VERSION)))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(f"model at {path} has a different model_version (want {MODEL_VERSION})")
    if max_age_days is not None:
        cutoff = _dt.datetime.now(tz=_dt.timezone.utc) - _dt.timedelta(days=max_age_days)
        old = df.filter(F.col("created_at") < F.lit(cutoff)).limit(1).count()
        if old:
            raise ValueError(f"model at {path} is older than {max_age_days} days")
    return df


def merge(model_dfs: list[DataFrame]) -> DataFrame:
    """mconcat of persisted models (model.rs:158-217): per-group union of
    rows with duplicate elimination (first model wins), row ids recomputed.

    Duplicate rows are detected on the (indices, values) payload, the
    vectorized equivalent of nub_vstack's row signature (vstack.rs:10-47).
    """
    from functools import reduce

    unioned = reduce(
        DataFrame.unionByName,
        [
            df.withColumn("m_ord", F.lit(i)).select(
                "group_key", "row_id", "indices", "values", "m_ord",
                "line_count", "byte_count", "created_at",
            )
            for i, df in enumerate(model_dfs)
        ],
    )
    # merged metadata per reference mappend/mconcat (model.rs:118-155):
    # line/byte counters SUM across the merged per-group indexes, created_at
    # is the MAX (newest constituent). Counters are constant across one
    # model's rows of a group, so distinct (group, m_ord) first, then sum.
    meta = (
        unioned.select("group_key", "m_ord", "line_count", "byte_count", "created_at")
        .distinct()
        .groupBy("group_key")
        .agg(
            F.sum("line_count").alias("line_count"),
            F.sum("byte_count").alias("byte_count"),
            F.max("created_at").alias("created_at"),
        )
    )
    # nub_vstack parity (vstack.rs:38-41): rows of the FIRST model append
    # unconditionally — duplicates WITHIN model 0 are all kept — while a
    # later model's row survives iff its (indices, values) payload equals
    # no previously-accepted row (model 0's rows, or an earlier first
    # occurrence among the later models). A round-4 review found the old
    # global first-occurrence dedup also collapsing model-0-internal
    # duplicates, drifting merged row ids from the reference.
    keep0 = unioned.filter(F.col("m_ord") == 0).select(
        "group_key", "indices", "values",
        F.struct("m_ord", "row_id").alias("w"),
    )
    later_first = (
        unioned.filter(F.col("m_ord") > 0)
        .groupBy("group_key", "indices", "values")
        .agg(F.min(F.struct("m_ord", "row_id")).alias("w"))
    )
    kept_later = later_first.join(
        keep0.select("group_key", "indices", "values").distinct(),
        on=["group_key", "indices", "values"],
        how="left_anti",
    )
    w_first = keep0.unionByName(kept_later)
    from pyspark.sql import Window

    order = Window.partitionBy("group_key").orderBy("w.m_ord", "w.row_id")
    return (
        w_first.withColumn("row_id", (F.row_number().over(order) - 1).cast("int"))
        .join(F.broadcast(meta), "group_key")
        .withColumn("model_version", F.lit(MODEL_VERSION))
        .select([f.name for f in MODEL.fields])
    )


# driver-collect budget: ~8 bytes/nnz for (indices, values) plus python
# overhead; 200M nnz ~ a few GiB of driver RAM and a similar broadcast.
# Override via LOGJUICER_MAX_MODEL_NNZ or the max_nnz parameter.
MAX_MODEL_NNZ = 200_000_000


def collect_indexes(model_df: DataFrame, max_nnz: int | None = None) -> dict[str, SparseIndex]:
    """Collect the model to the driver as {group_key: SparseIndex}.

    The whole model round-trips through the driver and is then broadcast —
    the same memory model as the reference (one process's RAM), and right
    for models that fit. A size guard fails fast with a clear error instead
    of OOMing the driver mid-collect when a baseline is pathologically
    large; the documented escape for oversized models is scoring via a
    shuffle join of winners against the exploded model rows on
    (group_key, bucket) — per-group partial dot products recombined by
    (group, dkey) max — at the cost of shuffling the model once per run.
    """
    import os

    if max_nnz is None:
        max_nnz = int(os.environ.get("LOGJUICER_MAX_MODEL_NNZ", MAX_MODEL_NNZ))
    # persist so the guard aggregation and the collect evaluate the train
    # DAG (tokenize UDF + per-group build) exactly once
    cached = model_df.select("group_key", "row_id", "indices", "values").persist()
    try:
        nnz = cached.agg(
            F.coalesce(F.sum(F.size("indices")), F.lit(0)).alias("n")
        ).first()["n"]
        if nnz > max_nnz:
            raise ValueError(
                f"model has {nnz} nonzeros > budget {max_nnz}: too large to collect "
                "and broadcast from the driver. Prune/split the baseline, raise "
                "LOGJUICER_MAX_MODEL_NNZ if the driver has the RAM, or score via "
                "the distributed join path (see collect_indexes docstring)."
            )
        pdf = cached.toPandas()
    finally:
        cached.unpersist()
    out: dict[str, SparseIndex] = {}
    for group, g in pdf.groupby("group_key"):
        out[group] = SparseIndex.from_rows(
            list(zip(g["row_id"], g["indices"], g["values"]))
        )
    return out


def broadcast_indexes(spark: SparkSession, indexes: dict[str, SparseIndex]):
    return spark.sparkContext.broadcast(indexes)


def lookup(indexes: dict[str, SparseIndex], group_key):
    """Index lookup with the single-index fallback (model.rs:857-869)."""
    idx = indexes.get(group_key)
    if idx is None and len(indexes) == 1:
        return next(iter(indexes.values()))
    return idx
