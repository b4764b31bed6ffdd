"""Enrich-stage scoring: distance of each distinct (group, token-line) to the
broadcast baseline index.

This is the Spark reincarnation of the reference's chunked nearest-neighbor
search (J2 in SURVEY.md §2.4: index.rs:68-102,175-181 via process.rs:283-287):
the reference buffers 512 unique tokenized lines and scores them with one
sparse matrix product; here every Arrow batch of the winners DataFrame is
scored with one numpy gather/segment-sum per group — same math, f32, and the
baseline matrix arrives once per executor via broadcast instead of being
rebuilt per task.

Winner rows carry ``skey``, the sortable encoding of (conv_id, turn_idx,
sub_idx) used for first-occurrence semantics (see pipeline._SKEY).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .model import lookup

SCORED_SCHEMA = "tool string, dkey string, skey string, score float"


def _token_lines(pdf: pd.DataFrame) -> list:
    """Winner token lines from either winners layout: a ``tokens`` column
    (full parse mode), or ``wtext`` — the winner's raw text under the
    fused-dkey parse mode, tokenized HERE inside the scoring/build UDF so
    winner tokens never cross the Arrow boundary and no extra Python
    stage exists (process() is lru-cached per line)."""
    if "tokens" in pdf.columns:
        return pdf["tokens"].tolist()
    from .tokenizer import process

    return [process(t) for t in pdf["wtext"]]


def make_score_fn(bc_indexes):
    """mapInPandas over winner rows (tool, dkey, skey, tokens|wtext) -> + score."""

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        indexes = bc_indexes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            lines = _token_lines(pdf)
            scores = np.ones(len(pdf), dtype=np.float32)
            for tool, g in pdf.groupby("tool", sort=False):
                idx = lookup(indexes, tool)
                if idx is not None:
                    gi = g.index.to_numpy()
                    scores[gi] = idx.score([lines[i] for i in gi])
            out = pdf[["tool", "dkey", "skey"]].copy()
            out["score"] = scores
            yield out

    return score_batches


# ---------------------------------------------------------------------------
# distributed scoring (the escape hatch for models too large to collect and
# broadcast from the driver)
# ---------------------------------------------------------------------------

_VECTOR_SCHEMA = "tool string, dkey string, skey string, bucket int, tval float"


def _vectorize_winners_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Explode each winner line into its L2-normalized sparse-vector entries
    (bucket, value) — the same _vectorize_batch the broadcast kernel uses,
    so feature hashing, duplicate-bucket dropping and normalization are
    bit-identical across the two scoring paths."""
    from .hashing import _vectorize_batch

    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows, cols, vals = _vectorize_batch(_token_lines(pdf))
        yield pd.DataFrame(
            {
                "tool": pdf["tool"].to_numpy()[rows],
                "dkey": pdf["dkey"].to_numpy()[rows],
                "skey": pdf["skey"].to_numpy()[rows],
                "bucket": cols.astype(np.int32),
                "tval": vals,
            }
        )


def vectorize_entries(winners):
    """(tool, dkey, skey, bucket, tval): the exploded sparse-vector entries
    of each winner line (Arrow-batched; the only Python in the join path)."""
    return winners.mapInPandas(_vectorize_winners_fn, _VECTOR_SCHEMA)


def explode_model(model_df):
    """(group_key, row_id, bucket, mval): the model matrix in coordinate
    form — the join-side layout of the distributed scorer."""
    from pyspark.sql import functions as F

    return model_df.select(
        F.col("group_key"),
        F.col("row_id"),
        F.explode(F.arrays_zip("indices", "values")).alias("z"),
    ).select(
        "group_key",
        "row_id",
        F.col("z.indices").alias("bucket"),
        F.col("z.values").alias("mval"),
    )


def save_exploded_model(
    model_df, table_name: str, buckets: int = 64, single_index: bool = False
):
    """Persist the model in its JOIN-SIDE layout: coordinate rows bucketed
    (and sorted) by the distributed scorer's join keys. Repeat runs against
    the same baseline then skip both the explode and the model-side
    exchange — Spark reads bucketed tables pre-partitioned on the join
    keys, so only the (new) target side shuffles (storage-partitioned
    join; verified by plan shape in tests/test_distributed_score.py and
    PLANS.md). The scorer must join UNSALTED for the co-partitioning to
    hold (score_join with hot_bucket_rows=None): hot-bucket salting joins
    on an extra salt key that the storage layout can't provide. Use the
    bucketed layout for repeat runs over baselines without pathological
    hot buckets; the salted ad-hoc path otherwise."""
    m = explode_model(model_df)
    keys = ["bucket"] if single_index else ["group_key", "bucket"]
    (
        m.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table_name)
    )


def load_exploded_model(spark, table_name: str):
    """The bucketed join-side model written by save_exploded_model."""
    return spark.table(table_name)


def score_join(
    t, m, winners, single_index: bool,
    hot_bucket_rows: int | None = 8192, hot_salts: int = 16,
):
    """The relational half of the distributed scorer: join vector entries
    against model coordinates, partial-sum dot products per (line, row),
    max per line, distance = min(1, 1 - max); left join keeps no-overlap
    lines at exactly 1.0. Pure DataFrame ops — DuckDB-oracle-able over
    staged t/m (entry_queries.q_score_distributed).

    Hot-bucket salting: a token present in a large share of baseline rows
    makes its (group, bucket) join key carry |targets| x |bucket rows|
    pairs through one reducer. Buckets larger than hot_bucket_rows are
    salted: model coordinates get salt = row_id % hot_salts, target entries
    replicate across all salts (each pair still meets exactly once, so the
    dot sums are unchanged) — the pair stream and its partial-aggregate
    hash maps spread over hot_salts times more tasks. Cold buckets pay
    nothing (salt 0, no replication); the hot dim is a broadcast.

    hot_bucket_rows=None disables salting entirely: the join runs on the
    bare keys, which is what lets a bucketed model table
    (save_exploded_model) join without a model-side exchange."""
    from pyspark.sql import functions as F

    keys = ["bucket"] if single_index else ["group_key", "bucket"]
    if hot_bucket_rows is None:
        if single_index:
            cond = [t["bucket"] == m["bucket"]]
        else:
            cond = [t["tool"] == m["group_key"], t["bucket"] == m["bucket"]]
        dots = (
            t.join(m, cond)
            .groupBy("tool", "dkey", "row_id")
            .agg(F.sum(F.col("tval") * F.col("mval")).alias("dot"))
            .groupBy("tool", "dkey")
            .agg(F.max("dot").alias("best"))
        )
        return _score_tail(winners, dots)
    hot = (
        m.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_bucket_rows)
        .select(*keys, F.lit(True).alias("_hot"))
    )
    m = (
        m.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot"), F.pmod(F.col("row_id"), F.lit(hot_salts))
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_hot")
    )
    hot_t = hot.select(
        *[F.col(k).alias(f"_h_{k}") for k in keys], F.col("_hot")
    )
    t_cond = [t["bucket"] == F.col("_h_bucket")]
    if not single_index:
        t_cond.append(t["tool"] == F.col("_h_group_key"))
    t = (
        t.join(F.broadcast(hot_t), t_cond, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot"), F.sequence(F.lit(0), F.lit(hot_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts", *[f"_h_{k}" for k in keys])
    )

    if single_index:
        cond = [t["bucket"] == m["bucket"], t["_salt"] == m["_salt"]]
    else:
        cond = [
            t["tool"] == m["group_key"],
            t["bucket"] == m["bucket"],
            t["_salt"] == m["_salt"],
        ]
    dots = (
        t.join(m, cond)
        .groupBy("tool", "dkey", "row_id")
        .agg(F.sum(F.col("tval") * F.col("mval")).alias("dot"))
        .groupBy("tool", "dkey")
        .agg(F.max("dot").alias("best"))
    )
    return _score_tail(winners, dots)


def _score_tail(winners, dots):
    """distance = min(1, 1 - best dot), left join keeping no-overlap lines
    at exactly 1.0."""
    from pyspark.sql import functions as F

    return (
        winners.select("tool", "dkey", "skey")
        .join(dots, ["tool", "dkey"], "left")
        .select(
            "tool",
            "dkey",
            "skey",
            # rounding order matches the broadcast kernel (hashing.py score):
            # cast the f64 max-dot to f32 FIRST, then subtract in f32 — a
            # f64 subtraction with one final cast can differ by 1 ulp, which
            # flips anomaly membership on the f32(0.3) knife edge
            F.least(
                F.lit(1.0).cast("float"),
                F.lit(1.0).cast("float")
                - F.coalesce(F.col("best").cast("float"), F.lit(0.0).cast("float")),
            ).alias("score"),
        )
    )


def score_winners_distributed(winners, model_df, single_index: bool):
    """Score winner lines against the model WITHOUT collecting it: the
    sparse matmul as relational algebra.

    Shape (the 10^12-line design point where the model itself is huge):
    explode model rows to (group, bucket, row_id, mval) and winner lines to
    (group, bucket, tval) — the Arrow-batched UDF above is the only Python —
    then join on (group, bucket), partial-sum the products per
    (group, dkey, row_id) (map-side combine), take the per-line max dot and
    emit distance = min(1, 1 - max). Rows with no bucket overlap keep
    distance 1.0 via the final left join (index.rs:68-102 semantics).

    Skew note: hot buckets (tokens present in a large share of baseline
    rows) concentrate the join; AQE skew-join splits them, and the
    per-(dkey,row_id) aggregation bounds any single task's output. Same
    asymptotic work as the broadcast kernel, paid as one shuffle instead of
    a driver collect + N-executor broadcast.

    Reference: cosine_distance_chunk (index.rs:85-102), lookup_or_single
    (model.rs:857-869) — with single_index=True the one index matches every
    group, so the join drops the group-key equality.
    """
    return score_join(
        vectorize_entries(winners), explode_model(model_df), winners, single_index
    )
