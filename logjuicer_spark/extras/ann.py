"""Approximate nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k (the correctness baseline; see also
  entry_queries.q_ann_cosine which is DuckDB-oracled)
- ivf_topk: the scale path — k-means-lite coarse quantizer (centroids
  trained on a sample, driver-side numpy, broadcast), probe the nprobe
  nearest cells only; candidate set shrinks by ~ncells/nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _cos_cols(vcol, qcol):
    dot = F.aggregate(F.zip_with(vcol, qcol, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    n1 = F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda s, x: s + x * x))
    n2 = F.sqrt(F.aggregate(qcol, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (n1 * n2)


def _sqnorm(vcol):
    return F.aggregate(vcol, F.lit(0.0), lambda s, x: s + x * x)


def _check_query(query_vec):
    """A zero query has no defined cosine to anything; 0/0 is NaN and
    Spark sorts NaN ABOVE every number, so without this guard garbage
    rows would fill the entire top-k (round-4 review finding)."""
    if not any(float(x) != 0.0 for x in query_vec):
        raise ValueError("ANN query vector has zero norm (cosine undefined)")


def brute_force_topk(
    emb: DataFrame, query_vec, k: int = 10, id_col="vec_id", vec_col="embedding"
) -> DataFrame:
    _check_query(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    # zero-norm rows (padding / failed encodes) are EXCLUDED: their cosine
    # is NaN, which Spark orders above all numbers — they would otherwise
    # dominate the top-k. The SQL oracles carry the same norm predicate.
    return (
        emb.filter(_sqnorm(v) > 0)
        .select(F.col(id_col).alias("id"), F.round(_cos_cols(v, q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id")
        .limit(k)
    )


def train_centroids(emb: DataFrame, n_cells: int = 16, vec_col="embedding",
                    sample: int = 4096, iters: int = 8, seed: int = 42,
                    id_col: str = "vec_id") -> np.ndarray:
    """k-means on a driver-side sample (Lloyd iterations in numpy).

    The sample is a deterministic distributed top-k by xxhash64(id) — a
    hash-ordered pseudo-random draw from the WHOLE table (plain
    .limit(sample) would take the first file's rows, biasing the codebook
    toward one partition's distribution at scale). TakeOrderedAndProject
    keeps it one pass, no full sort."""
    rows = (
        emb.select(vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("no embeddings to train on")
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def train_centroids_distributed(
    spark, emb: DataFrame, n_cells: int = 16, vec_col="embedding",
    iters: int = 8, id_col: str = "vec_id", tol: float = 1e-9,
) -> np.ndarray:
    """Distributed Lloyd: every vector participates in every iteration.

    Per iteration, ONE mapInPandas pass computes per-partition partial sums
    per centroid (cell, count, sum-vector) — the map-side combine of
    k-means — and only the tiny (n_cells x n_partitions) partial table
    reaches the driver for the centroid update. This replaces the
    driver-sample trainer at scale: a bounded sample can entirely miss a
    rare-but-real cluster (tests/test_extras.py::
    test_distributed_lloyd_finds_cluster_the_sample_misses), while the
    full-data pass cannot. Init is the same deterministic hash-ordered
    draw the sampler uses (n_cells rows). Cost: iters scans of the
    embedding table (persisted across iterations here; at 100 TB you cap
    iters and/or pre-filter, but the per-iteration shape — map-side
    partial sums, O(n_cells) driver traffic — is the one that scales)."""
    rows = (
        emb.select(vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("train_centroids_distributed: no embeddings to train on")
    cent = np.array([r[0] for r in rows], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    vec = emb.select(F.col(vec_col).alias("v")).persist()
    schema = "cell int, n long, psum array<double>"
    try:
        for _ in range(iters):
            bc = spark.sparkContext.broadcast(cent)

            def part_sums(batches):
                c = bc.value
                acc = np.zeros((len(c), c.shape[1]), dtype=np.float64)
                cnt = np.zeros(len(c), dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                    m /= np.maximum(
                        np.linalg.norm(m, axis=1, keepdims=True), 1e-12
                    )
                    a = (m @ c.T).argmax(axis=1)
                    np.add.at(acc, a, m)
                    cnt += np.bincount(a, minlength=len(c))
                yield pd.DataFrame(
                    {"cell": range(len(c)), "n": cnt, "psum": list(acc)}
                )

            try:
                parts = vec.mapInPandas(part_sums, schema).toPandas()
            finally:
                # each round's codebook broadcast is dead once its pass
                # finishes; long sessions training many codebooks must not
                # accumulate them in the broadcast manager
                bc.unpersist(blocking=False)
            new = cent.copy()
            for cell, g in parts.groupby("cell"):
                n = int(g["n"].sum())
                if n > 0:
                    s = np.sum(np.stack(g["psum"].to_numpy()), axis=0)
                    v = s / n
                    new[int(cell)] = v / max(np.linalg.norm(v), 1e-12)
            moved = float(np.abs(new - cent).max())
            cent = new
            if moved <= tol:
                break
    finally:
        vec.unpersist()
    return cent


def ivf_assign(spark, emb: DataFrame, centroids: np.ndarray, vec_col="embedding") -> DataFrame:
    """Assign every vector to its nearest centroid cell (vectorized pandas
    UDF over the broadcast codebook). Returns emb + a ``cell`` int column."""
    bc = spark.sparkContext.broadcast(centroids)

    @pandas_udf("int")
    def _cell(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    return emb.withColumn("cell", _cell(F.col(vec_col)))


def probe_cells(centroids: np.ndarray, query_vec, nprobe: int = 4) -> list[int]:
    """The query's nprobe closest centroid cells."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    return np.argsort(-(centroids @ qn))[:nprobe].tolist()


def ivf_search(
    cells: DataFrame, query_vec, probe: list[int], k: int = 10,
    id_col="vec_id", vec_col="embedding",
) -> DataFrame:
    """Prune to the probed cells, exact cosine top-k within them (pure JVM
    expressions — the pruning filter pushes down to the cell column)."""
    _check_query(query_vec)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        cells.filter(F.col("cell").isin(probe))
        .filter(_sqnorm(v) > 0)  # NaN-cosine guard, see brute_force_topk
        .select(F.col(id_col).alias("id"), F.round(_cos_cols(v, qcol), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id")
        .limit(k)
    )


def ivf_topk(
    spark,
    emb: DataFrame,
    query_vec,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """IVF: assign cells, prune to the query's nprobe closest cells, exact
    cosine within the probed cells; candidate set shrinks ~ncells/nprobe."""
    cells = ivf_assign(spark, emb, centroids, vec_col)
    probe = probe_cells(centroids, query_vec, nprobe)
    return ivf_search(cells, query_vec, probe, k, id_col, vec_col)
