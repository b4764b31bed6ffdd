"""Near-duplicate detection at corpus scale.

Spark-first shapes:
- exact: hash groupBy (see entry_queries.q_dedup_exact)
- MinHash + LSH: signature pandas UDF -> band explode -> bucket groupBy ->
  candidate pairs -> signature-estimate verify. The only Python is the
  Arrow-batched signature computation; banding/bucketing/verification are
  shuffle-friendly DataFrame ops (band buckets distribute; no pairwise
  cross-join ever materializes beyond colliding buckets).
- SimHash: 64-bit signature UDF -> 4x16-bit pigeonhole bands ->
  bit_count(xor) Hamming verify, fully JVM-side after the signature.
- n-gram Jaccard: exact verification for candidate pairs (pandas UDF).
- embedding cosine: random-hyperplane LSH bucket join + exact cosine verify.
"""

from __future__ import annotations

import logging
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_MERSENNE = (1 << 61) - 1
_LOG = logging.getLogger(__name__)


def _cap_buckets(banded: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Guard against LSH bucket-size quadratics: at extreme scale a single
    hot bucket (e.g. the all-zeros SimHash of empty docs) turns the bucket
    self-join into n² within that bucket. With a cap set, buckets larger
    than max_bucket_size are EXCLUDED from pairing — never silently: the
    dropped bucket/row counts are logged (one tiny aggregation job, only
    run when a cap is requested)."""
    if max_bucket_size is None:
        return banded
    # persist: the oversized aggregation feeds BOTH the stats probe below
    # and the anti-join broadcast in the returned plan — uncached it would
    # run the full groupBy over banded twice (round-4 review finding).
    # The dim is bounded by n_rows/max_bucket_size; released when the
    # Spark context cleans the out-of-scope reference.
    oversized = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket_size)
        .persist()
    )
    stats = oversized.agg(
        F.count(F.lit(1)).alias("nb"), F.coalesce(F.sum("_bsz"), F.lit(0)).alias("nr")
    ).first()
    if stats["nb"]:
        _LOG.warning(
            "LSH bucket cap %d: excluding %d oversized buckets (%d member rows) "
            "from pairing — raise the cap or salt the bucket key to cover them",
            max_bucket_size, stats["nb"], stats["nr"],
        )
    return banded.join(F.broadcast(oversized.select(*keys)), on=keys, how="left_anti")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    if len(text) < k:
        data = text.encode("utf-8", "ignore")
        return np.array([zlib.crc32(data)], dtype=np.uint64)
    b = text.encode("utf-8", "ignore")
    # byte-shingles approximate char-shingles and stay allocation-cheap
    return np.unique(
        np.array([zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)], dtype=np.uint64)
    )


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) with sig[i] = min_h((a_i*x+b_i) mod M)."""
    a, b = _minhash_params(n_hashes, seed)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        # loop-invariant hoists (round 6): the split halves of `a` and the
        # reshaped `b` were rebuilt per document — three allocations per
        # row for constants of the batch
        a1c = a[:, None] >> np.uint64(32)
        a0c = a[:, None] & np.uint64(0xFFFFFFFF)
        bc = b[:, None]
        out = []
        for t in texts:
            x = _shingle_hashes(t or "", shingle_k)
            # EXACT (a*x + b) mod M, M = 2^61-1: the plain uint64 product
            # a*x reaches 2^93 and would silently wrap mod 2^64 first
            # (round-4 review, verified numerically), voiding the
            # min-wise-independence guarantee the docstring promises.
            # Split a = a1*2^32 + a0 (x < 2^32, so each partial product is
            # exact in uint64) and reduce t*2^32 mod M via the Mersenne
            # identity t*2^32 = (t >> 29)*M + (t >> 29) + ((t & (2^29-1)) << 32).
            t_hi = a1c * x[None, :]  # < 2^61, exact
            hi_mod = (t_hi >> np.uint64(29)) + (
                (t_hi & np.uint64((1 << 29) - 1)) << np.uint64(32)
            )
            lo = a0c * x[None, :]  # < 2^64, exact
            lo_mod = (lo >> np.uint64(61)) + (lo & np.uint64(_MERSENNE))
            m = (hi_mod + lo_mod + bc) % _MERSENNE
            out.append(m.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame,
    bands: int = 32,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate pairs via banding, verified by signature-estimated Jaccard.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, est >= threshold.

    The band bucket key is the joined band slice itself (exact — no hash
    collisions, and engine-portable so a SQL oracle can reproduce the
    banding). The key is ~40 bytes instead of an 8-byte hash; band rows are
    a transient shuffle, so exactness wins over the few extra bytes.
    """
    head = sigs.select("sig").first()
    if head is None:  # empty input: empty pairs frame, no crash
        return sigs.limit(0).select(
            F.col("id").alias("id_a"),
            F.col("id").alias("id_b"),
            F.lit(0.0).alias("est_jaccard"),
        )
    n_hashes = len(head["sig"])
    if bands <= 0 or n_hashes % bands != 0:
        # no silent caps: bands > n_hashes would make every band slice
        # empty ('' buckets -> a full n^2 cross join), and a non-divisible
        # band count silently drops tail hashes from the banding
        raise ValueError(
            f"bands={bands} must evenly divide the signature length "
            f"({n_hashes})"
        )
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    "-",
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(n_hashes)
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_dedup_groups(
    pairs: DataFrame, sigs: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Connected components via min-label propagation TO FIXPOINT: each
    round costs one join + one changed-labels count job; the loop stops as
    soon as no label moves, so typical tiny near-dup clusters converge in
    2-3 rounds while a chain of diameter d needs d rounds (label distance
    shrinks by >=1 hop per round). If max_iters trips first the residual
    changed-label count is LOGGED (no silent split groups — the repo's
    "no silent caps" rule). Returns (id, keep_id) — backed by the final
    round's materialized localCheckpoint (bounded by |ids|): the caller
    consumes it, so it cannot be unpersisted here without severing the
    truncated lineage."""
    import logging

    edges = pairs.select("id_a", "id_b")
    labels = sigs.select("id", F.col("id").alias("label"))
    sym = (
        edges.union(edges.select(F.col("id_b"), F.col("id_a")))
        .toDF("id", "nbr")
        .persist()
    )
    try:
        sym.count()  # materialize once; every round re-reads it
        changed = None
        for _ in range(max_iters):
            nbr_min = (
                sym.join(labels.withColumnRenamed("id", "nbr"), "nbr")
                .groupBy("id")
                .agg(F.min("label").alias("nbr_label"))
            )
            # localCheckpoint (not persist): labels feeds BOTH the propagate join
            # and the min-combine, so without truncation the logical plan doubles
            # every round — exponential analysis cost long before any data moves
            prop = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.col("label").alias("_old"),
                    F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                )
                .localCheckpoint()
            )
            changed = prop.filter(F.col("label") < F.col("_old")).count()
            # localCheckpoint blocks are NOT registered with the cache
            # manager, so an explicit unpersist would be a no-op: dropping
            # the reference to the previous round's DataFrame is the real
            # release — the ContextCleaner reclaims its RDD blocks once the
            # lineage no longer reaches them (only the FINAL round's blocks
            # must outlive this function; the caller consumes them)
            labels = prop.drop("_old")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    if changed:
        logging.getLogger(__name__).warning(
            "minhash_dedup_groups: label propagation did not converge in "
            "%d rounds (%d labels still moving) — some groups may be split; "
            "raise max_iters for longer chains", max_iters, changed,
        )
    return labels.withColumnRenamed("label", "keep_id")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace words (term hash: xxhash-like crc mix)."""

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").split()
            if not words:
                continue
            hs = np.array(
                [zlib.crc32(w.encode("utf-8", "ignore")) * 0x9E3779B97F4A7C15 & (2**64 - 1)
                 for w in words],
                dtype=np.uint64,
            )
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int32)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.flatnonzero(v > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, max_bucket_size: int | None = None
) -> DataFrame:
    """Pigeonhole banding on 4x16-bit chunks, JVM-side Hamming verify.
    max_bucket_size guards the per-bucket self-join quadratic (see
    _cap_buckets)."""
    chunks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("band", "chunk"),
    )
    chunks = _cap_buckets(chunks, ["band", "chunk"], max_bucket_size)
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification of candidate pairs)
# --------------------------------------------------------------------------


def ngram_jaccard_verify(
    pairs: DataFrame, docs: DataFrame, text_col="text", id_col="doc_id",
    k: int = 5, threshold: float = 0.6,
) -> DataFrame:
    da = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    j = pairs.join(da, "id_a").join(db, "id_b")

    @pandas_udf("double")
    def _jacc(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = set(map(int, _shingle_hashes(ta.iloc[i] or "", k)))
            sb = set(map(int, _shingle_hashes(tb.iloc[i] or "", k)))
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    return j.select(
        "id_a", "id_b", F.round(_jacc("text_a", "text_b"), 4).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# embedding cosine near-dup (random hyperplane LSH + exact verify)
# --------------------------------------------------------------------------


def embedding_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, v, bucket): random-hyperplane sign bucket per embedding (the
    Arrow-batched half of embedding_near_dup; the verify half is a plain
    bucket join, so staging this output lets a SQL oracle check it)."""
    head = emb.select(vec_col).first()
    if head is None:  # empty input: empty (id, v, bucket) frame, no crash
        return emb.limit(0).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.lit(0).cast("long").alias("bucket"),
        )
    dim = len(head[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _bucket(F.col(vec_col)).alias("bucket"),
    )


def embedding_verify(
    e: DataFrame, threshold: float = 0.95, max_bucket_size: int | None = None
) -> DataFrame:
    """Exact-cosine verification of bucket-colliding embedding pairs.

    Zero-norm vectors are EXCLUDED before pairing: their cosine is 0/0 =
    NaN, and Spark evaluates NaN >= threshold as TRUE (NaN sorts above
    every number), so without the guard every (zero-vec, other) bucket
    pair would be reported as a confirmed near-duplicate (round-4 review
    finding). The SQL oracle carries the same norm predicate."""
    sq = F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    e = _cap_buckets(e.filter(sq > 0), ["bucket"], max_bucket_size)
    l, r = e.alias("l"), e.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.v"), F.col("r.v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))  # noqa: E731
    return (
        l.join(
            r,
            on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(dot / (nrm(F.col("l.v")) * nrm(F.col("r.v"))), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos_sim) for pairs sharing an LSH sign-bucket with
    cosine >= threshold. Bucket join keeps the candidate set near-linear."""
    e = embedding_buckets(emb, id_col, vec_col, n_planes, seed)
    return embedding_verify(e, threshold, max_bucket_size)
