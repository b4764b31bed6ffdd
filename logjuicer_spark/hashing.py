"""Feature hashing + sparse cosine scoring (pure numpy, f32).

Semantics from the reference index (/root/reference/crates/index/src/index.rs):
- feature space: 260_000 dims, f32                       (index.rs:183,18)
- per word: h = fxhash32(word); sign = +1 if h >= 2^31 else -1;
  bucket = h % 260000; duplicate buckets DROPPED (first kept, not summed),
  matching sklearn HashingVectorizer behavior            (index.rs:188-208)
- rows L2-normalized at build                            (index.rs:137-142)
- score(target) = 1 - max_row cos(baseline_row, target); a target with no
  bucket overlap keeps distance 1.0                      (index.rs:68-102,175-181)

The index is stored column-major (sorted by bucket): scoring a batch of
targets is then a searchsorted gather over exactly the probed buckets — the
numpy equivalent of the reference's sparse matmul, with cost proportional to
the actual bucket collisions instead of a dense pass. This is the payload of
the Arrow-batched scoring UDF (score.py).

fxhash32 is implemented from the public algorithm of the ``fxhash`` crate
(cbreeden/fxhash, lifted from rustc's FxHasher): per little-endian chunk
(u32, then u16, then u8 tail) ``h = (rotl(h, 5) ^ chunk) * SEED32``; Rust
``Hash for str`` appends a trailing 0xff byte. SEED32 = 0x9e3779b9 (the
rustc-hash 32-bit constant).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

SIZE = 260_000  # index.rs:183
THRESHOLD = np.float32(0.3)  # process.rs:20
# (the reference's 512-unique-line scoring chunk, process.rs:26, has no
# direct analog here: batching is governed by the pair budget / dense-cell
# heuristics below, whose max-over-rows result is chunking-invariant)

_MASK = 0xFFFFFFFF
_SEED32 = 0x9E3779B9


def fxhash32(data: bytes) -> int:
    """32-bit FxHash of a byte string, with the Rust `str` 0xff suffix."""
    h = 0
    n = len(data)
    i = 0
    while n - i >= 4:
        w = int.from_bytes(data[i : i + 4], "little")
        h = ((((h << 5) | (h >> 27)) & _MASK) ^ w) * _SEED32 & _MASK
        i += 4
    if n - i >= 2:
        w = int.from_bytes(data[i : i + 2], "little")
        h = ((((h << 5) | (h >> 27)) & _MASK) ^ w) * _SEED32 & _MASK
        i += 2
    if n - i == 1:
        h = ((((h << 5) | (h >> 27)) & _MASK) ^ data[i]) * _SEED32 & _MASK
    # Hash for str writes the bytes then a single 0xff (prefix-freedom)
    h = ((((h << 5) | (h >> 27)) & _MASK) ^ 0xFF) * _SEED32 & _MASK
    return h


@lru_cache(maxsize=1 << 20)
def word_bucket(word: str) -> tuple[int, float]:
    """(bucket, sign) of one token word. Cached: the post-mask vocabulary is
    small, so across an executor's lifetime this is a dict lookup."""
    h = fxhash32(word.encode("utf-8"))
    sign = 1.0 if h >= 2_147_483_648 else -1.0
    return h % SIZE, sign


def _fxhash32_batch(words) -> np.ndarray:
    """Vectorized fxhash32 over a sequence of words -> uint32 array.

    Bit-identical to fxhash32 (pure wrap-around integer math, so numpy
    uint32 arithmetic reproduces the scalar loop exactly): the words are
    packed into a padded (n, Lmax) byte matrix and the chunk recurrence
    runs across all words at once — one masked vector step per 4-byte
    chunk position, then the 2-byte / 1-byte tails and the 0xff suffix.
    This is the cold-vocabulary fast path: corpora with per-line-unique
    tokens (zero cache hits) otherwise pay a ~1 us Python loop per word.
    """
    enc = [w.encode("utf-8") for w in words]
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    h = np.zeros(n, dtype=np.uint32)
    seed = np.uint32(_SEED32)
    five, twenty7 = np.uint32(5), np.uint32(27)
    # group by byte length: each class packs into a dense (k, L) byte
    # matrix by one frombuffer/reshape (no padding, no 2D scatter) and
    # the chunk recurrence runs MASK-FREE — every row of a class walks
    # the identical chunk sequence (L//4 u32 chunks, then the 2/1-byte
    # tail), so the loop is plain u32 vector ops
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    bounds = np.flatnonzero(np.diff(slens)) + 1
    for cls in (np.split(order, bounds) if n else ()):
        length = int(lens[cls[0]])
        if length == 0:
            continue
        blob = b"".join(enc[i] for i in cls)
        arr = np.frombuffer(blob, dtype=np.uint8).reshape(len(cls), length)
        hc = np.zeros(len(cls), dtype=np.uint32)
        o = 0
        while length - o >= 4:
            w = (
                arr[:, o].astype(np.uint32)
                | (arr[:, o + 1].astype(np.uint32) << np.uint32(8))
                | (arr[:, o + 2].astype(np.uint32) << np.uint32(16))
                | (arr[:, o + 3].astype(np.uint32) << np.uint32(24))
            )
            hc = (((hc << five) | (hc >> twenty7)) ^ w) * seed
            o += 4
        if length - o >= 2:
            w = arr[:, o].astype(np.uint32) | (
                arr[:, o + 1].astype(np.uint32) << np.uint32(8)
            )
            hc = (((hc << five) | (hc >> twenty7)) ^ w) * seed
            o += 2
        if length - o == 1:
            hc = (((hc << five) | (hc >> twenty7)) ^ arr[:, o].astype(np.uint32)) * seed
        h[cls] = hc
    # Hash for str writes the bytes then a single 0xff (prefix-freedom)
    h = (((h << five) | (h >> twenty7)) ^ np.uint32(0xFF)) * seed
    return h


# executor-lifetime (bucket, sign) cache shared by the batch path; the
# lru_cache on word_bucket stays for the scalar path
_BUCKET_CACHE: dict = {}


def _word_buckets_batch(uniques) -> tuple[np.ndarray, np.ndarray]:
    """(buckets, signs) for a batch of unique words: dict-cache hits are a
    lookup, misses hash through the VECTORIZED fxhash32 — the per-word
    Python loop only survives in the scalar word_bucket path.

    A 512-word sample probes the cache first: template vocabularies hit
    ~90% (measured, scripts/tokenizer_bench.py) and take the split
    probe; adversarial per-line-unique vocabularies hit ~0% and skip the
    probe loop entirely — on such corpora the probe itself was the
    largest single cost. Misses warm the cache only while the batch is
    small enough to be a plausible recurring vocabulary (a million-word
    one-shot vocabulary would just thrash the cap)."""
    nw = len(uniques)
    cache_get = _BUCKET_CACHE.get
    sample_hits = 0
    sample_n = min(nw, 512)
    for i in range(sample_n):
        if cache_get(uniques[i]) is not None:
            sample_hits += 1

    def _hash_all(words):
        hs = _fxhash32_batch(words)
        return (
            (hs % np.uint32(SIZE)).astype(np.int64),
            np.where(
                hs >= np.uint32(2_147_483_648), np.float32(1.0), np.float32(-1.0)
            ),
        )

    if sample_n and sample_hits >= 0.05 * sample_n:
        ub = np.empty(nw, dtype=np.int64)
        us = np.empty(nw, dtype=np.float32)
        miss_i: list = []
        miss_w: list = []
        for i in range(nw):
            hit = cache_get(uniques[i])
            if hit is None:
                miss_i.append(i)
                miss_w.append(uniques[i])
            else:
                ub[i], us[i] = hit
        if not miss_w:
            return ub, us
        buckets, signs = _hash_all(miss_w)
        mi = np.asarray(miss_i, dtype=np.int64)
        ub[mi] = buckets
        us[mi] = signs
    else:
        miss_w = uniques
        buckets, signs = _hash_all(miss_w)
        ub, us = buckets, signs
    if len(miss_w) <= 200_000:
        if len(_BUCKET_CACHE) + len(miss_w) > (1 << 20):
            _BUCKET_CACHE.clear()
        for w, b, s in zip(miss_w, buckets.tolist(), signs.tolist()):
            _BUCKET_CACHE[w] = (b, s)
    return ub, us


def vectorize(tokens: str) -> tuple[np.ndarray, np.ndarray]:
    """Sparse vector of one tokenized line: (sorted unique buckets, signs).

    Duplicate buckets keep the first-seen sign and are NOT summed
    (index.rs:188-208). Values are un-normalized (+-1, f32).
    """
    words = tokens.split(" ")
    cols = np.empty(len(words), dtype=np.int64)
    vals = np.empty(len(words), dtype=np.float32)
    for i, w in enumerate(words):
        cols[i], vals[i] = word_bucket(w)
    order = np.argsort(cols, kind="stable")
    cols = cols[order]
    vals = vals[order]
    keep = np.ones(len(cols), dtype=bool)
    keep[1:] = cols[1:] != cols[:-1]
    return cols[keep], vals[keep]


def _vectorize_batch(token_lines) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorize a batch of lines -> (row_idx, cols, normalized vals).

    Batch formulation: one hash-based vocabulary factorization (only unique
    words pay fxhash32), one stable lexsort for the per-row bucket dedup
    (first occurrence keeps its sign, matching index.rs:188-208), one
    bincount for the L2 norms.
    """
    if not token_lines:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), np.empty(0, dtype=np.float32)
    import pandas as pd

    word_lists = [l.split(" ") for l in token_lines]
    lens = np.fromiter(
        (len(w) for w in word_lists), dtype=np.int64, count=len(word_lists)
    )
    flat = [w for ws in word_lists for w in ws]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    ub, us = _word_buckets_batch(uniques)
    cols = ub[codes]
    vals = us[codes]
    rows = np.repeat(np.arange(len(token_lines), dtype=np.int64), lens)
    order = np.lexsort((cols, rows))  # stable: first occurrence wins ties
    rows, cols, vals = rows[order], cols[order], vals[order]
    keep = np.ones(len(cols), dtype=bool)
    keep[1:] = (cols[1:] != cols[:-1]) | (rows[1:] != rows[:-1])
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    nnz = np.bincount(rows, minlength=len(token_lines))
    nrm = np.sqrt(nnz.astype(np.float32))
    nrm[nnz == 0] = np.float32(1.0)
    vals = (vals / nrm[rows]).astype(np.float32)
    return rows, cols, vals


def _multi_arange(starts: np.ndarray, counts: np.ndarray, dtype=np.int64) -> np.ndarray:
    """Concatenation of arange(s, s+c) for each (s, c), vectorized.

    ``dtype``: the accumulator loop passes int32 whenever the index nnz
    fits (it always does at SIZE=260k per-group models) — the cumsum and
    the downstream gathers are memory-bandwidth-bound, so halving element
    width is a direct throughput win (measured, scripts note in BENCH.md).
    Values stay in [0, nnz), so int32 cumsum cannot overflow."""
    nz = counts > 0
    starts = starts[nz]
    counts = counts[nz]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=dtype)
    ends = np.cumsum(counts)
    out = np.ones(total, dtype=dtype)
    out[0] = starts[0]
    # at the first slot of each later range, jump from the previous range's
    # last value (starts[i-1] + counts[i-1] - 1) to starts[i]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + counts[:-1] - 1)
    # keep the requested width through the cumsum: np.cumsum PROMOTES
    # int32 input to int64 by default, which would silently undo the
    # narrow-gather optimization (values stay in [0, nnz), so the narrow
    # accumulation cannot overflow)
    return np.cumsum(out, dtype=dtype)


class SparseIndex:
    """An immutable column-major baseline index (one per group key).

    Stored as parallel arrays sorted by bucket: (cols, rows, vals), plus the
    row count. Rows are L2-normalized. Picklable -> broadcastable.
    """

    __slots__ = ("nrows", "cols", "rows", "vals")

    def __init__(self, nrows: int, cols: np.ndarray, rows: np.ndarray, vals: np.ndarray):
        self.nrows = int(nrows)
        # int32 storage (buckets < 260k, row ids < 2^31 at any collectable
        # model size): the scoring loop is memory-bandwidth-bound on the
        # (rows, vals) gathers, so narrow elements are a direct win — and
        # the broadcast pickle halves too. Guarded: a hypothetical >2^31-row
        # index keeps int64.
        if self.nrows < 2**31 and len(cols):
            cols = cols.astype(np.int32, copy=False)
            rows = rows.astype(np.int32, copy=False)
        self.cols = cols
        self.rows = rows
        self.vals = vals

    @property
    def nnz(self) -> int:
        return len(self.cols)

    @classmethod
    def from_token_lines(cls, token_lines) -> "SparseIndex":
        rows, cols, vals = _vectorize_batch(list(token_lines))
        order = np.argsort(cols, kind="stable")
        return cls(len(token_lines), cols[order], rows[order], vals[order])

    @classmethod
    def from_rows(cls, row_triples) -> "SparseIndex":
        """From persisted (row_id, indices, values) triples (any order).

        Vectorized: this runs on the DRIVER during model collect, inside
        the serial fraction of every run — a per-row python loop here was
        ~12s on a 500k-row model (measured), which capped scaling at high
        core counts (Amdahl). np.repeat covers the row ids; the coordinate
        payloads are np.concatenate'd when the cells are already numpy
        arrays (the Arrow collect path) and np.fromiter-flattened
        otherwise."""
        triples = sorted(row_triples, key=lambda r: r[0])
        if not triples:
            e = np.empty(0, dtype=np.int64)
            return cls(0, e, e.copy(), np.empty(0, dtype=np.float32))
        lens = np.fromiter(
            (len(t[1]) for t in triples), dtype=np.int64, count=len(triples)
        )
        total = int(lens.sum())
        r = np.repeat(np.arange(len(triples), dtype=np.int64), lens)
        if isinstance(triples[0][1], np.ndarray):
            c = np.concatenate([t[1] for t in triples]).astype(np.int64, copy=False)
            v = np.concatenate([t[2] for t in triples]).astype(np.float32, copy=False)
        else:
            c = np.fromiter(
                (x for t in triples for x in t[1]), dtype=np.int64, count=total
            )
            v = np.fromiter(
                (x for t in triples for x in t[2]), dtype=np.float32, count=total
            )
        order = np.argsort(c, kind="stable")
        return cls(len(triples), c[order], r[order], v[order])

    def to_rows(self):
        """Explode into (row_id, indices[int32], values[f32]) python rows, the
        persisted parquet model layout (FIXTURES.md section 2)."""
        order = np.argsort(self.rows, kind="stable")
        r = self.rows[order]
        c = self.cols[order].astype(np.int32)
        v = self.vals[order]
        out = []
        bounds = np.searchsorted(r, np.arange(self.nrows + 1))
        for i in range(self.nrows):
            lo, hi = bounds[i], bounds[i + 1]
            out.append((int(i), c[lo:hi].tolist(), v[lo:hi].tolist()))
        return out

    # per-flush budget of gathered (target, row) pairs: bounds both the
    # gather arrays and the accumulation cost of one flush
    _PAIR_BUDGET = 4_000_000
    # dense accumulator cap: targets_in_batch * nrows cells
    _DENSE_CELLS = 32_000_000

    def score(self, token_lines) -> np.ndarray:
        """Cosine distance of each tokenized line to its nearest baseline row.

        Mirrors cosine_distance_chunk (index.rs:85-102): per target,
        result = min(1.0, 1 - max_row dot); f32 values.

        Common masked words can appear in a large fraction of baseline rows,
        so the (target, row) match set is potentially |targets| x |rows|;
        accumulation therefore runs in pair-budgeted flushes, each choosing
        between a dense bincount accumulator (overlap-heavy: linear, no
        sort) and a sort-based compaction (overlap-sparse: tiny pair sets).
        """
        token_lines = list(token_lines)
        m = len(token_lines)
        result = np.ones(m, dtype=np.float32)
        if m == 0 or self.nrows == 0 or self.nnz == 0:
            return result
        t_idx, t_cols, t_vals = _vectorize_batch(token_lines)
        if len(t_cols) == 0:
            return result
        # match the probe dtype to the stored cols: a mixed-dtype
        # searchsorted would silently promote (and copy) the full index
        # column array on every batch
        t_cols = t_cols.astype(self.cols.dtype, copy=False)
        lo = np.searchsorted(self.cols, t_cols, side="left")
        hi = np.searchsorted(self.cols, t_cols, side="right")
        cnt = (hi - lo).astype(np.int64)
        if int(cnt.sum()) == 0:
            return result

        # group targets into flushes under the pair budget
        pairs_per_target = np.bincount(t_idx, weights=cnt, minlength=m).astype(np.int64)
        cum = np.cumsum(pairs_per_target)
        # word-entry boundaries per target (t_idx is sorted by construction)
        word_starts = np.searchsorted(t_idx, np.arange(m + 1))
        nrows = np.int64(self.nrows)

        start_t = 0
        while start_t < m:
            # extend the flush while within budget (always >= 1 target)
            base_pairs = cum[start_t - 1] if start_t else 0
            end_t = int(
                np.searchsorted(cum, base_pairs + self._PAIR_BUDGET, side="right")
            )
            end_t = min(max(end_t, start_t + 1), m)
            ws, we = word_starts[start_t], word_starts[end_t]
            if ws == we:
                start_t = end_t
                continue
            gather = _multi_arange(
                lo[ws:we], cnt[ws:we],
                dtype=np.int32 if self.nnz < 2**31 else np.int64,
            )
            if len(gather) == 0:
                start_t = end_t
                continue
            b_rows = self.rows[gather]
            prod = self.vals[gather] * np.repeat(t_vals[ws:we], cnt[ws:we])
            # scale to key space BEFORE the repeat: the multiply runs over
            # the word-level array (tiny) instead of the pair stream — one
            # fewer full pass over the flush's largest arrays
            nb = end_t - start_t
            keys = np.repeat((t_idx[ws:we] - start_t) * nrows, cnt[ws:we]) + b_rows
            if nb * self.nrows <= self._DENSE_CELLS:
                # dot products accumulate in f64 (bincount weights) and are
                # rounded to f32 ONCE; the reference's sprs matmul sums
                # sequentially in f32, so a knife-edge score can differ by
                # 1 ulp (documented deviation, NOTES.md; goldens hold at
                # 1e-6 and the exact pinned distances are bit-identical).
                # Both of THIS engine's scoring paths share this exact
                # rounding tail, which is the internal-consistency contract
                # the oracles verify.
                sums = np.bincount(keys, weights=prod, minlength=nb * self.nrows)
                best = sums.reshape(nb, self.nrows).max(axis=1).astype(np.float32)
                result[start_t:end_t] = np.minimum(
                    result[start_t:end_t], np.float32(1.0) - best
                )
            else:
                # accumulate in f64 like the dense bincount path (bincount
                # promotes weights to f64), then cast once: the two paths are
                # chosen by batch size, so identical lines must score
                # bit-identically across partitionings (f32 discipline —
                # cast commutes with max since it's monotone).
                # Compaction is STABLE sort + segment bincount (round 3; was
                # np.unique + np.add.at, ~3x slower): within a segment the
                # stable sort preserves the original gather order, and
                # bincount adds sequentially in input order, so every
                # per-key f64 accumulation sequence — hence every bit —
                # matches the add.at formulation and the dense path.
                order = np.argsort(keys, kind="stable")
                ks = keys[order]
                ps = prod[order]
                newseg = np.empty(len(ks), dtype=bool)
                newseg[0] = True
                np.not_equal(ks[1:], ks[:-1], out=newseg[1:])
                seg = np.cumsum(newseg) - 1
                sums = np.bincount(seg, weights=ps)
                uniq = ks[newseg]
                tgt = (uniq // nrows).astype(np.int64) + start_t
                np.minimum.at(
                    result, tgt, np.float32(1.0) - sums.astype(np.float32)
                )
            start_t = end_t
        return result


def build_matrix(token_lines) -> SparseIndex:
    """Build an L2-row-normalized index from tokenized lines."""
    return SparseIndex.from_token_lines(token_lines)


def score_lines(index: SparseIndex | None, token_lines) -> np.ndarray:
    if index is None:
        return np.ones(len(list(token_lines)), dtype=np.float32)
    return index.score(token_lines)
