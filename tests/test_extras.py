"""Tests for the training-data-pipeline extras (dedup / ANN / textstats /
multimodal plumbing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logjuicer_spark.extras import ann, dedup, multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a quiet tune in the warm evening air near the old stone bridge"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup
        (2, base.replace("quiet", "loud").replace("warm", "cold")),  # near dup
        (3, "completely different content about databases and query planners "
            "optimizing join orders with cost models and cardinality estimates"),
        (4, "der schnelle braune fuchs springt und die alte Band spielt nicht "
            "mit der einen Melodie auf das leise Abendlied und zu der Stille"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh(spark, docs):
    sigs = dedup.minhash_signatures(docs).cache()
    pairs = dedup.minhash_lsh_pairs(sigs, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert got.get((0, 1)) == 1.0  # exact dup -> identical signatures
    assert (0, 2) in got or (1, 2) in got  # near dup caught by banding
    assert not any(3 in p for p in got)  # unrelated doc never pairs
    groups = dedup.minhash_dedup_groups(
        dedup.minhash_lsh_pairs(sigs, threshold=0.5), sigs
    ).collect()
    label = {r.id: r.keep_id for r in groups}
    assert label[0] == label[1] == label[2] == 0
    assert label[3] == 3


def test_ngram_jaccard(spark, docs):
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.minhash_lsh_pairs(sigs, threshold=0.5)
    verified = dedup.ngram_jaccard_verify(pairs, docs, threshold=0.5).collect()
    j = {(r.id_a, r.id_b): r.jaccard for r in verified}
    assert j.get((0, 1)) == 1.0
    assert 0.5 <= j.get((0, 2), 0) < 1.0


def test_simhash(spark, docs):
    sigs = dedup.simhash_signatures(docs).cache()
    vals = {r.id: r.simhash for r in sigs.collect()}
    assert vals[0] == vals[1]
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=10).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get((0, 1)) == 0
    assert (0, 3) not in got


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(32).astype(np.float32)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + 0.01 * rng.standard_normal(32).astype(np.float32)]),
        (2, [float(x) for x in rng.standard_normal(32)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dedup.embedding_near_dup(emb, threshold=0.95).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in ids
    assert not any(2 in p for p in ids)


def test_ann_ivf_vs_brute(spark):
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((4, 16)).astype(np.float64)
    rows = []
    for i in range(400):
        c = centers[i % 4]
        v = c + 0.1 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    query = [float(x) for x in centers[1]]
    brute = [r.id for r in ann.brute_force_topk(emb, query, k=10).collect()]
    cents = ann.train_centroids(emb, n_cells=8, sample=400)
    approx = [r.id for r in ann.ivf_topk(spark, emb, query, cents, k=10, nprobe=3).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.8


def test_language_id(spark):
    rows = [
        (0, "the cat sat on the mat and it was happy for a while"),
        (1, "der hund ist nicht mit der katze und das ist gut"),
        (2, "le chat est dans la maison et il est pour une sieste"),
        (3, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.lang_guess for r in textstats.language_id(df).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"


def test_quality_and_tokens(spark, docs):
    q = {r.id: r for r in textstats.quality_score(docs).collect()}
    assert q[0].quality > 0.5  # clean english prose
    assert 0 <= q[3].quality <= 1
    t = {r.id: r for r in textstats.token_count(docs).collect()}
    assert t[0].ws_tokens == len(docs.collect()[0].text.split())
    assert t[0].bpe_ish_tokens >= t[0].ws_tokens


def test_fingerprint_clone_detection(spark, docs):
    fp = {r.id: set(r.fingerprints) for r in textstats.fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    overlap_near = len(fp[0] & fp[2]) / len(fp[0] | fp[2])
    overlap_far = len(fp[0] & fp[3]) / len(fp[0] | fp[3])
    assert overlap_near > 0.5 > overlap_far


def test_multimodal_features(spark):
    media = multimodal.synth_media(spark, 30)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r.media_id: r for r in feats}
    assert all(r.decode_ok for r in feats)
    assert len(by_id[0].feature) == 16
    # deterministic: same payload -> same feature
    feats2 = multimodal.extract_features(media).collect()
    assert {r.media_id: r.feature for r in feats2} == {r.media_id: r.feature for r in feats}
    # unknown modality path raises cleanly via NotImplementedError -> flag
    multimodal.DECODERS.pop("video")
    try:
        feats3 = multimodal.extract_features(media).collect()
        bad = [r for r in feats3 if r.modality == "video"]
        assert bad and not any(r.decode_ok for r in bad)
        assert all(r.feature is None for r in bad)
    finally:
        multimodal.DECODERS["video"] = multimodal._fake_decode


def test_lsh_bucket_cap(spark, caplog):
    # 40 identical docs -> one hot SimHash bucket; the cap must exclude it
    # (logged, never silent) instead of expanding a 40^2/2 self-join
    rows = [(i, "identical words repeated here") for i in range(40)]
    rows += [(100, "first unique alpha"), (101, "second unique bravo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.simhash_signatures(docs)
    uncapped = dedup.simhash_near_pairs(sigs).count()
    assert uncapped >= 40 * 39 // 2
    import logging

    with caplog.at_level(logging.WARNING, logger="logjuicer_spark.extras.dedup"):
        capped = dedup.simhash_near_pairs(sigs, max_bucket_size=10)
        got = capped.collect()
    hot_ids = set(range(40))
    assert not any(r.id_a in hot_ids and r.id_b in hot_ids for r in got)
    assert any("bucket cap" in rec.getMessage() for rec in caplog.records)

    # embedding path: same guard on the sign-bucket join
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
        + [(50, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    e = dedup.embedding_buckets(emb, n_planes=4)
    assert dedup.embedding_verify(e, threshold=0.9).count() >= 30 * 29 // 2
    assert dedup.embedding_verify(e, threshold=0.9, max_bucket_size=5).count() == 0


def test_distributed_lloyd_finds_cluster_the_sample_misses(spark):
    """A rare (1%) cluster orthogonal to the bulk: a small driver sample is
    overwhelmingly likely to miss it, so the sampled trainer places no
    centroid near it — while distributed Lloyd (every vector participates)
    must. This is the 100-TB argument for the distributed trainer."""
    import numpy as np

    from logjuicer_spark.extras.ann import (
        train_centroids, train_centroids_distributed,
    )

    rng = np.random.default_rng(9)
    dim = 16
    # bulk: 2000 points around two dense directions in the first half of
    # the space; rare: 20 points on a pure axis unused by the bulk
    bulk_dirs = np.zeros((2, dim)); bulk_dirs[0, 0] = 1.0; bulk_dirs[1, 1] = 1.0
    rare_dir = np.zeros(dim); rare_dir[dim - 1] = 1.0
    rows = []
    for i in range(2000):
        v = bulk_dirs[i % 2] + 0.05 * rng.standard_normal(dim)
        v[dim - 1] = 0.0
        rows.append((i, [float(x) for x in v]))
    for j in range(20):
        v = rare_dir + 0.01 * rng.standard_normal(dim)
        rows.append((10_000 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def best_cos_to_rare(cents):
        r = rare_dir / np.linalg.norm(rare_dir)
        return float((cents @ r).max())

    sampled = train_centroids(emb, n_cells=4, sample=64, iters=6, seed=1)
    distributed = train_centroids_distributed(spark, emb, n_cells=4, iters=6)
    # the sampled codebook has no centroid anywhere near the rare axis...
    assert best_cos_to_rare(sampled) < 0.5, best_cos_to_rare(sampled)
    # ...the full-data Lloyd does
    assert best_cos_to_rare(distributed) > 0.95, best_cos_to_rare(distributed)


def test_media_real_decode_fallback_without_libs(spark):
    """use_real=True on executors WITHOUT PIL/soundfile must keep the
    plumbing intact: every row comes back with decode_ok=False and a real
    sha256/n_bytes, no job failure."""
    from logjuicer_spark.extras import multimodal as mm

    media = mm.synth_media(spark, n=12)
    rows = mm.extract_features(media, use_real=True).collect()
    assert len(rows) == 12
    assert all(r.decode_ok is False and r.feature is None for r in rows)
    assert all(len(r.sha256) == 64 and r.n_bytes > 0 for r in rows)


def test_media_real_decode_with_pil(spark):
    """Real-codec path (skip-marked: PIL is not in the sandbox): a genuine
    PNG payload decodes with decode_ok=True and a 16-dim feature."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from logjuicer_spark.extras import multimodal as mm

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 30, 90)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image", "image/png", buf.getvalue(), {})], mm.MEDIA_SCHEMA
    )
    row = mm.extract_features(media, use_real=True).collect()[0]
    assert row.decode_ok is True
    assert len(row.feature) == 16
    assert all(0.0 <= v <= 1.0 for v in row.feature)


def test_ann_zero_vector_guards(spark):
    """round-4 review: zero-norm embeddings yield NaN cosine, which Spark
    sorts ABOVE every number — they must be excluded from top-k and from
    near-dup verification, and a zero query must be rejected."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = ann.brute_force_topk(emb, [1.0, 0.0], k=4).collect()
    assert [r.id for r in top] == [0, 1, 3]  # zero vector excluded, not first
    with pytest.raises(ValueError, match="zero norm"):
        ann.brute_force_topk(emb, [0.0, 0.0], k=2)

    pairs = dedup.embedding_near_dup(
        emb, n_planes=4, threshold=0.5, seed=1
    ).collect()
    assert all(2 not in (r.id_a, r.id_b) for r in pairs)


def test_minhash_band_validation_and_empty_inputs(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    sigs = dedup.minhash_signatures(docs, n_hashes=16)
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_lsh_pairs(sigs, bands=5)
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_lsh_pairs(sigs, bands=32)  # bands > n_hashes
    empty_sigs = sigs.limit(0)
    assert dedup.minhash_lsh_pairs(empty_sigs, bands=4).count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert dedup.embedding_buckets(empty_emb).count() == 0


def test_minhash_exact_mersenne_hash():
    """The signature hash must be the documented (a*x+b) mod M universal
    hash — exact big-int arithmetic, no silent uint64 wraparound."""
    import numpy as np

    from logjuicer_spark.extras.dedup import _MERSENNE, _minhash_params, _shingle_hashes

    a, b = _minhash_params(8)
    x = _shingle_hashes("some text with shingles", 5)
    want = np.array(
        [min((int(ai) * int(xi) + int(bi)) % _MERSENNE for xi in x)
         for ai, bi in zip(a, b)],
        dtype=np.int64,
    )
    a1 = a[:, None] >> np.uint64(32); a0 = a[:, None] & np.uint64(0xFFFFFFFF)
    t_hi = a1 * x[None, :]
    hi_mod = (t_hi >> np.uint64(29)) + ((t_hi & np.uint64((1 << 29) - 1)) << np.uint64(32))
    lo = a0 * x[None, :]
    lo_mod = (lo >> np.uint64(61)) + (lo & np.uint64(_MERSENNE))
    got = ((hi_mod + lo_mod + b[:, None]) % _MERSENNE).min(axis=1).astype(np.int64)
    assert np.array_equal(got, want)
