"""Golden tests for feature hashing + cosine scoring.

Distances transcribed from /root/reference/crates/index/src/index.rs tests.
"""

import numpy as np
import pytest

from logjuicer_spark.hashing import (
    SparseIndex,
    build_matrix,
    fxhash32,
    score_lines,
    vectorize,
)


def test_fxhash32_properties():
    # deterministic, 32-bit, sensitive to every byte
    assert fxhash32(b"abc") == fxhash32(b"abc")
    assert 0 <= fxhash32(b"abc") < 2**32
    assert fxhash32(b"abc") != fxhash32(b"abd")
    # chunking boundaries: 3/4/5-byte inputs traverse the u16/u8 tails
    vals = {fxhash32(bytes(range(1, n))) for n in range(1, 10)}
    assert len(vals) == 9


def test_vectorize_dedup_not_summed():
    # index.rs:199-205: duplicate buckets dropped, not summed
    cols1, vals1 = vectorize("abc abc")
    cols2, vals2 = vectorize("abc")
    assert np.array_equal(cols1, cols2)
    assert np.array_equal(vals1, vals2)
    assert set(np.abs(vals1)) == {1.0}


def test_search_mat_goldens():
    # index.rs:264-281 exact distances (raw un-tokenized lines)
    baselines = ["the first line", "the second line", "the third line is a warning"]
    targets = ["a new error", "the second line"]
    model = build_matrix(baselines)
    distances = score_lines(model, targets)
    expected = np.array([0.7642977, 0.000000059604645], dtype=np.float32)
    assert distances == pytest.approx(expected, abs=1e-6)


def test_search_list_goldens():
    # index.rs:229-240
    model = build_matrix(
        ["the first line", "the second line", "the third line is a warning"]
    )
    d = score_lines(model, ["a new error", "the second line"])
    assert d[0] > 0.6
    assert abs(d[1]) < 1e-6


def test_similarity_range():
    # index.rs:220-227: 4 shared words of 5 -> similarity 0.8 (the reference's
    # inline test uses the unnormalized `similarity()` path which lands one
    # f32 ulp above 0.8; the normalized search_mat path -- ours -- lands one
    # ulp below; both are 0.8 +- 1e-7)
    m = build_matrix(["the first test is the 42"])
    d = score_lines(m, ["the second test is the 42"])
    assert d[0] == pytest.approx(0.2, abs=1e-6)


def test_no_overlap_distance_one():
    model = build_matrix(["alpha beta"])
    d = score_lines(model, ["gamma delta"])
    assert d[0] == 1.0


def test_empty_model():
    d = score_lines(None, ["anything"])
    assert d[0] == 1.0
    assert score_lines(build_matrix([]), ["x"])[0] == 1.0


def test_mappend_dedup_union():
    # index.rs:243-262: merged model of 2+2 rows with one duplicate -> 3 rows,
    # we express the merge as union + dedup before vectorizing (SURVEY A4/U1)
    lines1 = ["the first line", "the second line"]
    lines2 = ["the first line", "the third line"]
    merged = list(dict.fromkeys(lines1 + lines2))
    model = build_matrix(merged)
    assert model.nrows == 3
    d = score_lines(model, ["the third line", "the first line", "a new error"])
    assert round(d[0] * 1000) == 0.0
    assert round(d[1] * 1000) == 0.0
    assert round(d[2] * 1000) == 1000.0


def test_matrix_roundtrip():
    m = build_matrix(["a b c", "d e", "a b c d e f"])
    m2 = SparseIndex.from_rows(m.to_rows())
    assert m2.nrows == m.nrows
    assert np.array_equal(m2.cols, m.cols)
    assert np.array_equal(m2.rows, m.rows)
    assert np.array_equal(m2.vals, m.vals)
    targets = ["a b c", "zzz yyy", "d e f"]
    assert np.array_equal(m.score(targets), m2.score(targets))


def test_chunked_slicing_equivalence():
    # slicing baselines in 512-row chunks must not change results
    rng = np.random.default_rng(42)
    lines = [f"word{rng.integers(0, 50)} tok{i % 700} x{i % 13}" for i in range(1300)]
    model = build_matrix(lines)
    targets = [f"word7 tok{i} x1" for i in range(40)]
    d = score_lines(model, targets)
    assert d.dtype == np.float32
    assert ((d >= 0.0) | np.isclose(d, 0.0)).all() and (d <= 1.0).all()


def test_overlap_heavy_scoring_budgeted():
    # common masked words shared by every baseline row used to explode the
    # sort-based accumulator; the pair-budgeted bincount path must stay
    # linear. 2k targets x 8k rows x 9 shared words ~ 144M pair-products.
    import time

    base = [f"alpha beta gamma delta epsilon tag{i} zeta eta theta" for i in range(8000)]
    idx = build_matrix(base)
    targets = [f"alpha beta gamma delta epsilon tag{90000+i} zeta eta theta" for i in range(2000)]
    t0 = time.perf_counter()
    d = idx.score(targets)
    dt = time.perf_counter() - t0
    # 8 of 9 words shared -> similarity 8/9, distance ~0.111 (a few tags
    # collide in the 260k-bucket space and shift individual scores)
    assert (np.abs(d - (1 - 8 / 9)) < 1e-5).mean() > 0.9
    assert dt < 60  # was effectively unbounded with sort-based compaction


def test_fxhash32_batch_matches_scalar():
    """round-4: the vectorized cold-vocabulary hash path must be
    bit-identical to the scalar fxhash32 on every length class, tail
    shape, unicode and the empty word."""
    import random

    import numpy as np

    from logjuicer_spark import hashing as H

    rng = random.Random(11)
    words = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
             "ü", "héllo wörld", "日本語テキスト", "x" * 39, "y" * 40, "z" * 41]
    words += [
        "".join(rng.choice("abcdef0123456789%_-üθ") for _ in range(rng.randint(0, 45)))
        for _ in range(5000)
    ]
    got = H._fxhash32_batch(words)
    want = np.array([H.fxhash32(w.encode("utf-8")) for w in words], dtype=np.uint32)
    assert np.array_equal(got, want)


def test_word_buckets_batch_matches_scalar_both_probe_regimes():
    """_word_buckets_batch must agree with word_bucket whether the cache
    probe path (warm cache) or the skip-probe path (cold cache) runs."""
    import numpy as np

    from logjuicer_spark import hashing as H

    words = [f"w{i}_{i % 7}" for i in range(2000)] + ["%EQ", "error", ""]
    want_b = np.array([H.word_bucket(w)[0] for w in words], dtype=np.int64)
    want_s = np.array([H.word_bucket(w)[1] for w in words], dtype=np.float32)

    H._BUCKET_CACHE.clear()  # cold: sample probe misses -> vectorized-all
    b1, s1 = H._word_buckets_batch(words)
    assert np.array_equal(b1, want_b) and np.array_equal(s1, want_s)

    # warm: cache now holds every word -> full probe path
    b2, s2 = H._word_buckets_batch(words)
    assert np.array_equal(b2, want_b) and np.array_equal(s2, want_s)

    # mixed: half the vocabulary is new
    mixed = words[:1000] + [f"fresh{i}" for i in range(1000)]
    want_mb = np.array([H.word_bucket(w)[0] for w in mixed], dtype=np.int64)
    b3, _ = H._word_buckets_batch(mixed)
    assert np.array_equal(b3, want_mb)
