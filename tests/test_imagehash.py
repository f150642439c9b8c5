"""dHash image fingerprint + hamming-bucketed near-dup tests.

Covers: exact-integer luma/block-mean/gradient arithmetic against
hand-computed values, decode→hash through the REAL PNG path,
pigeonhole completeness of the 4-chunk candidate join vs a brute-force
all-pairs reference, bucket capping with surfaced drops, and the
invariance properties (re-encode stability, partitioning).
"""

import itertools

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.imagehash import (
    block_means,
    dhash64,
    hamming_expr,
    image_dhash,
    luma,
    neardup_dropped_buckets,
    neardup_image_pairs,
)


def _ref_dhash(px):
    """Independent pure-Python reference (no numpy vector tricks)."""
    h, w = px.shape[0], px.shape[1]
    if px.ndim == 3 and px.shape[2] >= 3:
        g = [
            [
                (77 * int(px[y][x][0]) + 150 * int(px[y][x][1]) + 29 * int(px[y][x][2]))
                >> 8
                for x in range(w)
            ]
            for y in range(h)
        ]
    else:
        g = [[int(px[y][x] if px.ndim == 2 else px[y][x][0]) for x in range(w)] for y in range(h)]
    rb = [(r * h) // 8 for r in range(8)] + [h]
    cb = [(c * w) // 9 for c in range(9)] + [w]
    grid = [
        [
            sum(
                g[y][x]
                for y in range(rb[r], rb[r + 1])
                for x in range(cb[c], cb[c + 1])
            )
            // ((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]))
            for c in range(9)
        ]
        for r in range(8)
    ]
    hi = lo = 0
    for r in range(8):
        for c in range(8):
            if grid[r][c + 1] > grid[r][c]:
                bit = r * 8 + c
                if bit < 32:
                    lo |= 1 << bit
                else:
                    hi |= 1 << (bit - 32)
    return hi, lo


def _img(seed, h=16, w=18, pert=None):
    """Deterministic RGB test image; pert=(cy, cx, delta) bumps one
    2x2 grid cell."""
    flat = (seed * 53 + np.arange(h * w * 3)) % 256
    px = flat.astype(np.uint8).reshape(h, w, 3)
    if pert is not None:
        cy, cx, d = pert
        region = px[2 * cy : 2 * cy + 2, 2 * cx : 2 * cx + 2].astype(np.int64)
        px[2 * cy : 2 * cy + 2, 2 * cx : 2 * cx + 2] = (
            (region + d) % 256
        ).astype(np.uint8)
    return px


def test_luma_equal_channels_identity():
    px = np.full((4, 4, 3), 137, np.uint8)
    assert (luma(px) == 137).all()  # weights sum to 256 exactly


def test_luma_gray_passthrough():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert (luma(g) == g.astype(np.int64)).all()


def test_block_means_exact_small():
    gray = np.arange(4 * 9, dtype=np.int64).reshape(4, 9) * 7
    bm = block_means(gray, 2, 3)
    # cell (0,0): rows 0-1, cols 0-2 → mean of 6 values, floor
    vals = gray[0:2, 0:3]
    assert bm[0, 0] == vals.sum() // 6


def test_block_means_uneven_boundaries():
    # h=10 over 8 rows: row blocks sized by floor boundaries (i*10//8)
    gray = (np.arange(10 * 9, dtype=np.int64) % 251).reshape(10, 9)
    bm = block_means(gray, 8, 9)
    rb = [(r * 10) // 8 for r in range(8)] + [10]
    for r in range(8):
        seg = gray[rb[r] : rb[r + 1], 0:1]
        assert bm[r, 0] == seg.sum() // seg.size


def test_dhash_matches_pure_python_reference():
    for seed in (0, 7, 123, 255):
        px = _img(seed)
        assert dhash64(px) == _ref_dhash(px)


def test_dhash_halves_nonnegative_32bit():
    for seed in range(20):
        hi, lo = dhash64(_img(seed))
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_dhash_stable_under_png_roundtrip():
    from pg_pb3_ld_spark.functions.multimodal import (
        decode_image_pixels,
        encode_png,
    )

    px = _img(42)
    assert dhash64(decode_image_pixels(encode_png(px))) == dhash64(px)


def test_small_perturbation_small_distance():
    base = dhash64(_img(5))
    pert = dhash64(_img(5, pert=(3, 4, 40)))
    d = bin((base[0] ^ pert[0])).count("1") + bin(base[1] ^ pert[1]).count("1")
    # one bumped grid cell touches at most its two horizontal gradients
    assert 0 <= d <= 4


def _brute_pairs(hashes, max_h):
    out = set()
    for (ia, (ahi, alo)), (ib, (bhi, blo)) in itertools.combinations(
        sorted(hashes.items()), 2
    ):
        d = bin(ahi ^ bhi).count("1") + bin(alo ^ blo).count("1")
        if d <= max_h:
            out.add((ia, ib, d))
    return out


def test_pigeonhole_completeness_vs_bruteforce(spark):
    # hashes engineered across the spectrum: clones, 1-3 bit flips,
    # far-apart randoms (seeded)
    rng = np.random.RandomState(11)
    hashes = {}
    mid = 0
    for _ in range(12):
        hi = int(rng.randint(0, 2**32, dtype=np.uint32))
        lo = int(rng.randint(0, 2**32, dtype=np.uint32))
        hashes[mid] = (hi, lo)
        mid += 1
        for _ in range(rng.randint(0, 3)):
            flips = rng.randint(0, 64, size=rng.randint(0, 4))
            fhi, flo = hi, lo
            for b in flips:
                if b < 32:
                    flo ^= 1 << int(b)
                else:
                    fhi ^= 1 << int(b - 32)
            hashes[mid] = (fhi, flo)
            mid += 1
    df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in hashes.items()],
        "media_id long, hash_hi long, hash_lo long",
    )
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in neardup_image_pairs(df, max_hamming=3).collect()
    }
    assert got == _brute_pairs(hashes, 3)


def test_max_hamming_above_pigeonhole_guarantee_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 0)], "media_id long, hash_hi long, hash_lo long"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        neardup_image_pairs(df, max_hamming=4)


def test_bucket_cap_drops_flat_cluster_and_surfaces_it(spark):
    # 20 all-zero hashes (flat images) + one true near pair
    rows = [(i, 0, 0) for i in range(20)] + [(100, 3, 5), (101, 3, 4)]
    df = spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )
    pairs = neardup_image_pairs(df, max_bucket_size=10).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(100, 101)}
    dropped = neardup_dropped_buckets(df, max_bucket_size=10).collect()
    # every chunk of the degenerate hash; chunks 1 and 3 (the zero
    # high bits of the two real hashes) also absorb those 2 rows
    assert len(dropped) == 4
    assert sorted(r.bucket_size for r in dropped) == [20, 20, 22, 22]


def test_image_dhash_real_decode_and_error_capture(spark):
    from pg_pb3_ld_spark.functions.multimodal import encode_png

    good = encode_png(_img(9))
    rows = [(1, bytearray(good)), (2, bytearray(b"not an image")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {r.media_id: r for r in image_dhash(df).collect()}
    hi, lo = dhash64(_img(9))
    assert (out[1].hash_hi, out[1].hash_lo) == (hi, lo)
    assert out[1].error is None
    assert out[2].error is not None and out[3].error is not None


def test_hamming_expr_matches_python(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0x0F, 0xF0, 0x0E, 0xF1)], "ahi long, alo long, bhi long, blo long"
    )
    d = df.select(
        hamming_expr(F.col("ahi"), F.col("alo"), F.col("bhi"), F.col("blo")).alias("d")
    ).first().d
    assert d == bin(0x0F ^ 0x0E).count("1") + bin(0xF0 ^ 0xF1).count("1")


def test_partition_invariance(spark):
    from pg_pb3_ld_spark.functions.multimodal import encode_png

    rows = [(i, bytearray(encode_png(_img(i % 4)))) for i in range(16)]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    a = sorted(
        (r.media_id, r.hash_hi, r.hash_lo)
        for r in image_dhash(df.repartition(1)).collect()
    )
    b = sorted(
        (r.media_id, r.hash_hi, r.hash_lo)
        for r in image_dhash(df.repartition(13)).collect()
    )
    assert a == b
