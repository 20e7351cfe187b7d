"""Baseline JPEG codec (functions/jpeg.py): spec-math units, roundtrips
at flat quantization, 4:2:0, restart-free streams, and the Spark stats
pipeline integration."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.functions import jpeg
from osmgraphing_spark.functions import multimodal as mm


def test_dct_idct_inverse_pair():
    rng = np.random.default_rng(0)
    b = rng.uniform(-128, 127, size=(8, 8))
    assert np.allclose(jpeg._idct2(jpeg._dct2(b)), b, atol=1e-9)
    # DC basis: constant block → single coefficient
    c = jpeg._dct2(np.full((8, 8), 10.0))
    assert c[0, 0] == pytest.approx(80.0)
    assert np.abs(c).sum() == pytest.approx(80.0)


def test_zigzag_is_a_permutation():
    assert sorted(jpeg.ZIGZAG.tolist()) == list(range(64))
    # spec anchors: start of the diagonal walk
    assert jpeg.ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_huffman_canonical_codes():
    table = jpeg._build_huffman(*jpeg._DC_LUMA)
    # Annex K: DC luma category 0 is the 2-bit code 00
    assert table[(2, 0)] == 0
    # prefix-freeness: no code is a prefix of another
    codes = [(ln, code) for (ln, code) in table]
    as_bits = {format(code, f"0{ln}b") for ln, code in codes}
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)


def test_roundtrip_444_noise_and_uniform():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    # flat quant=1: error budget is DCT/quant rounding + YCbCr float trip
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4
    u = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(jpeg.decode_jpeg(jpeg.encode_jpeg(u)), u)


def test_roundtrip_grayscale():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(g))
    assert got.shape == (9, 13, 3)
    assert np.abs(got[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_roundtrip_420_subsampled():
    """2×2-tile-constant image: chroma subsampling is lossless there, so
    the full 4:2:0 path (MCU interleave, upsampling) roundtrips within
    the rounding budget."""
    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 2, axis=0), 2, axis=1)
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsample=True))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_non_baseline_rejected():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(jpeg.encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # claim progressive
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"nope")


def test_jpeg_flows_through_image_stats(spark):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(11, "image", bytearray(jpeg.encode_jpeg(img)),
          {"width": 8, "height": 8, "channels": 3, "sample_rate": None,
           "n_frames": None, "format": "jpeg"})],
        mm.MEDIA_SCHEMA,
    )
    row = mm.image_stats(df).collect()[0]
    assert row["width"] == 8 and row["height"] == 8
    assert row["mean_r"] == pytest.approx(float(img[:, :, 0].mean()), abs=4.0)
