"""Oracle-checked multimodal stats: executor-side synth encode → REAL
decode → stats, cross-checked against direct numpy computation (the same
arithmetic the driver's DuckDB oracle runs)."""

import numpy as np
import pytest

from osmgraphing_spark.functions import multimodal as mm


IDS = [0, 1, 2, 5, 7, 12, 123, 10_000_000_001]


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.createDataFrame([(i,) for i in IDS], "doc_id long")


def _expected_image(i):
    w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * (i % 7 + 1)) % 256, (yy * (i % 11 + 2)) % 256,
         (i + yy * w + xx) % 256],
        axis=-1,
    ).astype(np.uint8)
    m = img.astype(np.float64).mean(axis=(0, 1))
    return w, h, w * h, round(m[0], 6), round(m[1], 6), round(m[2], 6)


def test_image_stats_match_numpy_oracle(ids_df):
    rows = {
        r["doc_id"]: r
        for r in mm.image_stats(
            mm.synth_images_from_ids(ids_df), id_col="doc_id"
        ).collect()
    }
    assert set(rows) == set(IDS)
    for i in IDS:
        w, h, n_px, mr, mg, mb = _expected_image(i)
        r = rows[i]
        assert (r["width"], r["height"], r["n_px"]) == (w, h, n_px)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)


def test_image_stats_read_header_not_metadata(spark):
    # a hand-built PPM whose meta lies about the dims: stats must report
    # the decoded raster shape, proving the header parse ran
    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    media = spark.createDataFrame(
        [(42, "image", bytearray(mm.encode_ppm(img)),
          {"width": 999, "height": 999, "channels": 3, "sample_rate": None,
           "n_frames": None, "format": "ppm"})],
        mm.MEDIA_SCHEMA,
    )
    r = mm.image_stats(media).collect()[0]
    assert (r["width"], r["height"]) == (3, 5)
    assert r["mean_r"] == round(float(img[:, :, 0].mean()), 6)


def test_audio_stats_match_numpy_oracle(ids_df):
    rows = {
        r["doc_id"]: r
        for r in mm.audio_stats(
            mm.synth_audio_from_ids(ids_df), id_col="doc_id"
        ).collect()
    }
    t = np.arange(4000, dtype=np.int64)
    for i in IDS:
        pcm = (i * 7 + t * 13) % 4096 - 2048
        x = pcm / 32768.0
        r = rows[i]
        assert r["rms"] == round(float(np.sqrt(np.mean(x * x))), 6)
        zc = np.mean(np.abs(np.diff(pcm < 0)))
        assert r["zcr"] == round(float(zc), 6)
        assert r["duration_s"] == 0.25


def test_wav_pcm16_roundtrip_exact():
    pcm = np.array([-2048, -1, 0, 1, 2047, 32767, -32768], dtype="<i2")
    x, rate = mm._decode_audio_impl(mm.encode_wav_pcm16(pcm, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(
        np.round(x[:, 0] * 32768.0).astype("<i2"), pcm
    )
