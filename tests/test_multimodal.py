"""Multimodal tests: schema, mapInPandas batch shape, deterministic fake
decode, REAL dependency-free WAV/PPM decode, honest NotImplementedError for
formats that need a codec library."""

import math
import struct

import pytest

from eva_opentargets_spark.operators.multimodal import (
    MEDIA,
    _ppm_features,
    _wav_features,
    extract_features,
)


def make_wav(samples, rate=8000, channels=1):
    """Minimal valid 16-bit PCM WAV (pure stdlib)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_ppm(width, height, value=100, maxval=255):
    header = f"P6\n# test comment\n{width} {height}\n{maxval}\n".encode()
    return header + bytes([value]) * (width * height * 3)


def _media(spark):
    rows = [
        (1, "audio", bytearray(make_wav([1000] * 800)), "audio/wav", None, None, 100),
        (2, "image", bytearray(make_ppm(4, 4, value=100)), "image/x-portable-pixmap", 4, 4, None),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_fake_decode_deterministic(spark):
    out1 = {r.media_id: (r.n_bytes, r.content_sha, tuple(r.feature)) for r in extract_features(_media(spark)).collect()}
    out2 = {r.media_id: (r.n_bytes, r.content_sha, tuple(r.feature)) for r in extract_features(_media(spark)).collect()}
    assert out1 == out2
    assert len(out1[1][2]) == 8  # feature dim


def test_real_wav_decode(spark):
    """Constant-amplitude PCM -> every segment RMS == amplitude/32768."""
    out = {r.media_id: list(r.feature) for r in extract_features(_media(spark), fake=False).collect()}
    for v in out[1]:
        assert math.isclose(v, 1000 / 32768, rel_tol=1e-5)
    assert len(out[1]) == 8


def test_real_ppm_decode(spark):
    """Constant-value raster -> every segment mean == value/maxval; the
    header comment is honored."""
    out = {r.media_id: list(r.feature) for r in extract_features(_media(spark), fake=False).collect()}
    for v in out[2]:
        assert math.isclose(v, 100 / 255, rel_tol=1e-5)


def test_wav_segments_differ():
    """Two half-streams of different amplitude land in different segments."""
    wav = make_wav([2000] * 400 + [500] * 400)
    feats = _wav_features(wav, dim=2)
    assert math.isclose(feats[0], 2000 / 32768, rel_tol=1e-5)
    assert math.isclose(feats[1], 500 / 32768, rel_tol=1e-5)


def test_ppm_maxval_scaling():
    ppm = make_ppm(2, 2, value=50, maxval=100)
    feats = _ppm_features(ppm, dim=4)
    for v in feats:
        assert math.isclose(v, 0.5, rel_tol=1e-6)


def test_real_decode_not_implemented_for_coded_formats(spark):
    rows = [(3, "image", bytearray(b"\x89PNG fake bytes"), "image/png", 4, 4, None)]
    df = spark.createDataFrame(rows, MEDIA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(df, fake=False).collect()
