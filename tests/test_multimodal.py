"""Multimodal plumbing tests: schema, mapInPandas batch shape, deterministic
fake decode, honest NotImplementedError for the real decoder."""

import pytest

from eva_opentargets_spark.operators.multimodal import MEDIA, extract_features


def _media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake bytes"), "image/png", 4, 4, None),
        (2, "audio", bytearray(b"RIFF fake wav"), "audio/wav", None, None, 1200),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_fake_decode_deterministic(spark):
    out1 = {r.media_id: (r.n_bytes, r.content_sha, tuple(r.feature)) for r in extract_features(_media(spark)).collect()}
    out2 = {r.media_id: (r.n_bytes, r.content_sha, tuple(r.feature)) for r in extract_features(_media(spark)).collect()}
    assert out1 == out2
    assert out1[1][0] == 15  # byte length
    assert len(out1[1][2]) == 8  # feature dim


def test_real_decode_not_implemented(spark):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(_media(spark), fake=False).collect()
