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


def make_png(pixels, channels=3, filters=None):
    """Minimal valid 8-bit PNG (pure stdlib): `pixels` is rows of flat byte
    lists; each row is filtered with the corresponding PNG filter type so
    the decoder's unfilter paths are genuinely exercised."""
    import zlib

    height = len(pixels)
    width = len(pixels[0]) // channels
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    filters = filters or [0] * height

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = [0] * (width * channels)
    for row, ftype in zip(pixels, filters):
        raw.append(ftype)
        for i, x in enumerate(row):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                raw.append(x)
            elif ftype == 1:
                raw.append((x - a) & 255)
            elif ftype == 2:
                raw.append((x - b) & 255)
            elif ftype == 3:
                raw.append((x - (a + b) // 2) & 255)
            elif ftype == 4:
                raw.append((x - paeth(a, b, c)) & 255)
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_all_filters():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) must reconstruct
    the original raster: segment means equal the plain pixel means."""
    from eva_opentargets_spark.operators.multimodal import _png_features

    rows = [[(r * 31 + i * 7) % 256 for i in range(4 * 3)] for r in range(5)]
    flat = [x for row in rows for x in row]
    expected = []
    n = len(flat)
    for seg in range(8):
        chunk_ = flat[seg * n // 8 : (seg + 1) * n // 8]
        expected.append((sum(chunk_) / len(chunk_)) / 255.0 if chunk_ else 0.0)
    for filters in ([0] * 5, [0, 1, 2, 3, 4]):
        got = _png_features(make_png(rows, channels=3, filters=filters))
        assert got == pytest.approx(expected), f"filters={filters}"


def test_real_png_decode_gray_and_rgba():
    from eva_opentargets_spark.operators.multimodal import _png_features

    gray = [[100] * 6 for _ in range(3)]
    assert _png_features(make_png(gray, channels=1)) == pytest.approx([100 / 255.0] * 8)
    rgba = [[200] * (2 * 4) for _ in range(2)]
    assert _png_features(make_png(rgba, channels=4, filters=[0, 4])) == pytest.approx(
        [200 / 255.0] * 8
    )


def test_real_png_decode_via_spark(spark):
    """The PNG path through the real mapInPandas plumbing."""
    rows = [(7, "image", bytearray(make_png([[50] * 9 for _ in range(3)], channels=3,
                                            filters=[0, 2, 1])), "image/png", 3, 3, None)]
    media = spark.createDataFrame(rows, MEDIA)
    out = extract_features(media, fake=False).collect()
    assert len(out) == 1
    assert list(out[0].feature) == pytest.approx([50 / 255.0] * 8)


def make_adam7_png(pixels, channels=3):
    """Adam7-INTERLACED encoding of the same pixel grid (filter 0 on every
    pass scanline): pixels scattered into the 7 reduced images per the
    spec-8.2 grid — the exact inverse of the decoder's scatter-back."""
    import zlib

    height = len(pixels)
    width = len(pixels[0]) // channels
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in adam7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for py in range(ph):
            raw.append(0)  # filter None
            y = y0 + py * dy
            for px in range(pw):
                x = x0 + px * dx
                raw.extend(pixels[y][x * channels : (x + 1) * channels])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_adam7_reconstructs_identically_to_sequential():
    """Round-5: Adam7 decode is real — the same pixel grid encoded
    interlaced and non-interlaced must reconstruct to the identical raster
    (so identical features), on sizes that exercise partial passes."""
    from eva_opentargets_spark.operators.multimodal import _png_features

    for w, h, ch in [(9, 9, 3), (8, 8, 1), (5, 3, 4), (1, 1, 3), (2, 7, 2)]:
        pixels = [
            [((x * 31 + y * 17 + c * 7) % 256) for x in range(w) for c in range(ch)]
            for y in range(h)
        ]
        seq = _png_features(make_png(pixels, channels=ch))
        inter = _png_features(make_adam7_png(pixels, channels=ch))
        assert inter == pytest.approx(seq), f"{w}x{h}x{ch}"


def test_png_palette_still_not_implemented():
    """Palette PNGs stay an honest NotImplementedError, not a wrong
    answer (color type 3 needs the PLTE lookup we don't implement)."""
    import zlib

    from eva_opentargets_spark.operators.multimodal import _png_features

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color_type=3
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 6)) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        _png_features(png)


def _ppm(w, h, pixels):
    """pixels: list of (r,g,b) row-major."""
    return b"P6\n%d %d\n255\n" % (w, h) + b"".join(bytes(p) for p in pixels)


def test_resize_nearest_exact_pixels(spark):
    """4x4 -> 2x2 nearest-neighbor picks pixels (0,0),(0,2),(2,0),(2,2)."""
    from eva_opentargets_spark.operators.multimodal import resize_nearest

    pixels = [(16 * y + x, 0, 0) for y in range(4) for x in range(4)]
    media = spark.createDataFrame(
        [(1, "image", bytearray(_ppm(4, 4, pixels)), "image/x-ppm", 4, 4, None)],
        MEDIA,
    )
    out = resize_nearest(media, 2, 2).collect()[0]
    assert (out.width, out.height) == (2, 2)
    body = bytes(out.content)
    assert body.startswith(b"P6\n2 2\n255\n")
    raster = body[len(b"P6\n2 2\n255\n"):]
    reds = [raster[i] for i in range(0, 12, 3)]
    assert reds == [0, 2, 32, 34]  # source pixels (0,0) (0,2) (2,0) (2,2)


def test_resize_nearest_png_gray_expands_to_rgb(spark):
    """A 2x2 gray PNG resizes to a 1x1 RGB PPM whose channels replicate
    the selected gray value."""
    import struct
    import zlib

    from eva_opentargets_spark.operators.multimodal import resize_nearest

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray
    raw = bytes([0, 10, 20, 0, 30, 40])  # two filter-0 scanlines
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(7, "image", bytearray(png), "image/png", 2, 2, None)], MEDIA
    )
    out = resize_nearest(media, 1, 1).collect()[0]
    raster = bytes(out.content)[len(b"P6\n1 1\n255\n"):]
    assert list(raster) == [10, 10, 10]  # top-left gray, replicated to RGB


def test_sample_frames_every_kth(spark):
    """A 5-frame concatenated-PPM stream sampled every 2 frames yields
    frames 0, 2, 4 with per-frame features."""
    from eva_opentargets_spark.operators.multimodal import sample_frames

    frames = b"".join(
        _ppm(4, 2, [(v, v, v)] * 8) for v in (10, 60, 110, 160, 210)
    )
    media = spark.createDataFrame(
        [(3, "video", bytearray(frames), "video/x-ppm-stream", 4, 2, 5)], MEDIA
    )
    out = sorted(
        (r.frame_idx, round(r.feature[0], 4)) for r in sample_frames(media, every_k=2).collect()
    )
    assert [i for i, _ in out] == [0, 2, 4]
    assert [v for _, v in out] == [round(10 / 255, 4), round(110 / 255, 4), round(210 / 255, 4)]


def test_sample_frames_truncated_stream_is_honest(spark):
    from eva_opentargets_spark.operators.multimodal import sample_frames

    bad = _ppm(2, 2, [(1, 1, 1)] * 4)[:-3]  # truncated raster
    media = spark.createDataFrame(
        [(4, "video", bytearray(bad), "video/x-ppm-stream", 2, 2, 1)], MEDIA
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="truncated"):
        sample_frames(media, every_k=1).collect()
