"""Multimodal: REAL pure-python BMP/WAV codecs + fake-codec plumbing via
mapInPandas."""

from __future__ import annotations

import struct

import pytest

from connemara_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    bmp_fixture,
    bmp_stride,
    decimate_audio,
    decode_audio,
    decode_bmp,
    decode_images,
    decode_wav,
    encode_bmp,
    encode_fake_media,
    encode_wav,
    resize_images,
    sample_frames,
    wav_fixture,
)


# ---------------------------------------------------------------------------
# Pure-python codec units (no Spark)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_with_stride_padding():
    # width 3 → row 9 bytes → stride 12: padding must be added and stripped
    px = bytes(range(3 * 2 * 3))
    raw = encode_bmp(3, 2, px)
    assert bmp_stride(3) == 12
    assert len(raw) == 54 + 12 * 2
    w, h, decoded = decode_bmp(raw)
    assert (w, h) == (3, 2)
    assert decoded == px  # bottom-up storage undone, padding removed


def test_bmp_top_down_negative_height():
    px = bytes(range(3 * 2 * 3))
    raw = bytearray(encode_bmp(3, 2, px))
    # flip to top-down: negate height, reorder rows accordingly
    struct.pack_into("<i", raw, 22, -2)
    stride = bmp_stride(3)
    r0 = bytes(raw[54 : 54 + stride])
    r1 = bytes(raw[54 + stride : 54 + 2 * stride])
    raw[54 : 54 + stride] = r1
    raw[54 + stride : 54 + 2 * stride] = r0
    _, h, decoded = decode_bmp(bytes(raw))
    assert h == 2 and decoded == px


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    raw = bytearray(encode_bmp(2, 2, bytes(2 * 2 * 3)))
    struct.pack_into("<H", raw, 28, 8)  # 8-bpp → needs palette support
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(raw))


def test_wav_roundtrip_and_chunk_order():
    samples = [0, 1000, -1000, 32767, -32768, 7]
    raw = encode_wav(8000, samples)
    rate, ch, out = decode_wav(raw)
    assert (rate, ch, out) == (8000, 1, samples)
    # tolerate an unknown odd-sized chunk before fmt/data (word-aligned skip)
    chunks = raw[12:]  # fmt + data chunks
    padded = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 9 + 1 + len(chunks))
        + b"WAVE"
        + b"LIST" + struct.pack("<I", 9) + b"x" * 9 + b"\x00"
        + chunks
    )
    rate2, ch2, out2 = decode_wav(padded)
    assert out2 == samples


def test_wav_rejects_non_pcm():
    raw = bytearray(encode_wav(8000, [1, 2, 3]))
    struct.pack_into("<H", raw, 20, 85)  # mp3 format tag inside fmt chunk
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))


# ---------------------------------------------------------------------------
# Spark plumbing over the real codecs
# ---------------------------------------------------------------------------


def test_real_bmp_decode_features(spark):
    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = {r["media_id"]: r for r in decode_images(bmp_fixture(ids), codec="bmp").collect()}
    assert len(out) == 20
    r7 = out[7]
    w, h = 3 + 7 % 5, 2 + 7 % 4
    assert (r7["width"], r7["height"]) == (w, h)
    expected = [(7 * 31 + y * 7 + x * 3 + c * 11) % 256 for y in range(h) for x in range(w) for c in range(3)]
    assert r7["checksum"] == sum(expected) % (1 << 31)
    assert r7["mean_byte"] == pytest.approx(sum(expected) / len(expected))
    assert r7["n_bytes"] == 54 + bmp_stride(w) * h


def test_real_bmp_resize_nearest_neighbor(spark):
    ids = spark.createDataFrame([(4,)], "doc_id long")
    resized = resize_images(bmp_fixture(ids), width=2, height=2, codec="bmp")
    raw = bytes(resized.collect()[0]["payload"])
    w0, h0 = 3 + 4 % 5, 2 + 4 % 4
    w, h, px = decode_bmp(raw)
    assert (w, h) == (2, 2)
    # nearest-neighbor: out(x,y) = src(x*w0//2, y*h0//2)
    src = bytes((4 * 31 + y * 7 + x * 3 + c * 11) % 256 for y in range(h0) for x in range(w0) for c in range(3))
    for y in range(2):
        for x in range(2):
            sx, sy = x * w0 // 2, y * h0 // 2
            assert px[(y * 2 + x) * 3 : (y * 2 + x) * 3 + 3] == src[(sy * w0 + sx) * 3 : (sy * w0 + sx) * 3 + 3]


def test_real_wav_decimation(spark):
    ids = spark.createDataFrame([(7,)], "doc_id long")
    out = decimate_audio(wav_fixture(ids), factor=4).collect()
    rate, ch, samples = decode_wav(bytes(out[0]["payload"]))
    n0 = 50 + 7 % 30
    expected = [((7 * 13 + i * 7) % 2048) - 1024 for i in range(0, n0, 4)]
    assert (rate, ch) == (2000, 1)
    assert samples == expected
    with pytest.raises(ValueError):
        decimate_audio(wav_fixture(ids), factor=0)


def test_wav_decimation_quarantines_multichannel(spark):
    """A stereo row is dropped (quarantined) like a corrupt payload — one
    poison row must not sink the job — while mono rows still decode."""
    from connemara_spark.operators.multimodal import encode_wav

    stereo = encode_wav(4000, [1, 2, 3, 4, 5, 6], channels=2)
    mono = encode_wav(4000, [10, 20, 30, 40], channels=1)
    df = spark.createDataFrame([(1, bytearray(stereo)), (2, bytearray(mono))],
                               "media_id long, payload binary")
    out = decimate_audio(df, factor=2).collect()
    assert [r["media_id"] for r in out] == [2]
    rate, ch, samples = decode_wav(bytes(out[0]["payload"]))
    assert (rate, ch, samples) == (2000, 1, [10, 30])


def test_real_wav_decode_features(spark):
    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = {r["media_id"]: r for r in decode_audio(wav_fixture(ids), codec="wav").collect()}
    assert len(out) == 20
    r9 = out[9]
    n = 50 + 9 % 30
    samples = [((9 * 13 + i * 7) % 2048) - 1024 for i in range(n)]
    assert r9["n_samples"] == n
    assert r9["sample_rate"] == 8000 and r9["channels"] == 1
    assert r9["duration_ms"] == n * 1000 // 8000
    assert r9["checksum"] == sum(samples)
    assert r9["mean_abs"] == pytest.approx(sum(abs(s) for s in samples) / n)


def test_undecodable_payloads_are_dropped(spark):
    df = spark.createDataFrame([(1, b"not-a-bmp"), (2, b"RIFFgarbage")], "media_id long, payload binary")
    assert decode_images(df, codec="bmp").count() == 0
    assert decode_audio(df, codec="wav").count() == 0


def test_unavailable_codecs_raise(spark):
    # bmp/png/jpeg are real codecs; webp/mp3 remain library-bound
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        decode_images(df, codec="webp")
    with pytest.raises(NotImplementedError):
        decode_audio(df, codec="mp3")
    with pytest.raises(NotImplementedError):
        resize_images(df, width=2, height=2, codec="webp")


# ---------------------------------------------------------------------------
# Fake-codec plumbing (formats that genuinely need external libraries)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(10):
        body = bytes([(i * 7 + j) % 256 for j in range(100 + i)])
        payload = encode_fake_media(i, "image", 640 + i, 480, 0, body)
        rows.append((i, "image", payload, ("image/fake", 640 + i, 480, None)))
    rows.append((100, "video", encode_fake_media(100, "video", 1920, 1080, 5500, b"vv"), ("video/fake", 1920, 1080, 5500)))
    rows.append((101, "image", b"GARBAGE-not-decodable", ("image/fake", 0, 0, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_decode_features(media):
    out = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    assert 101 not in out  # undecodable dropped
    assert out[0]["width"] == 640 and out[0]["height"] == 480
    assert out[9]["width"] == 649
    assert out[0]["n_bytes"] == 16 + 100
    assert 0 <= out[0]["mean_byte"] <= 255


def test_fake_resize_rewrites_header(media):
    resized = resize_images(media, width=32, height=32, fake=True)
    feats = {r["media_id"]: r for r in decode_images(resized, fake=True).collect()}
    assert all(r["width"] == 32 and r["height"] == 32 for r in feats.values())
    # payload body preserved
    orig = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    assert feats[3]["checksum"] == orig[3]["checksum"]


def test_frame_sampling(media):
    frames = sample_frames(media, every_ms=1000, fake=True).collect()
    assert {r["frame_ms"] for r in frames} == {0, 1000, 2000, 3000, 4000, 5000}
    assert all(r["media_id"] == 100 for r in frames)


def test_y4m_roundtrip_mono_and_420():
    from connemara_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = [bytes(range(12)), bytes(range(12, 24))]
    raw = encode_y4m(4, 3, frames, fps=(30, 1), colorspace="mono")
    w, h, num, den, got = decode_y4m(raw)
    assert (w, h, num, den) == (4, 3, 30, 1)
    assert got == frames

    # C420: Y(4x2) + U(2x1) + V(2x1) = 12 bytes per frame
    f420 = [bytes(range(12))]
    raw420 = encode_y4m(4, 2, f420, colorspace="420")
    w, h, num, den, got = decode_y4m(raw420)
    assert (w, h) == (4, 2) and got == f420


def test_y4m_rejects_malformed():
    from connemara_spark.operators.multimodal import decode_y4m, encode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"NOTY4M W2 H2\n")
    raw = encode_y4m(2, 2, [bytes(4)])
    with pytest.raises(ValueError):
        decode_y4m(raw[:-2])  # truncated frame
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 F10:1 C444\n" + b"FRAME\n" + bytes(12))
    with pytest.raises(ValueError):
        encode_y4m(2, 2, [bytes(3)])  # wrong frame size


def test_real_y4m_frame_sampling(spark):
    from connemara_spark.operators.multimodal import sample_video_frames, y4m_fixture

    ids = spark.createDataFrame([(5,)], "doc_id long")
    out = sorted(
        (r["frame_idx"], r["t_ms"], r["mean_luma"]) for r in
        sample_video_frames(y4m_fixture(ids), every_ms=200, n_partitions=1).collect()
    )
    # id=5: w=4, h=3, nf=4 frames @10fps -> 400ms; grid 0,200 -> frames 0,2
    def mean_luma(f):
        vals = [(5 * 17 + f * 5 + y * 3 + x) % 256 for y in range(3) for x in range(4)]
        return sum(vals) / len(vals)

    assert out == [(0, 0, mean_luma(0)), (2, 200, mean_luma(2))]


def test_y4m_unsupported_codec_raises(spark):
    from connemara_spark.operators.multimodal import sample_video_frames, y4m_fixture

    ids = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(NotImplementedError):
        sample_video_frames(y4m_fixture(ids), codec="h264")


# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib — real DEFLATE, real scanline filters)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_color_types():
    from connemara_spark.operators.multimodal import decode_png, encode_png

    for ct, bpp in [(0, 1), (2, 3), (6, 4)]:
        for w, h in [(1, 5), (3, 7), (8, 6)]:  # h >= 5 exercises filters 0-4
            px = bytes(
                (x * 5 + y * 11 + c * 7 + ct) % 256
                for y in range(h)
                for x in range(w)
                for c in range(bpp)
            )
            assert decode_png(encode_png(w, h, px, color_type=ct)) == (w, h, bpp, px)


def test_png_crc_corruption_rejected():
    from connemara_spark.operators.multimodal import decode_png, encode_png

    enc = bytearray(encode_png(3, 5, bytes(45), color_type=2))
    enc[20] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(enc))


def test_png_interlace_and_palette_unsupported():
    import struct
    import zlib

    from connemara_spark.operators.multimodal import decode_png

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    for depth, ct, interlace in [(8, 2, 1), (8, 3, 0), (16, 2, 0)]:
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ct, 0, 0, interlace)
        raw = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00" * 4)) + chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            decode_png(raw)


def test_real_png_decode_features(spark):
    from connemara_spark.operators.multimodal import decode_images, png_fixture

    ids = spark.createDataFrame([(6,)], "doc_id long")
    row = decode_images(png_fixture(ids), codec="png", n_partitions=1).collect()[0]
    # id=6: w=3+6%4=5, h=5+6%3=5; v = (6*23 + y*11 + x*5 + c*7) % 256
    vals = [(138 + y * 11 + x * 5 + c * 7) % 256 for y in range(5) for x in range(5) for c in range(3)]
    assert (row["width"], row["height"]) == (5, 5)
    assert row["mean_byte"] == sum(vals) / len(vals)
    assert row["checksum"] == sum(vals) % (1 << 31)


def test_real_png_resize_nearest_neighbor(spark):
    from connemara_spark.operators.multimodal import (
        decode_images,
        png_fixture,
        resize_images,
    )

    ids = spark.createDataFrame([(2,)], "doc_id long")
    resized = resize_images(png_fixture(ids), width=2, height=2, codec="png")
    row = decode_images(resized, codec="png", n_partitions=1).collect()[0]
    # id=2: w=5, h=7; NN map sy=y*7//2, sx=x*5//2
    vals = [
        (2 * 23 + (y * 7 // 2) * 11 + (x * 5 // 2) * 5 + c * 7) % 256
        for y in range(2)
        for x in range(2)
        for c in range(3)
    ]
    assert (row["width"], row["height"]) == (2, 2)
    assert row["checksum"] == sum(vals) % (1 << 31)


def test_png_image_stats_grayscale_and_rgba(spark):
    import pandas as pd

    from connemara_spark.operators.multimodal import encode_png, image_stats_features

    gray = encode_png(4, 5, bytes(range(20)), color_type=0)
    rgba = encode_png(2, 5, bytes(range(40)), color_type=6)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [gray, rgba]})
    )
    rows = {r["media_id"]: r for r in image_stats_features(df, codec="png", n_partitions=1).collect()}
    # grayscale: "green" falls back to the single channel
    g = list(range(20))
    assert rows[1]["mean_g"] == sum(g) / 20
    assert rows[1]["dyn_range"] == 19
    # RGBA: channel index 1 of each 4-byte pixel
    g2 = list(range(40))[1::4]
    assert rows[2]["mean_g"] == sum(g2) / len(g2)


# ---------------------------------------------------------------------------
# GIF codec (real LZW both directions)
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrip_including_table_reset():
    import random

    from connemara_spark.operators.multimodal import _lzw_compress, _lzw_decompress

    rng = random.Random(1)
    cases = [
        bytes(rng.randrange(256) for _ in range(10000)),  # forces table reset
        b"abc" * 5000,                                    # long repeats (KwKwK)
        bytes(range(256)) * 32,
        b"",
        b"\x00",
    ]
    for data in cases:
        assert _lzw_decompress(_lzw_compress(data, 8), 8) == data
    small = bytes(rng.randrange(4) for _ in range(5000))
    assert _lzw_decompress(_lzw_compress(small, 2), 2) == small


def test_gif_roundtrip_animated():
    from connemara_spark.operators.multimodal import decode_gif, encode_gif

    pal = bytes(c for i in range(256) for c in (i, (i * 3) % 256, (i * 7) % 256))
    frames = [bytes((f * 5 + i) % 256 for i in range(12)) for f in range(4)]
    w, h, p, fr = decode_gif(encode_gif(4, 3, frames, pal, delay_cs=7))
    assert (w, h) == (4, 3) and p == pal
    assert [d for d, _ in fr] == [7] * 4
    assert [x for _, x in fr] == frames


def test_gif_unsupported_features_raise():
    import struct

    from connemara_spark.operators.multimodal import decode_gif, encode_gif

    pal = bytes(768)
    enc = bytearray(encode_gif(2, 2, [bytes(4)], pal))
    # flip the interlace bit in the image descriptor flags byte
    idx = enc.index(0x2C, 13 + 768)
    enc[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(enc))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_gif_frame_sampling_hand_checked(spark):
    from connemara_spark.operators.multimodal import gif_fixture, sample_video_frames

    ids = spark.createDataFrame([(5,)], "doc_id long")
    out = sorted(
        (r["frame_idx"], r["t_ms"], r["mean_luma"])
        for r in sample_video_frames(gif_fixture(ids), every_ms=200, codec="gif", n_partitions=1).collect()
    )
    # id=5: w=4, h=3, nf=4 frames @100ms -> 400ms; grid 0,200 -> frames 0,2;
    # palette red channel == index, so mean over the index formula
    def mean_red(f):
        vals = [(5 * 17 + f * 5 + y * 3 + x) % 256 for y in range(3) for x in range(4)]
        return sum(vals) / len(vals)

    assert out == [(0, 0, mean_red(0)), (2, 200, mean_red(2))]


# ---------------------------------------------------------------------------
# G.711 mu-law: the codec that fits IN Catalyst
# ---------------------------------------------------------------------------


def test_mulaw_reference_properties():
    from connemara_spark.operators.multimodal import mulaw_to_pcm

    vals = [mulaw_to_pcm(u) for u in range(256)]
    # symmetric code: toggling the (complemented) sign bit negates the value
    for u in range(256):
        assert mulaw_to_pcm(u) == -mulaw_to_pcm(u ^ 0x80)
    # 0xFF (and its sign mirror 0x7F) encode 0; extremes reach the
    # standard 16-bit-scaled G.711 range +/-32124 (0x7D7C)
    assert mulaw_to_pcm(0xFF) == 0 and mulaw_to_pcm(0x7F) == 0
    assert max(vals) == 32124 and min(vals) == -32124


def test_mulaw_native_expr_matches_reference(spark):
    import pandas as pd

    from connemara_spark.operators.multimodal import (
        encode_wav_mulaw,
        mulaw_to_pcm,
        mulaw_wav_samples_expr,
    )

    payload = bytes(range(256))  # every mu-law code point
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2],
            "payload": [encode_wav_mulaw(8000, payload), b"not a wav"],
        })
    )
    rows = {
        r["media_id"]: r["s"]
        for r in df.select("media_id", mulaw_wav_samples_expr("payload").alias("s")).collect()
    }
    assert rows[1] == [mulaw_to_pcm(b) for b in payload]
    assert rows[2] is None  # layout guard: non-RIFF/non-mu-law -> NULL


def test_mulaw_query_is_pure_catalyst(spark):
    from connemara_spark import plans
    from connemara_spark.operators.multimodal import mulaw_wav_samples_expr

    # the decode itself (fixture generation aside) must carry no Python:
    # apply the expression to a static binary column and assert the plan
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    out = df.select(mulaw_wav_samples_expr("payload").alias("s"))
    plans.assert_no_python_udf(out)


def test_alaw_native_expr_matches_reference(spark):
    import pandas as pd

    from connemara_spark.operators.multimodal import (
        alaw_to_pcm,
        alaw_wav_samples_expr,
        encode_wav_alaw,
    )

    payload = bytes(range(256))  # every A-law code point
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [encode_wav_alaw(8000, payload), b"x"]})
    )
    rows = {
        r["media_id"]: r["s"]
        for r in df.select("media_id", alaw_wav_samples_expr("payload").alias("s")).collect()
    }
    assert rows[1] == [alaw_to_pcm(b) for b in payload]
    assert rows[2] is None
    # sign symmetry + range: toggling the xored sign bit negates; extremes
    # reach the standard +/-(0xFFF << 3) = 32640... A-law max is 32256
    vals = [alaw_to_pcm(b) for b in payload]
    for a in range(256):
        assert alaw_to_pcm(a) == -alaw_to_pcm(a ^ 0x80)
    assert max(vals) == -min(vals)


def test_python_wav_path_decodes_g711_formats():
    """The general (any chunk layout) python path expands G.711 formats to
    linear PCM — cross-checked against the native-expression decoders'
    reference tables."""
    from connemara_spark.operators.multimodal import (
        alaw_to_pcm,
        decode_wav,
        encode_wav_alaw,
        encode_wav_mulaw,
        mulaw_to_pcm,
    )

    rate, ch, s = decode_wav(encode_wav_mulaw(8000, bytes(range(256))))
    assert (rate, ch) == (8000, 1) and s == [mulaw_to_pcm(b) for b in range(256)]
    rate, ch, s = decode_wav(encode_wav_alaw(16000, bytes(range(256))))
    assert (rate, ch) == (16000, 1) and s == [alaw_to_pcm(b) for b in range(256)]


# ---------------------------------------------------------------------------
# Baseline grayscale JPEG (real huffman + DCT)
# ---------------------------------------------------------------------------


def test_jpeg_solid_exact_at_q100():
    from connemara_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    for v in (0, 127, 128, 255):
        for w, h in [(8, 8), (13, 9), (1, 1)]:
            px = bytes([v]) * (w * h)
            assert decode_jpeg(encode_jpeg(w, h, px, quality=100)) == (w, h, px)


def test_jpeg_q100_rounding_only_and_q75_bounded_error():
    import random

    import numpy as np

    from connemara_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = random.Random(5)
    for w, h in [(24, 16), (17, 11)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        _, _, out = decode_jpeg(encode_jpeg(w, h, px, quality=100))
        # all-ones tables: only FDCT/IDCT rounding error survives
        assert max(abs(a - b) for a, b in zip(px, out)) <= 2
    w, h = 32, 24
    px = bytes(
        int(128 + 80 * np.sin(x / 10) + 40 * np.cos(y / 7)) & 0xFF
        for y in range(h)
        for x in range(w)
    )
    _, _, out = decode_jpeg(encode_jpeg(w, h, px, quality=75))
    err = [abs(a - b) for a, b in zip(px, out)]
    assert sum(err) / len(err) < 4 and max(err) < 30


def test_jpeg_unsupported_and_malformed():
    from connemara_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG1234")
    enc = bytearray(encode_jpeg(8, 8, bytes(64), quality=90))
    # flip SOF0 -> SOF2 (progressive)
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))


def test_jpeg_decode_features_spark(spark):
    from connemara_spark.operators.multimodal import decode_images, jpeg_fixture

    ids = spark.createDataFrame([(11,)], "doc_id long")
    row = decode_images(jpeg_fixture(ids), codec="jpeg", n_partitions=1).collect()[0]
    w, h, v = 9 + 11 % 8, 6 + 11 % 5, (11 * 37) % 256
    assert (row["width"], row["height"]) == (w, h)
    assert row["mean_byte"] == float(v)
    assert row["checksum"] == (v * w * h) % (1 << 31)


def test_jpeg_resize_nearest_neighbor(spark):
    from connemara_spark.operators.jpegcodec import decode_jpeg
    from connemara_spark.operators.multimodal import jpeg_fixture, resize_images

    ids = spark.createDataFrame([(3,)], "doc_id long")
    out = resize_images(jpeg_fixture(ids), width=4, height=4, codec="jpeg").collect()[0]
    w, h, px = decode_jpeg(bytes(out["payload"]))
    v = (3 * 37) % 256
    assert (w, h) == (4, 4)
    assert px == bytes([v]) * 16  # solid resize of a solid: exact at q100


def test_gif_lzw_end_code_width_at_boundary_regression():
    """Pinned hypothesis counterexample: a payload whose TAIL data code's
    (decoder-side) table append lands exactly on the 1<<width boundary —
    the encoder must mirror that bump or the END code is written one bit
    narrower than the decoder reads it (truncated-stream error)."""
    from connemara_spark.operators.multimodal import _lzw_compress, _lzw_decompress

    payload = bytes([0, 0, 0, 0, 0, 1, 0, 2, 0, 1, 1, 2, 1])
    assert _lzw_decompress(_lzw_compress(payload, 2), 2) == payload
