"""Pure-numpy/stdlib media codecs (operators/codecs.py) and their
wiring into the multimodal stages — the decode paths that are REAL in
this container (BMP/PPM/PGM images, PCM WAV audio, Y4M video), no
imaging/audio library required and no fakes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_to_s3_spark.operators import multimodal
from mysql_to_s3_spark.operators.codecs import (
    CodecError,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
    iter_y4m_frames,
    resize_nearest,
    sniff_media,
    synth_audio,
    synth_image,
    synth_video,
    y4m_frame_at,
    y4m_info,
)


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# round-trips (hypothesis over shapes — odd widths exercise BMP row padding)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 17), w=st.integers(1, 17), seed=st.integers(0, 2**31))
def test_bmp_roundtrip_any_shape(h, w, seed):
    a = _rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = encode_bmp(a)
    assert sniff_media(b) == "bmp"
    assert (decode_bmp(b) == a).all()


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 17), w=st.integers(1, 17), gray=st.booleans(), seed=st.integers(0, 2**31))
def test_ppm_pgm_roundtrip(h, w, gray, seed):
    shape = (h, w) if gray else (h, w, 3)
    a = _rng(seed).integers(0, 256, shape, dtype=np.uint8)
    b = encode_ppm(a)
    assert sniff_media(b) == ("pgm" if gray else "ppm")
    assert (decode_ppm(b) == a).all()


def test_ppm_header_comments_and_whitespace():
    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    b = encode_ppm(a)
    # inject a comment line after the magic — netpbm allows them anywhere
    # in the header; a spec-conformant reader must skip it
    hacked = b"P6\n# a comment\n 4  2 \n255\n" + b.split(b"255\n", 1)[1]
    assert (decode_ppm(hacked) == a).all()


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 500), rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_wav_roundtrip_mono(n, rate, seed):
    s = _rng(seed).integers(-(2**15), 2**15, n, dtype=np.int16)
    b = encode_wav(s, rate)
    assert sniff_media(b) == "wav"
    d, r = decode_wav(b)
    assert r == rate and (d == s).all()


def test_wav_roundtrip_stereo():
    s = _rng(3).integers(-1000, 1000, (64, 2)).astype(np.int16)
    d, r = decode_wav(encode_wav(s, 22050))
    assert r == 22050 and d.shape == (64, 2) and (d == s).all()


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 6),
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    fps=st.sampled_from([(25, 1), (30, 1), (24000, 1001)]),
    seed=st.integers(0, 2**31),
)
def test_y4m_roundtrip(n, h, w, fps, seed):
    v = _rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    b = encode_y4m(v, *fps)
    assert sniff_media(b) == "y4m"
    info = y4m_info(b)
    assert (info["width"], info["height"], info["n_frames"]) == (w, h, n)
    assert info["duration_ms"] == n * 1000 * fps[1] // fps[0]
    frames = list(iter_y4m_frames(b))
    assert len(frames) == n and all((frames[i] == v[i]).all() for i in range(n))


def test_y4m_frame_at_is_o1_indexing():
    v = synth_video(11, 7, width=4, height=3)
    b = encode_y4m(v, 10, 1)  # 10 fps -> frame every 100 ms, 700 ms total
    assert (y4m_frame_at(b, 0) == v[0]).all()
    assert (y4m_frame_at(b, 99) == v[0]).all()
    assert (y4m_frame_at(b, 100) == v[1]).all()
    assert (y4m_frame_at(b, 650) == v[6]).all()
    # past-the-end clamps to the final frame (grab-at-duration contract)
    assert (y4m_frame_at(b, 10**12) == v[6]).all()


# ---------------------------------------------------------------------------
# malformed-payload refusals: every decoder raises CodecError, never a
# numpy shape error or silent garbage


def test_malformed_payloads_raise_codec_errors():
    a = synth_image(1)
    with pytest.raises(CodecError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(CodecError, match="truncated"):
        decode_bmp(encode_bmp(a)[:-10])
    with pytest.raises(CodecError, match="only 24-bit"):
        # flip bpp to 8 in an otherwise-valid header
        raw = bytearray(encode_bmp(a))
        raw[28] = 8
        decode_bmp(bytes(raw))
    with pytest.raises(CodecError, match="truncated"):
        decode_ppm(encode_ppm(a)[:-5])
    with pytest.raises(CodecError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(CodecError, match="not a PCM WAV"):
        decode_wav(b"RIFFxxxxWAVE garbage")
    with pytest.raises(CodecError, match="not a YUV4MPEG2"):
        y4m_info(b"nonsense")
    with pytest.raises(CodecError, match="truncated"):
        y4m_info(encode_y4m(synth_video(2, 2))[:-7])
    with pytest.raises(CodecError, match="C444"):
        y4m_info(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + b"\x00" * 6)
    with pytest.raises(CodecError):
        encode_bmp(np.zeros((2, 2), np.uint8))  # needs 3 channels
    with pytest.raises(CodecError):
        encode_wav(np.zeros(4, np.float64))  # needs int16


# ---------------------------------------------------------------------------
# nearest-neighbor resize: exact index-map semantics, up and down


def test_resize_nearest_index_map_exact():
    a = synth_image(3)  # 12x16x3
    r = resize_nearest(a, 8, 6)
    assert r.shape == (6, 8, 3)
    for y in range(6):
        for x in range(8):
            assert (r[y, x] == a[y * 12 // 6, x * 16 // 8]).all()
    up = resize_nearest(a, 32, 24)
    assert up.shape == (24, 32, 3)
    # upscale by 2 = each source pixel becomes a 2x2 block
    assert (up[::2, ::2] == a).all() and (up[1::2, 1::2] == a).all()
    # identity resize is a no-op
    assert (resize_nearest(a, 16, 12) == a).all()
    with pytest.raises(CodecError):
        resize_nearest(a, 0, 4)


# ---------------------------------------------------------------------------
# multimodal wiring: the decode seams are live for these formats


def test_decode_image_sniffs_bmp_and_ppm():
    a = synth_image(5)
    assert (multimodal.decode_image(encode_bmp(a)) == a).all()
    assert (multimodal.decode_image(encode_ppm(a)) == a).all()
    g = _rng(4).integers(0, 256, (3, 5), dtype=np.uint8)
    assert (multimodal.decode_image(encode_ppm(g)) == g).all()


def test_resize_image_preserves_format():
    a = synth_image(6)
    rb = multimodal.resize_image(encode_bmp(a), 8, 6)
    assert sniff_media(rb) == "bmp"
    assert (decode_bmp(rb) == resize_nearest(a, 8, 6)).all()
    rp = multimodal.resize_image(encode_ppm(a), 8, 6)
    assert sniff_media(rp) == "ppm"
    assert (decode_ppm(rp) == resize_nearest(a, 8, 6)).all()


def test_decode_audio_wav_native():
    s = synth_audio(9)
    d, rate = multimodal.decode_audio(encode_wav(s, 8000))
    assert rate == 8000 and (d == s).all()


def test_frame_sample_real_y4m():
    v = synth_video(3, 4)
    y = encode_y4m(v, 2, 1)  # 2 fps, 4 frames -> 2000 ms
    fr = multimodal.frame_sample(y, every_ms=500)
    assert fr.shape == (4, 6, 8, 3) and (fr == v).all()
    fr2 = multimodal.frame_sample(y, every_ms=1000)
    assert fr2.shape == (2, 6, 8, 3) and (fr2 == v[[0, 2]]).all()


def test_compressed_formats_still_gated():
    if multimodal._pil_image() is not None:
        pytest.skip("imaging library present; gate contract not applicable")
    with pytest.raises(NotImplementedError, match="BMP/PPM/PGM/PNG"):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"x" * 64)  # JPEG
    with pytest.raises(NotImplementedError, match="PCM WAV"):
        multimodal.decode_audio(b"ID3\x04" + b"x" * 64)
    with pytest.raises(NotImplementedError, match="Y4M"):
        multimodal.frame_sample(b"\x00\x00\x00 ftypisom" + b"x" * 64)
    # PNG no longer gates (r10: native decode) — a malformed PNG now
    # refuses through the codec, not the library seam
    with pytest.raises(CodecError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"x" * 64)


# ---------------------------------------------------------------------------
# distributed end-to-end with REAL payloads (no fakes): build BMP / WAV /
# Y4M columns, run the mapInPandas stages, verify against numpy


def _media_rows(spark, rows, schema=multimodal.MEDIA_SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_sample_frames_real_y4m_end_to_end(spark):
    vids = {d: synth_video(d, n_frames=2 + d % 3, width=4, height=3) for d in (1, 2, 3)}
    rows = []
    for d, v in vids.items():
        payload = encode_y4m(v, 10, 1)  # 10 fps -> 100 ms per frame
        dur = y4m_info(payload)["duration_ms"]
        rows.append((d, bytearray(payload), ("video", "video/x-yuv4mpeg", None, None, dur)))
    df = _media_rows(spark, rows)
    out = multimodal.sample_frames(df, every_ms=100)  # every frame
    got = sorted(
        ((r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in out.collect())
    )
    assert [(d, i) for d, i, _ in got] == [
        (d, i) for d in (1, 2, 3) for i in range(2 + d % 3)
    ]
    for d, i, frame in got:
        assert sniff_media(frame) == "bmp"
        assert (decode_bmp(frame) == vids[d][i]).all()


def test_resize_images_real_bmp_end_to_end(spark):
    imgs = {d: synth_image(d) for d in (1, 2)}
    rows = [
        (d, bytearray(encode_bmp(a)), ("image", "image/bmp", 16, 12, None))
        for d, a in imgs.items()
    ]
    out = multimodal.resize_images(_media_rows(spark, rows), 8, 6)
    got = {r["doc_id"]: r for r in out.collect()}
    for d, a in imgs.items():
        m = got[d]["media_meta"]
        assert (m["width"], m["height"]) == (8, 6)
        assert (decode_bmp(bytes(got[d]["payload"])) == resize_nearest(a, 8, 6)).all()
    # still a pure per-row stage: no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decode_pipeline_composes_video_to_image_stages(spark):
    """Y4M frame grab emits BMP, so the frame column feeds the image
    decoder directly — the composition a real pipeline runs
    (sample -> decode -> featurize) with zero format-specific glue."""
    v = synth_video(8, 3, width=4, height=3)
    payload = encode_y4m(v, 10, 1)
    df = _media_rows(
        spark,
        [(8, bytearray(payload), ("video", "video/x-yuv4mpeg", None, None, 300))],
    )
    frames = multimodal.sample_frames(df, every_ms=100)
    # per-frame mean pixel via the REAL decode inside a pandas stage
    import pandas as pd
    from pyspark.sql import types as T

    def _mean(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "mean_px": pdf["frame"].map(
                        lambda b: float(multimodal.decode_image(bytes(b)).mean())
                    ),
                }
            )

    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("mean_px", T.DoubleType()),
        ]
    )
    got = {r["frame_idx"]: r["mean_px"] for r in frames.mapInPandas(_mean, sch).collect()}
    for i in range(3):
        assert got[i] == pytest.approx(float(v[i].mean()))


def test_synth_formula_matches_closed_form():
    """The synthetic builders' formulas are the contract the driver's
    oracle SQL replicates — pin them against direct arithmetic."""
    a = synth_image(100, 16, 12)
    n = 16 * 12 * 3
    assert int(a.sum()) == sum((100 + i) % 256 for i in range(n))
    s = synth_audio(100, 256)
    assert int(s.astype(np.int64).sum()) == sum(
        ((100 * 7 + t * 13) % 2048) - 1024 for t in range(256)
    )
    v = synth_video(100, 4, 8, 6)
    nb = 8 * 6 * 3
    assert int(v.astype(np.int64).sum()) == sum(
        (100 + 97 * f + i) % 256 for f in range(4) for i in range(nb)
    )


def test_y4m_frame_at_o1_fast_path_matches_walk():
    """The length-arithmetic fast path and the validating walk agree;
    an irregular FRAME-line (parameters after the marker, legal per
    spec) forces the walk and still grabs the right frame."""
    v = synth_video(5, 6, width=4, height=3)
    b = encode_y4m(v, 10, 1)
    for ts in (0, 99, 100, 250, 10**9):
        idx = min(ts * 10 // 1000, 5)
        assert (y4m_frame_at(b, ts) == v[idx]).all()
    # rebuild with a parameterized FRAME line on frame 0 -> irregular
    hdr_end = b.find(b"\n") + 1
    irregular = b[:hdr_end] + b"FRAME Xparam\n" + b[hdr_end + 6 :]
    assert y4m_info(irregular)["n_frames"] == 6
    for ts in (0, 150, 550):
        idx = min(ts * 10 // 1000, 5)
        assert (y4m_frame_at(irregular, ts) == v[idx]).all(), ts


def test_frame_sample_zero_duration_and_negative_ts():
    empty = encode_y4m(np.zeros((0, 3, 4, 3), np.uint8))
    fr = multimodal.frame_sample(empty, every_ms=100)
    assert fr.shape == (0, 3, 4, 3) and fr.dtype == np.uint8
    b = encode_y4m(synth_video(1, 2))
    with pytest.raises(CodecError, match="negative"):
        y4m_frame_at(b, -200)


# ---------------------------------------------------------------------------
# PNG (r10): stdlib zlib + the five scanline filters


def test_png_roundtrip_all_filters_and_shapes():
    from mysql_to_s3_spark.operators.codecs import decode_png, encode_png

    rng = _rng(11)
    for shape in [(12, 16), (12, 16, 2), (12, 16, 3), (12, 16, 4), (1, 1, 3), (7, 1)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            b = encode_png(a, filter_type=ft)
            assert sniff_media(b) == "png"
            d = decode_png(b)
            assert d.shape == a.shape and (d == a).all(), (shape, ft)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 17), w=st.integers(1, 17), ft=st.integers(0, 4),
       seed=st.integers(0, 2**31))
def test_png_roundtrip_property(h, w, ft, seed):
    from mysql_to_s3_spark.operators.codecs import decode_png, encode_png

    a = _rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(a, filter_type=ft)) == a).all()


def test_png_palette_expansion():
    """A hand-built color-type-3 stream expands through PLTE to RGB."""
    import struct
    import zlib

    from mysql_to_s3_spark.operators.codecs import decode_png

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    w, h = 4, 3
    idx = (np.arange(w * h, dtype=np.uint8).reshape(h, w) % 3)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    d = decode_png(png)
    assert d.shape == (3, 4, 3)
    assert (d[0, 0] == [255, 0, 0]).all() and (d[0, 1] == [0, 255, 0]).all()
    # palette index out of range refuses loudly
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal[:6])
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with pytest.raises(CodecError, match="palette index"):
        decode_png(bad)


def test_png_malformed_and_unsupported():
    import struct
    import zlib

    from mysql_to_s3_spark.operators.codecs import decode_png, encode_png

    a = synth_image(5)
    good = encode_png(a)
    with pytest.raises(CodecError, match="not a PNG"):
        decode_png(b"XPNG" + good[4:])
    # flipped payload byte -> CRC mismatch, never silent garbage
    raw = bytearray(good)
    raw[40] ^= 0xFF
    with pytest.raises(CodecError, match="CRC mismatch"):
        decode_png(bytes(raw))
    # Adam7 refuses loudly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    adam = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b""))
    with pytest.raises(CodecError, match="Adam7"):
        decode_png(adam)
    # 16-bit depth refuses loudly
    deep = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b""))
    with pytest.raises(CodecError, match="bit depth"):
        decode_png(deep)
    with pytest.raises(CodecError, match="filter_type"):
        encode_png(a, filter_type=7)


def test_png_multimodal_wiring():
    """decode_image and resize_image route PNG natively (no PIL)."""
    from mysql_to_s3_spark.operators.codecs import encode_png

    a = synth_image(9)  # 12x16x3
    png = encode_png(a, filter_type=4)
    assert (multimodal.decode_image(png) == a).all()
    r = multimodal.decode_image(multimodal.resize_image(png, 8, 6))
    assert r.shape == (6, 8, 3)
    assert (r == resize_nearest(a, 8, 6)).all()
