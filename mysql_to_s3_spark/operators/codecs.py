"""Pure-numpy / stdlib media codecs for the multimodal column family.

The sandbox ships no imaging/audio/video library, but several REAL,
publicly specified formats need none:

- **BMP** (Windows bitmap, 24-bit uncompressed ``BI_RGB``): 14-byte file
  header + 40-byte ``BITMAPINFOHEADER``, bottom-up BGR rows padded to a
  4-byte boundary. Decodable with ``struct`` + numpy slicing.
- **PPM / PGM** (netpbm ``P6``/``P5`` binary): ASCII header
  (magic, width, height, maxval) + raw samples.
- **WAV** (RIFF PCM 16-bit): Python's stdlib ``wave`` module reads and
  writes it with no third-party dependency.
- **Y4M** (YUV4MPEG2): plain-text stream header
  (``YUV4MPEG2 W.. H.. F<num>:<den> .. C444``) followed by uncompressed
  ``FRAME\\n`` + planar payloads. We use the C444 colorspace (no chroma
  subsampling) so a frame is exactly ``3*W*H`` bytes.

- **PNG** (r10): the container is CRC'd chunks and the payload is one
  stdlib-``zlib`` stream of filter-prefixed scanlines — the five filter
  algebras are byte arithmetic mod 256, implemented with numpy below.

These give `operators/multimodal.py` genuinely working decode / resize /
frame-sample paths in THIS environment; the remaining compressed
formats (JPEG, GIF, MP3, H.264) stay behind the optional-PIL/ffmpeg
seams.

Reference parity note: the reference (klahnakoski/MySQL-to-S3) has no
media handling at all — this family is part of the beyond-reference
LLM-data-pipeline surface. Formats follow the public specs only
(BMP: Windows BITMAPINFOHEADER layout; netpbm: netpbm.sourceforge.net
format docs; Y4M: the mjpegtools YUV4MPEG2 stream description).

Scale shape: codecs are per-payload kernels executed inside Arrow-batched
``mapInPandas`` stages — embarrassingly parallel, zero shuffle; numpy
does the per-pixel work, so a batch of images costs a handful of
vectorized ops, not a Python loop over pixels.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np


class CodecError(ValueError):
    """Raised on malformed payloads or unsupported format variants."""


# ---------------------------------------------------------------------------
# format sniffing


def sniff_media(payload: bytes) -> str | None:
    """Best-effort magic-byte detection. Returns one of
    ``'bmp' | 'ppm' | 'pgm' | 'wav' | 'y4m' | 'png' | 'jpeg' | 'gif'``
    or None when unrecognized. Pure prefix checks — never reads past
    the first 16 bytes."""
    b = bytes(payload[:16])
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P6":
        return "ppm"
    if b[:2] == b"P5":
        return "pgm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:9] == b"YUV4MPEG2":
        return "y4m"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] in (b"GIF8",):
        return "gif"
    return None


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed BI_RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP.
    Rows are stored bottom-up in BGR order, padded to 4 bytes — the
    canonical Windows layout every viewer accepts."""
    a = np.asarray(arr)
    if a.ndim != 3 or a.shape[2] != 3 or a.dtype != np.uint8:
        raise CodecError(f"encode_bmp wants HxWx3 uint8, got {a.shape} {a.dtype}")
    h, w, _ = a.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    # BITMAPINFOHEADER: positive height = bottom-up, compression 0 = BI_RGB
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_raw] = a[::-1, :, ::-1].reshape(h, row_raw)  # flip rows, RGB->BGR
    return header + info + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an HxWx3 uint8 RGB array.
    Handles bottom-up and top-down (negative height) variants; refuses
    palettes, compression, and other bit depths loudly."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise CodecError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise CodecError(f"unsupported BMP header size {hdr_size} (want BITMAPINFOHEADER+)")
    w, h_signed = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise CodecError(f"only 24-bit BI_RGB supported, got bpp={bpp} compression={compression}")
    if w <= 0 or h_signed == 0 or planes != 1:
        raise CodecError(f"bad BMP dims w={w} h={h_signed} planes={planes}")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    need = off + stride * h
    if len(b) < need:
        raise CodecError(f"truncated BMP: {len(b)} bytes, need {need}")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# netpbm — P6 (PPM, RGB) and P5 (PGM, gray), binary, maxval <= 255


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 as binary PPM (P6) or HxW uint8 as PGM (P5)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise CodecError(f"encode_ppm wants uint8, got {a.dtype}")
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise CodecError(f"encode_ppm wants HxWx3 or HxW, got {a.shape}")
    h, w = a.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + a.tobytes()


def _pnm_header(b: bytes) -> tuple[bytes, list[int], int]:
    """Parse a netpbm header: magic then 3 ASCII ints (w, h, maxval),
    '#' comments allowed, single whitespace byte after maxval."""
    magic = b[:2]
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":  # comment to EOL
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise CodecError("malformed netpbm header")
        vals.append(int(b[i:j]))
        i = j
    return magic, vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to HxWx3 / PGM (P5) to HxW uint8."""
    b = bytes(payload)
    magic, (w, h, maxval), off = _pnm_header(b)
    if magic not in (b"P6", b"P5"):
        raise CodecError(f"unsupported netpbm magic {magic!r} (want P6/P5 binary)")
    if maxval != 255:
        raise CodecError(f"only maxval=255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(b) - off < need:
        raise CodecError(f"truncated netpbm: {len(b) - off} payload bytes, need {need}")
    a = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    return a.reshape((h, w, 3) if ch == 3 else (h, w)).copy()


# ---------------------------------------------------------------------------
# WAV — RIFF PCM via stdlib `wave` (no third-party dependency)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode a 1-D int16 array (mono) or (n, ch) int16 array as PCM WAV."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise CodecError(f"encode_wav wants int16, got {a.dtype}")
    if a.ndim == 1:
        nch = 1
    elif a.ndim == 2:
        nch = a.shape[1]
    else:
        raise CodecError(f"encode_wav wants 1-D or (n, ch), got {a.shape}")
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    try:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(a.astype("<i2").tobytes())
    finally:
        w.close()
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to (samples, sample_rate); samples come back
    1-D for mono, (n, ch) otherwise."""
    try:
        r = wave.open(io.BytesIO(bytes(payload)), "rb")
    except (wave.Error, EOFError) as e:
        raise CodecError(f"not a PCM WAV payload: {e}") from e
    try:
        if r.getsampwidth() != 2 or r.getcomptype() != "NONE":
            raise CodecError(
                f"only PCM-16 supported, got width={r.getsampwidth()} comp={r.getcomptype()}"
            )
        nch, rate, n = r.getnchannels(), r.getframerate(), r.getnframes()
        a = np.frombuffer(r.readframes(n), dtype="<i2")
    finally:
        r.close()
    return (a if nch == 1 else a.reshape(-1, nch)), rate


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2, C444 colorspace (one frame = 3*W*H planar bytes)


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode an (n_frames, H, W, 3) uint8 array as a YUV4MPEG2 C444
    stream. The three channels are written as the Y, U, V planes
    verbatim (we treat them as opaque planes — no colorspace matrix;
    decode gives the bytes back exactly)."""
    a = np.asarray(frames)
    if a.ndim != 4 or a.shape[3] != 3 or a.dtype != np.uint8:
        raise CodecError(f"encode_y4m wants (n, H, W, 3) uint8, got {a.shape} {a.dtype}")
    n, h, w, _ = a.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, fps_num, fps_den)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(a[f].transpose(2, 0, 1)).tobytes())  # planar
    return b"".join(out)


def y4m_info(payload: bytes) -> dict:
    """Parse the stream header and WALK the frames (validating every
    FRAME marker): returns width/height/fps_num/fps_den/n_frames/
    duration_ms (duration from frame count at the header fps). O(n)
    in frame count; ``y4m_frame_at`` has an O(1) fast path for the
    regular bare-marker layout."""
    b = bytes(payload)
    w, h, num, den, pos = _y4m_header(b)
    frame_bytes = 3 * w * h
    n = 0
    while pos < len(b):
        fl = b.find(b"\n", pos)
        if fl < 0 or b[pos : pos + 5] != b"FRAME":
            raise CodecError(f"malformed FRAME marker at byte {pos}")
        pos = fl + 1 + frame_bytes
        if pos > len(b):
            raise CodecError("truncated YUV4MPEG2 frame")
        n += 1
    return {
        "width": w,
        "height": h,
        "fps_num": num,
        "fps_den": den,
        "n_frames": n,
        "duration_ms": n * 1000 * den // num,
    }


def iter_y4m_frames(payload: bytes) -> Iterator[np.ndarray]:
    """Yield each frame as an (H, W, 3) uint8 array (planes restacked)."""
    b = bytes(payload)
    info = y4m_info(b)  # validates structure up front
    w, h = info["width"], info["height"]
    frame_bytes = 3 * w * h
    pos = b.find(b"\n") + 1
    for _ in range(info["n_frames"]):
        pos = b.find(b"\n", pos) + 1  # skip FRAME line (validated above)
        planes = np.frombuffer(b, dtype=np.uint8, count=frame_bytes, offset=pos)
        yield np.ascontiguousarray(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos += frame_bytes


def _y4m_header(b: bytes) -> tuple[int, int, int, int, int]:
    """Header-only parse (no frame walk): (w, h, fps_num, fps_den,
    header_end). O(header) regardless of stream length."""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise CodecError("not a YUV4MPEG2 payload")
    w = h = None
    num, den = 25, 1
    for tok in b[:nl].split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C" and tok != b"C444":
            raise CodecError(f"only C444 supported, got {tok.decode()}")
    if not w or not h or num <= 0 or den <= 0:
        raise CodecError("malformed YUV4MPEG2 header")
    return w, h, num, den, nl + 1


def y4m_frame_at(payload: bytes, ts_ms: int) -> np.ndarray:
    """Random-access frame grab at a timestamp: frame index =
    floor(ts_ms * fps / 1000), clamped to the last frame. TRUE O(1):
    header-only parse, frame count from length arithmetic (bare
    'FRAME\\n' markers + fixed-size C444 payloads), then one seek —
    sampling n frames from an n-frame video stays O(n), not O(n^2).
    Streams with FRAME-line parameters (variable-length markers, rare)
    fail the stride check and take the validating walk instead."""
    if ts_ms < 0:
        raise CodecError(f"negative timestamp {ts_ms}")
    b = bytes(payload)
    w, h, num, den, hdr = _y4m_header(b)
    frame_bytes = 3 * w * h
    stride = 6 + frame_bytes  # 'FRAME\n' is 6 bytes
    body = len(b) - hdr
    if body % stride == 0 and b[hdr : hdr + 6] == b"FRAME\n":
        n = body // stride
        if n == 0:
            raise CodecError("empty YUV4MPEG2 stream")
        idx = min(int(ts_ms) * num // (1000 * den), n - 1)
        pos = hdr + idx * stride + 6
    else:  # irregular FRAME-line params (rare): one validating walk
        n = y4m_info(b)["n_frames"]
        if n == 0:
            raise CodecError("empty YUV4MPEG2 stream")
        idx = min(int(ts_ms) * num // (1000 * den), n - 1)
        pos = hdr
        for _ in range(idx):  # skip idx frames
            pos = b.find(b"\n", pos) + 1 + frame_bytes
        pos = b.find(b"\n", pos) + 1  # skip the target's FRAME line
    planes = np.frombuffer(b, dtype=np.uint8, count=frame_bytes, offset=pos)
    return np.ascontiguousarray(planes.reshape(3, h, w).transpose(1, 2, 0))


# ---------------------------------------------------------------------------
# PNG — stdlib zlib + the five scanline filters (r10). PNG is a
# COMPRESSED format that needs no imaging library: the container is
# length-typed chunks with CRC-32, the payload is one zlib stream of
# scanlines, each prefixed by a filter byte (0 None, 1 Sub, 2 Up,
# 3 Average, 4 Paeth — the whole filter algebra is byte arithmetic mod
# 256). Supported: bit depth 8, color types 0 (gray), 2 (RGB),
# 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7
# interlace and 16-bit depth refuse loudly (CodecError) — rare in web
# corpora and cheap to add if they ever matter. Spec: the public
# PNG (ISO/IEC 15948) chunk + filter definitions.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int arrays (left, up, up-left)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode uint8 HxW (gray), HxWx2 (gray+alpha), HxWx3 (RGB), or
    HxWx4 (RGBA) as an 8-bit non-interlaced PNG. ``filter_type``
    applies one of the five scanline filters to EVERY row (0 is the
    always-valid default; 1-4 exist so tests can drive the decoder's
    whole unfilter algebra through real streams)."""
    import zlib

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise CodecError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        color_type = 0
        a3 = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[a.shape[2]]
        a3 = a
    else:
        raise CodecError(f"encode_png wants HxW or HxWx{{2,3,4}}, got {a.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise CodecError(f"filter_type must be 0-4, got {filter_type}")
    h, w, ch = a3.shape
    flat = a3.reshape(h, w * ch).astype(np.int32)
    # per-row predictors from the RECONSTRUCTED (original) bytes
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, ch:] = flat[:-1, :-ch]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - (left + up) // 2
    else:
        filt = flat - _paeth(
            left.astype(np.uint8), up.astype(np.uint8), upleft.astype(np.uint8)
        )
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = (filt % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to uint8 — HxW for grayscale,
    HxWx2 for gray+alpha, HxWx3 for RGB and palette (expanded through
    PLTE), HxWx4 for RGBA. All five scanline filters handled; Adam7
    interlace, 16-bit depth, and malformed streams refuse loudly."""
    import zlib

    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise CodecError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise CodecError("truncated PNG chunk")
        (want_crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != want_crc:
            raise CodecError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        pos += 12 + length
        if typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise CodecError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise CodecError(f"only bit depth 8 supported, got {depth}")
    if color_type not in _PNG_CHANNELS:
        raise CodecError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt_method != 0:
        raise CodecError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise CodecError("Adam7 interlaced PNG not supported")
    if w <= 0 or h <= 0:
        raise CodecError(f"bad PNG dims {w}x{h}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise CodecError(
            f"PNG scanline payload is {len(raw)} bytes, want {h * (1 + stride)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if ft == 0:
            recon = cur
        elif ft == 1:
            # Sub: per-channel prefix sum mod 256
            recon = np.cumsum(cur.reshape(w, ch), axis=0).reshape(stride) % 256
        elif ft == 2:
            recon = (cur + prev) % 256
        elif ft in (3, 4):
            # Average/Paeth depend on the current row's own left pixel:
            # sequential in x, vectorized over channels
            recon = np.zeros(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = x * ch
                up = prev[s : s + ch]
                if ft == 3:
                    px = (cur[s : s + ch] + (left + up) // 2) % 256
                else:
                    upleft = (
                        prev[s - ch : s] if x else np.zeros(ch, dtype=np.int32)
                    )
                    px = (
                        cur[s : s + ch]
                        + _paeth(
                            left.astype(np.uint8),
                            up.astype(np.uint8),
                            upleft.astype(np.uint8),
                        )
                    ) % 256
                recon[s : s + ch] = px
                left = px
        else:
            raise CodecError(f"unknown PNG scanline filter {ft} at row {y}")
        out[y] = recon.astype(np.uint8)
        prev = recon.astype(np.int32)
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise CodecError("palette PNG without a valid PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise CodecError("PNG palette index out of range")
        return np.ascontiguousarray(pal[idx])
    if ch == 1:
        return out.reshape(h, w).copy()
    return out.reshape(h, w, ch).copy()


# ---------------------------------------------------------------------------
# nearest-neighbor resize (pure numpy; the classic index-map formula
# out[y, x] = in[y * H_in // H_out, x * W_in // W_out])


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxWx3 or HxW uint8 array. Integer
    index map (floor), so the result is bit-deterministic across
    platforms — no float rounding in play."""
    a = np.asarray(arr)
    if width <= 0 or height <= 0:
        raise CodecError(f"bad target size {width}x{height}")
    h_in, w_in = a.shape[:2]
    ys = (np.arange(int(height)) * h_in) // int(height)
    xs = (np.arange(int(width)) * w_in) // int(width)
    return np.ascontiguousarray(a[np.ix_(ys, xs)])


# ---------------------------------------------------------------------------
# deterministic synthetic payload builders — shared by tests and the
# driver's oracle legs. The pixel/sample formulas are chosen to be
# closed-form replicable in ANSI SQL (DuckDB `range()` arithmetic), so
# an encode -> decode -> aggregate round-trip through the REAL codecs
# sits under the driver's value-hash gate.


def synth_image(doc_id: int, width: int = 16, height: int = 12) -> np.ndarray:
    """Pixel i (row-major, channel-last linear index) = (doc_id + i) % 256."""
    n = width * height * 3
    return (
        (int(doc_id) + np.arange(n, dtype=np.int64)) % 256
    ).astype(np.uint8).reshape(height, width, 3)


def synth_audio(doc_id: int, n_samples: int = 256) -> np.ndarray:
    """Sample t = ((doc_id*7 + t*13) % 2048) - 1024, int16 mono."""
    t = np.arange(n_samples, dtype=np.int64)
    return (((int(doc_id) * 7 + t * 13) % 2048) - 1024).astype(np.int16)


def synth_video(doc_id: int, n_frames: int, width: int = 8, height: int = 6) -> np.ndarray:
    """Frame f, linear byte i: (doc_id + 97*f + i) % 256."""
    n = width * height * 3
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    i = np.arange(n, dtype=np.int64)[None, :]
    return (
        (int(doc_id) + 97 * f + i) % 256
    ).astype(np.uint8).reshape(n_frames, height, width, 3)
