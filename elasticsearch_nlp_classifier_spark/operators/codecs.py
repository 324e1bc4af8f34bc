"""Pure-numpy codecs for public UNCOMPRESSED media containers.

This container ships no image/audio libraries (PIL/librosa/ffmpeg), but
three classic formats are simple enough to encode/decode from their
public specifications with ``struct`` + numpy alone — which turns the
multimodal column story from plumbing-only into a real decode path:

- BMP   (Windows bitmap, BITMAPINFOHEADER, 24 bpp, bottom-up rows,
         4-byte row padding) — images
- WAV   (RIFF/WAVE, PCM 16-bit, chunk-walked) — audio
- Y4M   (YUV4MPEG2, C420 planar, ASCII header + FRAME markers) — video

Each codec is a total function of the payload bytes: decoders parse the
real header (they do NOT trust caller-supplied metadata), validate
magic/size invariants, and raise ``ValueError`` on malformed input.
Encoders exist so tests can roundtrip synthetic media deterministically.

Compressed formats (JPEG/MP3/H.264) still need a real codec library —
``multimodal.extract_features(decode_with=...)`` stays the injection
point for those.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")     # magic, size, res, res, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bpp BMP bytes (bottom-up, BGR on disk)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up scanlines, channels swapped to BGR
    body = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    body[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    data = body.tobytes()
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    head = _BMP_FILE_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    return head + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if len(payload) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("BMP payload shorter than headers")
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    (hdr_size, w, h, planes, bpp, compression, *_rest) = \
        _BMP_INFO_HEADER.unpack_from(payload, _BMP_FILE_HEADER.size)
    if hdr_size < _BMP_INFO_HEADER.size or planes != 1:
        raise ValueError("unsupported BMP header variant")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bpp uncompressed BMP supported "
                         f"(bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if w <= 0 or h == 0 or len(payload) < need:
        raise ValueError("BMP pixel data truncated")
    body = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR on disk -> RGB


def resize_image(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic resize: exact area-mean when both factors divide
    evenly (the common thumbnailing case), else nearest-neighbor index
    mapping.  Pure numpy, no interpolation library."""
    pixels = np.asarray(pixels)
    h, w = pixels.shape[:2]
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        view = pixels.reshape(out_h, fh, out_w, fw, -1).astype(np.float64)
        out = view.mean(axis=(1, 3))
        return np.rint(out).astype(pixels.dtype).reshape(
            out_h, out_w, *pixels.shape[2:]
        )
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM samples -> mono RIFF/WAVE bytes."""
    samples = np.asarray(samples, dtype="<i2").ravel()
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes -> (mono int16 samples, sample_rate).

    Walks the chunk list (a conforming reader must — writers may insert
    LIST/fact chunks between fmt and data)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate, channels, bits, data = None, None, None, None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk truncated")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"only PCM WAV supported (fmt={audio_fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:  # downmix by channel mean
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples.astype(np.int16), int(rate)


# ---------------------------------------------------------------- Y4M

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 24) -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 C420 bytes (flat
    128-valued chroma planes; h and w must be even per 4:2:0)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"expected (n, h, w) luma array, got {frames.shape}")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even frame dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
        parts.append(chroma)  # U
        parts.append(chroma)  # V
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 C420 bytes -> ((n, h, w) uint8 luma frames, fps).
    Chroma planes are parsed past but not returned (the feature
    extractors are luma-based)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    for tok in payload[len(_Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            fps = int(t[1:].split(":")[0])
        elif t.startswith("C") and not t.startswith("C420"):
            raise ValueError(f"only C420 chroma supported (got {t})")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    y_size, c_size = w * h, (w // 2) * (h // 2)
    frame_size = y_size + 2 * c_size
    frames, pos, end = [], nl + 1, len(payload)
    while pos < end:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M FRAME marker")
        body_at = fnl + 1
        if body_at + frame_size > end:
            raise ValueError("Y4M frame data truncated")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=y_size,
                          offset=body_at).reshape(h, w)
        )
        pos = body_at + frame_size
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), \
        int(fps or 0)
