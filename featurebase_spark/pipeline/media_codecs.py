"""Pure-stdlib media decoders: PNG / BMP / PPM-PGM images and PCM WAV
audio, in numpy — no codec libraries required.

These give the multimodal pipeline a REAL decode path in a container
without PIL/opencv/ffmpeg: PNG needs only ``zlib`` (stdlib) plus the five
scanline filters; BMP and PPM are plain array layouts; WAV decodes with
the stdlib ``wave`` module. Formats outside this set (JPEG, MP3, video
codecs) still raise — honest about what a codec-free container can do —
but the decode → feature-extract transform itself executes for real and
is verified against hand-built files in tests.

Everything returns numpy so the Arrow-batched feature extraction in
:mod:`featurebase_spark.pipeline.multimodal` stays vectorized.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedMediaError(NotImplementedError):
    """Payload format not decodable without external codec libraries."""


def sniff(payload: bytes) -> str:
    """'png' | 'bmp' | 'ppm' | 'pgm' | 'wav' | 'unknown'."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG (bit depth 8; color types 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA;
# no interlace) — IHDR/IDAT walk + zlib + the five scanline filters
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 array."""
    if payload[:8] != PNG_SIG:
        raise UnsupportedMediaError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise UnsupportedMediaError(f"PNG bit depth {depth} (only 8)")
            if color not in _PNG_CHANNELS:
                raise UnsupportedMediaError(f"PNG color type {color}")
            if interlace:
                raise UnsupportedMediaError("interlaced PNG")
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMediaError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        ftype = raw[y * (stride + 1)]
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev).astype(np.uint8)
        else:
            # Sub/Average/Paeth need the left neighbor — per-pixel walk
            # in C-order over the row (rows are short; height-parallel
            # batches amortize)
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                if ftype == 1:  # Sub
                    pred = left
                elif ftype == 3:  # Average
                    pred = (left + up) // 2
                elif ftype == 4:  # Paeth
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc else up if pb <= pc else ul
                    )
                else:
                    raise UnsupportedMediaError(f"PNG filter {ftype}")
                cur[x] = (int(row[x]) + pred) & 0xFF
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows) — used by tests to build real
    payloads; gray/gray+alpha/RGB/RGBA by channel count."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32 bpp, BITMAPINFOHEADER) and PPM/PGM (binary)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP core header")
    width, height = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if comp != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={comp}")
    ch = bpp // 8
    flip = height > 0
    height = abs(height)
    stride = (width * ch + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[:, : width * ch]
    img = rows.reshape(height, width, ch)
    if flip:
        img = img[::-1]
    # BGR(A) → RGB(A)
    order = [2, 1, 0] + ([3] if ch == 4 else [])
    return np.ascontiguousarray(img[:, :, order])


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray), maxval ≤ 255."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise UnsupportedMediaError("not a binary PPM/PGM")
    # header tokens: magic, width, height, maxval (comments allowed)
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM")
    ch = 3 if magic == b"P6" else 1
    return np.frombuffer(
        payload, dtype=np.uint8, count=w * h * ch, offset=i
    ).reshape(h, w, ch)


def decode_image(payload: bytes) -> np.ndarray:
    kind = sniff(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("ppm", "pgm"):
        return decode_ppm(payload)
    raise UnsupportedMediaError(
        f"image format {kind!r} needs external codecs (PIL/opencv)"
    )


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index arithmetic) — the thumbnail /
    normalization step of a training-data pipeline."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 samples in [-1, 1], channels
    averaged to mono)."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"WAV: {e}") from e
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedMediaError(f"WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, x


def audio_features(payload: bytes) -> dict:
    """Real audio features: duration, RMS energy, zero-crossing rate,
    spectral centroid (numpy FFT)."""
    rate, x = decode_wav(payload)
    n = len(x)
    feats = {
        "sample_rate": rate,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
        "rms": float(np.sqrt(np.mean(x**2))) if n else 0.0,
        "zero_cross_rate": float(np.mean(np.abs(np.diff(np.signbit(x)))))
        if n > 1
        else 0.0,
    }
    if n:
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate) if rate else np.zeros_like(spec)
        total = spec.sum()
        feats["spectral_centroid"] = (
            float((spec * freqs).sum() / total) if total > 0 else 0.0
        )
    else:
        feats["spectral_centroid"] = 0.0
    return feats


def image_features(payload: bytes, thumb: int = 4) -> dict:
    """Real image features: dimensions, per-channel mean/std, and a
    ``thumb``×``thumb`` grayscale thumbnail (the resize step)."""
    img = decode_image(payload)
    h, w, ch = img.shape
    gray = img[:, :, :3].mean(axis=2) if ch >= 3 else img[:, :, 0].astype(float)
    t = resize_image(gray, thumb, thumb)
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "mean": [float(img[:, :, c].mean()) for c in range(ch)],
        "std": [float(img[:, :, c].std()) for c in range(ch)],
        "thumb": (t / 255.0).ravel().tolist(),
    }
