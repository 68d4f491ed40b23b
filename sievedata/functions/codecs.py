"""Pure-numpy media codecs: 24-bit BMP images and PCM-16 WAV audio.

The container has no PIL/ffmpeg, but BMP (BITMAPINFOHEADER, BI_RGB) and
WAV (RIFF, PCM16) are plain struct formats — decodable with ``struct`` +
``np.frombuffer`` alone.  This upgrades the multimodal stages from
"deterministic fake decode" to REAL decode/re-encode for images and audio;
compressed formats (JPEG/PNG/MP4) remain stubbed behind
``NotImplementedError`` in functions/media.py.

Both codecs roundtrip losslessly (tests/test_media_codecs.py) and are
vectorized — row padding, channel flips and sample de-interleaving are
numpy reshapes, never per-pixel loops.
"""
from __future__ import annotations

import struct

import numpy as np

# --- BMP (Windows V3, 24-bit BI_RGB, bottom-up) ---------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, file size, res, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BMP."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("bmp_encode expects (H, W, 3) uint8 RGB")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    padded = row_bytes + pad
    # bottom-up rows, BGR channel order, 4-byte row alignment
    rows = np.zeros((h, padded), dtype=np.uint8)
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)
    pix = rows.tobytes()
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(pix), 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(pix),
                          2835, 2835, 0, 0)
    return header + info + pix


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB array."""
    if len(payload) < _BMP_HEADER.size + _BMP_INFO.size or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    (info_size, w, h, _planes, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    padded = (w * 3 + 3) & ~3
    pix = np.frombuffer(payload, dtype=np.uint8, count=h * padded,
                        offset=offset)
    rows = pix.reshape(h, padded)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]                       # BGR → RGB
    return img[::-1] if bottom_up else img.copy()


def is_bmp(payload: bytes) -> bool:
    return len(payload) > 2 and payload[:2] == b"BM"


def bmp_resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, 3) array — two index gathers."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


# --- WAV (RIFF, PCM 16-bit) -----------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode (n,) or (n, channels) int16 samples as a PCM-16 WAV."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()       # interleaved little-endian
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block,
                      block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to ((n, channels) int16, sample_rate).  Walks
    RIFF chunks, so extra chunks (LIST/fact) are skipped correctly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, ch, rate, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            if audio_fmt != 1 or struct.unpack_from("<H", body, 14)[0] != 16:
                raise ValueError("unsupported WAV (non-PCM16)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)             # chunks are word-aligned
    if ch is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch), rate


def is_wav(payload: bytes) -> bool:
    return (len(payload) > 12 and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE")


# --- Feature extraction (decoded media → fixed-dim vectors) ----------------


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: dims, per-channel mean/std (unit-scaled),
    8-bin luminance histogram (mass-normalized)."""
    h, w = img.shape[:2]
    f = np.empty(16, dtype=np.float32)
    f[0] = w / 4096.0
    f[1] = h / 4096.0
    flat = img.reshape(-1, 3).astype(np.float32)
    f[2:5] = flat.mean(axis=0) / 255.0
    f[5:8] = flat.std(axis=0) / 255.0
    lum = flat @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist = np.bincount(np.minimum(lum / 32.0, 7.0).astype(np.int64),
                       minlength=8)
    f[8:16] = hist / max(len(lum), 1)
    return f


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash (aHash) of a decoded (H, W, 3) image: channel
    mean → 8×8 block means (reduceat over near-equal row/col spans) → one
    bit per block, set iff the block mean exceeds the global mean of the 64
    block means.  A uniform brightness shift moves every block mean AND the
    global mean by the same amount, so the hash is invariant to it — the
    property byte-level exact dedup lacks."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    rb = (np.arange(8) * h) // 8
    cb = (np.arange(8) * w) // 8
    sums = np.add.reduceat(np.add.reduceat(g, rb, axis=0), cb, axis=1)
    rc = np.diff(np.r_[rb, h]).astype(np.float64)
    cc = np.diff(np.r_[cb, w]).astype(np.float64)
    means = sums / np.outer(rc, cc)
    bits = (means > means.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """16-dim audio descriptor: duration, rms, peak, zero-crossing rate,
    channels, rate, 10 rFFT power bands (unit-normalized)."""
    mono = samples.mean(axis=1) / 32768.0
    n = len(mono)
    f = np.zeros(16, dtype=np.float32)
    f[0] = n / max(sample_rate, 1)               # duration (s)
    f[1] = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    f[2] = float(np.abs(mono).max()) if n else 0.0
    f[3] = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    f[4] = samples.shape[1]
    f[5] = sample_rate / 48_000.0
    if n:
        power = np.abs(np.fft.rfft(mono)) ** 2
        bands = np.array_split(power, 10)
        e = np.array([b.sum() for b in bands], dtype=np.float64)
        tot = e.sum()
        f[6:16] = (e / tot if tot > 0 else e).astype(np.float32)
    return f
