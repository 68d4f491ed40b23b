"""Pure-numpy BMP/WAV codecs: lossless roundtrips (incl. row-padding and
odd-size edges), resize semantics, and the real-decode media stages."""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sievedata.functions import codecs
from sievedata.functions.media import decode_media, synth_bmp, synth_wav


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 37), st.integers(1, 23), st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_exact(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = codecs.bmp_decode(codecs.bmp_encode(img))
    np.testing.assert_array_equal(out, img)


def test_bmp_row_padding_widths():
    # widths 1..8 hit every 4-byte row-padding residue
    for w in range(1, 9):
        img = np.arange(w * 3 * 2, dtype=np.uint8).reshape(2, w, 3)
        np.testing.assert_array_equal(
            codecs.bmp_decode(codecs.bmp_encode(img)), img)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.bmp_decode(b"not a bitmap at all............")


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 500), st.integers(1, 2), st.integers(0, 2**31 - 1))
def test_wav_roundtrip_exact(n, ch, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    samples = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    out, rate = codecs.wav_decode(codecs.wav_encode(samples, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_wav_mono_1d_input():
    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    out, rate = codecs.wav_decode(codecs.wav_encode(samples, 16_000))
    np.testing.assert_array_equal(out[:, 0], samples)
    assert out.shape == (5, 1) and rate == 16_000


def test_wav_skips_extra_chunks():
    samples = np.array([[1], [2], [3]], dtype=np.int16)
    raw = codecs.wav_encode(samples, 44_100)
    # splice a LIST chunk (odd size → word-aligned) between fmt and data
    fmt_end = raw.index(b"data")
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    out, rate = codecs.wav_decode(spliced)
    np.testing.assert_array_equal(out, samples)


def test_resize_nearest_semantics():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    half = codecs.bmp_resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(half, img[::2, ::2])
    up = codecs.bmp_resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_decode_media_real_paths():
    bmp = synth_bmp(42)
    f_img = decode_media(bmp, "image", fake=False)
    assert f_img.shape == (16,)
    img = codecs.bmp_decode(bmp)
    assert np.isclose(f_img[2], img[..., 0].mean() / 255.0, atol=1e-5)
    assert np.isclose(f_img[8:16].sum(), 1.0, atol=1e-5)  # hist mass

    wav = synth_wav(42)
    f_aud = decode_media(wav, "audio", fake=False)
    assert f_aud.shape == (16,)
    assert f_aud[0] == pytest.approx(0.1)       # 1600 samples @ 16 kHz
    assert 0 < f_aud[1] < 1                     # rms of a bounded signal
    assert np.isclose(f_aud[6:16].sum(), 1.0, atol=1e-4)  # band energies

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG....", "image", fake=False)


def test_media_resizer_real_bmp():
    from sievedata.functions.media import MediaResizer
    import pyarrow as pa

    r = MediaResizer(width=8, height=6, fake=False)
    batch = pa.table({
        "media_id": pa.array(["a"], pa.string()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([synth_bmp(7, width=24, height=16)], pa.binary()),
    })
    out = r(batch)
    thumb = codecs.bmp_decode(out["payload"][0].as_py())
    src = codecs.bmp_decode(synth_bmp(7, width=24, height=16))
    np.testing.assert_array_equal(
        thumb, codecs.bmp_resize_nearest(src, 8, 6))


def test_fake_mode_survives_magic_collisions():
    """fake=True must NEVER raise: payloads that merely start with 'BM' or
    'RIFF' (e.g. document text cast to binary) fall back to the fake
    decode instead of crashing the pipeline."""
    from sievedata.functions.media import MediaResizer

    for payload in (b"BMW dealership invoice 123",
                    b"RIFFxxxxWAVEfmt \x02\x00\x00\x00ab",
                    b"RIFF\x00\x00\x00\x00WAVE"):
        f = decode_media(payload, "image", fake=True)
        assert f.shape == (16,)
        r = MediaResizer(width=8, height=8, fake=True)
        assert isinstance(r._resize_one(payload), bytes)
    with pytest.raises((ValueError, Exception)):
        decode_media(b"BMW dealership invoice 123", "image", fake=False)


def test_ahash64_brightness_invariant_and_discriminative():
    """aHash must be invariant to a uniform brightness shift (the near-dup
    property byte dedup lacks) yet separate differently-seeded images."""
    base = codecs.bmp_decode(synth_bmp(7, width=24, height=16))
    h0 = codecs.ahash64(base)
    assert 0 <= h0 < 2**64
    for shift in (1, 2):
        bright = np.clip(base.astype(np.int16) + shift, 0, 255).astype(np.uint8)
        # re-encode/decode round trip = the path the query takes
        assert codecs.ahash64(
            codecs.bmp_decode(codecs.bmp_encode(bright))) == h0
    others = {codecs.ahash64(codecs.bmp_decode(synth_bmp(s, width=24, height=16)))
              for s in range(8, 16)}
    assert h0 not in others and len(others) > 1


def test_ahash64_non_multiple_of_8_dims():
    """reduceat block spans must cover ragged (H, W) not divisible by 8."""
    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.integers(0, 256, (13, 21, 3)).astype(np.uint8)
    h = codecs.ahash64(img)
    assert h == codecs.ahash64(img)  # deterministic
    assert 0 <= h < 2**64


# --- PNG ------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 37), st.integers(1, 23), st.integers(0, 2**31 - 1))
def test_png_roundtrip_exact_all_filters(w, h, seed):
    """Lossless roundtrip under EVERY scanline filter type and under a
    seed-derived per-row filter mix — the decoder's five unfilter paths
    each reconstruct the encoder's vectorized filtering bit-exactly."""
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    for f in (None, 0, 1, 2, 3, 4):
        np.testing.assert_array_equal(
            codecs.png_decode(codecs.png_encode(img, filters=f)), img)
    mixed = rng.integers(0, 5, h)
    np.testing.assert_array_equal(
        codecs.png_decode(codecs.png_encode(img, filters=mixed)), img)


def test_png_grayscale_and_rgba_decode():
    """Decoder handles color types 0 (expanded to RGB) and 6 (alpha
    dropped) from hand-built spec-conformant payloads."""
    import struct
    import zlib

    rng = np.random.Generator(np.random.PCG64(3)) 

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    def build(w, h, ctype, pix):
        scan = np.concatenate(
            [np.zeros((h, 1), np.uint8), pix.reshape(h, -1)], axis=1)
        return (codecs._PNG_SIG
                + chunk(b"IHDR", codecs._PNG_IHDR.pack(w, h, 8, ctype, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(scan.tobytes()))
                + chunk(b"IEND", b""))

    g = rng.integers(0, 256, (5, 7, 1)).astype(np.uint8)
    np.testing.assert_array_equal(
        codecs.png_decode(build(7, 5, 0, g)), np.repeat(g, 3, axis=2))
    rgba = rng.integers(0, 256, (4, 6, 4)).astype(np.uint8)
    np.testing.assert_array_equal(
        codecs.png_decode(build(6, 4, 6, rgba)), rgba[:, :, :3])


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.png_decode(b"not a png .....................")
    img = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError):
        codecs.png_encode(img.astype(np.int16))  # wrong dtype
    with pytest.raises(ValueError):
        codecs.png_encode(img, filters=7)  # bad filter id


def test_decode_media_real_png_path():
    """decode_media sniffs PNG magic and produces the same features as the
    equivalent BMP payload of the same image (the features depend only on
    decoded pixels, not the container)."""
    rng = np.random.Generator(np.random.PCG64(11))
    img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    f_png = decode_media(codecs.png_encode(img, filters=4), "image", fake=False)
    f_bmp = decode_media(codecs.bmp_encode(img), "image", fake=False)
    np.testing.assert_array_equal(f_png, f_bmp)
    assert f_png.shape == (16,)


def test_media_resizer_preserves_png_container():
    """MediaResizer really decodes a PNG, resizes, and re-encodes as PNG
    (format preserved; pixels equal the BMP-resize of the same image)."""
    import pyarrow as pa

    from sievedata.functions.media import MediaResizer, synth_png

    payload = synth_png(77, width=24, height=16)
    r = MediaResizer(width=8, height=6, fake=False)
    out = r(pa.table({
        "media_id": pa.array(["m1"]),
        "kind": pa.array(["image"]),
        "payload": pa.array([payload], pa.binary()),
    }))
    thumb = out.column("payload")[0].as_py()
    assert codecs.is_png(thumb)
    got = codecs.png_decode(thumb)
    want = codecs.bmp_resize_nearest(codecs.png_decode(payload), 8, 6)
    np.testing.assert_array_equal(got, want)
