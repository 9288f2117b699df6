"""G.711 mu-law / A-law companding (io/g711.py): ITU spot values, the
encode(decode(c)) == c identity, round-trip quantization bounds, and the
exactness invariants the serving wire relies on."""

import numpy as np
import pytest

from streamz_tpu.io import g711

ALL_CODES = np.arange(256, dtype=np.uint8)


# -- standard spot values ------------------------------------------------------


def test_ulaw_spot_values():
    # The standard 16-bit mu-law decode table's anchor points.
    assert g711.ulaw_decode(np.uint8(0x00)) == -32124
    assert g711.ulaw_decode(np.uint8(0x80)) == 32124
    assert g711.ulaw_decode(np.uint8(0xFF)) == 0
    assert g711.ulaw_decode(np.uint8(0x7F)) == 0
    # Zero encodes to 0xFF.
    assert g711.ulaw_encode(np.int16(0)) == 0xFF


def test_alaw_spot_values():
    # The standard A-law decode anchors (even-bit inversion 0x55).
    assert g711.alaw_decode(np.uint8(0xD5)) == 8      # +min step
    assert g711.alaw_decode(np.uint8(0x55)) == -8     # -min step
    assert g711.alaw_decode(np.uint8(0xAA)) == 32256  # +max
    assert g711.alaw_decode(np.uint8(0x2A)) == -32256
    assert g711.alaw_encode(np.int16(0)) == 0xD5


def test_decode_tables_are_odd_symmetric():
    # Flipping the (post-inversion) sign bit negates the magnitude.
    u = g711.ULAW_TABLE_I16.astype(np.int32)
    assert np.array_equal(u[:128], -u[128:])
    a = g711.ALAW_TABLE_I16.astype(np.int32)
    dec = np.array([a[c] for c in range(256)])
    flipped = np.array([a[c ^ 0x80] for c in range(256)])
    assert np.array_equal(dec, -flipped)


# -- codec identities ----------------------------------------------------------


def test_ulaw_encode_decode_identity():
    """encode(decode(c)) == c for every code (decode lands on segment
    midpoints) — except 0x7F/0xFF which both decode to 0 (+/-0 merge)."""
    back = g711.ulaw_encode(g711.ulaw_decode(ALL_CODES))
    merged = np.isin(ALL_CODES, [0x7F])
    assert np.array_equal(back[~merged], ALL_CODES[~merged])
    assert back[0x7F] == 0xFF  # -0 re-encodes as +0


def test_alaw_encode_decode_identity():
    back = g711.alaw_encode(g711.alaw_decode(ALL_CODES))
    assert np.array_equal(back, ALL_CODES)


@pytest.mark.parametrize(
    "enc,dec,step_top",
    [
        (g711.ulaw_encode, g711.ulaw_decode, 1024),
        (g711.alaw_encode, g711.alaw_decode, 2048),
    ],
)
def test_roundtrip_quantization_bound(enc, dec, step_top):
    """decode(encode(x)) stays within the top segment's step of x for the
    full i16 range, and within the fine step near zero."""
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [
            rng.integers(-32768, 32768, 4096),
            np.arange(-600, 600),
            np.array([-32768, -32767, 32767, 0, 1, -1]),
        ]
    ).astype(np.int16)
    x32 = x.astype(np.int32)  # int16 abs would overflow at -32768
    y = dec(enc(x)).astype(np.int32)
    err = np.abs(y - np.clip(x32, -32635, 32635))
    assert err.max() <= step_top
    small = np.abs(x32) < 500
    assert err[small].max() <= 64


def test_encode_is_monotone():
    """Decoded values are non-decreasing in the linear input — companding
    preserves order."""
    x = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec in [
        (g711.ulaw_encode, g711.ulaw_decode),
        (g711.alaw_encode, g711.alaw_decode),
    ]:
        y = dec(enc(x)).astype(np.int32)
        assert (np.diff(y) >= 0).all()


def test_tables_f32_exact():
    """The f32 decode tables hold the i16 values exactly (the device wire
    gathers f32 and must match the host i16 path bit-for-bit)."""
    assert np.array_equal(
        g711.ULAW_TABLE.astype(np.int32), g711.ULAW_TABLE_I16.astype(np.int32)
    )
    assert np.array_equal(
        g711.ALAW_TABLE.astype(np.int32), g711.ALAW_TABLE_I16.astype(np.int32)
    )


def test_decode_dispatch_rejects_unknown():
    with pytest.raises(ValueError):
        g711.decode(ALL_CODES, "pcm")


# -- signal-level sanity -------------------------------------------------------


def test_speech_band_snr():
    """Companding a speech-level sine keeps ~35+ dB SNR — the property
    that makes G.711 a usable serving wire."""
    t = np.arange(44100, dtype=np.float64)
    x = (8000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    for enc, dec in [
        (g711.ulaw_encode, g711.ulaw_decode),
        (g711.alaw_encode, g711.alaw_decode),
    ]:
        y = dec(enc(x)).astype(np.float64)
        snr = 10 * np.log10(
            np.mean(x.astype(np.float64) ** 2)
            / np.mean((y - x.astype(np.float64)) ** 2)
        )
        assert snr > 30.0, snr
