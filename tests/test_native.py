"""C++ native ingest runtime tests (skipped when the toolchain is absent)."""

import os

import numpy as np
import pytest

from streamz_tpu.io import native, wav as wavio

REF_DATA = "/root/reference/streamz-rs/examples/training_data"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_wav_roundtrip(tmp_path):
    p = str(tmp_path / "t.wav")
    samples = (np.sin(np.linspace(0, 60, 8000)) * 25000).astype(np.int16)
    assert native.write_wav_native(p, samples, 44100)
    got = native.decode_file(p)
    assert got is not None
    arr, rate, ch = got
    assert rate == 44100 and ch == 1
    np.testing.assert_array_equal(arr, samples)
    # Python codec reads native-written files and vice versa.
    py_arr, py_rate, py_ch = wavio.read_wav(p)
    np.testing.assert_array_equal(py_arr, samples)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_native_mp3_matches_python():
    from streamz_tpu.io import mp3 as mp3io

    p = os.path.join(REF_DATA, "common_voice_fr_41922955.mp3")
    got = native.decode_file(p)
    assert got is not None
    arr, rate, ch = got
    s2, rate2, ch2 = mp3io.load_mp3_samples(p)
    assert (rate, ch) == (rate2, ch2)
    np.testing.assert_array_equal(arr, s2)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_native_batch_decode_drops_failures(tmp_path):
    good = os.path.join(REF_DATA, "common_voice_fr_42346439.mp3")
    out = native.batch_decode([good, str(tmp_path / "missing.mp3"), good])
    assert out[0] is not None and out[2] is not None
    assert out[1] is None
    np.testing.assert_array_equal(out[0][0], out[2][0])


def test_native_rejects_non16bit_wav(tmp_path):
    import struct
    p = str(tmp_path / "bad.wav")
    data = b"\x00" * 8
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100, 1, 8))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    assert native.decode_file(p) is None


def test_native_resampler_bit_identical():
    from streamz_tpu.dsp.resample import resample_to_44100

    rng = np.random.default_rng(9)
    for fs in (32000, 48000, 22050):
        x = rng.normal(0, 8000, 12000).astype(np.int16)
        want = resample_to_44100(x, fs)
        got = native.resample_i16_native(x, fs, 44100)
        assert got is not None
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_native_batch_ingest_matches_python_pipeline():
    from streamz_tpu.io.audio import load_and_resample_file

    p = os.path.join(REF_DATA, "common_voice_fr_41911269.mp3")
    got = native.batch_ingest([p, "missing.mp3"])
    assert got[1] is None
    assert got[0] is not None
    samples, rate, ch = got[0]
    assert rate == 44100 and ch == 1
    _, want = load_and_resample_file(p)
    np.testing.assert_array_equal(samples, want)
