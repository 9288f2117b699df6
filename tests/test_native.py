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


def _zero_data_wav(path, rate=44100):
    import struct

    hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, rate, rate * 2, 2, 16
    )
    with open(path, "wb") as f:
        f.write(hdr + fmt + b"data" + struct.pack("<I", 0))


def test_native_zero_data_chunk_matches_python(tmp_path):
    """A WAV with a zero-length data chunk is a valid EMPTY clip on both
    ingest paths (the pure-Python reader accepts it; the native path must
    not diverge by rejecting the same file — downstream skips it as too
    short either way)."""
    p = str(tmp_path / "zero.wav")
    _zero_data_wav(p)
    samples, rate, ch = wavio.read_wav(p)
    assert samples.shape == (0,) and rate == 44100 and ch == 1
    got = native.decode_file(p)
    assert got is not None
    n_samples, n_rate, n_ch = got
    assert n_samples.shape == (0,) and n_rate == 44100 and n_ch == 1
    # The full threaded ingest (decode → downmix → resample) also yields
    # an empty clip, including through the resampler plan (32 kHz input).
    p32 = str(tmp_path / "zero32.wav")
    _zero_data_wav(p32, rate=32000)
    for res in native.batch_ingest([p, p32]):
        assert res is not None
        assert res[0].shape == (0,) and res[1] == 44100


def _riff_wav_bytes(sr, data: bytes) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sr, (sr * 2) & 0xFFFFFFFF, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_native_and_python_agree_on_truncated_data(tmp_path):
    """A data chunk whose file ends early is rejected by BOTH readers —
    a silent partial read on one path would make the corpus depend on
    whether libstreamz_native.so built (non-reproducible runs)."""
    raw = _riff_wav_bytes(44100, b"\x01\x02" * 100)
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(raw[:-60])  # chop the payload, keep the declared size
    assert native.decode_file(p) is None
    with pytest.raises(wavio.WavError, match="truncated data"):
        wavio.read_wav(p)


def test_native_rejects_int32_overflow_sample_rate(tmp_path):
    """A fuzzed fmt rate >= 2^31 would go negative through the int32 cast
    and wrap the resampler plan's allocations — the reader must reject it
    as malformed, and the ingest pool must survive the file."""
    p = str(tmp_path / "hugerate.wav")
    with open(p, "wb") as f:
        f.write(_riff_wav_bytes(0x80000000, b"\x01\x02" * 64))
    assert native.decode_file(p) is None
    assert native.batch_ingest([p]) == [None]


def test_native_batch_ingest_rejects_bad_target_rate(tmp_path):
    """target_rate <= 0 is a caller bug: fail loudly (the C side would
    otherwise build a zero-output resampler plan — heap corruption)."""
    p = str(tmp_path / "ok.wav")
    wavio.write_wav(p, np.zeros(1000, np.int16), 44100)
    with pytest.raises(ValueError, match="target_rate"):
        native.batch_ingest([p], target_rate=0)
    with pytest.raises(ValueError, match="target_rate"):
        native.batch_ingest([p], target_rate=-44100)


def test_native_non_utf8_filename_fails_only_its_clip(tmp_path):
    """A surrogate-escaped (non-UTF-8) filename must fail only ITS clip,
    not raise UnicodeEncodeError for the whole batch (os.fsencode)."""
    good = str(tmp_path / "good.wav")
    wavio.write_wav(good, (np.sin(np.linspace(0, 50, 4000)) * 20000
                           ).astype(np.int16), 44100)
    badp = os.fsdecode(bytes(tmp_path) + b"/bad_\xff.wav")
    with open(os.fsencode(badp), "wb") as f:
        f.write(b"not a wav")
    out = native.batch_ingest([good, badp])
    assert out[0] is not None and out[1] is None


def test_stale_library_version_falls_back_cleanly(monkeypatch):
    """available() must return False — never raise — when the on-disk .so
    does not match the expected ABI version even after a forced rebuild."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    monkeypatch.setattr(native, "SZ_NATIVE_VERSION", 999)
    assert native.available() is False
    # and the failure is cached, not retried per call
    assert native.load() is None
    # restore: a fresh load with the real version succeeds
    monkeypatch.setattr(native, "SZ_NATIVE_VERSION", 2)
    monkeypatch.setattr(native, "_load_failed", False)
    assert native.available() is True
