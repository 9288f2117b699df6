"""Audio ingest tests: WAV codec, MP3 decode, resampler, caches."""

import os

import numpy as np
import pytest

from streamz_tpu import config
from streamz_tpu.dsp.resample import resample_f32, resample_to_44100
from streamz_tpu.io import audio, wav as wavio

REF_DATA = "/root/reference/streamz-rs/examples/training_data"


def test_wav_roundtrip(tmp_path):
    p = str(tmp_path / "t.wav")
    samples = (np.sin(np.linspace(0, 40, 4410)) * 20000).astype(np.int16)
    wavio.write_wav(p, samples, sample_rate=44100)
    got, rate, ch = wavio.read_wav(p)
    assert rate == 44100 and ch == 1
    np.testing.assert_array_equal(got, samples)
    assert wavio.wav_spec(p) == (44100, 16, 1)


def test_wav_rejects_non_16bit(tmp_path):
    import struct
    p = str(tmp_path / "bad.wav")
    data = b"\x00" * 8
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100, 1, 8))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    with pytest.raises(wavio.WavError, match="16-bit"):
        wavio.read_wav(p)


def test_downmix_stereo():
    inter = np.array([100, 200, -100, -301, 5, 5], np.int16)
    mono = audio.downmix_to_mono(inter, 2)
    # Rust integer division truncates toward zero: (-100 + -301)/2 = -200
    np.testing.assert_array_equal(mono, np.array([150, -200, 5], np.int16))


def test_downmix_mono_passthrough():
    x = np.array([1, 2, 3], np.int16)
    np.testing.assert_array_equal(audio.downmix_to_mono(x, 1), x)


def test_resample_identity():
    x = np.arange(1000, dtype=np.int16)
    y = resample_to_44100(x, 44100)
    np.testing.assert_array_equal(y, x)


def test_resample_length_contract():
    x = np.zeros(32000, np.int16)
    y = resample_to_44100(x, 32000)
    assert len(y) == 32000 * 44100 // 32000  # floor(n * 44100 / from)


@pytest.mark.parametrize("from_rate", [8000, 16000, 22050, 32000, 48000])
def test_resample_preserves_sine(from_rate):
    """A 1 kHz tone must survive resampling with right frequency+amplitude."""
    dur = 0.5
    t_in = np.arange(int(from_rate * dur)) / from_rate
    x = 0.5 * np.sin(2 * np.pi * 1000.0 * t_in)
    y = resample_f32(x, from_rate, 44100)
    n = int(44100 * dur)
    y = y[: n]
    # Skip filter transient edges.
    core = y[4410 : n - 4410]
    t_out = (np.arange(len(y)) / 44100.0)[4410 : n - 4410]
    # Amplitude within 2%.
    assert abs(np.max(np.abs(core)) - 0.5) < 0.01
    # Frequency via FFT peak.
    spec = np.abs(np.fft.rfft(core * np.hanning(len(core))))
    peak = np.argmax(spec) * 44100.0 / len(core)
    assert abs(peak - 1000.0) < 5.0


def test_resample_dc_gain():
    x = np.full(16000, 0.25)
    y = resample_f32(x, 16000, 44100)
    mid = y[4410 : 16000 * 44100 // 16000 - 4410]
    np.testing.assert_allclose(mid, 0.25, atol=5e-3)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_mp3_decode_bundled():
    p = os.path.join(REF_DATA, "common_voice_fr_41911269.mp3")
    samples, rate, ch = audio.load_mp3_samples(p)
    assert rate == 32000 and ch == 1
    assert len(samples) > 32000  # > 1 second of audio
    assert samples.dtype == np.int16
    assert np.abs(samples.astype(np.int32)).max() > 500  # not silence


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_load_and_resample_mp3():
    p = os.path.join(REF_DATA, "common_voice_fr_41911269.mp3")
    path, samples = audio.load_and_resample_file(p)
    assert path == p
    raw, rate, _ = audio.load_mp3_samples(p)
    assert len(samples) == len(raw) * 44100 // 32000


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_mp3_wav_cache_contract(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = os.path.join(REF_DATA, "common_voice_fr_42346439.mp3")
    samples = audio.load_audio_samples(p)
    cached = tmp_path / "cache" / "common_voice_fr_42346439.wav"
    assert cached.exists()
    got, rate, ch = wavio.read_wav(str(cached))
    assert rate == 44100 and ch == 1
    np.testing.assert_array_equal(got, samples)
    # Second load comes from the cache and matches.
    again = audio.load_audio_samples(p)
    np.testing.assert_array_equal(again, samples)


def test_no_cache_wav_flag(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    src = os.path.join(REF_DATA, "common_voice_fr_42483609.mp3")
    if not os.path.exists(src):
        pytest.skip("reference data absent")
    config.set_wav_cache_enabled(False)
    try:
        audio.load_audio_samples(src)
        assert not (tmp_path / "cache" / "common_voice_fr_42483609.wav").exists()
    finally:
        config.set_wav_cache_enabled(True)


def test_audio_metadata_quirk(tmp_path):
    """audio_metadata always reports 44100 (src/lib.rs:497,503)."""
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, np.zeros(100, np.int16), sample_rate=8000)
    assert audio.audio_metadata(p) == (44100, 16)


def test_batch_resample_drops_failures(tmp_path):
    good = str(tmp_path / "ok.wav")
    wavio.write_wav(good, np.zeros(4410, np.int16))
    bad = str(tmp_path / "missing.wav")
    out = audio.batch_resample([good, bad, str(tmp_path / "x.txt")])
    assert [p for p, _ in out] == [good]


def test_feature_cache_path(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = audio.feature_cache_path("examples/training_data/a.mp3")
    assert p.name == "examples_training_data_a.mp3.npy"
    assert p.parent.name == "feature_cache"
