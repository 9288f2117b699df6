"""Corrupt/malformed input robustness of the host ingest layer.

The reference's loaders fail per-file and the pipeline skips and continues
(``streamz-rs/src/main.rs:490-508`` drops files whose decode errors); the
rebuilt ingest must never crash the process on malformed bytes.
"""

import numpy as np
import pytest

from streamz_tpu.io import audio, mp3, wav


def test_truncated_wav_no_crash(tmp_path):
    # A valid header then truncated data section: either a clean rejection
    # or a short read of the available samples — never a crash.
    p = tmp_path / "t.wav"
    sr = 44100
    pcm = (np.sin(np.linspace(0, 100, 8000)) * 20000).astype(np.int16)
    wav.write_wav(str(p), pcm, sr)
    raw = p.read_bytes()
    (tmp_path / "cut.wav").write_bytes(raw[: len(raw) // 3])
    try:
        samples, rate, ch = wav.read_wav(str(tmp_path / "cut.wav"))
        assert len(samples) < len(pcm) and rate == sr
    except Exception:
        pass


def test_garbage_wav_rejected(tmp_path):
    p = tmp_path / "g.wav"
    p.write_bytes(b"RIFFgarbagegarbagegarbage")
    with pytest.raises(Exception):
        wav.read_wav(str(p))


def test_garbage_mp3_rejected_or_empty(tmp_path):
    p = tmp_path / "g.mp3"
    rng = np.random.default_rng(0)
    p.write_bytes(rng.bytes(4096))
    try:
        samples, rate, ch = mp3.load_mp3_samples(str(p))
        assert len(samples) == 0 or rate > 0
    except Exception:
        pass  # rejection is equally acceptable


def test_batch_ingest_skips_bad_files(tmp_path):
    """The parallel loader preserves the reference's silent-drop semantics:
    bad entries are skipped, good ones still load."""
    good = tmp_path / "good.wav"
    sr = 44100
    pcm = (np.sin(np.linspace(0, 100, 44100)) * 20000).astype(np.int16)
    wav.write_wav(str(good), pcm, sr)
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"\x00" * 100)
    missing = tmp_path / "missing.wav"

    out = dict(audio.batch_resample([str(good), str(bad), str(missing)]))
    assert str(good) in out and len(out[str(good)]) > 0
    assert str(missing) not in out


def test_loader_missing_file():
    with pytest.raises(Exception):
        audio.load_audio_samples("/nonexistent/file.wav")


def _riff(chunks: bytes) -> bytes:
    body = b"WAVE" + chunks
    import struct

    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(cid: bytes, payload: bytes) -> bytes:
    import struct

    return cid + struct.pack("<I", len(payload)) + payload


def test_malformed_fmt_chunk_rejected(tmp_path):
    """A fmt chunk shorter than the 16-byte PCM header must raise WavError
    (python) / status!=0 (native), never read out of bounds or crash."""
    import struct

    bad = _riff(_chunk(b"fmt ", b"\x01\x00") + _chunk(b"data", b"\x00" * 8))
    p = tmp_path / "shortfmt.wav"
    p.write_bytes(bad)
    with pytest.raises(wav.WavError):
        wav.read_wav(str(p))
    from streamz_tpu.io import native

    if native.available():
        assert native.decode_file(str(p)) is None  # error status, no crash


def test_zero_rate_wav_rejected(tmp_path):
    """sample_rate=0 would divide by zero in the resampler plan: both
    codecs must reject it at parse time."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    bad = _riff(_chunk(b"fmt ", fmt) + _chunk(b"data", b"\x00" * 8))
    p = tmp_path / "zerorate.wav"
    p.write_bytes(bad)
    with pytest.raises(wav.WavError):
        wav.read_wav(str(p))
    from streamz_tpu.io import native

    if native.available():
        assert native.decode_file(str(p)) is None
    # and the batch loader drops it instead of crashing the pool
    out = audio.batch_resample([str(p)])
    assert out == []


def test_odd_length_data_chunk(tmp_path):
    """A data chunk truncated mid-sample parses (dropping the half sample)
    instead of raising a non-WavError from np.frombuffer."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    bad = _riff(_chunk(b"fmt ", fmt) + _chunk(b"data", b"\x00" * 7))
    p = tmp_path / "odd.wav"
    p.write_bytes(bad)
    samples, rate, ch = wav.read_wav(str(p))
    assert len(samples) == 3 and rate == 44100 and ch == 1
