"""Deterministic mutation fuzzing of the ingest parsers.

The reference ingests arbitrary user files (``streamz-rs/src/main.rs:418-447``
walks a directory and feeds every ``.wav``/``.mp3`` to the decoders, skipping
failures); a crafted or bit-rotted file must never take down the process —
only be skipped.  These tests mutate valid files with a fixed-seed RNG:

- the pure-Python WAV reader must either return samples or raise ``WavError``
  (anything else — struct.error, ZeroDivisionError, MemoryError — is a bug);
- the native C++ decoders run in a SUBPROCESS so a segfault/abort/std::
  terminate shows up as a failed assertion here, not a dead test runner;
- the threaded batch ingest must map corrupt entries to per-file failures
  while still decoding the healthy ones.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from streamz_tpu.io import native as sznative
from streamz_tpu.io import wav as wavio

N_PY_MUTATIONS = 120
N_NATIVE_MUTATIONS = 48


def _valid_wav_bytes(tmp_path, n=2000, rate=8000) -> bytes:
    t = np.arange(n) / rate
    pcm = (9000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    p = str(tmp_path / "base.wav")
    wavio.write_wav(p, pcm, sample_rate=rate)
    with open(p, "rb") as f:
        return f.read()


def _mutate(rng: np.random.Generator, base: bytes) -> bytes:
    """One random structural mutation of a valid file."""
    buf = bytearray(base)
    kind = rng.integers(0, 5)
    if kind == 0:  # truncate anywhere (headers included)
        return bytes(buf[: rng.integers(0, len(buf))])
    if kind == 1:  # flip 1-8 random bytes
        for _ in range(rng.integers(1, 9)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        return bytes(buf)
    if kind == 2:  # smash a random aligned u32 field with an extreme value
        off = int(rng.integers(0, max(1, len(buf) - 4)))
        val = int(rng.choice([0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 0x80000000]))
        buf[off:off + 4] = struct.pack("<I", val)
        return bytes(buf)
    if kind == 3:  # duplicate a random slice (grows chunk-size lies)
        a = int(rng.integers(0, len(buf)))
        b = int(rng.integers(a, min(len(buf), a + 64)))
        return bytes(buf[:b] + buf[a:b] + buf[b:])
    # kind == 4: pure garbage of a WAV-ish length
    return bytes(rng.integers(0, 256, size=int(rng.integers(0, 400)), dtype=np.uint8))


def test_fuzz_python_wav_reader(tmp_path):
    base = _valid_wav_bytes(tmp_path)
    rng = np.random.default_rng(0)
    p = str(tmp_path / "fuzz.wav")
    outcomes = {"ok": 0, "rejected": 0}
    for i in range(N_PY_MUTATIONS):
        with open(p, "wb") as f:
            f.write(_mutate(rng, base))
        try:
            samples, rate, ch = wavio.read_wav(p)
            assert samples.dtype == np.int16
            assert rate > 0 and ch > 0
            outcomes["ok"] += 1
        except wavio.WavError:
            outcomes["rejected"] += 1
        # any other exception propagates and fails the test
    assert sum(outcomes.values()) == N_PY_MUTATIONS
    # sanity: the mutator produces both survivable and fatal corruption
    assert outcomes["rejected"] > 0


_NATIVE_DRIVER = r"""
import sys
from streamz_tpu.io import native as sznative

paths = sys.argv[1:]
lib = sznative.load()
if lib is None:
    print("NATIVE_UNAVAILABLE")
    sys.exit(0)
ok = bad = 0
for p in paths:
    r = sznative.decode_file(p)
    ok += r is not None
    bad += r is None
# the threaded batch paths exercise the worker-thread error handling
for r in sznative.batch_decode(paths, threads=4):
    pass
for r in sznative.batch_ingest(paths, target_rate=44100, threads=4):
    pass
print(f"DECODED ok={ok} bad={bad}")
"""


def test_fuzz_native_decoders_no_crash(tmp_path):
    """Every mutated file must produce rc!=0 or a decode — never a signal."""
    if not sznative.available():
        pytest.skip("native library unavailable")
    base = _valid_wav_bytes(tmp_path)
    rng = np.random.default_rng(1)
    paths = []
    for i in range(N_NATIVE_MUTATIONS):
        p = str(tmp_path / f"fuzz_{i}.wav")
        with open(p, "wb") as f:
            f.write(_mutate(rng, base))
        paths.append(p)
    # a couple of valid files mixed in keeps the happy path in the same batch
    good = str(tmp_path / "good.wav")
    with open(good, "wb") as f:
        f.write(base)
    paths.append(good)
    # mp3-extension garbage routes through the libmpg123 path
    for i in range(8):
        p = str(tmp_path / f"fuzz_{i}.mp3")
        with open(p, "wb") as f:
            f.write(_mutate(rng, base))
        paths.append(p)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, "-c", _NATIVE_DRIVER, *paths],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, (
        f"native decoder died (rc={proc.returncode}, likely a signal):\n"
        f"stdout={proc.stdout!r}\nstderr={proc.stderr[-2000:]!r}"
    )
    assert "DECODED" in proc.stdout or "NATIVE_UNAVAILABLE" in proc.stdout


def test_fuzz_native_mp3_frames_no_crash(tmp_path):
    """Mutate a *real* LAME-encoded MP3 so corruption lands inside valid
    frame syncs/side-info, exercising libmpg123's frame parser much deeper
    than garbage bytes with an .mp3 extension."""
    if not sznative.available():
        pytest.skip("native library unavailable")
    from test_ingest_parity import _LAME, _encode_mp3

    if _LAME is None:
        pytest.skip("libmp3lame not available")
    rng = np.random.default_rng(3)
    t = np.arange(44100) / 44100.0
    pcm = (9000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    base = _encode_mp3(pcm, 44100)
    paths = []
    for i in range(N_NATIVE_MUTATIONS):
        p = str(tmp_path / f"fuzz_{i}.mp3")
        with open(p, "wb") as f:
            f.write(_mutate(rng, base))
        paths.append(p)
    good = str(tmp_path / "good.mp3")
    with open(good, "wb") as f:
        f.write(base)
    paths.append(good)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, "-c", _NATIVE_DRIVER, *paths],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, (
        f"native mp3 decoder died (rc={proc.returncode}, likely a signal):\n"
        f"stdout={proc.stdout!r}\nstderr={proc.stderr[-2000:]!r}"
    )
    assert "DECODED" in proc.stdout or "NATIVE_UNAVAILABLE" in proc.stdout


_BATCH_DRIVER = r"""
import sys
from streamz_tpu.io import native as sznative

paths = sys.argv[1:]
if sznative.load() is None:
    print("NATIVE_UNAVAILABLE")
    sys.exit(0)
for i, r in enumerate(sznative.batch_ingest(paths, target_rate=44100, threads=3)):
    if r is None:
        print(f"BAD {i}")
    else:
        samples, rate, ch = r
        ok = rate == 44100 and ch == 1 and len(samples) > 0
        print(f"{'OK' if ok else 'MALFORMED'} {i}")
"""


def test_fuzz_batch_ingest_keeps_healthy_files(tmp_path):
    """Corrupt entries fail per-file; healthy neighbors still decode.

    Like the other native fuzz tests, the mutated batch runs in a
    SUBPROCESS — a native crash must fail this assertion, not kill the
    pytest runner."""
    if not sznative.available():
        pytest.skip("native library unavailable")
    base = _valid_wav_bytes(tmp_path)
    rng = np.random.default_rng(2)
    paths, want_good = [], []
    for i in range(12):
        p = str(tmp_path / f"mix_{i}.wav")
        good = i % 3 == 0
        with open(p, "wb") as f:
            f.write(base if good else _mutate(rng, base))
        paths.append(p)
        want_good.append(good)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, "-c", _BATCH_DRIVER, *paths],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, (
        f"batch ingest died (rc={proc.returncode}, likely a signal):\n"
        f"stdout={proc.stdout!r}\nstderr={proc.stderr[-2000:]!r}"
    )
    if "NATIVE_UNAVAILABLE" in proc.stdout:
        pytest.skip("native library unavailable in subprocess")
    status = dict(
        (int(ln.split()[1]), ln.split()[0])
        for ln in proc.stdout.splitlines() if ln.strip()
    )
    for i, good in enumerate(want_good):
        if good:
            assert status.get(i) == "OK", f"healthy file {i}: {status.get(i)}"
        # mutated files may or may not survive — they just must not crash


def test_fuzz_checkpoint_loader(tmp_path):
    """Mutated model.npz must either load or raise — never hang, loop
    unboundedly on crafted per-column keys, or crash the interpreter
    (the CLI catches any exception and falls back to a fresh net)."""
    from streamz_tpu.nn import checkpoint
    from streamz_tpu.nn.model import SpeakerNet

    net = SpeakerNet.new(input_size=8, hidden1=6, hidden2=4, output=3, seed=0)
    base_path = str(tmp_path / "base.npz")
    checkpoint.save(net, base_path)
    with open(base_path, "rb") as f:
        base = f.read()

    rng = np.random.default_rng(4)
    p = str(tmp_path / "fuzz.npz")
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(80):
        with open(p, "wb") as f:
            f.write(_mutate(rng, base))
        try:
            loaded = checkpoint.load(p)
            assert loaded.output_size() >= 0
            outcomes["ok"] += 1
        except Exception:
            outcomes["rejected"] += 1
    assert sum(outcomes.values()) == 80
    assert outcomes["rejected"] > 0
