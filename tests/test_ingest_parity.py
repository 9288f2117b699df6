"""Ingest-chain parity evidence (SURVEY.md hard-part #1).

Bounds decoder drift (mpg123 here vs the reference's minimp3,
``streamz-rs/src/lib.rs:416-444``) and resampler drift (this repo's chunked
FFT OLA vs the reference's rubato FftFixedInOut, ``src/lib.rs:83-96``,
``:186-209``) with *external* oracles, through to the feature level:

- the resampler is pinned against ``scipy.signal.resample_poly`` (an
  independent polyphase implementation) with quantified PCM and feature-level
  tolerances, after compensating the known FIR group delay
  ``(Nin-1)/2 * fs_out/fs_in`` (the causal windowed-sinc in
  ``streamz_tpu/dsp/resample.py``);
- the full MP3 → decode → downmix → resample → features chain is pinned
  against *ground truth* by synthesizing PCM, encoding it with libmp3lame
  (an encoder the pipeline never uses), and bounding the feature drift of
  the decoded chain vs the directly-resampled original;
- the bundled 32 kHz Common Voice clips are frozen as a golden full-chain
  fixture (regression pin, tolerance 1e-3).

Feature-space units are z-normalized MFCC+Δ+ΔΔ values (per-frame mean 0 /
std 1), so the tolerances are scale-free.
"""

import ctypes
import os

import numpy as np
import pytest
from scipy.signal import butter, correlate, lfilter, resample_poly

from streamz_tpu.dsp.mfcc_ref import extract_features_np
from streamz_tpu.dsp.resample import _plan, resample_to_44100

REF_DATA = "/root/reference/streamz-rs/examples/training_data"
FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _speech_like(rate: int, seconds: float = 3.0, seed: int = 7) -> np.ndarray:
    """Band-limited noise (80 Hz .. min(7 kHz, Nyquist-1k)) — broadband like
    speech, far harder on a resampler/codec than pure tones."""
    rng = np.random.default_rng(seed)
    n = int(rate * seconds)
    white = rng.normal(size=n + 2000)
    hi = min(7000, rate // 2 - 1000)
    b, a = butter(4, [80 / (rate / 2), hi / (rate / 2)], btype="band")
    sig = lfilter(b, a, white)[2000:]
    sig /= np.abs(sig).max()
    return (sig * 18000).astype(np.int16)


def _delay_by(x: np.ndarray, d: float) -> np.ndarray:
    """Fractional delay via FFT phase ramp (band-limited signals only)."""
    n = len(x)
    f = np.fft.rfftfreq(n)
    return np.fft.irfft(np.fft.rfft(x) * np.exp(-2j * np.pi * f * d), n=n)


def _align_lag(a: np.ndarray, b: np.ndarray) -> float:
    """Sub-sample lag of ``a`` relative to ``b`` (cross-correlation peak with
    parabolic interpolation)."""
    n = min(len(a), len(b))
    c = correlate(a[:n], b[:n], "full")
    k = int(np.argmax(c))
    if 0 < k < len(c) - 1:
        y0, y1, y2 = c[k - 1], c[k], c[k + 1]
        denom = y0 - 2 * y1 + y2
        frac = 0.5 * (y0 - y2) / denom if denom != 0 else 0.0
    else:
        frac = 0.0
    return k - (n - 1) + float(frac)


def _compare(chain: np.ndarray, gt: np.ndarray, *, skip: int = 4000,
             tail: int = 8000):
    """Align ``chain`` (delayed) to ground truth ``gt`` and return
    (pcm_corr, pcm_relrms, feat_absdiff[frames, 60])."""
    lag_f = _align_lag(chain, gt)
    lag = int(np.floor(lag_f))
    gt_al = _delay_by(gt, lag_f - lag)
    n = min(len(chain) - lag, len(gt_al))
    a, b = skip, n - tail
    ch, g = chain[a + lag : b + lag].astype(np.float64), gt_al[a:b]
    corr = float(np.dot(ch, g) / (np.linalg.norm(ch) * np.linalg.norm(g)))
    rel = float(np.linalg.norm(ch - g) / np.linalg.norm(g))
    m = (b - a) // 400 * 400
    fa = extract_features_np(chain[a + lag : a + lag + m].astype(np.int16))
    fb = extract_features_np(
        np.trunc(np.clip(gt_al[a : a + m], -32768, 32767)).astype(np.int16)
    )
    k = min(len(fa), len(fb)) - 2  # drop the tail frames the trim truncated
    return corr, rel, np.abs(fa[:k] - fb[:k])


def _lame():
    try:
        lib = ctypes.CDLL("libmp3lame.so.0")
        lib.lame_init.restype = ctypes.c_void_p
        return lib
    except OSError:
        return None


_LAME = _lame()


def _encode_mp3(pcm_i16: np.ndarray, rate: int, brate: int = 320) -> bytes:
    gfp = ctypes.c_void_p(_LAME.lame_init())
    _LAME.lame_set_in_samplerate(gfp, ctypes.c_int(rate))
    _LAME.lame_set_num_channels(gfp, ctypes.c_int(1))
    _LAME.lame_set_mode(gfp, ctypes.c_int(3))  # mono
    _LAME.lame_set_brate(gfp, ctypes.c_int(brate))
    _LAME.lame_set_quality(gfp, ctypes.c_int(0))
    assert _LAME.lame_init_params(gfp) >= 0
    pcm = np.ascontiguousarray(pcm_i16, np.int16)
    buf = ctypes.create_string_buffer(int(1.25 * len(pcm) + 7200))
    m = _LAME.lame_encode_buffer(
        gfp,
        pcm.ctypes.data_as(ctypes.c_void_p),
        pcm.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(len(pcm)),
        buf,
        ctypes.c_int(len(buf)),
    )
    assert m >= 0
    out = buf.raw[:m]
    m2 = _LAME.lame_encode_flush(gfp, buf, ctypes.c_int(len(buf)))
    out += buf.raw[:m2]
    _LAME.lame_close(gfp)
    return out


# ---------------------------------------------------------------------------
# resampler vs scipy.signal.resample_poly (external polyphase oracle)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rate", [32000, 48000, 22050, 16000, 8000])
def test_resampler_vs_scipy_oracle(rate):
    """Group-delay-compensated output matches scipy's polyphase resampler:
    PCM correlation >= 0.9999 and relative RMS error <= 2% on broadband
    speech-like noise (measured: <=0.13% except 16 kHz at 0.97%, whose band
    reaches the anti-alias transition)."""
    x = _speech_like(rate)
    ours = np.asarray(resample_to_44100(x, rate), np.float64)
    nin, _, _ = _plan(rate, 44100)
    d_exact = (nin - 1) / 2 * 44100 / rate
    d_int = int(np.floor(d_exact))
    sp = resample_poly(x.astype(np.float64), 44100, rate)
    sp_al = _delay_by(sp, d_exact - d_int)
    n = min(len(ours) - d_int, len(sp_al))
    a, b = 2000, n - 2000
    o, s = ours[a + d_int : b + d_int], sp_al[a:b]
    corr = np.dot(o, s) / (np.linalg.norm(o) * np.linalg.norm(s))
    rel = np.linalg.norm(o - s) / np.linalg.norm(s)
    assert corr >= 0.9999, corr
    assert rel <= 0.02, rel


@pytest.mark.parametrize("rate", [32000, 16000])
def test_resampler_feature_drift_vs_scipy(rate):
    """Resampler drift measured where it matters: through the MFCC frontend.
    Mean |Δfeature| <= 0.02 and p99 <= 0.15 z-norm units (measured 0.013 /
    0.093 worst-case at 16 kHz)."""
    x = _speech_like(rate)
    ours = np.asarray(resample_to_44100(x, rate), np.float64)
    sp = resample_poly(x.astype(np.float64), 44100, rate)
    _, _, diff = _compare(ours, sp, skip=2000, tail=2000)
    assert diff.mean() <= 0.02, diff.mean()
    assert np.percentile(diff, 99) <= 0.15, np.percentile(diff, 99)


# ---------------------------------------------------------------------------
# full MP3 chain vs synthesized ground truth (libmp3lame round trip)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(_LAME is None, reason="libmp3lame not available")
@pytest.mark.parametrize("rate", [44100, 32000, 48000])
def test_mp3_chain_feature_drift_vs_ground_truth(rate, tmp_path, monkeypatch):
    """Synthesized PCM → lame 320 kbps → (mpg123 decode → downmix →
    resample) vs the directly-resampled original.  The 44100 case isolates
    pure decoder drift (no resample)."""
    from streamz_tpu.io.audio import load_and_resample_file

    x = _speech_like(rate)
    gt = (
        x.astype(np.float64)
        if rate == 44100
        else resample_poly(x.astype(np.float64), 44100, rate)
    )
    p = tmp_path / "clip.mp3"
    p.write_bytes(_encode_mp3(x, rate))
    monkeypatch.chdir(tmp_path)
    chain = np.asarray(load_and_resample_file(str(p))[1], np.float64)

    corr, rel, diff = _compare(chain, gt)
    if rate == 44100:
        # decode-only: measured corr 0.99998, feat mean 0.0019
        assert corr >= 0.9995, corr
        assert diff.mean() <= 0.01, diff.mean()
        assert np.percentile(diff, 99) <= 0.05
    else:
        assert corr >= 0.995, corr
        assert diff.mean() <= 0.03
        assert np.percentile(diff, 99) <= 0.2


# ---------------------------------------------------------------------------
# bundled Common Voice clips: frozen full-chain golden fixture
# ---------------------------------------------------------------------------

_GOLDEN_CLIP = "common_voice_fr_41911269.mp3"
_GOLDEN_PATH = os.path.join(FIX, "golden_ingest_features.npy")


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample data absent"
)
def test_bundled_clip_full_chain_golden(tmp_path, monkeypatch):
    """The full chain on a real 32 kHz Common Voice MP3 reproduces the frozen
    fixture within 1e-3 — any silent decoder/resampler/frontend drift fails
    here."""
    from streamz_tpu.io.audio import load_and_resample_file

    monkeypatch.chdir(tmp_path)
    path, pcm = load_and_resample_file(os.path.join(REF_DATA, _GOLDEN_CLIP))
    feats = extract_features_np(np.asarray(pcm, np.int16))
    golden = np.load(_GOLDEN_PATH)
    assert feats.shape == golden.shape
    np.testing.assert_allclose(feats[: len(golden)], golden, atol=1e-3)


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample data absent"
)
def test_bundled_clip_metadata():
    """The bundled clips really are 32 kHz sources (the resampler is in the
    loop for them), and the chain emits 44.1 kHz mono i16."""
    from streamz_tpu.io.audio import load_and_resample_file
    from streamz_tpu.io.mp3 import load_mp3_samples

    p = os.path.join(REF_DATA, _GOLDEN_CLIP)
    _, rate, _ = load_mp3_samples(p)
    assert rate == 32000
    _, pcm = load_and_resample_file(p)
    assert np.asarray(pcm).dtype == np.int16
