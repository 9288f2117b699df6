"""Streaming identification (app/stream.py): exact offline parity.

The streaming mode is a *latency* mode, not an approximation: after
``finalize()``, the streamed feature sequence and vote-sum verdict must match
the offline pipeline (``streamz-rs/src/lib.rs:279-345`` frontend +
``:1307-1343`` voting) on the same PCM, for any chunking of the input.
"""

import numpy as np
import pytest

from streamz_tpu.app.stream import StreamingIdentifier
from streamz_tpu.dsp.mfcc import extract_features
from streamz_tpu.infer.identify import (
    identify_speaker,
    identify_speaker_with_threshold,
)
from streamz_tpu.nn.model import SpeakerNet


@pytest.fixture(scope="module")
def net():
    return SpeakerNet.new(output=5, seed=0)


def _stream(net, clip, chunks, **kw):
    sid = StreamingIdentifier(net, collect_features=True, **kw)
    i = 0
    for n in chunks:
        sid.feed(clip[i : i + n])
        i += n
    if i < len(clip):
        sid.feed(clip[i:])
    return sid


def test_streamed_features_match_offline(net):
    rng = np.random.default_rng(0)
    clip = rng.normal(0, 3000, size=5 * 44100 + 123).astype(np.int16)
    chunks = rng.integers(1, 5000, size=200).tolist()
    sid = _stream(net, clip, chunks, threshold=0.0)
    sid.finalize()
    ref = extract_features(clip)
    out = sid.streamed_features()
    assert ref.shape == out.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_final_verdict_matches_offline_voting(net):
    rng = np.random.default_rng(1)
    clip = rng.normal(0, 3000, size=2 * 44100).astype(np.int16)
    sid = _stream(net, clip, [len(clip)], threshold=0.0)
    speaker, conf = sid.finalize()
    assert speaker == identify_speaker(net, clip)
    assert speaker == identify_speaker_with_threshold(net, clip, 0.0)
    assert 0.0 < conf <= 1.0


def test_chunking_invariance(net):
    """Same PCM through wildly different chunkings → identical results."""
    rng = np.random.default_rng(2)
    clip = rng.normal(0, 3000, size=44100).astype(np.int16)
    a = _stream(net, clip, [len(clip)], threshold=0.0)
    b = _stream(net, clip, [7] * 1000, threshold=0.0)
    va, vb = a.finalize(), b.finalize()
    assert va[0] == vb[0]
    np.testing.assert_allclose(va[1], vb[1], rtol=1e-5)
    np.testing.assert_allclose(
        a.streamed_features(), b.streamed_features(), atol=1e-5
    )


@pytest.mark.parametrize("n", [0, 100, 800, 1200, 1600, 4000])
def test_tiny_streams_match_offline(net, n):
    rng = np.random.default_rng(n)
    clip = rng.normal(0, 3000, size=n).astype(np.int16)
    sid = _stream(net, clip, [max(n // 3, 1)] * 3, threshold=0.0)
    sid.finalize()
    ref = extract_features(clip)
    out = sid.streamed_features()
    assert ref.shape == out.shape
    if ref.size:
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_rolling_verdict_available_mid_stream(net):
    rng = np.random.default_rng(3)
    clip = rng.normal(0, 3000, size=44100).astype(np.int16)
    sid = StreamingIdentifier(net, threshold=0.0)
    sid.feed(clip[:22050])
    mid = sid.current()
    assert mid is not None  # enough finalized frames for a verdict
    sid.feed(clip[22050:])
    assert sid.finalize() is not None


def test_single_speaker_net_returns_none():
    # output_size <= 1 → None (src/lib.rs:1311-1315)
    net1 = SpeakerNet.new(output=1, seed=0)
    rng = np.random.default_rng(4)
    clip = rng.normal(0, 3000, size=8000).astype(np.int16)
    sid = StreamingIdentifier(net1, threshold=0.0)
    sid.feed(clip)
    assert sid.finalize() is None


def test_threshold_gates_verdict(net):
    rng = np.random.default_rng(5)
    clip = rng.normal(0, 3000, size=8000).astype(np.int16)
    sid = StreamingIdentifier(net, threshold=1.01)  # impossible confidence
    sid.feed(clip)
    assert sid.finalize() is None


def test_example_runs(capsys):
    import examples.live_stream as ls

    import sys as _sys

    old = _sys.argv
    _sys.argv = ["live_stream.py"]
    try:
        ls.main()
    finally:
        _sys.argv = old
    out = capsys.readouterr().out
    assert "Final:" in out


def test_feed_after_finalize_raises():
    """Post-finalize feed must raise even under python -O (a stripped
    assert would re-finalize the flushed lookahead frames and silently
    double-count votes)."""
    net = SpeakerNet.new(output=2, seed=0)
    s = StreamingIdentifier(net, threshold=0.0)
    s.feed((np.random.default_rng(0).normal(0, 3000, size=12000)
            ).astype(np.int16))
    s.finalize()
    with pytest.raises(RuntimeError, match="finalized"):
        s.feed(np.zeros(400, np.int16))
