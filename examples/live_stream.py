"""Live streaming identification demo.

Upgrades the reference's stub (``examples/live_stream.rs:1-9``, which only
prints that mic streaming is disabled because the audio backends were removed,
``Cargo.toml:11-13``) into a *working* streaming mode: there is still no mic
in this environment, so the demo simulates one by feeding a clip to
:class:`streamz_tpu.app.stream.StreamingIdentifier` in ~100 ms chunks and
printing the rolling identification as it firms up.

Usage:
    python examples/live_stream.py [path/to/clip.mp3|clip.wav]

Without an argument it synthesizes a tone+noise clip.  With a trained
``model.npz`` in the CWD the real model is used; otherwise a fresh net with a
few random speakers demonstrates the mechanics.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # Honor the env var even when a site hook pre-imported jax before it
    # could take effect (see tests/conftest.py).
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from streamz_tpu import config
from streamz_tpu.app.stream import StreamingIdentifier
from streamz_tpu.nn import checkpoint
from streamz_tpu.nn.model import SpeakerNet


def load_source(argv):
    if len(argv) > 1:
        from streamz_tpu.io.audio import load_and_resample_file

        _, pcm = load_and_resample_file(argv[1])
        return np.asarray(pcm, np.int16), argv[1]
    rng = np.random.default_rng(0)
    t = np.arange(3 * config.DEFAULT_SAMPLE_RATE) / config.DEFAULT_SAMPLE_RATE
    clip = (
        8000 * np.sin(2 * np.pi * 330 * t) + rng.normal(0, 1500, len(t))
    ).astype(np.int16)
    return clip, "<synthesized 3 s tone+noise>"


def main() -> None:
    clip, name = load_source(sys.argv)
    if os.path.exists(config.MODEL_PATH):
        net = checkpoint.load(config.MODEL_PATH)
        print(f"Loaded {config.MODEL_PATH}: {net.output_size()} speakers")
    else:
        net = SpeakerNet.new(output=4, seed=0)
        print("No model.npz found — using a fresh 4-speaker net (demo mode)")

    sid = StreamingIdentifier(net, threshold=0.2)
    chunk = config.DEFAULT_SAMPLE_RATE // 10  # ~100 ms of "mic" audio
    print(f"Streaming {name} in {chunk}-sample chunks:")
    for start in range(0, len(clip), chunk):
        sid.feed(clip[start : start + chunk])
        verdict = sid.current()
        ms = 1000.0 * (start + chunk) / config.DEFAULT_SAMPLE_RATE
        if verdict is None:
            print(f"  t={ms:6.0f} ms  (no confident speaker yet)")
        else:
            print(f"  t={ms:6.0f} ms  speaker {verdict[0]}  conf {verdict[1]:.3f}")
    final = sid.finalize()
    if final is None:
        print("Final: unidentified")
    else:
        print(f"Final: speaker {final[0]} (confidence {final[1]:.3f})")


if __name__ == "__main__":
    main()
