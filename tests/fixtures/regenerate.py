"""Regenerate the golden fixtures — a DELIBERATE act that redefines the
frozen feature/checkpoint contract (see tests/test_golden_fixtures.py).

Run from the repo root:  JAX_PLATFORMS=cpu python tests/fixtures/regenerate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from streamz_tpu.dsp.mfcc_ref import extract_features_np
from streamz_tpu.nn import checkpoint
from streamz_tpu.nn.model import SpeakerNet

FIX = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    rng = np.random.default_rng(20260816)
    t = np.arange(12000) / 44100.0
    clip = (
        9000 * np.sin(2 * np.pi * 440 * t)
        + 4000 * np.sin(2 * np.pi * 1270 * t)
        + rng.normal(0, 800, 12000)
    ).astype(np.int16)
    np.save(os.path.join(FIX, "golden_clip.npy"), clip)
    np.save(os.path.join(FIX, "golden_features.npy"), extract_features_np(clip))

    net = SpeakerNet.new(input_size=6, hidden1=5, hidden2=4, output=3, seed=20260816)
    net.record_training_file(0, "data/a.wav")
    net.record_training_file(2, "data/c.wav")
    net.set_embeddings(
        [
            (np.linspace(0, 1, 4).astype(np.float32) + i, 0.5 + 0.1 * i, 0.01 * i)
            for i in range(3)
        ]
    )
    net.set_encoding_layer(
        rng.normal(size=(4, 16)).astype(np.float32),
        rng.normal(size=(16,)).astype(np.float32),
    )
    checkpoint.save(net, os.path.join(FIX, "golden_model.npz"))
    x = rng.normal(size=(5, 6)).astype(np.float32)
    np.save(os.path.join(FIX, "golden_model_input.npy"), x)
    np.save(os.path.join(FIX, "golden_model_probs.npy"), net.forward(x))

    # Full ingest-chain fixture: one bundled 32 kHz Common Voice clip through
    # MP3 decode → downmix → resample → features (tests/test_ingest_parity.py).
    ref_clip = (
        "/root/reference/streamz-rs/examples/training_data/"
        "common_voice_fr_41911269.mp3"
    )
    if os.path.isfile(ref_clip):
        import tempfile

        from streamz_tpu.io.audio import load_and_resample_file

        cwd = os.getcwd()
        os.chdir(tempfile.mkdtemp())
        try:
            _, pcm = load_and_resample_file(ref_clip)
        finally:
            os.chdir(cwd)
        np.save(
            os.path.join(FIX, "golden_ingest_features.npy"),
            extract_features_np(np.asarray(pcm, np.int16)),
        )

    print("fixtures regenerated")


if __name__ == "__main__":
    main()
