"""Quickstart: the library API end-to-end on synthetic audio.

Demonstrates the same flow a user of the reference binary knows —
train on labeled clips, identify new audio, extract embeddings, match by
cosine, checkpoint to ``model.npz`` — using the TPU-native library surface.

Run:  python examples/quickstart.py   (works on CPU or TPU)
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

import streamz_tpu as sz


def synth_voice(pitch_hz: float, seed: int = 0, bright: bool = False) -> np.ndarray:
    """A crude synthetic 'speaker': harmonic stack + noise, i16 at 44.1 kHz.

    ``bright`` selects a high-harmonic timbre so the two demo speakers have
    clearly different spectral envelopes.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(int(44100 * 2.0)) / 44100.0
    harmonics = range(8, 16) if bright else range(4)
    sig = sum(
        (0.7 ** i) * np.sin(2 * np.pi * pitch_hz * (k + 1) * t)
        for i, k in enumerate(harmonics)
    )
    sig = 9000.0 * sig + rng.normal(0, 400, len(t))
    return np.clip(sig, -32768, 32767).astype(np.int16)


def main() -> None:
    extractor = sz.FeatureExtractor()

    # Two "speakers" with three clips each, interleaved in the training list
    # (training one speaker's whole corpus last would bias the classifier).
    clips = {
        0: [synth_voice(110.0, seed=s) for s in range(3)],
        1: [synth_voice(110.0, seed=s + 10, bright=True) for s in range(3)],
    }
    feature_map = {
        f"s{spk}_{i}": extractor.extract(rec)
        for spk, recs in clips.items()
        for i, rec in enumerate(recs)
    }
    files = [(f"s{spk}_{i}", spk) for i in range(3) for spk in (0, 1)]

    net = sz.SpeakerNet.new(output=2, seed=0)
    loss = sz.train_from_feature_map(
        net, feature_map, files, epochs=20, lr=0.01, dropout=0.2, batch_size=8
    )
    print(f"trained 2 speakers; mean loss {loss:.4f}")

    # Identify held-out clips by window voting.
    probe0 = synth_voice(110.0, seed=99)
    probe1 = synth_voice(110.0, seed=98, bright=True)
    print("probe0 ->", sz.identify_speaker(net, probe0, extractor))   # 0
    print("probe1 ->", sz.identify_speaker(net, probe1, extractor))   # 1

    # Embedding + cosine matching against per-speaker centroids.
    cents = {
        spk: sz.average_vectors([
            sz.extract_embedding_from_features(net, feature_map[f"s{spk}_{i}"])
            for i in range(3)
        ])
        for spk in clips
    }
    emb = sz.extract_embedding_from_features(net, extractor.extract(probe1))
    matched = sz.identify_speaker_from_embedding(emb, cents, threshold=0.8)
    print("cosine match ->", matched)  # 1

    # Grow a third class on the fly and checkpoint.
    net.add_output_class()
    net.save("quickstart_model.npz")
    again = sz.SpeakerNet.load("quickstart_model.npz")
    print(f"checkpoint round trip: {again.output_size()} speakers")
    os.remove("quickstart_model.npz")


if __name__ == "__main__":
    main()
