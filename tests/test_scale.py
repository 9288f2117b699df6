"""VoxCeleb-scale stretch config: 1000-speaker batched training over the mesh
(BASELINE.json configs[4])."""

import numpy as np
import pytest

from streamz_tpu.app.corpus import build_window_pool, train_corpus
from streamz_tpu.nn.model import SpeakerNet
from streamz_tpu.parallel import comm


def test_thousand_speaker_capacity():
    net = SpeakerNet.new(input_size=16, hidden1=32, hidden2=16, output=1000, seed=0)
    assert net.capacity >= 1000
    x = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    probs = net.forward(x)
    assert probs.shape == (4, 1000)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)


def test_corpus_training_1000_speakers_sharded():
    """Synthetic 1000-class corpus trains data-parallel on the 8-device mesh
    and the loss drops."""
    rng = np.random.default_rng(1)
    n_classes, per_class, dim = 1000, 4, 32
    # class centers well separated in a random subspace
    centers = rng.normal(size=(n_classes, dim)).astype(np.float32) * 3.0
    x = (centers[:, None, :] + rng.normal(size=(n_classes, per_class, dim))
         ).reshape(-1, dim).astype(np.float32)
    y = np.repeat(np.arange(n_classes, dtype=np.int32), per_class)

    net = SpeakerNet.new(input_size=dim, hidden1=64, hidden2=32,
                         output=n_classes, seed=2)
    mesh = comm.make_mesh(8)
    losses = train_corpus(
        net, x, y, epochs=12, batch_size=512, lr=0.5, mesh=mesh
    )
    assert len(losses) == 12
    assert losses[-1] < losses[0] * 0.8
    # top-1 on training data beats chance by a wide margin
    preds = net.forward(x[:512]).argmax(axis=1)
    acc = (preds == y[:512]).mean()
    assert acc > 0.05  # chance = 0.001


def test_build_window_pool():
    fm = {
        "a": np.ones((3, 60), np.float32),
        "b": np.zeros((0, 60), np.float32),
        "c": np.full((2, 60), 2.0, np.float32),
    }
    x, y = build_window_pool(fm, [("a", 0), ("b", 1), ("c", 5), ("missing", 2)])
    assert x.shape == (5, 60)
    assert y.tolist() == [0, 0, 0, 5, 5]
