"""Fused Pallas classifier forward vs the XLA model forward."""

import numpy as np
import jax.numpy as jnp
import pytest

from streamz_tpu.nn.model import SpeakerNet, forward
from streamz_tpu.nn.pallas_forward import forward_probs_pallas


@pytest.mark.parametrize("rows", [1, 512, 700])
def test_matches_xla_forward(rows):
    net = SpeakerNet.new(output=5, seed=3)
    x = np.random.default_rng(0).normal(size=(rows, 60)).astype(np.float32)
    want = np.asarray(forward(net.params, jnp.asarray(x), net.num_speakers))
    got = np.asarray(forward_probs_pallas(net.params, jnp.asarray(x), net.num_speakers))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    assert np.all(got[:, net.num_speakers:] == 0.0)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_grown_class_count():
    net = SpeakerNet.new(output=2, seed=4)
    x = np.random.default_rng(1).normal(size=(64, 60)).astype(np.float32)
    p2 = np.asarray(forward_probs_pallas(net.params, jnp.asarray(x), 2))
    net.add_output_class()
    p3 = np.asarray(forward_probs_pallas(net.params, jnp.asarray(x), 3))
    assert np.all(p2[:, 2:] == 0.0)
    assert np.any(p3[:, 2] > 0.0)
