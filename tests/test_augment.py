"""Augmentation semantics tests (src/lib.rs:103-116)."""

import numpy as np
import jax
import pytest

from streamz_tpu.dsp.augment import augment


def test_augment_shapes_and_range():
    x = (np.random.default_rng(0).normal(0, 8000, 4000)).astype(np.int16)
    out = np.asarray(augment(jax.random.PRNGKey(0), x.astype(np.float32)))
    assert out.shape == x.shape
    assert out.min() >= -32768.0 and out.max() <= 32767.0
    # integer-valued (i16 truncation semantics)
    np.testing.assert_array_equal(out, np.trunc(out))


def test_augment_gain_and_noise_bounds():
    """Output stays within gain/noise envelope of a circularly shifted input."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 10000, 2000).astype(np.int16).astype(np.float32)
    out = np.asarray(augment(jax.random.PRNGKey(1), x))
    # Find the shift by correlating: some circular shift of x must match out
    # within gain [0.95, 1.05] and noise 0.005*32767 ~ 164.
    best_err = np.inf
    for s in range(0, 800):
        shifted = np.roll(x, -s)
        # estimate gain by least squares
        g = float(shifted @ out) / max(float(shifted @ shifted), 1e-9)
        err = np.abs(out - g * shifted).max()
        if err < best_err:
            best_err = err
            best_gain = g
    assert best_err < 170.0  # noise amplitude bound + rounding
    assert 0.94 < best_gain < 1.06


def test_augment_batched_independent():
    x = np.tile(
        np.random.default_rng(2).normal(0, 5000, 1000).astype(np.float32),
        (3, 1),
    )
    out = np.asarray(augment(jax.random.PRNGKey(2), x))
    # Different clips get different gains/shifts/noise.
    assert not np.allclose(out[0], out[1])
    assert not np.allclose(out[1], out[2])


def test_augment_deterministic_per_key():
    x = np.random.default_rng(3).normal(0, 5000, 1000).astype(np.float32)
    a = np.asarray(augment(jax.random.PRNGKey(7), x))
    b = np.asarray(augment(jax.random.PRNGKey(7), x))
    np.testing.assert_array_equal(a, b)
