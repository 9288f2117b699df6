"""Batched on-device data augmentation (``streamz-rs/src/lib.rs:103-116``).

Per clip: random gain in [0.95, 1.05), additive noise with per-clip amplitude
in [0, 0.005)·32767 and per-sample value in (-amp, amp), and a circular left
shift in [0, min(len, 800)).  Output is clamped to the i16 range and truncated
toward zero, reproducing the reference's ``as i16`` cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from streamz_tpu import config


def augment(key: jax.Array, samples: jax.Array, n_samples=None) -> jax.Array:
    """Augment PCM. samples: [T] or [B, T] i16/f32 raw-scale values.

    ``n_samples`` optionally gives the valid length per clip (defaults to the
    full padded width); the circular shift wraps within the valid region.
    Returns float32 at the raw i16 scale (truncated to integer values).
    """
    squeeze = samples.ndim == 1
    x = jnp.atleast_2d(jnp.asarray(samples, jnp.float32))
    B, T = x.shape
    if n_samples is None:
        n = jnp.full((B,), T, jnp.int32)
    else:
        n = jnp.atleast_1d(jnp.asarray(n_samples, jnp.int32))

    k_noise_amp, k_gain, k_shift, k_noise = jax.random.split(key, 4)
    noise_amp = jax.random.uniform(k_noise_amp, (B, 1), minval=0.0, maxval=0.005)
    gain = jax.random.uniform(k_gain, (B, 1), minval=0.95, maxval=1.05)
    shift_max = jnp.maximum(jnp.minimum(n, config.WINDOW_SIZE), 1)
    shift = (
        jax.random.uniform(k_shift, (B,)) * shift_max.astype(jnp.float32)
    ).astype(jnp.int32)

    idx = jnp.arange(T)[None, :]
    src = jnp.where(n[:, None] > 0, (idx + shift[:, None]) % jnp.maximum(n[:, None], 1), idx)
    shifted = jnp.take_along_axis(x, src, axis=1)

    noise = jax.random.uniform(k_noise, (B, T), minval=-1.0, maxval=1.0) * noise_amp
    val = shifted * gain + noise * 32767.0
    val = jnp.clip(val, -32768.0, 32767.0)
    val = jnp.trunc(val)
    val = jnp.where(idx < n[:, None], val, x)
    return val[0] if squeeze else val
