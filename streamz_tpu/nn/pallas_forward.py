"""Fused Pallas classifier forward: 60→512→256→S MLP + masked softmax.

The XLA forward materializes the hidden activations in HBM between layers
(h1 [R, 512] and h2 [R, 256] — ~80 MB for a 35k-window batch).  This kernel
keeps the whole per-tile chain in VMEM: one grid step loads a [TILE, 64]
feature block plus the (small, ~0.8 MB) weight matrices and emits the
masked softmax probabilities — the device side of ``identify_speaker``'s
per-window classification (reference ``streamz-rs/src/lib.rs:880-891``).

Class masking matches :func:`streamz_tpu.nn.model.forward`: logits at or
beyond ``num_speakers`` (scalar-prefetched) are pinned to a large negative
value so their probability is exactly 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from streamz_tpu.nn.model import MASK_LOGIT, Params

_TILE = 512
_IN_PAD = 64  # 60-dim features padded to the f32 sublane-friendly width


def _use_interpret() -> bool:
    from streamz_tpu.runtime.autotune import use_interpret

    return use_interpret()


def _fwd_kernel(ns_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref):
    # DEFAULT (1-pass bf16) like XLA's inference forward: classification
    # probabilities tolerate bf16 easily and 6-pass f32 costs ~1.7x here.
    prec = jax.lax.Precision.DEFAULT
    h1 = jnp.maximum(
        jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec) + b1_ref[:], 0.0)
    h2 = jnp.tanh(
        jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32,
                precision=prec) + b2_ref[:])
    logits = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32,
                     precision=prec) + b3_ref[:]
    cap = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < ns_ref[0], logits, MASK_LOGIT)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    # Keep the documented invariant (inactive columns exactly 0.0) in the
    # ns == 0 degeneracy too, where the all-MASK_LOGIT softmax would emit a
    # uniform 1/capacity row — matches model.forward's explicit mask.
    out_ref[:] = jnp.where(col < ns_ref[0], probs, 0.0)


@jax.jit
def forward_probs_pallas(params: Params, x: jax.Array, num_speakers) -> jax.Array:
    """Masked softmax probabilities for a window batch.

    x: [R, F] (any F ≤ 64) → [R, capacity]; drop-in for
    ``model.forward(params, x, num_speakers)`` on 2-D inputs.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F = x.shape
    cap = params["b3"].shape[0]
    h1 = params["w1"].shape[1]
    h2 = params["w2"].shape[1]

    r_pad = -(-max(R, 1) // _TILE) * _TILE
    xp = jnp.zeros((r_pad, _IN_PAD), jnp.float32)
    xp = xp.at[:R, :F].set(x)
    w1p = jnp.zeros((_IN_PAD, h1), jnp.float32).at[:F].set(params["w1"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, _IN_PAD), lambda j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_IN_PAD, h1), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h1), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, cap), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, cap), lambda j, *_: (j, 0), memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, cap), jnp.float32),
        interpret=_use_interpret(),
    )(
        jnp.asarray([num_speakers], jnp.int32),
        xp,
        w1p,
        params["b1"][None, :],
        params["w2"],
        params["b2"][None, :],
        params["w3"],
        params["b3"][None, :],
    )
    return out[:R]
