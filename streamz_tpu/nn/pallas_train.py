"""Fused Pallas training step: forward + hand-rolled backward in VMEM.

The XLA ``corpus_step`` (``nn/train.py:202``) is HBM-bound: it materializes
h1 [B,512], h2 [B,256], logits [B,128] f32 plus their backward counterparts —
~12 KB of HBM round trips per window against ~1.3 MFLOP of useful math
(measured ~30 ns/window at B=131k on v5e; the MXU bound is ~7 ns).  This
kernel runs the whole chain per 512-row tile inside VMEM and accumulates the
weight gradients across grid steps in the output refs, so HBM traffic drops
to the feature read (256 B/window) plus the (tiny, tile-invariant) gradient
tensors written once.

Semantics are identical to ``corpus_step``'s gradient: the surrogate loss
``sum_i w_i * (logsumexp(logits_i) - <t_i, logits_i>)`` whose gradient is the
reference's hand-written delta ``softmax - target`` chain
(``streamz-rs/src/lib.rs:954-1060``), with out-of-range labels yielding a
zero target vector (``src/lib.rs:592-594``) and capacity columns masked
exactly as :func:`streamz_tpu.nn.model.forward_logits` does.

The reported loss value and valid count ride along in a stats output, so the
step needs no second forward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from streamz_tpu.nn.model import MASK_LOGIT, Params

_IN_PAD = 64  # 60-dim features padded to a lane-friendly width


def _tile_for(capacity: int) -> int:
    """Row-tile size bounded by VMEM: the per-tile live set grows linearly
    with the class capacity (logits/probs/target/delta are [tile, cap] f32,
    plus w3/dw3 [256, cap]).  512 rows fits comfortably at cap<=256
    (~6 MB); halve the tile as capacity doubles to stay under ~8 MB at the
    1024-class stretch config."""
    if capacity <= 256:
        return 512
    if capacity <= 512:
        return 256
    return 128


def _use_interpret() -> bool:
    from streamz_tpu.runtime.autotune import use_interpret

    return use_interpret()


def _dotT_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    """a.T @ b contracting the row (batch) axis: [T,M],[T,N] -> [M,N]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotT_cols(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b.T contracting the column axis: [T,N],[M,N] -> [T,M]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _train_kernel(ns_ref, x_ref, lab_ref, w_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                  stats_ref):
    j = pl.program_id(0)

    x = x_ref[:]                                    # [T, 64]
    labels = lab_ref[:]                             # [T, 1] int32
    wvec = w_ref[:]                                 # [T, 1] f32

    # Forward (DEFAULT = 1-pass bf16 on the MXU, matching XLA's inference
    # and training precision on TPU).
    h1 = jnp.maximum(
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:], 0.0)                           # [T, 512]
    h2 = jnp.tanh(
        jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:])                                # [T, 256]
    logits = (jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
              + b3_ref[:])                          # [T, cap]

    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    ns = ns_ref[0]
    live_col = col < ns                             # [T, cap] bool
    logits = jnp.where(live_col, logits, MASK_LOGIT)

    # Target: one-hot of the label, zeroed when the label is out of range
    # (the reference's pretrain_from_features quirk).
    target = jnp.where(
        (col == labels) & (labels < ns), 1.0, 0.0
    ).astype(jnp.float32)                           # [T, cap]

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    se = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / se
    lse = m + jnp.log(se)                           # [T, 1]

    # Reported per-sample surrogate loss and the delta that IS the gradient.
    # The (col < ns) factor reproduces the where-mask's backward exactly:
    # for live columns it is 1; for masked columns the XLA path's gradient
    # is identically zero (for ns > 0 the exp underflow already gives
    # probs == 0 there, but when ns == 0 the softmax degenerates to uniform
    # and only this mask keeps the update at exactly zero).
    per = lse - jnp.sum(target * logits, axis=-1, keepdims=True)  # [T, 1]
    delta = (probs - target) * wvec * live_col.astype(jnp.float32)

    # Backward, all in VMEM.
    dh2 = _dotT_cols(delta, w3_ref[:]) * (1.0 - h2 * h2)        # [T, 256]
    dh1 = _dotT_cols(dh2, w2_ref[:]) * (h1 > 0.0).astype(jnp.float32)

    dw3 = _dotT_rows(h2, delta)                     # [256, cap]
    dw2 = _dotT_rows(h1, dh2)                       # [512, 256]
    dw1 = _dotT_rows(x, dh1)                        # [64, 512]
    db3 = jnp.sum(delta, axis=0, keepdims=True)
    db2 = jnp.sum(dh2, axis=0, keepdims=True)
    db1 = jnp.sum(dh1, axis=0, keepdims=True)

    loss = jnp.sum(per * wvec, axis=0, keepdims=True)     # [1, 1]
    count = jnp.sum(wvec, axis=0, keepdims=True)          # [1, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats = (jnp.where(lane == 0, loss, 0.0)
             + jnp.where(lane == 1, count, 0.0))

    @pl.when(j == 0)
    def _init():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2
        dw3_ref[:] = dw3
        db3_ref[:] = db3
        stats_ref[:] = stats

    @pl.when(j != 0)
    def _accum():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2
        dw3_ref[:] += dw3
        db3_ref[:] += db3
        stats_ref[:] += stats


def corpus_grads_pallas(
    params: Params,
    batch: jax.Array,     # [B, F] f32, F <= 64
    labels: jax.Array,    # [B] int32
    weights: jax.Array,   # [B] f32 0/1
    num_speakers,
):
    """Summed gradients + (loss_sum, count) for one labeled batch.

    Drop-in for the ``jax.value_and_grad(summed)`` core of
    ``train.corpus_step`` — returns the *sum* gradient (callers scale by
    ``lr/count`` exactly as before).
    """
    from jax.experimental.pallas import tpu as pltpu

    B, F = batch.shape
    cap = params["b3"].shape[0]
    h1 = params["w1"].shape[1]
    h2 = params["w2"].shape[1]

    tile = _tile_for(cap)
    n_tiles = -(-max(B, 1) // tile)
    b_pad = n_tiles * tile
    xp = jnp.zeros((b_pad, _IN_PAD), jnp.float32).at[:B, :F].set(batch)
    lp = jnp.full((b_pad, 1), jnp.int32(-1)).at[:B, 0].set(labels)
    wp = jnp.zeros((b_pad, 1), jnp.float32).at[:B, 0].set(weights)
    w1p = jnp.zeros((_IN_PAD, h1), jnp.float32).at[:F].set(params["w1"])

    def fixed(shp):
        return pl.BlockSpec(shp, lambda j, *_: (0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, _IN_PAD), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            fixed((_IN_PAD, h1)), fixed((1, h1)),
            fixed((h1, h2)), fixed((1, h2)),
            fixed((h2, cap)), fixed((1, cap)),
        ],
        out_specs=[
            fixed((_IN_PAD, h1)), fixed((1, h1)),
            fixed((h1, h2)), fixed((1, h2)),
            fixed((h2, cap)), fixed((1, cap)),
            fixed((1, 128)),
        ],
    )
    outs = pl.pallas_call(
        _train_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_IN_PAD, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((h2, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        jnp.asarray([num_speakers], jnp.int32),
        xp, lp, wp,
        w1p, params["b1"][None, :],
        params["w2"], params["b2"][None, :],
        params["w3"], params["b3"][None, :],
    )
    dw1p, db1, dw2, db2, dw3, db3, stats = outs
    grads = {
        "w1": dw1p[:F],
        "b1": db1[0],
        "w2": dw2,
        "b2": db2[0],
        "w3": dw3,
        "b3": db3[0],
    }
    return grads, stats[0, 0], stats[0, 1]


def _file_train_kernel(ns_ref, chunk_ref, mask_ref, tgt_ref, lr_ref,
                       w1i_ref, b1i_ref, w2i_ref, b2i_ref, w3i_ref, b3i_ref,
                       w1o_ref, b1o_ref, w2o_ref, b2o_ref, w3o_ref, b3o_ref,
                       stats_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        w1o_ref[:] = w1i_ref[:]
        b1o_ref[:] = b1i_ref[:]
        w2o_ref[:] = w2i_ref[:]
        b2o_ref[:] = b2i_ref[:]
        w3o_ref[:] = w3i_ref[:]
        b3o_ref[:] = b3i_ref[:]
        stats_ref[:] = jnp.zeros_like(stats_ref)

    x = chunk_ref[0]                                # [B, 64]
    wvec = mask_ref[0]                              # [B, 1]
    tgt = tgt_ref[:]                                # [1, cap]

    w1 = w1o_ref[:]
    b1 = b1o_ref[:]
    w2 = w2o_ref[:]
    b2 = b2o_ref[:]
    w3 = w3o_ref[:]
    b3 = b3o_ref[:]

    h1 = jnp.maximum(
        jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1, 0.0)
    h2 = jnp.tanh(jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2)
    logits = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3

    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    live_col = col < ns_ref[0]                      # [B, cap] bool
    logits = jnp.where(live_col, logits, MASK_LOGIT)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    se = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / se

    # Reported loss (the reference accumulates the clamped CE of the target,
    # src/lib.rs:610-616) and the delta that IS the gradient.
    report = -jnp.sum(
        tgt * jnp.log(jnp.maximum(probs, 1e-12)), axis=-1, keepdims=True
    )                                               # [B, 1]
    # live_col factor: the where-mask's exact backward (see the corpus
    # kernel) — without it an all-masked net (ns == 0) gets a spurious
    # uniform-softmax update where the XLA path applies exactly zero.
    delta = (probs - tgt) * wvec * live_col.astype(jnp.float32)

    dh2 = _dotT_cols(delta, w3) * (1.0 - h2 * h2)
    dh1 = _dotT_cols(dh2, w2) * (h1 > 0.0).astype(jnp.float32)

    dw3 = _dotT_rows(h2, delta)
    dw2 = _dotT_rows(h1, dh2)
    dw1 = _dotT_rows(x, dh1)
    db3 = jnp.sum(delta, axis=0, keepdims=True)
    db2 = jnp.sum(dh2, axis=0, keepdims=True)
    db1 = jnp.sum(dh1, axis=0, keepdims=True)

    count = jnp.sum(wvec, axis=0, keepdims=True)    # [1, 1]
    scale = jnp.where(count > 0, lr_ref[:] / jnp.maximum(count, 1.0), 0.0)
    # Scalar extraction: Mosaic cannot broadcast [1,1] along both sublanes
    # and lanes at once, but scalar * vector lowers fine.
    sc = scale[0, 0]

    w1o_ref[:] = w1 - sc * dw1
    b1o_ref[:] = b1 - sc * db1
    w2o_ref[:] = w2 - sc * dw2
    b2o_ref[:] = b2 - sc * db2
    w3o_ref[:] = w3 - sc * dw3
    b3o_ref[:] = b3 - sc * db3

    loss = jnp.sum(report * wvec, axis=0, keepdims=True)  # [1, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats_ref[:] += (jnp.where(lane == 0, loss, 0.0)
                     + jnp.where(lane == 1, count, 0.0))


def train_windows_pallas(
    params: Params,
    chunks: jax.Array,    # [S, B, F] shuffled+dropped window chunks
    masks: jax.Array,     # [S, B] f32 0/1 valid-window masks
    target_vec: jax.Array,  # [capacity]
    num_speakers,
    lr,
):
    """The whole per-file chunk-SGD loop in ONE kernel launch.

    The XLA formulation scans ~epochs*n_chunks sequential tiny (8-row)
    steps, each paying full scan/update machinery — the dominant cost of
    the incremental loop's per-file training.  Here the grid iterates the
    chunks with the six parameter tensors resident in the (revisited)
    output blocks in VMEM: no HBM parameter traffic until the single final
    writeback.  Semantics identical to the XLA chunk scan in
    :func:`streamz_tpu.nn.train.train_on_windows_impl` (same shuffled
    views, masked mean-gradient update per chunk, reported-loss/count
    accumulation).

    Returns (new_params, loss_sum, loss_count).
    """
    from jax.experimental.pallas import tpu as pltpu

    S, B, F = chunks.shape
    if S == 0:
        # Zero chunks (e.g. epochs=0): a grid-(0,) launch would never run
        # the j==0 copy-from-input step, leaving the output params
        # uninitialized.  Match the XLA scan's length-0 no-op instead.
        return params, jnp.float32(0.0), jnp.float32(0.0)
    cap = params["b3"].shape[0]
    h1 = params["w1"].shape[1]
    h2 = params["w2"].shape[1]

    xp = jnp.zeros((S, B, _IN_PAD), jnp.float32).at[:, :, :F].set(chunks)
    mp = masks[:, :, None]
    w1p = jnp.zeros((_IN_PAD, h1), jnp.float32).at[:F].set(params["w1"])

    def fixed(shp):
        return pl.BlockSpec(shp, lambda j, *_: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, B, _IN_PAD), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((1, cap)), fixed((1, 1)),
            fixed((_IN_PAD, h1)), fixed((1, h1)),
            fixed((h1, h2)), fixed((1, h2)),
            fixed((h2, cap)), fixed((1, cap)),
        ],
        out_specs=[
            fixed((_IN_PAD, h1)), fixed((1, h1)),
            fixed((h1, h2)), fixed((1, h2)),
            fixed((h2, cap)), fixed((1, cap)),
            fixed((1, 128)),
        ],
    )
    outs = pl.pallas_call(
        _file_train_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_IN_PAD, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((h2, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        jnp.asarray([num_speakers], jnp.int32),
        xp, mp,
        target_vec[None, :], jnp.asarray(lr, jnp.float32).reshape(1, 1),
        w1p, params["b1"][None, :],
        params["w2"], params["b2"][None, :],
        params["w3"], params["b3"][None, :],
    )
    w1o, b1o, w2o, b2o, w3o, b3o, stats = outs
    new_params = {
        "w1": w1o[:F],
        "b1": b1o[0],
        "w2": w2o,
        "b2": b2o[0],
        "w3": w3o,
        "b3": b3o[0],
    }
    return new_params, stats[0, 0], stats[0, 1]


def corpus_step_pallas(
    params: Params,
    batch: jax.Array,
    labels: jax.Array,
    weights: jax.Array,
    num_speakers,
    lr,
):
    """Fused-kernel twin of :func:`streamz_tpu.nn.train.corpus_step`."""
    grads, loss_sum, count = corpus_grads_pallas(
        params, batch, labels, weights, num_speakers
    )
    count = jnp.maximum(count, 1.0)
    new_params = jax.tree_util.tree_map(
        lambda p, g: p - (lr / count) * g, params, grads
    )
    return new_params, loss_sum / count
