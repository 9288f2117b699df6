"""Fused Pallas MFCC kernel: DFT-power → mel → log → DCT in one VMEM pass.

The XLA formulation (:mod:`streamz_tpu.dsp.mfcc`) materializes the per-block
DFT parts ([rows, 4*401] f32, ~230 MB for a 32x10s batch) in HBM between the
GEMM and the pointwise stages.  This kernel keeps the whole chain per tile in
VMEM, so HBM traffic drops to the PCM input plus the tiny [rows, 32] MFCC
output.

Formulation (see :func:`streamz_tpu.dsp.mel.dft_block_matrices`): with hop =
window/2, every 800-sample analysis window is two adjacent non-overlapping
400-sample blocks, so per window

    re = block_t . Ct + block_{t+1} . Cb        (one [400 x 1024] GEMM per
    im = block_t . St + block_{t+1} . Sb         tile half, bins padded to 512)
    power = re^2 + im^2                          (VPU)
    mfcc  = ln(max(power @ MEL, 1e-12)) @ DCT    (two small GEMMs)

The caller passes the block matrix twice — once plain, once shifted by one
block row — so every grid tile is a clean non-overlapping BlockSpec window
(no halo DMA).  Replaces the reference's per-window rustfft/rustdct loop
(``streamz-rs/src/lib.rs:279-345``) as the HOT-LOOP-A kernel.

Zero-padding layout invariants:
- DFT matrices are [400, 1024] with bins 401..511 zeroed; power in those
  lanes is 0, mel rows 401..511 are zero, so padded bins contribute nothing.
- MEL is [512, 32] with cols 26..31 zero → padded mel channels get
  ln(1e-12), but DCT rows 26..31 are zero so they never reach the output.
- DCT is [32, 32] with cols 20..31 zero → output cols 20..31 are zero.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from streamz_tpu import config
from streamz_tpu.dsp import mel as melmod

_BLOCK = config.HOP_SIZE       # 400
_BINS_PAD = 512                # 401 one-sided bins padded to the lane width
_CH_PAD = 32                   # 26 mels / 20 MFCCs padded
_TILE = 256                    # window rows per grid tile


@lru_cache(maxsize=1)
def _kernel_constants():
    ct, cb, st, sb = melmod.dft_block_matrices()
    n_bins = ct.shape[1]  # 401

    def pad_bins(m):
        out = np.zeros((_BLOCK, _BINS_PAD), np.float32)
        out[:, :n_bins] = m
        return out

    # [400, 1024]: lanes 0..511 = Re basis, 512..1023 = Im basis.
    top = np.concatenate([pad_bins(ct), pad_bins(st)], axis=1)
    bot = np.concatenate([pad_bins(cb), pad_bins(sb)], axis=1)

    mel = np.zeros((_BINS_PAD, _CH_PAD), np.float32)
    mel[:n_bins, : config.N_MELS] = melmod.mel_filterbank().T
    dct = np.zeros((_CH_PAD, _CH_PAD), np.float32)
    dct[: config.N_MELS, : config.MFCC_SIZE] = melmod.dct2_matrix().T
    # numpy (not jnp): this cache may be populated inside a trace, and cached
    # tracers would leak.
    return top.astype(np.float32), bot.astype(np.float32), mel, dct


def _mfcc_kernel(top_ref, bot_ref, dft_top_ref, dft_bot_ref, mel_ref, dct_ref, out_ref):
    # Full-f32 MXU passes: bf16 multiplies lose ~1e-2 on the z-normed
    # features, beyond the 1e-3 parity gate vs the golden spec.
    prec = jax.lax.Precision.HIGHEST
    parts = jnp.dot(
        top_ref[:], dft_top_ref[:],
        preferred_element_type=jnp.float32, precision=prec,
    )
    parts += jnp.dot(
        bot_ref[:], dft_bot_ref[:],
        preferred_element_type=jnp.float32, precision=prec,
    )
    re = parts[:, :_BINS_PAD]
    im = parts[:, _BINS_PAD:]
    power = re * re + im * im
    mel_e = jnp.dot(
        power, mel_ref[:], preferred_element_type=jnp.float32, precision=prec
    )
    mel_log = jnp.log(jnp.maximum(mel_e, 1e-12))
    out_ref[:] = jnp.dot(
        mel_log, dct_ref[:], preferred_element_type=jnp.float32, precision=prec
    )


@jax.jit
def mfcc_base_pallas(pcm: jax.Array) -> jax.Array:
    """Base MFCCs for every candidate window. pcm: [B, T] f32 → [B, W, 20]
    with W = T//400 - 1.  Drop-in for :func:`streamz_tpu.dsp.mfcc.mfcc_base`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T = pcm.shape
    nb = T // _BLOCK
    rows = B * nb
    blocks = pcm[:, : nb * _BLOCK].reshape(rows, _BLOCK)

    rows_pad = -(-rows // _TILE) * _TILE
    pad = rows_pad - rows
    top = jnp.pad(blocks, ((0, pad), (0, 0)))
    # One-block shift: window t pairs block t with block t+1.
    bot = jnp.pad(blocks[1:], ((0, pad + 1), (0, 0)))

    dft_top, dft_bot, mel, dct = (
        jnp.asarray(a) for a in _kernel_constants()
    )

    out = pl.pallas_call(
        _mfcc_kernel,
        grid=(rows_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, _BLOCK), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _BLOCK), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _CH_PAD), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, _CH_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * _BLOCK * 4 * _BINS_PAD,
            bytes_accessed=2 * rows_pad * _BLOCK * 4 + rows_pad * _CH_PAD * 4,
            transcendentals=rows_pad * _CH_PAD,
        ),
    )(top, bot, dft_top, dft_bot, mel, dct)

    # Rows at clip boundaries (t = nb-1) pair with the next clip's first
    # block; they are sliced away here.
    base = out[:rows].reshape(B, nb, _CH_PAD)
    return base[:, : nb - 1, : config.MFCC_SIZE]


def mfcc_features_pallas(pcm: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Full fused frontend: [B, T] f32 + [B] lengths → [B, W, 60]."""
    from streamz_tpu.dsp.mfcc import deltas_and_norm, window_count

    base = mfcc_base_pallas(pcm)
    return deltas_and_norm(base, window_count(n_samples))
