"""Fused Pallas MFCC kernel: DFT-power → mel → log → DCT in one VMEM pass.

The XLA formulation (:mod:`streamz_tpu.dsp.mfcc`) materializes the per-block
DFT parts ([rows, 4*401] f32, ~230 MB for a 32x10s batch) in HBM between the
GEMM and the pointwise stages.  This kernel instead consumes frame-major PCM
([W, 800], built by one cheap XLA concat of the two non-overlapping
half-window block arrays) and keeps the whole chain per tile in VMEM:

    parts = frame_tile @ [Re|Im basis]   ([800 x 1024] MXU GEMM, bins padded
    power = re^2 + im^2                   401 → 512)
    mfcc  = ln(max(power @ MEL, 1e-12)) @ DCT

so the only HBM traffic is the frame matrix in and the tiny [W, 32] MFCC out.
Replaces the reference's per-window rustfft/rustdct loop
(``streamz-rs/src/lib.rs:279-345``) as the HOT-LOOP-A kernel.

Zero-padding layout invariants:
- the DFT basis is [800, 1024] with bins 401..511 zeroed; padded power lanes
  are 0 and MEL rows 401..511 are zero, so they contribute nothing;
- MEL is [512, 32] with cols 26..31 zero → those mel channels read ln(1e-12),
  but DCT rows 26..31 are zero so they never reach the output;
- DCT is [32, 32] with cols 20..31 zero → output cols 20..31 are zero.

Matmul precision is f32 (``Precision.HIGHEST``): bf16 multiplies cost ~1e-2
error on the z-normed features, beyond the 1e-3 parity gate vs the golden
numpy spec.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from streamz_tpu import config

_BLOCK = config.HOP_SIZE       # 400
_WIN = config.WINDOW_SIZE      # 800
_BINS_PAD = 512                # 401 one-sided bins padded to the lane width
_CH_PAD = 32                   # 26 mels / 20 MFCCs padded
_TILE = 256                    # window rows per grid tile


def _bf16_split(a: np.ndarray):
    """hi/lo bf16 planes of ``a`` for the in-kernel bf16x3 contraction
    (Mosaic does not lower Precision.HIGH): hi = bf16(a), lo = bf16(a - hi).
    Shared by every kernel's constants builder — a precision change here
    changes all backends together."""
    import ml_dtypes

    a = a.astype(np.float32)
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _padded_dct() -> np.ndarray:
    """DCT-II matrix in the lane-padded [_CH_PAD, _CH_PAD] layout."""
    from streamz_tpu.dsp.mel import dct2_matrix

    dct = np.zeros((_CH_PAD, _CH_PAD), np.float32)
    dct[: config.N_MELS, : config.MFCC_SIZE] = dct2_matrix().T
    return dct


def _padded_mel() -> np.ndarray:
    """Mel filterbank transposed into the [_BINS_PAD, _CH_PAD] layout."""
    from streamz_tpu.dsp.mel import mel_filterbank

    mel = np.zeros((_BINS_PAD, _CH_PAD), np.float32)
    mel[: config.N_FFT_BINS, : config.N_MELS] = mel_filterbank().T
    return mel


@lru_cache(maxsize=1)
def _kernel_constants():
    # Full-window real-DFT basis: frame . dft[:, k] = Re X[k] (k < 512) or
    # Im X[k] (k >= 512).  numpy only (this cache may be populated inside a
    # trace; cached tracers would leak).
    n = np.arange(_WIN)[:, None]
    k = np.arange(_BINS_PAD)[None, :]
    ang = 2.0 * np.pi * k * n / _WIN
    n_bins = config.N_FFT_BINS  # 401
    mask = (k < n_bins).astype(np.float64)
    dft = np.concatenate([np.cos(ang) * mask, -np.sin(ang) * mask], axis=1)

    mel = _padded_mel()
    dct = _padded_dct()
    dft_hi, dft_lo = _bf16_split(dft)
    return dft_hi, dft_lo, mel, dct


def _mfcc_kernel(frames_ref, dft_hi_ref, dft_lo_ref, mel_ref, dct_ref, out_ref):
    # Manual bf16x3 for the big DFT GEMM (~1.5e-5 relative error, inside the
    # parity budget, at half the 6-pass full-f32 cost); the tiny mel/DCT
    # GEMMs run full-f32.
    x = frames_ref[:]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    parts = jnp.dot(x_hi, dft_hi_ref[:], preferred_element_type=jnp.float32)
    parts += jnp.dot(x_hi, dft_lo_ref[:], preferred_element_type=jnp.float32)
    parts += jnp.dot(x_lo, dft_hi_ref[:], preferred_element_type=jnp.float32)

    re = parts[:, :_BINS_PAD]
    im = parts[:, _BINS_PAD:]
    power = re * re + im * im
    prec = jax.lax.Precision.HIGHEST
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
    if nb == 0:  # clip shorter than one block: zero windows (window_count)
        return jnp.zeros((B, 0, config.MFCC_SIZE), jnp.float32)
    rows = B * nb
    blocks = pcm[:, : nb * _BLOCK].reshape(rows, _BLOCK)

    # Frame-major layout: window r = [block_r ; block_{r+1}].  Rows at clip
    # boundaries (r = b*nb + nb-1) pair with the next clip's first block and
    # are sliced away below.
    frames = jnp.concatenate([blocks, jnp.roll(blocks, -1, axis=0)], axis=1)

    rows_pad = -(-rows // _TILE) * _TILE
    frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    dft_hi, dft_lo, mel, dct = (jnp.asarray(a) for a in _kernel_constants())

    out = pl.pallas_call(
        _mfcc_kernel,
        # Interpret mode on non-TPU backends so the kernel is testable on the
        # CPU mesh used by the test suite.
        interpret=_use_interpret(),
        grid=(rows_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, _WIN), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_WIN, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_WIN, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _CH_PAD), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, _CH_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * _WIN * 2 * _BINS_PAD,
            bytes_accessed=rows_pad * (_WIN + _CH_PAD) * 4,
            transcendentals=rows_pad * _CH_PAD,
        ),
    )(frames, dft_hi, dft_lo, mel, dct)

    base = out[:rows].reshape(B, nb, _CH_PAD)
    return base[:, : nb - 1, : config.MFCC_SIZE]


@jax.jit
def mfcc_features_pallas(pcm: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Full fused frontend: [B, T] f32 + [B] lengths → [B, W, 60]."""
    from streamz_tpu.dsp.mfcc import deltas_and_norm, window_count

    base = mfcc_base_pallas(pcm)
    return deltas_and_norm(base, window_count(n_samples))


# ---------------------------------------------------------------------------
# v2: block-centric kernel with a manual-DMA halo and the parity-sign trick.
#
# The frame-major kernel above projects every window's 800 samples (each
# block participates twice).  This variant projects each 400-sample block
# ONCE through the [400 x (512|512)] cos|sin basis — the half-window-shift
# parity identity Cb = (-1)^k Ct (see streamz_tpu/dsp/mel.py) assembles both
# window roles from the same projection — and fetches its tile plus an
# 8-row halo from HBM with an explicit async copy, so window t can pair
# block t with block t+1 without overlapping BlockSpecs.
# ---------------------------------------------------------------------------

_TILE2 = 512
_HALO = 8       # sublane-aligned halo; only row +1 is consumed
_BLOCK_PAD = 512  # 400-sample blocks padded to the lane tile for aligned DMA


@lru_cache(maxsize=1)
def _kernel2_constants():
    from streamz_tpu.dsp.mel import bin_parity_sign, dft_block_matrices

    ct, st = dft_block_matrices()
    n_bins = ct.shape[1]  # 401

    def pad_bins(m):
        # rows padded 400 -> 512 (zero taps for the padded PCM lanes)
        out = np.zeros((_BLOCK_PAD, _BINS_PAD), np.float32)
        out[:_BLOCK, :n_bins] = m
        return out

    dft = np.concatenate([pad_bins(ct), pad_bins(st)], axis=1)  # [512, 1024]
    dft_hi, dft_lo = _bf16_split(dft)

    sign = np.zeros((1, _BINS_PAD), np.float32)
    sign[0, :n_bins] = bin_parity_sign()

    return dft_hi, dft_lo, sign, _padded_mel(), _padded_dct()


def _mfcc_kernel_v2(blocks_hbm, dft_hi_ref, dft_lo_ref, sign_ref, mel_ref,
                    dct_ref, out_ref, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    copy = pltpu.make_async_copy(
        blocks_hbm.at[pl.ds(j * _TILE2, _TILE2 + _HALO), :], scratch, sem
    )
    copy.start()
    copy.wait()

    x = scratch[:]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    parts = jnp.dot(x_hi, dft_hi_ref[:], preferred_element_type=jnp.float32)
    parts += jnp.dot(x_hi, dft_lo_ref[:], preferred_element_type=jnp.float32)
    parts += jnp.dot(x_lo, dft_hi_ref[:], preferred_element_type=jnp.float32)

    cos_p = parts[:, :_BINS_PAD]
    sin_p = parts[:, _BINS_PAD:]
    sign = sign_ref[:]
    re = cos_p[0:_TILE2] + sign * cos_p[1 : _TILE2 + 1]
    im = sin_p[0:_TILE2] + sign * sin_p[1 : _TILE2 + 1]
    power = re * re + im * im

    prec = jax.lax.Precision.HIGHEST
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    mel_log = jnp.log(jnp.maximum(mel_e, 1e-12))
    out_ref[:] = jnp.dot(mel_log, dct_ref[:], preferred_element_type=jnp.float32,
                         precision=prec)


@jax.jit
def mfcc_base_pallas_v2(pcm: jax.Array) -> jax.Array:
    """Block-centric fused MFCC base. pcm: [B, T] f32 → [B, W, 20]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T = pcm.shape
    nb = T // _BLOCK
    if nb == 0:  # clip shorter than one block: zero windows (window_count)
        return jnp.zeros((B, 0, config.MFCC_SIZE), jnp.float32)
    rows = B * nb
    blocks = pcm[:, : nb * _BLOCK].reshape(rows, _BLOCK)

    n_tiles = -(-rows // _TILE2)
    rows_pad = n_tiles * _TILE2 + _HALO
    blocks = jnp.pad(
        blocks, ((0, rows_pad - rows), (0, _BLOCK_PAD - _BLOCK))
    )

    dft_hi, dft_lo, sign, mel, dct = (
        jnp.asarray(a) for a in _kernel2_constants()
    )

    out = pl.pallas_call(
        _mfcc_kernel_v2,
        interpret=_use_interpret(),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            pl.BlockSpec((_BLOCK_PAD, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_PAD, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE2, _CH_PAD), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _TILE2, _CH_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE2 + _HALO, _BLOCK_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * _BLOCK * 2 * _BINS_PAD,
            bytes_accessed=rows_pad * (_BLOCK + _CH_PAD) * 4,
            transcendentals=rows_pad * _CH_PAD,
        ),
    )(blocks, dft_hi, dft_lo, sign, mel, dct)

    base = out[:rows].reshape(B, nb, _CH_PAD)
    return base[:, : nb - 1, : config.MFCC_SIZE]


@jax.jit
def mfcc_features_pallas_v2(pcm: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Full frontend with the block-centric kernel: [B,T]+[B] → [B,W,60]."""
    from streamz_tpu.dsp.mfcc import deltas_and_norm, window_count

    base = mfcc_base_pallas_v2(pcm)
    return deltas_and_norm(base, window_count(n_samples))


# ---------------------------------------------------------------------------
# v3: pipelined-halo kernel — v2's block-centric math with the two structural
# overheads removed (measured on v5e, see benchmarks/ROOFLINE.md):
#
# 1. **No pad copy.** v2 zero-pads the [rows, 400] block view to [rows, 512]
#    with jnp.pad — a full HBM round trip of the PCM (~3.6 KB/window).  v3
#    feeds the reshape *view* directly; Mosaic handles the 400-wide (K=400)
#    contraction.
# 2. **No serialized DMA.** v2 issues a blocking make_async_copy per tile
#    (copy.start(); copy.wait()) because its halo needs rows the BlockSpec
#    grid can't express.  v3 expresses the +1-block halo as a SECOND input
#    spec — an 8-row block mapped to the next tile's first rows — so the
#    Pallas grid machinery double-buffers both streams automatically.
# 3. **bf16x3 mel GEMM** (VERDICT #4): the two same-LHS passes fused into one
#    N-concat GEMM; full-f32 HIGHEST only for the tiny DCT.
#
# Accuracy: bf16x3 everywhere keeps the golden-spec parity at ~3.5e-5
# (bf16x2 variants measure ~1.4-3e-3 — outside the 1e-3 gate; measured in
# round 2, see ROOFLINE.md).
# ---------------------------------------------------------------------------

_TILE3 = 512
_HALO3 = 8  # one sublane-aligned halo block-row; only row +1 is consumed


@lru_cache(maxsize=4)
def _kernel3_constants(n_strips: int = None):
    from streamz_tpu.dsp.mel import bin_parity_sign, dft_block_matrices

    if n_strips is None:
        n_strips = _STRIPS3
    ct, st = dft_block_matrices()
    n_bins = ct.shape[1]  # 401

    def pad_bins(m):
        out = np.zeros((_BLOCK, _BINS_PAD), np.float32)
        out[:, :n_bins] = m
        return out

    # Strip-major layout: [cos s0 | sin s0 | cos s1 | sin s1 | ...] so each
    # strip's cos‖sin basis is ONE contiguous column range — the kernel
    # slices the VMEM ref instead of concatenating two non-adjacent halves
    # per tile (which cost ~1.6 MB of in-kernel copies per grid step).
    cos_all, sin_all = pad_bins(ct), pad_bins(st)
    sw = _BINS_PAD // n_strips
    dft = np.concatenate(
        [
            np.concatenate(
                [cos_all[:, s * sw:(s + 1) * sw], sin_all[:, s * sw:(s + 1) * sw]],
                axis=1,
            )
            for s in range(n_strips)
        ],
        axis=1,
    )  # [400, 1024]
    dft_hi, dft_lo = _bf16_split(dft)

    sign = np.zeros((1, _BINS_PAD), np.float32)
    sign[0, :n_bins] = bin_parity_sign()

    mel_hi, mel_lo = _bf16_split(_padded_mel())
    # Same-LHS passes ph@mel_hi + ph@mel_lo as ONE N-concat GEMM.
    mel_cat = np.concatenate([mel_hi, mel_lo], axis=1)  # [512, 64] bf16

    return dft_hi, dft_lo, sign, mel_cat, mel_hi, _padded_dct()


_STRIPS3 = 2  # bin strips per tile; see the strip-mining note below


def _mfcc_kernel_v3(main_ref, halo_ref, dft_hi_ref, dft_lo_ref, sign_ref,
                    mel_cat_ref, mel_hi_ref, dct_ref, out_ref):
    x = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)  # [TILE3+8, 400]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # Strip-mined over the bin axis: the DFT -> parity -> power -> partial
    # mel chain runs per _BINS_PAD/_STRIPS3-wide strip, halving the live
    # f32 intermediates ([*,512] instead of [*,1024] at 2 strips) so less
    # of the chain round-trips VMEM.  Measured +7% over the monolithic body
    # (same session: 22.3M vs 20.8M win/s); mel partial sums accumulate in
    # f32, so results are element-identical up to f32 summation order.
    sw = _BINS_PAD // _STRIPS3
    mel_acc = jnp.zeros((_TILE3, 2 * _CH_PAD), jnp.float32)
    mel_lo_acc = jnp.zeros((_TILE3, _CH_PAD), jnp.float32)
    for si in range(_STRIPS3):
        lo = si * sw
        # Strip-major constant layout (see _kernel3_constants): this strip's
        # cos‖sin basis is one contiguous slice of the ref — no copy.
        dh_s = dft_hi_ref[:, 2 * lo: 2 * lo + 2 * sw]
        dl_s = dft_lo_ref[:, 2 * lo: 2 * lo + 2 * sw]
        parts = jnp.dot(x_hi, dh_s, preferred_element_type=jnp.float32)
        parts += jnp.dot(x_lo, dh_s, preferred_element_type=jnp.float32)
        parts += jnp.dot(x_hi, dl_s, preferred_element_type=jnp.float32)

        cos_p = parts[:, :sw]
        sin_p = parts[:, sw:]
        sign = sign_ref[:, lo:lo + sw]
        re = cos_p[0:_TILE3] + sign * cos_p[1 : _TILE3 + 1]
        im = sin_p[0:_TILE3] + sign * sin_p[1 : _TILE3 + 1]
        power = re * re + im * im  # [TILE3, sw] f32

        p_hi = power.astype(jnp.bfloat16)
        p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mel_acc += jnp.dot(p_hi, mel_cat_ref[lo:lo + sw],
                           preferred_element_type=jnp.float32)
        mel_lo_acc += jnp.dot(p_lo, mel_hi_ref[lo:lo + sw],
                              preferred_element_type=jnp.float32)

    mel_e = mel_acc[:, :_CH_PAD] + mel_acc[:, _CH_PAD:] + mel_lo_acc

    mel_log = jnp.log(jnp.maximum(mel_e, 1e-12))
    out_ref[:] = jnp.dot(
        mel_log, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _use_interpret() -> bool:
    from streamz_tpu.runtime.autotune import use_interpret

    return use_interpret()


def _v3_call(blocks: jax.Array, n_tiles: int) -> jax.Array:
    """Invoke the v3 kernel over ``n_tiles`` tiles of ``blocks`` (whose row
    count must cover ``n_tiles*_TILE3 + _HALO3`` rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dft_hi, dft_lo, sign, mel_cat, mel_hi, dct = (
        jnp.asarray(a) for a in _kernel3_constants()
    )
    hb = _TILE3 // _HALO3  # halo block-rows per tile step
    return pl.pallas_call(
        _mfcc_kernel_v3,
        interpret=_use_interpret(),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE3, _BLOCK), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO3, _BLOCK), lambda j: (hb * (j + 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BINS_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, 2 * _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BINS_PAD, _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE3, _CH_PAD), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _TILE3, _CH_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n_tiles * _TILE3 * _BLOCK * 2 * _BINS_PAD,
            bytes_accessed=n_tiles * _TILE3 * (_BLOCK + _CH_PAD) * 4,
            transcendentals=n_tiles * _TILE3 * _CH_PAD,
        ),
    )(blocks, blocks, dft_hi, dft_lo, sign, mel_cat, mel_hi, dct)


def _pipelined_base(pcm: jax.Array, call_fn) -> jax.Array:
    """Shared launcher for the pipelined-halo kernels (v3/v4):
    pcm [B, T] f32 → [B, W, 20].

    The bulk of the block rows is fed to the kernel as the raw reshape view
    (no pad copy); only the tail tile — the rows the halo spec would read
    past the end of — goes through a tiny (≤ _TILE3+_HALO3 rows) padded
    second call.
    """
    B, T = pcm.shape
    nb = T // _BLOCK
    if nb == 0:  # clip shorter than one block: zero windows (window_count)
        return jnp.zeros((B, 0, config.MFCC_SIZE), jnp.float32)
    rows = B * nb
    blocks = pcm[:, : nb * _BLOCK].reshape(rows, _BLOCK)  # a view, no copy

    # Tiles whose main+halo reads stay inside the unpadded array.
    n_full = max((rows - _HALO3) // _TILE3, 0)
    outs = []
    if n_full > 0:
        outs.append(call_fn(blocks, n_full))

    tail_rows = rows - n_full * _TILE3  # in (0, _TILE3 + _HALO3)
    if tail_rows > 0:
        # tail_rows can EXCEED _TILE3 (up to _TILE3 + _HALO3 - 1, e.g.
        # rows = 516: n_full = 0), so the tail may need two tiles — one
        # tile would emit only _TILE3 rows and silently truncate.
        n_tt = -(-tail_rows // _TILE3)
        tail = blocks[n_full * _TILE3 :]
        tail = jnp.pad(
            tail, ((0, n_tt * _TILE3 + _HALO3 - tail_rows), (0, 0))
        )
        outs.append(call_fn(tail, n_tt)[:tail_rows])

    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    base = out[:rows].reshape(B, nb, _CH_PAD)
    return base[:, : nb - 1, : config.MFCC_SIZE]


@jax.jit
def mfcc_base_pallas_v3(pcm: jax.Array) -> jax.Array:
    """Pipelined-halo fused MFCC base (v3). pcm: [B, T] f32 → [B, W, 20]."""
    return _pipelined_base(pcm, _v3_call)


@jax.jit
def mfcc_features_pallas_v3(pcm: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Full frontend with the pipelined-halo kernel: [B,T]+[B] → [B,W,60]."""
    from streamz_tpu.dsp.mfcc import deltas_and_norm, window_count

    base = mfcc_base_pallas_v3(pcm)
    return deltas_and_norm(base, window_count(n_samples))


# ---------------------------------------------------------------------------
# v4: packed-bin basis — v3 with the dead DFT columns removed.
#
# v3's basis is [400, 1024]: two 512-wide cos/sin halves with bins 401..511
# zeroed, so 2x111 of the 1024 GEMM columns stream zeros through the MXU —
# 12.5% of the DFT FLOPs (the stage the round-3 decomposition measured at
# ~85% of kernel time) buy nothing.  v4 packs the basis to 896 columns while
# keeping every in-kernel slice 128-lane aligned:
#
#   cols [0,   256)  cos bins   0..255   } strip 0 (identical to v3's)
#   cols [256, 512)  sin bins   0..255   }
#   cols [512, 640)  cos bins 256..383   } strip 1
#   cols [640, 768)  sin bins 256..383   }
#   cols [768, 896)  ONE mixed tail group: cos bins 384..400 at lanes 0..16,
#                    sin bins 384..400 at lanes 64..80, rest zero
#
# The tail group's halo combine is the same parity trick (the (-1)^k sign
# applies per bin, identically to its cos and sin lanes), and the cos²+sin²
# pairing is folded into the mel projection: the mel matrix doubles the rows
# for bins 384..400 (one row under the cos lanes, one under the sin lanes),
# so `comb²  @ mel_tail` sums the two squares inside the GEMM's f32
# accumulator — no sub-128-lane shuffles anywhere.
#
# Replaces the same reference loop (``streamz-rs/src/lib.rs:279-345``).
# Accuracy: the only numeric change vs v3 is that the 17 tail bins' cos²
# and sin² are bf16-rounded before summation instead of after — measured
# parity vs the golden numpy spec stays at the v3 level (see tests).
# ---------------------------------------------------------------------------

_COLS4 = 896   # packed basis columns: 6 full 128-bin groups + 1 mixed tail
_T0 = 384      # bins below _T0 live in dense cos/sin groups
_MROWS4 = 512  # mel rows: 384 dense bins + 128-lane doubled tail group


@lru_cache(maxsize=1)
def _kernel4_constants():
    from streamz_tpu.dsp.mel import (
        bin_parity_sign, dft_block_matrices, mel_filterbank,
    )

    ct, st = dft_block_matrices()
    n_bins = ct.shape[1]  # 401
    nt = n_bins - _T0     # 17 tail bins

    tail = np.zeros((_BLOCK, 128), np.float32)
    tail[:, :nt] = ct[:, _T0:]
    tail[:, 64 : 64 + nt] = st[:, _T0:]
    dft = np.concatenate(
        [ct[:, :256], st[:, :256], ct[:, 256:_T0], st[:, 256:_T0], tail],
        axis=1,
    )  # [400, 896]
    dft_hi, dft_lo = _bf16_split(dft)

    parity = bin_parity_sign()
    sign = np.zeros((1, _MROWS4), np.float32)
    sign[0, :_T0] = parity[:_T0]
    sign[0, _T0 : _T0 + nt] = parity[_T0:]
    sign[0, _T0 + 64 : _T0 + 64 + nt] = parity[_T0:]

    fb = mel_filterbank().T  # [401, 26]
    mel = np.zeros((_MROWS4, _CH_PAD), np.float32)
    mel[:_T0, : config.N_MELS] = fb[:_T0]
    # Doubled rows fold the tail group's cos²+sin² pairing into the GEMM.
    mel[_T0 : _T0 + nt, : config.N_MELS] = fb[_T0:]
    mel[_T0 + 64 : _T0 + 64 + nt, : config.N_MELS] = fb[_T0:]
    mel_hi, mel_lo = _bf16_split(mel)
    mel_cat = np.concatenate([mel_hi, mel_lo], axis=1)  # [512, 64] bf16

    # K-stacked basis for the 3-in-1 DFT contraction: the three bf16
    # passes (xh@dh + xl@dh + xh@dl) become ONE GEMM of the K-concatenated
    # operands [xh|xl|xh] @ [dh;dh;dl] — fewer MXU pass switches and
    # better K-tile utilization than 3x K=400 (measured +3.6% on the
    # isolated contraction, benchmarks/kfuse_probe.py).
    dft_kcat = np.concatenate([dft_hi, dft_hi, dft_lo], axis=0)  # [1200, 896]

    return dft_kcat, sign, mel_cat, mel_hi, _padded_dct()


def _mfcc_kernel_v4(main_ref, halo_ref, dft_kcat_ref, sign_ref,
                    mel_cat_ref, mel_hi_ref, dct_ref, out_ref):
    x = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)  # [TILE3+8, 400]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # One K-stacked LHS shared by both strips (see _kernel4_constants).
    x_cat = jnp.concatenate([x_hi, x_lo, x_hi], axis=1)  # [TILE3+8, 1200]

    mel_acc = jnp.zeros((_TILE3, 2 * _CH_PAD), jnp.float32)
    mel_lo_acc = jnp.zeros((_TILE3, _CH_PAD), jnp.float32)

    def dot3(c0, c1):
        return jnp.dot(x_cat, dft_kcat_ref[:, c0:c1],
                       preferred_element_type=jnp.float32)

    def halo_combine(p, c0, c1, sgn):
        return p[0:_TILE3, c0:c1] + sgn * p[1 : _TILE3 + 1, c0:c1]

    def accum(power, r0, r1, acc, lo_acc):
        p_hi = power.astype(jnp.bfloat16)
        p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(p_hi, mel_cat_ref[r0:r1],
                            preferred_element_type=jnp.float32)
        lo_acc = lo_acc + jnp.dot(p_lo, mel_hi_ref[r0:r1],
                                  preferred_element_type=jnp.float32)
        return acc, lo_acc

    # Strip 0: bins 0..255 (cos cols 0..255, sin cols 256..511).
    parts = dot3(0, 512)
    sgn = sign_ref[:, 0:256]
    re = halo_combine(parts, 0, 256, sgn)
    im = halo_combine(parts, 256, 512, sgn)
    mel_acc, mel_lo_acc = accum(re * re + im * im, 0, 256, mel_acc, mel_lo_acc)

    # Strip 1: bins 256..383 plus the mixed tail group (bins 384..400).
    parts = dot3(512, 896)
    sgn = sign_ref[:, 256:384]
    re = halo_combine(parts, 0, 128, sgn)
    im = halo_combine(parts, 128, 256, sgn)
    mel_acc, mel_lo_acc = accum(re * re + im * im, 256, 384,
                                mel_acc, mel_lo_acc)

    comb = halo_combine(parts, 256, 384, sign_ref[:, 384:512])
    mel_acc, mel_lo_acc = accum(comb * comb, 384, 512, mel_acc, mel_lo_acc)

    mel_e = mel_acc[:, :_CH_PAD] + mel_acc[:, _CH_PAD:] + mel_lo_acc
    mel_log = jnp.log(jnp.maximum(mel_e, 1e-12))
    out_ref[:] = jnp.dot(
        mel_log, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _v4_call(blocks: jax.Array, n_tiles: int) -> jax.Array:
    """Invoke the v4 kernel over ``n_tiles`` tiles of ``blocks``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dft_kcat, sign, mel_cat, mel_hi, dct = (
        jnp.asarray(a) for a in _kernel4_constants()
    )
    hb = _TILE3 // _HALO3
    return pl.pallas_call(
        _mfcc_kernel_v4,
        interpret=_use_interpret(),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE3, _BLOCK), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO3, _BLOCK), lambda j: (hb * (j + 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * _BLOCK, _COLS4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _MROWS4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MROWS4, 2 * _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MROWS4, _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE3, _CH_PAD), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _TILE3, _CH_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n_tiles * _TILE3 * _BLOCK * _COLS4,
            bytes_accessed=n_tiles * _TILE3 * (_BLOCK + _CH_PAD) * 4,
            transcendentals=n_tiles * _TILE3 * _CH_PAD,
        ),
    )(blocks, blocks, dft_kcat, sign, mel_cat, mel_hi, dct)


@jax.jit
def mfcc_base_pallas_v4(pcm: jax.Array) -> jax.Array:
    """Packed-basis pipelined-halo fused MFCC base (v4).

    pcm: [B, T] f32 → [B, W, 20].  Same launcher as v3; the kernel's DFT
    GEMM streams 896 packed columns instead of 1024 (12.5% fewer MXU
    FLOPs on the stage that is ~85% of kernel time).
    """
    return _pipelined_base(pcm, _v4_call)


@jax.jit
def mfcc_features_pallas_v4(pcm: jax.Array, n_samples: jax.Array) -> jax.Array:
    """Full frontend with the packed-basis kernel: [B,T]+[B] → [B,W,60]."""
    from streamz_tpu.dsp.mfcc import deltas_and_norm, window_count

    base = mfcc_base_pallas_v4(pcm)
    return deltas_and_norm(base, window_count(n_samples))
