"""Probe: mel/DCT epilogue packing variants of the v4 kernel (VERDICT r3 #7).

The round-3 decomposition measured the DFT GEMM at ~85% of kernel time and
the whole power→mel→log→DCT epilogue at ~15%, of which the mel+DCT GEMMs
(N=64 on wide-lane hardware) are the padded part.  This probe bounds what
epilogue work could still buy, with variants of the SHIPPED v4 kernel:

  v4_shipped     the production kernel (baseline)
  fold_nolog     mel and DCT folded into ONE [512, 64] matrix (their
                 product), log REMOVED — mathematically wrong (the log
                 sits between them, so this is NOT shippable) but the
                 measured *upper bound* on every conceivable mel/DCT
                 fusion or lane-packing trick: no variant that keeps the
                 reference's math can beat it.
  dct_bf16x3     the final DCT GEMM at bf16x3 instead of f32 HIGHEST
                 (6 emulated passes) — shippable IF feature parity holds
                 (errors are printed; the 1e-3 gate decides).
  nolog          log removed, mel+DCT kept separate — isolates the VPU
                 log cost from the GEMM folding in fold_nolog.

Methodology identical to stage_probe.py: dependency-chained scans on the
real chip, scalar readback, same [rows, 32] output traffic.
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from streamz_tpu.dsp.pallas_mfcc import (
    _BLOCK,
    _CH_PAD,
    _COLS4,
    _HALO3,
    _MROWS4,
    _TILE3,
    _kernel4_constants,
    _use_interpret,
)


def _folded_matrix():
    """mel @ dct as one [512, 64] f32 matrix (the fold_nolog upper bound)."""
    from streamz_tpu.dsp.mel import dct2_matrix, mel_filterbank
    from streamz_tpu import config

    ct_dummy = None  # constants below mirror _kernel4_constants' mel build
    fb = mel_filterbank().T  # [401, 26]
    nt = 401 - 384
    mel = np.zeros((_MROWS4, config.N_MELS), np.float32)
    mel[:384] = fb[:384]
    mel[384 : 384 + nt] = fb[384:]
    mel[384 + 64 : 384 + 64 + nt] = fb[384:]
    dct = dct2_matrix().T  # [26, 20]
    fused = np.zeros((_MROWS4, _CH_PAD), np.float32)
    fused[:, : config.MFCC_SIZE] = mel @ dct
    return fused


def _make_kernel(variant: str):
    def kernel(main_ref, halo_ref, dft_kcat_ref, sign_ref,
               mel_cat_ref, mel_hi_ref, dct_ref, fused_ref, out_ref):
        x = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_cat = jnp.concatenate([x_hi, x_lo, x_hi], axis=1)

        mel_acc = jnp.zeros((_TILE3, 2 * _CH_PAD), jnp.float32)
        mel_lo_acc = jnp.zeros((_TILE3, _CH_PAD), jnp.float32)
        fused_acc = jnp.zeros((_TILE3, _CH_PAD), jnp.float32)

        def dot3(c0, c1):
            return jnp.dot(x_cat, dft_kcat_ref[:, c0:c1],
                           preferred_element_type=jnp.float32)

        def halo_combine(p, c0, c1, sgn):
            return p[0:_TILE3, c0:c1] + sgn * p[1 : _TILE3 + 1, c0:c1]

        def accum(power, r0, r1, acc, lo_acc, f_acc):
            if variant == "fold_nolog":
                # power @ (mel @ dct) in one bf16x3 GEMM per strip.
                p_hi = power.astype(jnp.bfloat16)
                p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                fh = fused_ref[r0:r1].astype(jnp.bfloat16)
                f_acc = f_acc + jnp.dot(p_hi, fh,
                                        preferred_element_type=jnp.float32)
                f_acc = f_acc + jnp.dot(p_lo, fh,
                                        preferred_element_type=jnp.float32)
                return acc, lo_acc, f_acc
            p_hi = power.astype(jnp.bfloat16)
            p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(p_hi, mel_cat_ref[r0:r1],
                                preferred_element_type=jnp.float32)
            lo_acc = lo_acc + jnp.dot(p_lo, mel_hi_ref[r0:r1],
                                      preferred_element_type=jnp.float32)
            return acc, lo_acc, f_acc

        parts = dot3(0, 512)
        sgn = sign_ref[:, 0:256]
        re = halo_combine(parts, 0, 256, sgn)
        im = halo_combine(parts, 256, 512, sgn)
        mel_acc, mel_lo_acc, fused_acc = accum(
            re * re + im * im, 0, 256, mel_acc, mel_lo_acc, fused_acc)

        parts = dot3(512, 896)
        sgn = sign_ref[:, 256:384]
        re = halo_combine(parts, 0, 128, sgn)
        im = halo_combine(parts, 128, 256, sgn)
        mel_acc, mel_lo_acc, fused_acc = accum(
            re * re + im * im, 256, 384, mel_acc, mel_lo_acc, fused_acc)

        comb = halo_combine(parts, 256, 384, sign_ref[:, 384:512])
        mel_acc, mel_lo_acc, fused_acc = accum(
            comb * comb, 384, 512, mel_acc, mel_lo_acc, fused_acc)

        if variant == "fold_nolog":
            out_ref[:] = fused_acc
            return
        mel_e = mel_acc[:, :_CH_PAD] + mel_acc[:, _CH_PAD:] + mel_lo_acc
        mel_log = (
            mel_e if variant == "nolog"
            else jnp.log(jnp.maximum(mel_e, 1e-12))
        )
        if variant == "dct_bf16x3":
            d = dct_ref[:]
            d_hi = d.astype(jnp.bfloat16)
            d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            m_hi = mel_log.astype(jnp.bfloat16)
            m_lo = (mel_log - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            o = jnp.dot(m_hi, d_hi, preferred_element_type=jnp.float32)
            o += jnp.dot(m_hi, d_lo, preferred_element_type=jnp.float32)
            o += jnp.dot(m_lo, d_hi, preferred_element_type=jnp.float32)
            out_ref[:] = o
            return
        out_ref[:] = jnp.dot(
            mel_log, dct_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return kernel


def _make_call(variant: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dft_kcat, sign, mel_cat, mel_hi, dct = (
        jnp.asarray(a) for a in _kernel4_constants()
    )
    fused = jnp.asarray(_folded_matrix())
    hb = _TILE3 // _HALO3
    kernel = _make_kernel(variant)

    @jax.jit
    def call(blocks):
        rows = blocks.shape[0]
        n_tiles = (rows - _HALO3) // _TILE3
        return pl.pallas_call(
            kernel,
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
                pl.BlockSpec((_MROWS4, _CH_PAD), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TILE3, _CH_PAD), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles * _TILE3, _CH_PAD), jnp.float32),
        )(blocks, blocks, dft_kcat, sign, mel_cat, mel_hi, dct, fused)

    return call


def _time(call, blocks, iters):
    @jax.jit
    def chained(b):
        def body(c, _):
            return jnp.sum(call(b + c)) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(blocks))
    times = []
    for _ in range(3):
        t = time.perf_counter()
        float(chained(blocks))
        times.append(time.perf_counter() - t)
    return sorted(times)[1] / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    iters = 16
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    rows = 64 * _TILE3 + _HALO3
    n_win = 64 * _TILE3
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.normal(0, 0.1, size=(rows, _BLOCK)).astype(np.float32))

    # dct_bf16x3 parity vs the shipped kernel (feature level, pre-Δ/norm).
    ref_call = _make_call("v4_shipped")
    small = blocks[: 2 * _TILE3 + _HALO3]
    ref = np.asarray(ref_call(small))
    for variant in ("v4_shipped", "dct_bf16x3", "nolog", "fold_nolog"):
        try:
            call = _make_call(variant)
            if variant == "dct_bf16x3":
                got = np.asarray(call(small))
                err = float(np.abs(got - ref).max())
            else:
                err = None
            t = _time(call, blocks, iters)
            print(json.dumps({
                "variant": variant,
                "ns_per_win": round(1e9 * t / n_win, 2),
                "win_per_s": round(n_win / t, 1),
                "max_abs_err_vs_shipped": err,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
