"""Per-stage decomposition of the v3 MFCC kernel, measured on the real chip.

Round-2 ROOFLINE.md asserted the kernel streams "near the practical ceiling"
without per-stage evidence (VERDICT r2 weak #1).  This probe times kernel
variants that stop after each pipeline stage — DFT GEMM, parity+power,
mel GEMM, log, DCT — plus structural ablations (strip count, tile size,
pre-split bf16 input), attributing the gap between the measured rate and the
executed-FLOP ceiling (~73 M win/s on v5e) to specific stages.

Every variant writes the same [rows, 32] f32 output (a cheap slice/reduce of
whatever intermediate it stopped at), so HBM output traffic is constant and
the deltas between variants isolate compute.

Run on TPU:  python benchmarks/stage_probe.py [--iters N]
Prints one JSON line per variant: {"variant": ..., "win_per_s": ..., "ns_per_win": ...}
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from streamz_tpu import config
from streamz_tpu.dsp.pallas_mfcc import (
    _BINS_PAD,
    _BLOCK,
    _CH_PAD,
    _HALO3,
    _kernel3_constants,
    _use_interpret,
)


def _stage_kernel(stage: str, n_strips: int, tile: int, presplit: bool):
    """Kernel body computing through ``stage`` then writing [tile, 32]."""

    def kernel(*refs):
        if presplit:
            (main_hi, main_lo, halo_hi, halo_lo, dft_hi_ref, dft_lo_ref,
             sign_ref, mel_cat_ref, mel_hi_ref, dct_ref, out_ref) = refs
            x_hi = jnp.concatenate([main_hi[:], halo_hi[:]], axis=0)
            x_lo = jnp.concatenate([main_lo[:], halo_lo[:]], axis=0)
        else:
            (main_ref, halo_ref, dft_hi_ref, dft_lo_ref, sign_ref,
             mel_cat_ref, mel_hi_ref, dct_ref, out_ref) = refs
            x = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        sw = _BINS_PAD // n_strips
        acc = jnp.zeros((tile, _CH_PAD), jnp.float32)
        mel_acc = jnp.zeros((tile, 2 * _CH_PAD), jnp.float32)
        mel_lo_acc = jnp.zeros((tile, _CH_PAD), jnp.float32)
        for si in range(n_strips):
            lo = si * sw
            # Strip-major constant layout (matches the shipped kernel,
            # _kernel3_constants(n_strips)): this strip's cos‖sin basis is
            # one contiguous, copy-free slice of the ref.
            dh_s = dft_hi_ref[:, 2 * lo: 2 * lo + 2 * sw]
            dl_s = dft_lo_ref[:, 2 * lo: 2 * lo + 2 * sw]
            parts = jnp.dot(x_hi, dh_s, preferred_element_type=jnp.float32)
            parts += jnp.dot(x_lo, dh_s, preferred_element_type=jnp.float32)
            parts += jnp.dot(x_hi, dl_s, preferred_element_type=jnp.float32)
            if stage == "dft":
                acc += parts[:tile, :_CH_PAD]
                continue

            cos_p = parts[:, :sw]
            sin_p = parts[:, sw:]
            sign = sign_ref[:, lo:lo + sw]
            re = cos_p[0:tile] + sign * cos_p[1: tile + 1]
            im = sin_p[0:tile] + sign * sin_p[1: tile + 1]
            power = re * re + im * im
            if stage == "power":
                acc += power[:, :_CH_PAD]
                continue

            p_hi = power.astype(jnp.bfloat16)
            p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            mel_acc += jnp.dot(p_hi, mel_cat_ref[lo:lo + sw],
                               preferred_element_type=jnp.float32)
            mel_lo_acc += jnp.dot(p_lo, mel_hi_ref[lo:lo + sw],
                                  preferred_element_type=jnp.float32)

        if stage in ("dft", "power"):
            out_ref[:] = acc
            return
        mel_e = mel_acc[:, :_CH_PAD] + mel_acc[:, _CH_PAD:] + mel_lo_acc
        if stage == "mel":
            out_ref[:] = mel_e
            return
        mel_log = jnp.log(jnp.maximum(mel_e, 1e-12))
        if stage == "log":
            out_ref[:] = mel_log
            return
        out_ref[:] = jnp.dot(
            mel_log, dct_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return kernel


def _make_call(stage: str, n_strips: int, tile: int, presplit: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dft_hi, dft_lo, sign, mel_cat, mel_hi, dct = (
        jnp.asarray(a) for a in _kernel3_constants(n_strips)
    )
    hb = tile // _HALO3
    const_specs = [
        pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_BLOCK, 2 * _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _BINS_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_BINS_PAD, 2 * _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_BINS_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_CH_PAD, _CH_PAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]
    main_spec = lambda: pl.BlockSpec((tile, _BLOCK), lambda j: (j, 0),
                                     memory_space=pltpu.VMEM)
    halo_spec = lambda: pl.BlockSpec((_HALO3, _BLOCK), lambda j: (hb * (j + 1), 0),
                                     memory_space=pltpu.VMEM)
    kernel = _stage_kernel(stage, n_strips, tile, presplit)

    @jax.jit
    def call(blocks):  # blocks: [rows, 400] f32 (rows = n_tiles*tile + halo)
        rows = blocks.shape[0]
        n_tiles = (rows - _HALO3) // tile
        if presplit:
            b_hi = blocks.astype(jnp.bfloat16)
            b_lo = (blocks - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            ins = (b_hi, b_lo, b_hi, b_lo, dft_hi, dft_lo, sign, mel_cat,
                   mel_hi, dct)
            in_specs = [main_spec(), main_spec(), halo_spec(), halo_spec(),
                        *const_specs]
        else:
            ins = (blocks, blocks, dft_hi, dft_lo, sign, mel_cat, mel_hi, dct)
            in_specs = [main_spec(), halo_spec(), *const_specs]
        return pl.pallas_call(
            kernel,
            interpret=_use_interpret(),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, _CH_PAD), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, _CH_PAD), jnp.float32),
        )(*ins)

    return call


def time_variant(call, blocks, iters: int) -> float:
    @jax.jit
    def chained(b):
        def body(c, _):
            r = call(b + c)
            # Full-sum consumer: a sliced consumer would let XLA shrink any
            # non-opaque computation feeding it (slice-of-dot rewrites
            # reduce a sliced GEMM to a 1x1 dot — found the hard way in
            # gemm_probe; pallas_call is opaque, but keep the probes
            # uniformly collapse-proof).
            return jnp.sum(r) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(blocks))  # compile + warm
    times = []
    for _ in range(3):
        start = time.perf_counter()
        float(chained(blocks))
        times.append(time.perf_counter() - start)
    return sorted(times)[1] / iters


def main():
    try:  # persistent compile cache: repeat runs skip the tunnel-bound compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    iters = 16
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    rows = 64 * 512 + _HALO3  # ~32k windows per call
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.normal(0, 0.1, size=(rows, _BLOCK)).astype(np.float32))
    n_win = 64 * 512

    variants = [
        ("dft_only", dict(stage="dft", n_strips=2, tile=512, presplit=False)),
        ("dft_power", dict(stage="power", n_strips=2, tile=512, presplit=False)),
        ("dft_power_mel", dict(stage="mel", n_strips=2, tile=512, presplit=False)),
        ("plus_log", dict(stage="log", n_strips=2, tile=512, presplit=False)),
        ("full", dict(stage="full", n_strips=2, tile=512, presplit=False)),
        ("full_strips1", dict(stage="full", n_strips=1, tile=512, presplit=False)),
        ("full_strips4", dict(stage="full", n_strips=4, tile=512, presplit=False)),
        ("full_tile1024", dict(stage="full", n_strips=2, tile=1024, presplit=False)),
        ("full_tile256", dict(stage="full", n_strips=2, tile=256, presplit=False)),
        ("full_presplit", dict(stage="full", n_strips=2, tile=512, presplit=True)),
        # Combined candidates (each single change measured faster than the
        # shipped config in the first fixed-layout run):
        ("presplit_s1", dict(stage="full", n_strips=1, tile=512, presplit=True)),
        ("presplit_t1024", dict(stage="full", n_strips=2, tile=1024, presplit=True)),
        ("presplit_s1_t1024", dict(stage="full", n_strips=1, tile=1024, presplit=True)),
        ("s1_t1024", dict(stage="full", n_strips=1, tile=1024, presplit=False)),
    ]
    repeat = 2 if "--repeat" in sys.argv else 1
    for r in range(repeat):
        for name, kw in variants:
            try:
                call = _make_call(**kw)
                t = time_variant(call, blocks, iters)
                print(json.dumps({
                    "variant": name,
                    "win_per_s": round(n_win / t, 1),
                    "ns_per_win": round(1e9 * t / n_win, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)

        # Same-process reference: the SHIPPED kernel via its public wrapper
        # (tail call + 20-col slice included) — anchors the variants above
        # to what users actually run, in the same session state.
        from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas_v3

        pcm = blocks.reshape(1, -1)  # [1, rows*400]: nb=rows, rows-1 windows

        def shipped(p):
            return mfcc_base_pallas_v3(p)

        t = time_variant(shipped, pcm, iters)
        nw = blocks.shape[0] - 1
        print(json.dumps({
            "variant": "shipped_v3_wrapper",
            "win_per_s": round(nw / t, 1),
            "ns_per_win": round(1e9 * t / nw, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
