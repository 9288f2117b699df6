"""Probe: 3-pass bf16 DFT contraction vs ONE K-concatenated GEMM.

The v3/v4 kernels issue three [rows,400]x[400,N] bf16 GEMMs per tile
(x_hi@d_hi + x_lo@d_hi + x_hi@d_lo).  The same math is one
[rows,1200]x[1200,N] GEMM with stacked operands — fewer MXU pass
switches, and if Mosaic pads each K=400 contraction up to its K tile, the
fused form streams fewer padded K elements.  This probe times both forms
inside minimal Pallas kernels on the real chip (dependency-chained scans,
scalar readback — tunnel-safe timing).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


ROWS, K, N = 512, 400, 896   # per-tile shape (matches the v3/v4 kernels)
TILES = 32                   # grid length per call
ITERS = 16


def _time(fn, x):
    @jax.jit
    def chained(x):
        def body(c, _):
            out = fn(x + c)
            return jnp.sum(out[0, :8]) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(chained(x))
    times = []
    for _ in range(3):
        t = time.perf_counter()
        float(chained(x))
        times.append((time.perf_counter() - t) / ITERS)
    return sorted(times)[1]


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    d = rng.standard_normal((K, N), np.float32)
    import ml_dtypes

    d_hi = jnp.asarray(d.astype(ml_dtypes.bfloat16))
    d_lo = jnp.asarray((d - np.asarray(d_hi, np.float32)).astype(ml_dtypes.bfloat16))
    d_cat = jnp.concatenate([d_hi, d_hi, d_lo], axis=0)  # [3K, N]
    x = jnp.asarray(rng.standard_normal((TILES * ROWS, K), np.float32))

    def k3(x_ref, dh_ref, dl_ref, o_ref):
        x = x_ref[:]
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        p = jnp.dot(xh, dh_ref[:], preferred_element_type=jnp.float32)
        p += jnp.dot(xl, dh_ref[:], preferred_element_type=jnp.float32)
        p += jnp.dot(xh, dl_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = p

    def kfused(x_ref, dcat_ref, o_ref):
        x = x_ref[:]
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        xcat = jnp.concatenate([xh, xl, xh], axis=1)  # [ROWS, 3K]
        o_ref[:] = jnp.dot(xcat, dcat_ref[:], preferred_element_type=jnp.float32)

    tile = lambda shape: pl.BlockSpec(shape, lambda j: (j, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0), memory_space=pltpu.VMEM)
    f3 = lambda x: pl.pallas_call(
        k3,
        grid=(TILES,),
        in_specs=[tile((ROWS, K)), const((K, N)), const((K, N))],
        out_specs=tile((ROWS, N)),
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, N), jnp.float32),
    )(x, d_hi, d_lo)
    ff = lambda x: pl.pallas_call(
        kfused,
        grid=(TILES,),
        in_specs=[tile((ROWS, K)), const((3 * K, N))],
        out_specs=tile((ROWS, N)),
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, N), jnp.float32),
    )(x, d_cat)

    # correctness first
    a, b = np.asarray(f3(x)), np.asarray(ff(x))
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"relative diff 3-pass vs fused: {err:.2e}")

    t3 = _time(f3, x)
    tf = _time(ff, x)
    fl = 2 * TILES * ROWS * 3 * K * N
    print(f"3-pass: {t3*1e6:.1f} us  {fl/t3/1e12:.1f} TF")
    print(f"fused : {tf*1e6:.1f} us  {fl/tf/1e12:.1f} TF  ({t3/tf:.3f}x)")


if __name__ == "__main__":
    main()
