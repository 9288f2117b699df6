"""Probe: does the MXU deliver the 2x int8 rate on the DFT shapes?

The v5e spec sheet lists 394 TOPS int8 vs 197 TFLOPS bf16.  The v3 frontend
kernel spends ~85% of its time in a 3-pass bf16 DFT contraction
(benchmarks/ROOFLINE.md "Per-stage decomposition"); if int8 GEMMs run ~2x
bf16 on the same shapes, an exactly-scaled int8 formulation (PCM split into
two int8 planes, basis at 13-bit precision) would replace 3 bf16 passes
with 3-4 int8 passes = 1.5-2 bf16-pass-equivalents.  This probe measures
the raw rates before any kernel work.

Run on the TPU:  python benchmarks/int8_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _chain_dot(a, b, prefer, iters=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, y):
        def body(c, _):
            # Serialize iterations without changing the operand dtype (an
            # int8 operand can't absorb a float carry): the barrier's
            # output is loop-defined, so neither CSE nor loop-invariant
            # code motion can hoist the dot out of the scan.
            xx, cc = jax.lax.optimization_barrier((x, c))
            r = jnp.dot(xx, y, preferred_element_type=prefer)
            # Full-sum consumer: a sliced consumer (sum(r[:1,:1])) lets
            # XLA's slice-of-dot rewrite shrink the GEMM to a 1x1 dot and
            # the probe then times dispatch latency (verified in HLO).
            s = jnp.sum(r.astype(jnp.float32)) * 1e-20
            return s + cc * 0.5, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(a, b))  # compile + warm
    times = []
    for _ in range(4):
        start = time.perf_counter()
        float(chained(a, b))
        times.append((time.perf_counter() - start) / iters)
    return sorted(times)[1]


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    print("device:", jax.devices()[0].device_kind, file=sys.stderr)
    rng = np.random.default_rng(0)

    shapes = [
        (4096, 4096, 4096, "canonical 4096^3"),
        (32768, 400, 1024, "DFT shape [32k,400]x[400,1024]"),
        (32768, 512, 1024, "DFT shape K padded to 512"),
    ]
    for m, k, n, label in shapes:
        a8 = jnp.asarray(rng.integers(-100, 100, size=(m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-100, 100, size=(k, n)), jnp.int8)
        abf = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        bbf = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32), jnp.bfloat16)

        t_bf = _chain_dot(abf, bbf, jnp.float32)
        t_i8 = _chain_dot(a8, b8, jnp.int32)
        f = 2.0 * m * k * n
        print(
            f"{label}: bf16 {f / t_bf / 1e12:6.1f} TF ({t_bf * 1e3:7.2f} ms)"
            f"   int8 {f / t_i8 / 1e12:6.1f} TOP ({t_i8 * 1e3:7.2f} ms)"
            f"   ratio int8/bf16 = {t_bf / t_i8:.2f}x"
        )


if __name__ == "__main__":
    main()
