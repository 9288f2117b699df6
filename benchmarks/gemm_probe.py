"""GEMM-bound probe: what the chip actually sustains on the DFT shape.

Companion to stage_probe.py. The stage decomposition shows the v3 kernel is
~85% DFT GEMM; this probe measures (same session, same chained-scan method):

- ``gemm_peak``: a canonical 4096^3 bf16 matmul — the session's achievable
  MXU rate (the axon tunnel/session can depress the whole chip, so the
  nameplate 197 TF is not the right denominator);
- ``gemm_dft_xla``: the exact DFT contraction ([rows,400] x [400,1024] bf16,
  f32 accum) as a plain XLA dot — the achievable rate for this shape;
- ``v3_full``: the shipped kernel, for the same-session ratio.

Prints one JSON line per variant with achieved TFLOP/s and ns/window-equiv.

Statistics: ``gemm_peak_bf16`` uses the shared ``session_peak_tflops`` probe
(min-of-3 — the statistic bench.py normalizes against; rows recorded before
the helpers were unified used median-of-3, a few-percent difference, far
inside the 41-197 TF session variance).  The per-shape variants keep
median-of-3 via ``chain_timer``.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


# Shared chained-scan timer + wedge-proof preflight + canonical peak probe
# (single implementation: streamz_tpu/runtime/measure.py).
from streamz_tpu.runtime.measure import (  # noqa: E402
    chain_timer as _chain,
    session_peak_tflops,
    wait_device_healthy,
)


def main():
    if not wait_device_healthy(max_wait_s=2400.0):
        print("device preflight never went healthy", file=sys.stderr)
        sys.exit(3)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    rng = np.random.default_rng(0)

    # Canonical peak — the same probe bench.py normalizes against.
    print(json.dumps({"variant": "gemm_peak_bf16",
                      "tflops": round(session_peak_tflops(), 1)}), flush=True)

    # The DFT shape (one bf16 pass).
    rows = 64 * 512
    x = jnp.asarray(rng.normal(size=(rows, 400)).astype(np.float32), jnp.bfloat16)
    d = jnp.asarray(rng.normal(size=(400, 1024)).astype(np.float32), jnp.bfloat16)
    t = _chain(lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32), x, d)
    flops = 2 * rows * 400 * 1024
    print(json.dumps({
        "variant": "gemm_dft_shape_1pass",
        "tflops": round(flops / t / 1e12, 1),
        "ns_per_row": round(1e9 * t / rows, 2),
        "ns_per_row_x3": round(3e9 * t / rows, 2),
    }), flush=True)

    # K padded to 512 (eighth 64-lane multiple): does K=400 hurt?
    xp = jnp.pad(x, ((0, 0), (0, 112)))
    dp = jnp.pad(d, ((0, 112), (0, 0)))
    t = _chain(lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32), xp, dp)
    print(json.dumps({
        "variant": "gemm_dft_shape_k512_1pass",
        "tflops": round(2 * rows * 512 * 1024 / t / 1e12, 1),
        "ns_per_row": round(1e9 * t / rows, 2),
    }), flush=True)

    # The shipped kernel, same session.
    from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas_v3

    B, T = 64, 512 * 400
    pcm = jnp.asarray(rng.normal(0, 0.1, size=(B, T)).astype(np.float32))

    def v3(p):
        return mfcc_base_pallas_v3(p).reshape(-1, 20)

    t = _chain(v3, pcm)
    n_win = B * (T // 400 - 1)
    print(json.dumps({
        "variant": "v3_full_strip_major",
        "win_per_s": round(n_win / t, 1),
        "ns_per_win": round(1e9 * t / n_win, 2),
    }), flush=True)

    # XLA frontend base for the same-session ratio.
    from streamz_tpu.dsp.mfcc import mfcc_base

    def xla_base(p):
        return mfcc_base(p).reshape(-1, 20)

    t = _chain(xla_base, pcm)
    print(json.dumps({
        "variant": "xla_base",
        "win_per_s": round(n_win / t, 1),
        "ns_per_win": round(1e9 * t / n_win, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
