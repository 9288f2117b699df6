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
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def _chain(fn, *args, iters=8):
    @jax.jit
    def chained(*a):
        def body(c, _):
            # Data-dependency chaining without dtype promotion: adding the
            # f32 carry to a bf16 operand would silently upcast the GEMM.
            r = fn(*(x + c.astype(x.dtype) if i == 0 else x
                     for i, x in enumerate(a)))
            # The consumer MUST keep every output element live: a sliced
            # consumer (sum(r[:1,:1])) lets XLA's slice-of-dot rewrite
            # shrink the whole GEMM to a 1x1 dot, and the probe then times
            # dispatch latency (verified in compiled HLO — the round-3
            # numbers recorded before this fix were exactly that artifact).
            return jnp.sum(r).astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / iters


def _wait_device_healthy(max_wait_s: float = 2400.0) -> bool:
    """Probe in abandonable subprocesses until the tunnel responds.

    Uses the shared wedge-proof helper (streamz_tpu/runtime/procs.py): a
    probe blocked on the wedged tunnel sits in uninterruptible D-state
    sleep where SIGKILL does not take, so plain subprocess.run would hang
    this process in its post-kill wait()."""
    from streamz_tpu.runtime.procs import probe_ok

    deadline = time.monotonic() + max_wait_s
    probe = "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))"
    while time.monotonic() < deadline:
        if probe_ok(probe, timeout=min(90.0, max(5.0, deadline - time.monotonic()))):
            return True
        if time.monotonic() + 60 >= deadline:
            break
        time.sleep(60)
    return False


def main():
    if not _wait_device_healthy():
        print("device preflight never went healthy", file=sys.stderr)
        sys.exit(3)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    rng = np.random.default_rng(0)

    # Canonical peak.
    N = 4096
    a = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32), jnp.bfloat16)
    t = _chain(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32), a, b)
    flops = 2 * N**3
    print(json.dumps({"variant": "gemm_peak_bf16",
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)

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
