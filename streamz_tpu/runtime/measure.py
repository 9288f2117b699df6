"""Shared measurement utilities for the benchmark harnesses.

One implementation of the three pieces every harness (``bench.py``,
``benchmarks/gemm_probe.py``, ``benchmarks/run_all.py``) needs, so a
methodology fix lands once:

- :func:`wait_device_healthy` — the wedge-proof tunnel preflight (probes in
  abandonable subprocesses until a trivial computation succeeds);
- :func:`chain_timer` — per-iteration timing of a device function via a
  data-chained jitted scan with a collapse-proof full-sum consumer;
- :func:`session_peak_tflops` — the canonical 4096^3 bf16 GEMM probe, the
  session's achievable MXU rate (the honest utilization denominator — the
  axon tunnel time-slices the chip, so nameplate peak conflates session
  state with kernel efficiency; see benchmarks/ROOFLINE.md).
"""

from __future__ import annotations

import os
import time

import numpy as np


def wait_device_healthy(max_wait_s: float | None = None) -> bool:
    """Probe in abandonable subprocesses until the tunnel responds.

    The axon tunnel occasionally wedges for ~20-30 min after a heavy
    session (device-claim turnover); a probe blocked on the wedged tunnel
    sits in uninterruptible D-state sleep where SIGKILL does not take, so
    the probe runs through the shared wedge-proof helper
    (:func:`streamz_tpu.runtime.procs.probe_ok`) and this process starts
    its own device client only once the tunnel responds.  ``max_wait_s``
    defaults to ``STREAMZ_BENCH_PREFLIGHT_S`` (1500 s)."""
    from streamz_tpu.runtime.procs import probe_ok

    if max_wait_s is None:
        try:
            max_wait_s = float(
                os.environ.get("STREAMZ_BENCH_PREFLIGHT_S", 1500.0)
            )
        except ValueError:
            max_wait_s = 1500.0  # malformed env must not kill the preflight
    deadline = time.monotonic() + max_wait_s
    probe = "import jax,jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))"
    while time.monotonic() < deadline:
        if probe_ok(probe, timeout=min(90.0, max(5.0, deadline - time.monotonic()))):
            return True
        if time.monotonic() + 60 >= deadline:
            break
        time.sleep(60)
    return False


def chain_timer(fn, *args, iters: int = 8, repeats: int = 3,
                best: bool = False) -> float:
    """Per-iteration wall time of ``fn(*args)`` on device.

    Iterations are chained through a data dependency inside ONE jitted
    scan and only a scalar is read back: the axon tunnel's
    ``block_until_ready`` does not reliably block, and bulk host readbacks
    would measure the tunnel, not the chip.  Two collapse fences:

    - the carry is added to the first operand WITHOUT dtype promotion
      (adding an f32 carry to a bf16 operand would silently upcast the
      GEMM);
    - the consumer keeps every output element live via a full ``sum`` — a
      sliced consumer (``sum(r[:1, :1])``) lets XLA's slice-of-dot rewrite
      shrink the whole GEMM to a 1x1 dot, and the probe then times
      dispatch latency (verified in compiled HLO; the round-3 numbers
      recorded before this fence were exactly that artifact).

    Returns the median of ``repeats`` runs (or the min with ``best=True``
    — the right statistic for a *peak* probe)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(c, _):
            r = fn(*(x + c.astype(x.dtype) if i == 0 else x
                     for i, x in enumerate(a)))
            return jnp.sum(r).astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(*args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    # (len-1)//2: the true lower-median — len//2 picks the WORSE of
    # two runs for even repeat counts.
    picked = min(times) if best else sorted(times)[(len(times) - 1) // 2]
    return picked / iters


def session_peak_tflops(iters: int = 8) -> float:
    """Measured bf16 MXU rate on a canonical 4096^3 GEMM *this session*.

    Axon tunnel sessions run the chip anywhere from ~20% to ~100% of
    nameplate (measured range 41-197 TF — benchmarks/gemm_probe.py), so
    utilization against the spec sheet conflates session state with kernel
    efficiency; this is the honest denominator.  Uses the min-of-repeats
    statistic (best attainable this session)."""
    import jax.numpy as jnp

    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32), jnp.bfloat16)
    t = chain_timer(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
        a, b, iters=iters, best=True,
    )
    return 2 * n**3 / t / 1e12
