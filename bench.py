"""Benchmark harness: MFCC+Δ+ΔΔ frontend throughput, device vs CPU reference.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
*measured* reference-spec pipeline on CPU: the numpy golden implementation of
the exact per-window FFT→mel→log→DCT→Δ→z-norm loop
(:mod:`streamz_tpu.dsp.mfcc_ref`), which is the compute-dominant hot loop of
the reference binary (HOT LOOP A, ``streamz-rs/src/main.rs:500-508``).
``value`` is the device (TPU when available) throughput of the batched XLA
frontend; ``vs_baseline`` is the speedup over the CPU spec implementation.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeat bench runs skip the (slow,
    tunnel-bound) device compile."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _bench_device(batch_clips: int = 32, clip_seconds: float = 10.0, iters: int = 5):
    import jax
    import jax.numpy as jnp

    from streamz_tpu import config
    from streamz_tpu.dsp.mfcc import mfcc_features

    rate = config.DEFAULT_SAMPLE_RATE
    t = int(clip_seconds * rate)
    t -= t % config.HOP_SIZE  # block-aligned
    n_win = (t - config.WINDOW_SIZE) // config.HOP_SIZE + 1

    rng = np.random.default_rng(0)
    pcm = jnp.asarray(
        rng.normal(0.0, 0.1, size=(batch_clips, t)).astype(np.float32)
    )
    n_samples = jnp.full((batch_clips,), t, jnp.int32)

    # Iterations are chained through a data dependency inside one jitted
    # scan, and only a scalar is read back: the axon tunnel's
    # block_until_ready does not reliably block, and bulk host readbacks
    # would measure the tunnel, not the chip.
    @jax.jit
    def chained(pcm, n_samples):
        def body(c, _):
            f = mfcc_features(pcm + c, n_samples)
            return jnp.sum(f) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(pcm, n_samples))  # compile + warm
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(chained(pcm, n_samples))
        best = min(best, (time.perf_counter() - start) / iters)

    return batch_clips * n_win / best


def _bench_cpu_baseline(clip_seconds: float = 4.0, iters: int = 2):
    from streamz_tpu import config
    from streamz_tpu.dsp.mfcc_ref import extract_features_np

    rate = config.DEFAULT_SAMPLE_RATE
    t = int(clip_seconds * rate)
    rng = np.random.default_rng(1)
    clip = (rng.normal(0, 3000, size=t)).astype(np.int16)

    extract_features_np(clip)  # warm caches
    start = time.perf_counter()
    n_win = 0
    for _ in range(iters):
        feats = extract_features_np(clip)
        n_win += len(feats)
    elapsed = time.perf_counter() - start
    return n_win / elapsed


def main() -> None:
    _enable_compile_cache()
    device_rate = _bench_device()
    cpu_rate = _bench_cpu_baseline()
    print(
        json.dumps(
            {
                "metric": "mfcc_delta_windows_per_sec",
                "value": round(device_rate, 1),
                "unit": "windows/s",
                "vs_baseline": round(device_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
