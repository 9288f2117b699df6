"""FeatureExtractor facade + the ``feature_cache/*.npy`` load-or-compute layer.

Mirrors the reference's ``FeatureExtractor`` (``streamz-rs/src/lib.rs:231-264``),
``with_thread_extractor`` (``:266-276``) and ``load_cached_features``
(``:558-579``).  On TPU there is no per-thread FFT plan to cache — the jitted
frontend is process-global — so the "extractor" is a thin stateless facade and
``with_thread_extractor`` simply hands it out.

Backend selection is **by measurement, not hardcoding**: the default
``'auto'`` backend times the XLA formulation against the fused Pallas v3
kernel on the first TPU use and keeps the winner (cached per device kind by
:mod:`streamz_tpu.runtime.autotune` so later processes skip the probe).
On non-TPU backends the XLA formulation is used directly — the Pallas kernels
only run there in interpret mode, which is for testing, not speed.
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence, TypeVar

import numpy as np

from streamz_tpu.dsp import mfcc, mfcc_ref
from streamz_tpu.io import audio

R = TypeVar("R")

_BACKENDS = (
    "auto", "jax", "pallas", "pallas_v2", "pallas_v3", "pallas_v4", "numpy"
)


def _core_for(backend: str):
    if backend == "pallas":
        from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas

        return mfcc_features_pallas
    if backend == "pallas_v2":
        from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v2

        return mfcc_features_pallas_v2
    if backend == "pallas_v3":
        from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v3

        return mfcc_features_pallas_v3
    if backend == "pallas_v4":
        from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v4

        return mfcc_features_pallas_v4
    return mfcc.mfcc_features


def _time_frontend(core, pcm, n_samples, iters: int = 8) -> float:
    """Median-of-3 time of ``iters`` chained frontend calls, via the shared
    chained-scan timer (dispatch-amortized; one warm+median protocol for
    every probe and harness — streamz_tpu/runtime/measure.py)."""
    from streamz_tpu.runtime.measure import chain_timer

    return chain_timer(core, pcm, n_samples, iters=iters) * iters


def autotune_frontend(force: bool = False) -> str:
    """Measure the XLA formulation against the fused Pallas kernels (v3 and
    the packed-basis v4) on this device and return the winner.  Non-TPU
    backends return 'jax' without probing.  The result is cached in-process
    and on disk per device kind."""
    from streamz_tpu.runtime import autotune

    # Probe at a compute-bound scale (32 clips x 10 s).  Smaller probes are
    # dispatch-bound through the tunnel and measure a tie (measured: at
    # 8x80k both frontends read 0.5M win/s; at this size the difference is
    # real — benchmarks/ROOFLINE.md).  The ~54 MB input is built lazily on
    # first probe and shared by both candidates.
    shared = {}

    def _setup():
        if shared:
            return
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        B, T = 32, 441600
        shared["pcm"] = jnp.asarray(
            rng.normal(0, 0.1, size=(B, T)).astype(np.float32)
        )
        shared["ns"] = jnp.full((B,), T, jnp.int32)

    def probe_for(backend):
        def probe():
            _setup()
            return _time_frontend(
                _core_for(backend), shared["pcm"], shared["ns"], iters=16
            )
        return probe

    return autotune.measured_choice(
        "frontend",
        {
            "jax": probe_for("jax"),
            "pallas_v3": probe_for("pallas_v3"),
            "pallas_v4": probe_for("pallas_v4"),
        },
        default="jax",
        force=force,
    )


def frontend_core(backend: str = "auto"):
    """Public accessor for a frontend implementation by backend name;
    'auto' resolves to the measured winner (see :func:`autotune_frontend`)."""
    if backend == "numpy":
        # Valid FeatureExtractor backend, but host-only: there is no
        # device core to hand out — say so instead of "unknown".
        raise ValueError(
            "the 'numpy' backend is the host-side golden spec "
            "(dsp/mfcc_ref.py) and has no device core; use "
            "FeatureExtractor(backend='numpy') for host extraction"
        )
    if backend not in _BACKENDS:
        raise ValueError(f"unknown frontend backend {backend!r}")
    if backend == "auto":
        backend = autotune_frontend()
    return _core_for(backend)


class FeatureExtractor:
    """Stateless MFCC frontend facade.

    ``backend='auto'`` (default) measures the XLA formulation against the
    fused Pallas kernels (v3 and the packed-basis v4) on first TPU use and
    keeps the winner; ``'jax'``/``'pallas'``/``'pallas_v2'``/``'pallas_v3'``/
    ``'pallas_v4'`` force a specific frontend; ``'numpy'`` runs the golden
    CPU spec (parity tests and the bench baseline).
    """

    def __init__(self, backend: str = "auto"):
        if backend not in _BACKENDS:
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _resolved(self) -> str:
        if self.backend == "auto":
            return autotune_frontend()
        return self.backend

    def _core(self):
        return _core_for(self._resolved())

    def extract(self, samples: np.ndarray) -> np.ndarray:
        """PCM (i16 or f32) → [n_windows, 60] float32."""
        if self.backend == "numpy":
            return mfcc_ref.extract_features_np(samples)
        return mfcc.extract_features(samples, core=self._core())

    def extract_batch(
        self, clips: Sequence[np.ndarray], mesh=None, store=None
    ) -> List[np.ndarray]:
        """Batched extraction; with ``mesh`` the clip axis is sharded across
        the data mesh for every device backend — the fused Pallas kernels
        run per shard under ``shard_map``, so the ingest stage stays sharded
        regardless of the autotune winner (only the numpy golden spec is
        host-only).  With ``store`` (a :class:`~streamz_tpu.dsp.mfcc.
        DeviceFeatureStore`) the device outputs are additionally kept
        device-resident for downstream device consumers."""
        if self.backend == "numpy":
            return [mfcc_ref.extract_features_np(c) for c in clips]
        resolved = self._resolved()
        # The PCM-halo long-clip route is bit-equal to the XLA core; honor a
        # user-forced Pallas backend strictly (the bucket path runs that
        # exact kernel per shard), but let 'auto' — which promises a
        # measured winner, not a specific bit pattern — use it.
        return mfcc.extract_features_batch(
            clips, core=_core_for(resolved), mesh=mesh,
            allow_pcm_sharded=(self.backend == "auto" or resolved == "jax"),
            store=store,
        )


_GLOBAL_EXTRACTOR = FeatureExtractor()


def with_thread_extractor(f: Callable[[FeatureExtractor], R]) -> R:
    """Run a closure with the process-global extractor (src/lib.rs:271-276)."""
    return f(_GLOBAL_EXTRACTOR)


def save_cached_features(path: str, feats: np.ndarray) -> None:
    """Publish ``feature_cache/<sanitized>.npy`` atomically (temp + rename
    in the cache dir): a concurrent reader — another process
    training/evaluating the same corpus — must never observe a
    partially-written .npy."""
    import tempfile

    cache = audio.feature_cache_path(path)
    fd, tmp = tempfile.mkstemp(
        prefix=cache.name + ".", suffix=".tmp", dir=str(cache.parent)
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.save(f, feats)
        os.replace(tmp, cache)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_cached_features(
    path: str, extractor: FeatureExtractor | None = None
) -> np.ndarray:
    """Load ``feature_cache/<sanitized>.npy`` or compute+store it
    (src/lib.rs:558-579).  Returns [n_windows, 60] float32."""
    extractor = extractor or _GLOBAL_EXTRACTOR
    cache = audio.feature_cache_path(path)
    if cache.exists():
        try:
            return np.load(cache).astype(np.float32)
        except Exception:
            # Torn cache file (writer interrupted mid-save, or two
            # processes raced before writes were atomic): recompute and
            # overwrite instead of aborting every future run.
            pass
    samples = audio.load_audio_samples(path)
    feats = extractor.extract(samples)
    save_cached_features(path, feats)
    return feats
