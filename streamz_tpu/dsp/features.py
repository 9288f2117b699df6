"""FeatureExtractor facade + the ``feature_cache/*.npy`` load-or-compute layer.

Mirrors the reference's ``FeatureExtractor`` (``streamz-rs/src/lib.rs:231-264``),
``with_thread_extractor`` (``:266-276``) and ``load_cached_features``
(``:558-579``).  On TPU there is no per-thread FFT plan to cache — the jitted
frontend is process-global — so the "extractor" is a thin stateless facade and
``with_thread_extractor`` simply hands it out.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, TypeVar

import numpy as np

from streamz_tpu.dsp import mfcc, mfcc_ref
from streamz_tpu.io import audio

R = TypeVar("R")


class FeatureExtractor:
    """Stateless MFCC frontend facade.

    ``backend='jax'`` (default) runs the batched XLA frontend;
    ``backend='pallas'`` runs the fused Pallas kernel
    (:mod:`streamz_tpu.dsp.pallas_mfcc`); ``backend='numpy'`` runs the golden
    CPU spec (parity tests and the bench baseline).
    """

    def __init__(self, backend: str = "jax"):
        if backend not in ("jax", "pallas", "numpy"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _core(self):
        if self.backend == "pallas":
            from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas

            return mfcc_features_pallas
        return mfcc.mfcc_features

    def extract(self, samples: np.ndarray) -> np.ndarray:
        """PCM (i16 or f32) → [n_windows, 60] float32."""
        if self.backend == "numpy":
            return mfcc_ref.extract_features_np(samples)
        return mfcc.extract_features(samples, core=self._core())

    def extract_batch(
        self, clips: Sequence[np.ndarray], mesh=None
    ) -> List[np.ndarray]:
        """Batched extraction; with ``mesh`` the clip axis is sharded across
        the data mesh (jax backend only — the Pallas kernel and the numpy
        spec run unsharded)."""
        if self.backend == "numpy":
            return [mfcc_ref.extract_features_np(c) for c in clips]
        if self.backend != "jax":
            mesh = None
        return mfcc.extract_features_batch(clips, core=self._core(), mesh=mesh)


_GLOBAL_EXTRACTOR = FeatureExtractor()


def with_thread_extractor(f: Callable[[FeatureExtractor], R]) -> R:
    """Run a closure with the process-global extractor (src/lib.rs:271-276)."""
    return f(_GLOBAL_EXTRACTOR)


def load_cached_features(
    path: str, extractor: FeatureExtractor | None = None
) -> np.ndarray:
    """Load ``feature_cache/<sanitized>.npy`` or compute+store it
    (src/lib.rs:558-579).  Returns [n_windows, 60] float32."""
    extractor = extractor or _GLOBAL_EXTRACTOR
    cache = audio.feature_cache_path(path)
    if cache.exists():
        return np.load(cache).astype(np.float32)
    samples = audio.load_audio_samples(path)
    feats = extractor.extract(samples)
    if len(feats):
        np.save(cache, feats)
    return feats
