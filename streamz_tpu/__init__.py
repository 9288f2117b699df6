"""StreamZ-TPU: a TPU-native incremental open-set speaker-ID framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
StreamZ application (Mycoearthdome/StreamZ): audio ingest (MP3/WAV decode,
resample to 44.1 kHz), an MXU-resident MFCC+delta frontend, a batched
speaker-classification MLP with dynamically growing output classes, cosine
centroid identification, k-means clustering, npz checkpoint interop, an
incremental discovery loop, and the steganography subsystem — all designed
SPMD-first for multi-chip TPU meshes.

Public API names mirror the reference crate's ``pub`` surface
(``streamz-rs/src/lib.rs``) so users of the reference can map 1:1.
"""

from streamz_tpu.config import (
    DEFAULT_SAMPLE_RATE,
    WINDOW_SIZE,
    MFCC_SIZE,
    FEATURE_SIZE,
    DEFAULT_DROPOUT,
    CHECKSUM_CONSTANT,
    get_checksum_constant,
    set_checksum_constant_override,
    set_wav_cache_enabled,
    wav_cache_enabled,
)
from streamz_tpu.nn.model import SpeakerNet

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_SAMPLE_RATE",
    "WINDOW_SIZE",
    "MFCC_SIZE",
    "FEATURE_SIZE",
    "DEFAULT_DROPOUT",
    "CHECKSUM_CONSTANT",
    "get_checksum_constant",
    "set_checksum_constant_override",
    "set_wav_cache_enabled",
    "wav_cache_enabled",
    "SpeakerNet",
]
