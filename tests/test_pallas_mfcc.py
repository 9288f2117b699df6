"""Fused Pallas MFCC kernel vs the golden numpy spec (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from streamz_tpu.dsp import mfcc_ref
from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas, mfcc_features_pallas


def test_pallas_matches_golden():
    B, T = 2, 12000
    rng = np.random.default_rng(0)
    pcm_i16 = rng.normal(0, 3000, (B, T)).astype(np.int16)
    pcm = jnp.asarray(pcm_i16.astype(np.float32) / 32767.0)
    ns = jnp.asarray([T, 9000], jnp.int32)
    got = np.asarray(mfcc_features_pallas(pcm, ns))
    for b, n in enumerate([T, 9000]):
        want = mfcc_ref.extract_features_np(pcm_i16[b][:n])
        nw = want.shape[0]
        np.testing.assert_allclose(got[b][:nw], want, atol=2e-3, rtol=1e-3)


def test_pallas_base_shape():
    pcm = jnp.zeros((3, 4000), jnp.float32)
    base = np.asarray(mfcc_base_pallas(pcm))
    assert base.shape == (3, 9, 20)


def test_pallas_matches_xla_frontend():
    from streamz_tpu.dsp.mfcc import mfcc_features

    B, T = 3, 20000
    rng = np.random.default_rng(5)
    pcm = jnp.asarray(rng.normal(0, 0.1, (B, T)).astype(np.float32))
    ns = jnp.asarray([T, 15000, 801], jnp.int32)
    a = np.asarray(mfcc_features_pallas(pcm, ns))
    b = np.asarray(mfcc_features(pcm, ns))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_pallas_backend_via_extractor():
    from streamz_tpu.dsp.features import FeatureExtractor

    rng = np.random.default_rng(7)
    clip = rng.normal(0, 3000, 6000).astype(np.int16)
    a = FeatureExtractor("pallas").extract(clip)
    b = FeatureExtractor("numpy").extract(clip)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_v2_block_kernel_matches_golden():
    from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v2

    B, T = 2, 12000
    rng = np.random.default_rng(0)
    pcm_i16 = rng.normal(0, 3000, (B, T)).astype(np.int16)
    pcm = jnp.asarray(pcm_i16.astype(np.float32) / 32767.0)
    ns = jnp.asarray([T, 9000], jnp.int32)
    got = np.asarray(mfcc_features_pallas_v2(pcm, ns))
    for b, n in enumerate([T, 9000]):
        want = mfcc_ref.extract_features_np(pcm_i16[b][:n])
        nw = want.shape[0]
        np.testing.assert_allclose(got[b][:nw], want, atol=2e-3, rtol=1e-3)


def test_v3_pipelined_kernel_matches_golden():
    from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v3

    B, T = 2, 12000
    rng = np.random.default_rng(1)
    pcm_i16 = rng.normal(0, 3000, (B, T)).astype(np.int16)
    pcm = jnp.asarray(pcm_i16.astype(np.float32) / 32767.0)
    ns = jnp.asarray([T, 9000], jnp.int32)
    got = np.asarray(mfcc_features_pallas_v3(pcm, ns))
    for b, n in enumerate([T, 9000]):
        want = mfcc_ref.extract_features_np(pcm_i16[b][:n])
        nw = want.shape[0]
        np.testing.assert_allclose(got[b][:nw], want, atol=1e-3, rtol=1e-3)


def test_v3_tail_split_shapes():
    """Exercise both the bulk-tiles and tail-only paths of the v3 launcher."""
    from streamz_tpu.dsp.mfcc import mfcc_base
    from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas_v3

    rng = np.random.default_rng(2)
    # (129, 1600) and (513, 800) pin the two-tile tail: rows mod _TILE3 in
    # 1.._HALO3-1 with rows > _TILE3 used to truncate the tail to one tile.
    for B, T in [(1, 800), (1, 2000), (2, 4000), (1, 208000), (3, 208000),
                 (129, 1600), (513, 800)]:
        pcm = jnp.asarray(rng.normal(0, 0.1, (B, T)).astype(np.float32))
        a = np.asarray(mfcc_base(pcm))
        b = np.asarray(mfcc_base_pallas_v3(pcm))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_v4_packed_kernel_matches_golden():
    from streamz_tpu.dsp.pallas_mfcc import mfcc_features_pallas_v4

    B, T = 2, 12000
    rng = np.random.default_rng(1)
    pcm_i16 = rng.normal(0, 3000, (B, T)).astype(np.int16)
    pcm = jnp.asarray(pcm_i16.astype(np.float32) / 32767.0)
    ns = jnp.asarray([T, 9000], jnp.int32)
    got = np.asarray(mfcc_features_pallas_v4(pcm, ns))
    for b, n in enumerate([T, 9000]):
        want = mfcc_ref.extract_features_np(pcm_i16[b][:n])
        nw = want.shape[0]
        np.testing.assert_allclose(got[b][:nw], want, atol=1e-3, rtol=1e-3)


def test_v4_matches_v3():
    """The packed basis is a pure layout change: v4 must match v3 to the
    tail-bin bf16-rounding tolerance (cos²/sin² rounded before summation
    for bins 384..400 instead of after)."""
    from streamz_tpu.dsp.pallas_mfcc import (
        mfcc_features_pallas_v3,
        mfcc_features_pallas_v4,
    )

    B, T = 2, 30000
    rng = np.random.default_rng(6)
    pcm = jnp.asarray(rng.normal(0, 0.1, (B, T)).astype(np.float32))
    ns = jnp.asarray([T, 22000], jnp.int32)
    a = np.asarray(mfcc_features_pallas_v3(pcm, ns))
    b = np.asarray(mfcc_features_pallas_v4(pcm, ns))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_v4_tail_split_shapes():
    """Exercise both the bulk-tiles and tail-only paths of the v4 launcher."""
    from streamz_tpu.dsp.mfcc import mfcc_base
    from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas_v4

    rng = np.random.default_rng(2)
    # (129, 1600) and (513, 800) pin the two-tile tail: rows mod _TILE3 in
    # 1.._HALO3-1 with rows > _TILE3 used to truncate the tail to one tile.
    for B, T in [(1, 800), (1, 2000), (2, 4000), (1, 208000), (3, 208000),
                 (129, 1600), (513, 800)]:
        pcm = jnp.asarray(rng.normal(0, 0.1, (B, T)).astype(np.float32))
        a = np.asarray(mfcc_base(pcm))
        b = np.asarray(mfcc_base_pallas_v4(pcm))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_autotune_backend_selection(monkeypatch, tmp_path):
    """'auto' resolves to the XLA frontend off-TPU without probing, and the
    disk cache round-trips a stored decision."""
    import streamz_tpu.dsp.features as feats
    from streamz_tpu.runtime import autotune

    monkeypatch.setattr(autotune, "_CACHE_PATH", str(tmp_path / "tune.json"))
    autotune.reset("frontend")
    assert feats.autotune_frontend(force=True) == "jax"  # CPU mesh here

    ex = feats.FeatureExtractor("auto")
    rng = np.random.default_rng(3)
    clip = rng.normal(0, 3000, 4000).astype(np.int16)
    np.testing.assert_allclose(
        ex.extract(clip), feats.FeatureExtractor("jax").extract(clip)
    )
    autotune.reset("frontend")


def test_extractor_accepts_v3_backend():
    from streamz_tpu.dsp.features import FeatureExtractor

    rng = np.random.default_rng(4)
    clip = rng.normal(0, 3000, 6000).astype(np.int16)
    a = FeatureExtractor("pallas_v3").extract(clip)
    b = FeatureExtractor("numpy").extract(clip)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_kernels_zero_block_clip():
    """Direct kernel calls on a sub-block clip (T < 400) return zero windows
    instead of crashing (ADVICE r2: empty-concatenate in v3)."""
    from streamz_tpu.dsp.pallas_mfcc import (
        mfcc_base_pallas_v2,
        mfcc_base_pallas_v3,
        mfcc_base_pallas_v4,
        mfcc_features_pallas_v2,
        mfcc_features_pallas_v3,
        mfcc_features_pallas_v4,
    )

    pcm = jnp.zeros((2, 399), jnp.float32)
    ns = jnp.asarray([399, 100], jnp.int32)
    for base_fn in (mfcc_base_pallas, mfcc_base_pallas_v2,
                    mfcc_base_pallas_v3, mfcc_base_pallas_v4):
        assert np.asarray(base_fn(pcm)).shape == (2, 0, 20)
    for feat_fn in (mfcc_features_pallas_v2, mfcc_features_pallas_v3,
                    mfcc_features_pallas_v4):
        assert np.asarray(feat_fn(pcm, ns)).shape == (2, 0, 60)
