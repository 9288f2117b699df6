"""Fused Pallas training kernel vs the XLA corpus step.

The kernel (``nn/pallas_train.py``) must produce the same gradients as
``train.corpus_step``'s autodiff of the surrogate loss — which itself equals
the reference's hand-written delta rule (``streamz-rs/src/lib.rs:954-1060``,
verified against the numpy oracle in ``test_train.py``) — including the
out-of-range-label zero-target quirk and the capacity masking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamz_tpu.nn.model import SpeakerNet
from streamz_tpu.nn.train import corpus_step, resolve_train_backend
from streamz_tpu.nn.pallas_train import corpus_step_pallas


def _mk(B=700, classes=5, label_hi=7, seed=1):
    net = SpeakerNet.new(output=classes, seed=0)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, 60)).astype(np.float32))
    # label_hi > classes: some labels out of range (zero-target quirk)
    labels = jnp.asarray(rng.integers(0, label_hi, B).astype(np.int32))
    w = jnp.asarray((rng.uniform(size=B) > 0.1).astype(np.float32))
    return net, x, labels, w


def test_fused_step_matches_xla():
    net, x, labels, w = _mk()
    p1, l1 = corpus_step(net.params, x, labels, w, net.num_speakers, 0.05,
                         backend="xla")
    p2, l2 = corpus_step_pallas(net.params, x, labels, w, net.num_speakers,
                                0.05)
    assert np.allclose(float(l1), float(l2), atol=1e-5)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-5, err_msg=k
        )


def test_fused_step_tile_boundary_and_empty_mask():
    # Exact tile multiple and a fully-masked batch (no update applied).
    net, x, labels, _ = _mk(B=1024)
    w1 = jnp.ones((1024,), jnp.float32)
    p1, _ = corpus_step(net.params, x, labels, w1, net.num_speakers, 0.05,
                        backend="xla")
    p2, _ = corpus_step_pallas(net.params, x, labels, w1, net.num_speakers,
                               0.05)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-5, err_msg=k
        )

    w0 = jnp.zeros((1024,), jnp.float32)
    p3, _ = corpus_step_pallas(net.params, x, labels, w0, net.num_speakers,
                               0.05)
    for k in p3:
        np.testing.assert_allclose(
            np.asarray(p3[k]), np.asarray(net.params[k]), atol=0,
            err_msg=k
        )


def test_auto_backend_resolves_to_xla_off_tpu():
    assert resolve_train_backend("auto") == "xla"  # CPU mesh in tests
    assert resolve_train_backend("pallas") == "pallas"
    with pytest.raises(ValueError):
        resolve_train_backend("cuda")


def test_dp_epoch_pallas_equals_xla_on_mesh():
    from streamz_tpu.parallel import comm
    from streamz_tpu.parallel import data_parallel as dp

    mesh = comm.make_mesh()
    assert mesh.devices.size == 8

    net, _, _, _ = _mk()
    B, steps = 256, 3
    rng = np.random.default_rng(7)
    xb = rng.normal(0, 1, (steps, B, 60)).astype(np.float32)
    yb = rng.integers(0, 5, (steps, B)).astype(np.int32)
    wb = np.ones((steps, B), np.float32)

    out = {}
    for backend in ("xla", "pallas"):
        epoch_fn = dp.make_dp_train_epoch(mesh, steps=steps, backend=backend)
        params, losses = epoch_fn(
            net.params, jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(wb),
            jnp.int32(net.num_speakers), jnp.float32(0.05),
        )
        out[backend] = (params, np.asarray(losses))

    np.testing.assert_allclose(out["xla"][1], out["pallas"][1], atol=1e-5)
    for k in out["xla"][0]:
        np.testing.assert_allclose(
            np.asarray(out["xla"][0][k]), np.asarray(out["pallas"][0][k]),
            atol=1e-5, err_msg=k,
        )


def test_shared_autotune_cache_roundtrip(monkeypatch, tmp_path):
    from streamz_tpu.runtime import autotune

    monkeypatch.setattr(autotune, "_CACHE_PATH", str(tmp_path / "t.json"))
    autotune.reset()
    # Off-TPU: defaults, no probing.
    assert autotune.measured_choice("train_step", {}, default="xla") == "xla"
    assert autotune.cached_choice("train_step", "pallas", "xla") == "xla"
    # A stored decision wins over the static default.
    autotune._disk_put("train_step:fake", "pallas")
    autotune.reset()
    assert autotune._disk_get("train_step:fake") == "pallas"
    autotune.reset()


def test_fused_step_at_stretch_capacity():
    """1000 live classes -> capacity 1024: exercises the reduced row tile
    (VMEM scales with capacity) and the masking at the stretch config."""
    from streamz_tpu.nn.pallas_train import _tile_for

    assert _tile_for(128) == 512 and _tile_for(1024) == 128

    net = SpeakerNet.new(output=1000, seed=0)
    assert net.params["b3"].shape[0] == 1024
    rng = np.random.default_rng(3)
    B = 300  # not a multiple of the 128-row tile
    x = jnp.asarray(rng.normal(0, 1, (B, 60)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1100, B).astype(np.int32))
    w = jnp.ones((B,), jnp.float32)
    p1, l1 = corpus_step(net.params, x, labels, w, net.num_speakers, 0.05,
                         backend="xla")
    p2, l2 = corpus_step_pallas(net.params, x, labels, w, net.num_speakers,
                                0.05)
    assert np.allclose(float(l1), float(l2), atol=1e-4)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-5, err_msg=k
        )


def test_file_train_kernel_matches_xla_scan():
    """train_on_windows_impl backend='pallas' (whole chunk loop in one
    kernel, params resident in VMEM) == backend='xla' (scan), including
    dropout, shuffle, partial validity, and the zero-target quirk."""
    from streamz_tpu.nn.train import train_on_windows_impl

    net = SpeakerNet.new(output=5, seed=0)
    cap = net.params["b3"].shape[0]
    rng = np.random.default_rng(11)
    for n_pad, n_valid, dropout, tgt_cls in [
        (64, 50, 0.0, 2), (448, 300, 0.2, 1), (64, 64, 0.2, 99)
    ]:
        windows = jnp.asarray(rng.normal(0, 1, (n_pad, 60)).astype(np.float32))
        tvec = jnp.zeros((cap,), jnp.float32)
        if tgt_cls < net.num_speakers:
            tvec = tvec.at[tgt_cls].set(1.0)
        key = jax.random.PRNGKey(42)
        out = {}
        for backend in ("xla", "pallas"):
            p, loss = train_on_windows_impl(
                net.params, windows, jnp.int32(n_valid), tvec,
                jnp.int32(net.num_speakers), key, jnp.float32(0.05),
                jnp.float32(dropout), epochs=3, batch_size=8,
                backend=backend)
            out[backend] = (p, float(loss))
        assert abs(out["xla"][1] - out["pallas"][1]) < 1e-4
        for k in out["xla"][0]:
            np.testing.assert_allclose(
                np.asarray(out["xla"][0][k]), np.asarray(out["pallas"][0][k]),
                atol=1e-4, err_msg=f"{k} n_pad={n_pad}",
            )


def test_file_train_auto_resolves_off_tpu():
    from streamz_tpu.runtime import autotune

    assert autotune.cached_choice("file_train", "pallas", "xla") == "xla"


def test_fused_steps_zero_update_when_no_classes():
    """num_speakers == 0: every column masked — both fused kernels must
    apply exactly zero update, like the XLA where-mask backward does."""
    from streamz_tpu.nn.train import train_on_windows_impl

    net, x, labels, w = _mk()
    p, _ = corpus_step_pallas(net.params, x, labels, w, 0, 0.05)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(p[k]), np.asarray(net.params[k]), atol=0, err_msg=k
        )

    windows = x[:64]
    cap = net.params["b3"].shape[0]
    key = jax.random.PRNGKey(5)
    out = {}
    for backend in ("xla", "pallas"):
        p2, _ = train_on_windows_impl(
            net.params, windows, jnp.int32(50), jnp.zeros((cap,), jnp.float32),
            jnp.int32(0), key, jnp.float32(0.05), jnp.float32(0.0),
            epochs=2, batch_size=8, backend=backend)
        out[backend] = p2
    for k in out["xla"]:
        np.testing.assert_allclose(
            np.asarray(out["xla"][k]), np.asarray(net.params[k]), atol=0,
            err_msg=f"xla moved {k}")
        np.testing.assert_allclose(
            np.asarray(out["pallas"][k]), np.asarray(net.params[k]), atol=0,
            err_msg=f"pallas moved {k}")


def test_file_train_zero_epochs_is_noop():
    """epochs=0 yields zero chunks: the Pallas path must return params
    unchanged and zero loss (a grid-(0,) launch would leave the output
    buffers uninitialized), matching the XLA scan's length-0 no-op."""
    import jax.numpy as jnp

    from streamz_tpu.nn.model import SpeakerNet
    from streamz_tpu.nn.pallas_train import train_windows_pallas

    net = SpeakerNet.new(output=2, seed=0)
    chunks = jnp.zeros((0, 8, 60), jnp.float32)
    masks = jnp.zeros((0, 8), jnp.float32)
    tvec = jnp.zeros((net.capacity,), jnp.float32).at[0].set(1.0)
    params, loss, cnt = train_windows_pallas(
        net.params, chunks, masks, tvec, jnp.int32(2), jnp.float32(0.05)
    )
    assert float(loss) == 0.0 and float(cnt) == 0.0
    for k in net.params:
        np.testing.assert_array_equal(params[k], net.params[k])
