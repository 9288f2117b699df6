"""Jitted training steps reproducing the reference's SGD semantics.

The reference trains with hand-written backprop (``streamz-rs/src/lib.rs:954-1060``):
softmax + cross-entropy whose output delta is exactly ``softmax(logits) - target``
— including the quirk that an out-of-range target class yields a zero target
vector and a pure ``softmax`` delta (``pretrain_from_features`` builds the
one-hot only when ``target_class < num_classes``, ``src/lib.rs:592-594``).
Autodiffing the clamped log-loss would *not* reproduce that, so the gradient
here is taken of ``logsumexp(logits) - <target, logits>``, whose derivative is
that exact delta for any target vector.

``train_on_windows`` reproduces the full ``pretrain_from_features`` loop
(``src/lib.rs:582-628``) as one jitted ``lax.scan``:

  per epoch: shuffle windows → chunks of ``batch_size`` → per-window feature
  dropout (plain zeroing, no 1/(1-p) rescale, ``src/lib.rs:119-129``) →
  windows that become all-zero are skipped (``:607-609``) → the *mean*
  gradient over surviving windows is applied once per chunk (``train_batch``,
  ``:1002-1060``) → the reported loss is ``-ln(max(p_target, 1e-12))``
  accumulated over surviving windows (``:610-616``).

Masked class growth: logits beyond ``num_speakers`` sit at a large negative
constant, so their softmax mass and gradients are exactly zero, matching the
reference's ``w3[.., ..num_speakers]`` slicing (``src/lib.rs:961-962``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from streamz_tpu.nn.model import Params, forward_logits, hidden_tanh


# VMEM bound for the fused Pallas trainers: w3 and its gradient
# accumulator live in VMEM ([h2, capacity] f32 each, ~2 KB per class at
# h2=256) plus per-row logits/probs/delta buffers — past ~2048 classes the
# working set approaches the ~16 MB of VMEM and the kernel fails to
# compile MID-RUN.  The autotune probes measure at capacity 128, so a
# cached 'pallas' winner says nothing about huge-capacity runs (a
# discovery pass over thousands of unlabeled files pre-sizes capacity to
# file count); above this bound the XLA formulation is used regardless of
# the cached choice.
PALLAS_TRAIN_MAX_CAPACITY = 2048


@jax.jit
def train_batch(
    params: Params,
    batch: jax.Array,
    target: jax.Array,
    lr,
    num_speakers,
    weights: jax.Array | None = None,
) -> Params:
    """One mean-gradient SGD step over a batch (src/lib.rs:1002-1060).

    Jitted: the reference method surface (SpeakerNet.train/train_batch)
    dispatches here per call, and an unjitted jax.grad would re-trace the
    whole forward+backward every step.

    ``weights``: optional [B] 0/1 mask of samples included in the batch; the
    mean divides by the *included* count, and a fully-masked batch applies no
    update (the reference skips empty batches at ``:1003-1005``).
    """
    B = batch.shape[0]
    w = jnp.ones((B,), jnp.float32) if weights is None else weights

    def summed(p):
        logits = forward_logits(p, batch, num_speakers)
        lse = jax.nn.logsumexp(logits, axis=-1)
        per = lse - jnp.sum(target * logits, axis=-1)
        return jnp.sum(per * w)

    grads = jax.grad(summed)(params)
    count = jnp.sum(w)
    scale = jnp.where(count > 0, lr / jnp.maximum(count, 1.0), 0.0)
    return jax.tree_util.tree_map(lambda p, g: p - scale * g, params, grads)


def file_epoch_views(
    windows: jax.Array,   # [N_pad, F]
    n_valid: jax.Array,   # scalar
    key: jax.Array,
    dropout: jax.Array,
    epochs: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-epoch shuffled+dropped window views and their valid masks.

    Reproduces ``pretrain_from_features``'s per-epoch shuffle
    (valid windows first, random order), plain-zeroing input dropout and
    all-zero-window skip (src/lib.rs:119-129, :598-609).  Shared by the XLA
    scan and the fused Pallas file trainer so both backends consume
    byte-identical data.  Returns (dropped [E, N_pad, F], valid [E, N_pad]).
    """
    n_pad, feat = windows.shape

    def one_epoch(ekey):
        k_perm, k_drop = jax.random.split(ekey)
        scores = jnp.where(
            jnp.arange(n_pad) < n_valid,
            jax.random.uniform(k_perm, (n_pad,)),
            jnp.inf,
        )
        order = jnp.argsort(scores)
        keep = jax.random.uniform(k_drop, (n_pad, feat)) >= dropout
        dropped = jnp.where(keep, windows[order], 0.0)
        valid = (jnp.arange(n_pad) < n_valid) & jnp.any(dropped != 0.0, axis=-1)
        return dropped, valid.astype(jnp.float32)

    return jax.vmap(one_epoch)(jax.random.split(key, epochs))


def train_on_windows_impl(
    params: Params,
    windows: jax.Array,   # [N_pad, F] feature windows (padded)
    n_valid: jax.Array,   # scalar count of real windows
    target_vec: jax.Array,  # [capacity] target vector (may be all-zero)
    num_speakers: jax.Array,  # scalar int
    key: jax.Array,
    lr: jax.Array,
    dropout: jax.Array,
    *,
    epochs: int,
    batch_size: int,
    backend: str = "auto",
) -> Tuple[Params, jax.Array]:
    """``pretrain_from_features`` (src/lib.rs:582-628) as one fused step.

    ``target_vec`` is the capacity-length target; the reference builds it as a
    one-hot only when ``target_class < num_classes`` (src/lib.rs:592-594) —
    callers replicate that rule in :mod:`streamz_tpu.nn.drivers`.

    Un-jitted implementation so larger fused steps (the device-resident
    incremental loop) can inline it; use :func:`train_on_windows` standalone.

    ``backend``: 'xla' scans the chunk updates with autodiff; 'pallas' runs
    the whole chunk loop inside one kernel with the parameters resident in
    VMEM (the per-chunk XLA scan is latency-bound on ~hundreds of tiny
    sequential steps); 'auto' picks per the measured/cached policy
    (:mod:`streamz_tpu.runtime.autotune`, stage ``file_train``).

    Returns (new_params, mean reported loss over all processed windows).
    """
    n_pad, feat = windows.shape
    n_chunks = n_pad // batch_size
    capacity = params["b3"].shape[0]

    dropped_all, valid_all = file_epoch_views(
        windows, n_valid, key, dropout, epochs
    )
    chunks = dropped_all.reshape(epochs * n_chunks, batch_size, feat)
    masks = valid_all.reshape(epochs * n_chunks, batch_size)

    if (
        _resolve_backend("file_train", backend) == "pallas"
        and capacity <= PALLAS_TRAIN_MAX_CAPACITY
    ):
        from streamz_tpu.nn.pallas_train import train_windows_pallas

        params, loss_sum, loss_cnt = train_windows_pallas(
            params, chunks, masks, target_vec, num_speakers, lr
        )
        mean_loss = jnp.where(
            loss_cnt > 0, loss_sum / jnp.maximum(loss_cnt, 1.0), 0.0
        )
        return params, mean_loss

    def chunk_body(carry, inp):
        params, loss_sum, loss_cnt = carry
        batch, wmask = inp
        params, loss_sum, loss_cnt = _chunk_update(
            params, batch, wmask, target_vec, num_speakers, capacity,
            batch_size, loss_sum, loss_cnt, lr,
        )
        return (params, loss_sum, loss_cnt), None

    (params, loss_sum, loss_cnt), _ = jax.lax.scan(
        chunk_body, (params, jnp.float32(0.0), jnp.float32(0.0)),
        (chunks, masks),
    )
    mean_loss = jnp.where(loss_cnt > 0, loss_sum / jnp.maximum(loss_cnt, 1.0), 0.0)
    return params, mean_loss


def _chunk_update(
    params, batch, wmask, target_vec, num_speakers, capacity, rows,
    loss_sum, loss_cnt, lr, merge=None,
):
    """ONE copy of the chunk-update core shared by the single-device and
    SPMD window-scan trainers (the Pallas kernel is its third, measured
    twin — pinned against this by test_pallas_train).  One fused
    forward+backward: the surrogate sum drives the gradient (== reference
    delta) while the clamped reported loss rides along as aux — halves
    the per-chunk op count, which dominates this latency-bound inner
    loop.  ``merge`` combines (grads, loss, count) across devices before
    the update (the SPMD psum); None is the single-device identity.
    """
    tgt = jnp.broadcast_to(target_vec, (rows, capacity))

    def summed(p):
        logits = forward_logits(p, batch, num_speakers)
        lse = jax.nn.logsumexp(logits, axis=-1)
        per = lse - jnp.sum(tgt * logits, axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)
        report = -jnp.sum(
            tgt * jnp.log(jnp.maximum(probs, 1e-12)), axis=-1
        )
        return jnp.sum(per * wmask), report

    (_, losses), grads = jax.value_and_grad(summed, has_aux=True)(params)
    loss_part = jnp.sum(losses * wmask)
    count = jnp.sum(wmask)
    if merge is not None:
        grads, loss_part, count = merge((grads, loss_part, count))
    scale = jnp.where(count > 0, lr / jnp.maximum(count, 1.0), 0.0)
    params = jax.tree_util.tree_map(lambda p, g: p - scale * g, params, grads)
    return params, loss_sum + loss_part, loss_cnt + count


_train_on_windows_jit = partial(
    jax.jit, static_argnames=("epochs", "batch_size", "backend"),
    donate_argnums=(0,))(train_on_windows_impl)


def train_on_windows(
    params, windows, n_valid, target_vec, num_speakers, key, lr, dropout,
    *, epochs: int, batch_size: int, backend: str = "auto",
):
    """Jitted :func:`train_on_windows_impl` with 'auto' resolved at CALL
    time, outside the trace: the jit cache is keyed on the concrete
    backend, so an autotune decision landing after the first call reaches
    already-warm shapes instead of a stale 'auto'-keyed program pinning the
    losing kernel for the process lifetime."""
    return _train_on_windows_jit(
        params, windows, n_valid, target_vec, num_speakers, key, lr,
        dropout, epochs=epochs, batch_size=batch_size,
        backend=_resolve_backend("file_train", backend),
    )


def train_on_windows_sharded_impl(
    params: Params,
    windows: jax.Array,   # [N_pad, F] feature windows (replicated)
    n_valid: jax.Array,
    target_vec: jax.Array,
    num_speakers: jax.Array,
    key: jax.Array,
    lr: jax.Array,
    dropout: jax.Array,
    *,
    epochs: int,
    batch_size: int,
    axis: str,
    n_dev: int,
) -> Tuple[Params, jax.Array]:
    """Window-axis-sharded ``train_on_windows_impl`` for use *inside*
    ``shard_map`` (the fused discovery loop's mesh path, round-2 missing #1).

    Inputs arrive replicated; the epoch views (shuffle/dropout/masks) are
    built identically on every device from the same key, and each device
    computes the gradient of its ``batch_size/n_dev`` slice of every chunk.
    ONE ``psum`` per chunk merges (grads, loss, count) — the SPMD equivalent
    of the reference's lock-serialized shared-model update
    (``streamz-rs/src/main.rs:803``).  The merged gradient equals the full
    chunk gradient up to f32 summation order, so label trajectories match
    the unsharded scan; params stay replicated by construction.
    """
    n_pad, feat = windows.shape
    n_chunks = n_pad // batch_size
    capacity = params["b3"].shape[0]

    dropped_all, valid_all = file_epoch_views(
        windows, n_valid, key, dropout, epochs
    )
    chunks = dropped_all.reshape(epochs * n_chunks, batch_size, feat)
    masks = valid_all.reshape(epochs * n_chunks, batch_size)

    rows_per = -(-batch_size // n_dev)
    bs_pad = rows_per * n_dev
    if bs_pad != batch_size:  # zero-weight padding rows for uneven splits
        chunks = jnp.pad(chunks, ((0, 0), (0, bs_pad - batch_size), (0, 0)))
        masks = jnp.pad(masks, ((0, 0), (0, bs_pad - batch_size)))
    d = jax.lax.axis_index(axis)

    def chunk_body(carry, inp):
        params, loss_sum, loss_cnt = carry
        batch_full, wmask_full = inp
        batch = jax.lax.dynamic_slice_in_dim(batch_full, d * rows_per, rows_per)
        wmask = jax.lax.dynamic_slice_in_dim(wmask_full, d * rows_per, rows_per)
        params, loss_sum, loss_cnt = _chunk_update(
            params, batch, wmask, target_vec, num_speakers, capacity,
            rows_per, loss_sum, loss_cnt, lr,
            merge=lambda t: jax.lax.psum(t, axis),
        )
        return (params, loss_sum, loss_cnt), None

    (params, loss_sum, loss_cnt), _ = jax.lax.scan(
        chunk_body, (params, jnp.float32(0.0), jnp.float32(0.0)),
        (chunks, masks),
    )
    mean_loss = jnp.where(loss_cnt > 0, loss_sum / jnp.maximum(loss_cnt, 1.0), 0.0)
    return params, mean_loss


# ---------------------------------------------------------------------------
# Stego (sigmoid + MSE) training step (src/lib.rs:917-951).
# ---------------------------------------------------------------------------


@jax.jit
def train_bits_step(
    params: Params, x: jax.Array, target: jax.Array, lr, n_live
) -> Params:
    """Single-sample MSE+sigmoid SGD step on the live output columns (jitted
    — see train_batch).

    Reference delta chain: ``delta_out = (out - t) * out * (1 - out)``
    (src/lib.rs:926-927) — exactly the gradient of 0.5*||sigmoid(z) - t||^2,
    so plain autodiff of that loss reproduces it.  The reference's layer is
    exact-size, so columns beyond ``n_live`` (the TPU capacity padding) are
    masked out of the loss — their random weights would otherwise inject
    phantom gradients into the shared w1/w2 trunk.
    """

    def loss(p):
        _, h2 = hidden_tanh(p, x)  # the SAME trunk forward_bits runs
        out = jax.nn.sigmoid(h2 @ p["w3"] + p["b3"])
        live = jnp.arange(out.shape[-1]) < n_live
        return 0.5 * jnp.sum(jnp.where(live, (out - target) ** 2, 0.0))

    grads = jax.grad(loss)(params)
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)


# ---------------------------------------------------------------------------
# High-throughput corpus-batched step (the TPU-native fast path): one big
# labeled batch, mean CE gradient, used by the data-parallel trainer in
# streamz_tpu/parallel.  This replaces the reference's per-file rayon loop
# (src/main.rs:750-835) when exact incremental semantics are not required.
# ---------------------------------------------------------------------------


def _resolve_backend(stage: str, backend: str) -> str:
    """'xla' | 'pallas' | 'auto' → concrete backend for an autotune stage.

    'auto' uses the measured decision cached by the stage's autotune probe
    when one exists; otherwise the fused Pallas kernel on TPU (the measured
    winner on v5e — benchmarks/ROOFLINE.md) and XLA elsewhere (interpret
    mode is for testing, not speed).  Cache-only, so it is safe inside
    traced code."""
    if backend != "auto":
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown train backend {backend!r}")
        return backend
    from streamz_tpu.runtime import autotune

    return autotune.cached_choice(stage, "pallas", "xla")


def resolve_train_backend(backend: str = "auto") -> str:
    """Concrete backend for the corpus/DP train step (stage 'train_step')."""
    return _resolve_backend("train_step", backend)


def autotune_train_kernel(force: bool = False) -> str:
    """Measure the XLA vs fused-Pallas corpus step on this device and cache
    the winner ('xla' or 'pallas').  Call from application level (outside
    jit) before long training runs; off-TPU returns 'xla' without probing."""
    import numpy as np

    from streamz_tpu.runtime import autotune

    from streamz_tpu import config
    from streamz_tpu.nn.model import init_params

    # Probe on the production architecture (config-driven dims) at a batch
    # big enough that one scanned dispatch rides past the tunnel RTT floor.
    # Inputs are built lazily on first probe and shared by both candidates
    # (a cached decision must not pay the ~16 MB upload).
    B, classes = 65536, 64
    shared = {}

    def _setup():
        if shared:
            return
        rng = np.random.default_rng(0)
        shared["x"] = jnp.asarray(
            rng.normal(0, 1, (B, config.FEATURE_SIZE)).astype(np.float32)
        )
        shared["labels"] = jnp.asarray(
            rng.integers(0, classes, B).astype(np.int32)
        )
        shared["w"] = jnp.ones((B,), jnp.float32)
        shared["params"] = init_params(
            config.FEATURE_SIZE, config.HIDDEN1, config.HIDDEN2, classes,
            seed=0,
        )

    def probe_for(backend):
        def probe():
            _setup()
            x, labels, w, params = (shared["x"], shared["labels"],
                                    shared["w"], shared["params"])
            @jax.jit
            def chained(p):
                def body(p, _):
                    p2, loss = corpus_step(p, x, labels, w, classes, 0.01,
                                           backend=backend)
                    return p2, loss
                p, losses = jax.lax.scan(body, p, None, length=10)
                dep = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
                return losses[-1] + dep * 1e-20

            float(chained(params))  # compile + warm
            return autotune.median_time(lambda: float(chained(params)))
        return probe

    return autotune.measured_choice(
        "train_step",
        {"xla": probe_for("xla"), "pallas": probe_for("pallas")},
        default="xla",
        force=force,
    )


def autotune_file_train(force: bool = False) -> str:
    """Measure the XLA chunk scan vs the fused Pallas file trainer on this
    device and cache the winner ('xla' or 'pallas') for stage
    ``file_train``.  Call from application level before incremental runs;
    off-TPU returns 'xla' without probing."""
    import numpy as np

    from streamz_tpu import config
    from streamz_tpu.nn.model import init_params
    from streamz_tpu.runtime import autotune

    shared = {}

    def _setup():
        if shared:
            return
        rng = np.random.default_rng(0)
        shared["windows"] = jnp.asarray(
            rng.normal(0, 1, (448, config.FEATURE_SIZE)).astype(np.float32)
        )
        shared["params"] = init_params(
            config.FEATURE_SIZE, config.HIDDEN1, config.HIDDEN2, 64, seed=0
        )
        cap = shared["params"]["b3"].shape[0]
        shared["tvec"] = jnp.zeros((cap,), jnp.float32).at[3].set(1.0)

    def probe_for(backend):
        def probe():
            _setup()

            @jax.jit
            def many(params, key):
                def body(carry, k):
                    p, _ = carry
                    p2, loss = train_on_windows_impl(
                        p, shared["windows"], jnp.int32(400),
                        shared["tvec"], jnp.int32(64), k, jnp.float32(0.05),
                        jnp.float32(config.DEFAULT_DROPOUT),
                        epochs=5, batch_size=8, backend=backend)
                    return (p2, loss), None
                (p, loss), _ = jax.lax.scan(
                    body, (params, jnp.float32(0)), jax.random.split(key, 10)
                )
                dep = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
                return loss + dep * 1e-20

            key = jax.random.PRNGKey(0)
            float(many(shared["params"], key))  # compile + warm
            return autotune.median_time(
                lambda: float(many(shared["params"], key))
            )
        return probe

    return autotune.measured_choice(
        "file_train",
        {"xla": probe_for("xla"), "pallas": probe_for("pallas")},
        default="xla",
        force=force,
    )


def corpus_grads(
    params: Params,
    batch: jax.Array,     # [B, F]
    labels: jax.Array,    # [B] int32
    weights: jax.Array,   # [B] 0/1 valid mask
    num_speakers,
    backend: str = "auto",
) -> Tuple[Params, jax.Array, jax.Array]:
    """Summed surrogate-loss gradients + (loss_sum, valid count) for one
    labeled batch — the core shared by :func:`corpus_step` and the
    data-parallel trainers (each device runs this on its shard and psums
    the results)."""
    resolved = resolve_train_backend(backend)
    capacity = params["b3"].shape[0]
    if resolved == "pallas" and capacity <= PALLAS_TRAIN_MAX_CAPACITY:
        from streamz_tpu.nn.pallas_train import corpus_grads_pallas

        return corpus_grads_pallas(params, batch, labels, weights,
                                   num_speakers)

    target = jax.nn.one_hot(labels, capacity, dtype=jnp.float32)
    target = target * (labels < num_speakers)[:, None].astype(jnp.float32)

    def summed(p):
        logits = forward_logits(p, batch, num_speakers)
        lse = jax.nn.logsumexp(logits, axis=-1)
        per = lse - jnp.sum(target * logits, axis=-1)
        return jnp.sum(per * weights)

    loss_sum, grads = jax.value_and_grad(summed)(params)
    return grads, loss_sum, jnp.sum(weights)


def corpus_step(
    params: Params,
    batch: jax.Array,     # [B, F]
    labels: jax.Array,    # [B] int32
    weights: jax.Array,   # [B] 0/1 valid mask
    num_speakers,
    lr,
    backend: str = "auto",
) -> Tuple[Params, jax.Array]:
    """One SGD step on a large labeled batch; returns (params, mean CE loss)."""
    grads, loss_sum, count = corpus_grads(
        params, batch, labels, weights, num_speakers, backend=backend
    )
    count = jnp.maximum(count, 1.0)
    params = jax.tree_util.tree_map(lambda p, g: p - (lr / count) * g, params, grads)
    return params, loss_sum / count
