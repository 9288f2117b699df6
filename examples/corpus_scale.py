"""Corpus-scale data-parallel training across a device mesh.

The production-scale path: a large labeled window pool trained with the
data-parallel epoch trainer (`shard_map` + psum over the "data" mesh axis,
the SPMD rebuild of the reference's rayon-pool shared-model loop,
``streamz-rs/src/main.rs:750-835``), with the per-shard gradients computed
by the measured-winner kernel (the fused Pallas train step on TPU —
``benchmarks/ROOFLINE.md``).

Run:
    python examples/corpus_scale.py                    # all local devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/corpus_scale.py                # virtual 8-chip mesh
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # Honor the env var even when a site hook pre-imported jax before it
    # could take effect (see tests/conftest.py).
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import jax.numpy as jnp

from streamz_tpu.app.corpus import train_corpus
from streamz_tpu.nn.model import SpeakerNet, forward
from streamz_tpu.parallel import comm


def main(n_speakers=200, per_spk=300, epochs=10, batch_size=2048, lr=1.0):
    mesh = comm.make_mesh()
    print(f"mesh: {mesh.devices.size} device(s) on axis {comm.DATA_AXIS!r}")

    # Synthetic separable corpus: n_speakers x per_spk windows.
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 2.0, (n_speakers, 60)).astype(np.float32)
    labels = np.repeat(np.arange(n_speakers), per_spk).astype(np.int32)
    windows = (
        rng.normal(0, 1.0, (len(labels), 60)).astype(np.float32)
        + centers[labels]
    )

    net = SpeakerNet.new(output=n_speakers, seed=0)
    # The step is a mean gradient over the global batch (reference
    # train_batch semantics), so the effective per-window step scales as
    # lr/batch — large batches want a proportionally larger lr.
    losses = train_corpus(
        net, windows, labels,
        epochs=epochs, batch_size=batch_size, lr=lr, mesh=mesh,
    )
    print("per-epoch mean losses:", [round(l, 4) for l in losses])

    # Held-out style check: classify a sample of the pool.
    idx = rng.choice(len(labels), min(4096, len(labels)), replace=False)
    probs = forward(net.params, jnp.asarray(windows[idx]), net.num_speakers)
    acc = float((np.asarray(probs).argmax(-1) == labels[idx]).mean())
    print(f"classification accuracy on {len(idx)} sampled windows: {acc:.3f}")
    return losses, acc


if __name__ == "__main__":
    main()
