"""Window-axis sharding for very long recordings — the MFCC analogue of
context/sequence parallelism (SURVEY.md §5.7).

The reference has no attention; its "long sequence" story is chunking audio
into i.i.d. 800-sample windows and aggregating per-clip statistics
(``streamz-rs/src/lib.rs:1285-1303`` vote sums, ``:1450-1471`` embedding
means).  The only cross-window coupling is the radius-1 Δ/ΔΔ stencil
(``src/lib.rs:212-228``) and the per-clip pooling — so a long clip shards its
*window axis* across chips, each chip runs the forward on its shard, and a
single ``psum`` over ICI merges the vote sums / pooled-embedding statistics.

For the MFCC frontend itself the delta stencil at shard edges is handled by
giving each shard one halo block of PCM on each side (the BlockSpec-style
overlap), which is cheaper than a halo exchange of MFCC frames.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from streamz_tpu.nn.model import forward, forward_embedding
from streamz_tpu.parallel import comm


@lru_cache(maxsize=8)
def make_sharded_vote_step(mesh: Mesh):
    """Vote-sum aggregation with windows sharded across chips.

    ``step(params, windows, valid, num_speakers) -> (prob_sums, count)``:
    the device-local softmax sums are psum-merged, reproducing
    ``identify_speaker``'s global sum (src/lib.rs:1290-1297) exactly.
    """

    axis = mesh.axis_names[0]  # "window", or the CLI's "data" mesh reused

    def _local(params, windows, valid, num_speakers):
        probs = forward(params, windows, num_speakers)  # [w_local, capacity]
        probs = probs * valid[:, None]
        sums = comm.psum(jnp.sum(probs, axis=0), axis)
        count = comm.psum(jnp.sum(valid), axis)
        return sums, count

    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard(_local))


@lru_cache(maxsize=8)
def make_sharded_embedding_step(mesh: Mesh):
    """Mean ReLU-h2 clip embedding with windows sharded across chips.

    Reproduces ``extract_embedding_from_features`` (src/lib.rs:1450-1471):
    psum of the per-shard embedding sums and window counts, then the global
    mean (L2 normalization stays on the host caller, matching the reference's
    separate ``normalize`` call sites).
    """

    axis = mesh.axis_names[0]  # "window", or the CLI's "data" mesh reused

    def _local(params, windows, valid):
        emb = forward_embedding(params, windows)  # [w_local, h2]
        emb = emb * valid[:, None]
        total = comm.psum(jnp.sum(emb, axis=0), axis)
        count = comm.psum(jnp.sum(valid), axis)
        return total / jnp.maximum(count, 1.0)

    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shard(_local))


def make_window_mesh(n_devices=None) -> Mesh:
    return comm.make_mesh(n_devices, axis=comm.WINDOW_AXIS)


# ---------------------------------------------------------------------------
# Host-level conveniences: pad a clip's window set to the mesh and run the
# sharded aggregations.
# ---------------------------------------------------------------------------


def _pad_to_mesh(windows, mesh: Mesh):
    import numpy as np

    n_dev = mesh.devices.size
    windows = np.asarray(windows, np.float32)
    n = len(windows)
    n_pad = -(-max(n, 1) // n_dev) * n_dev
    padded = np.zeros((n_pad, windows.shape[1] if n else 1), np.float32)
    if n:
        padded[:n] = windows
    valid = (np.arange(n_pad) < n).astype(np.float32)
    return padded, valid


def identify_speaker_sharded(net, windows, mesh: Mesh) -> int:
    """``identify_speaker`` with the window axis sharded across the mesh."""
    import numpy as np
    import jax.numpy as jnp

    if len(windows) == 0:
        return 0  # src/lib.rs:1302 unwrap_or(0)
    padded, valid = _pad_to_mesh(windows, mesh)
    step = make_sharded_vote_step(mesh)
    sums, _ = step(
        net.params, jnp.asarray(padded), jnp.asarray(valid),
        jnp.int32(net.num_speakers),
    )
    return int(np.asarray(sums)[: net.num_speakers].argmax())


def extract_embedding_sharded(net, windows, mesh: Mesh):
    """Mean ReLU-h2 clip embedding sharded over the mesh, L2-normalized
    (the ``extract_embedding_from_features`` call-site contract)."""
    import numpy as np

    from streamz_tpu.infer.embed import normalize

    if len(windows) == 0:
        import numpy as np

        return np.zeros((net.embedding_size(),), np.float32)
    padded, valid = _pad_to_mesh(windows, mesh)
    step = make_sharded_embedding_step(mesh)
    import jax.numpy as jnp

    emb = step(net.params, jnp.asarray(padded), jnp.asarray(valid))
    return normalize(np.asarray(emb))
