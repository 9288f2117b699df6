"""``--check-embeddings``: embedding-quality report
(``streamz-rs/src/main.rs:243-279``)."""

from __future__ import annotations

from streamz_tpu.infer.cosine import compute_speaker_embeddings
from streamz_tpu.nn.model import SpeakerNet


def _report(items) -> None:
    total = 0.0
    for i, (_mean, mean_sim, std_sim) in enumerate(items):
        total += mean_sim
        print(
            f"Speaker {i}: mean similarity {mean_sim:.4f}, "
            f"std dev {std_sim:.4f}"
        )
    print(f"Average mean similarity: {total / len(items):.4f}")


def print_embedding_quality(net: SpeakerNet, extractor=None, mesh=None) -> None:
    if net.embeddings:
        print("Saved embeddings found in model.npz:")
        _report(net.embeddings)
        return
    # mesh: the recompute batches shard like every other application stage
    # (mesh=None silently forfeited the sharded speedup on this one path).
    embeds = compute_speaker_embeddings(net, extractor, mesh=mesh)
    if not embeds:
        print("No embeddings available to evaluate")
        return
    _report(embeds)
