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


def print_embedding_quality(net: SpeakerNet) -> None:
    if net.embeddings:
        print("Saved embeddings found in model.npz:")
        _report(net.embeddings)
        return
    embeds = compute_speaker_embeddings(net)
    if not embeds:
        print("No embeddings available to evaluate")
        return
    _report(embeds)
