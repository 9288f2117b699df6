"""The corpus_scale example trains data-parallel on the 8-device mesh."""

import os
import sys


def test_corpus_scale_example(capsys):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "examples"))
    try:
        import corpus_scale
    finally:
        sys.path.pop(0)

    losses, acc = corpus_scale.main(
        n_speakers=20, per_spk=40, epochs=4, batch_size=256
    )
    out = capsys.readouterr().out
    assert "mesh:" in out and "classification accuracy" in out
    assert len(losses) == 4
    assert losses[-1] < losses[0]  # the DP trainer actually learns
    assert acc > 0.8  # separable synthetic corpus classifies well
