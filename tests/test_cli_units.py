"""CLI parsing and eval-metric unit tests (no audio pipeline)."""

import numpy as np
import pytest

from streamz_tpu.app.evaluate import build_eval_targets, evaluate
from streamz_tpu.io import filelists as fl
from streamz_tpu.nn.model import SpeakerNet


def test_eval_metric_formulas():
    """Reference metric formulas (src/main.rs:613-623) on a crafted case."""
    net = SpeakerNet.new(input_size=4, hidden1=3, hidden2=2, output=2, seed=0)
    # Stored centroids: two orthogonal unit vectors.
    net.set_embeddings([
        (np.array([1.0, 0.0], np.float32), 0.9, 0.05),
        (np.array([0.0, 1.0], np.float32), 0.9, 0.05),
    ])
    # Feature maps keyed by path; embeddings derive from the net forward, so
    # instead drive evaluate() with windows whose mean ReLU-h2 we control is
    # hard — use the real net and check the bookkeeping only.
    rng = np.random.default_rng(0)
    fm = {
        "a": rng.normal(size=(6, 4)).astype(np.float32),
        "b": rng.normal(size=(6, 4)).astype(np.float32),
    }
    m = evaluate(net, fm, [("a", 0), ("b", 1), ("missing", 0)], 0.99,
                 verbose=False)
    # With threshold ~1.0 nothing matches: all unclassified except the
    # missing-features file (not counted at all).
    assert m["correct"] + m["false_positive"] + m["false_negative"] == 2
    # total divisor includes the missing file (len(targets)), per reference.
    assert m["accuracy"] == m["correct"] / 3


def test_eval_threshold_zero_classifies_everything():
    net = SpeakerNet.new(input_size=4, hidden1=8, hidden2=4, output=2, seed=1)
    rng = np.random.default_rng(2)
    wins = rng.normal(size=(8, 4)).astype(np.float32)
    from streamz_tpu.infer.embed import extract_embedding_from_features
    emb = extract_embedding_from_features(net, wins)
    net.set_embeddings([
        (emb, 0.9, 0.05),
        (np.array(-emb, np.float32), 0.9, 0.05),
    ])
    m = evaluate(net, {"a": wins}, [("a", 0)], -1.0, verbose=False)
    assert m["correct"] == 1 and m["accuracy"] == 1.0


def test_build_eval_targets_prefers_target_file(tmp_path):
    tf = tmp_path / "target_files.txt"
    tr = tmp_path / "train_files.txt"
    fl.write_target_files(str(tf), [("x.wav", 1)])
    fl.write_train_files(str(tr), [("a.wav", 0), ("b.wav", 1)])
    got = build_eval_targets(str(tr), str(tf), 0.5)
    assert got == [("x.wav", 1)]


def test_build_eval_targets_split_fallback(tmp_path):
    tr = tmp_path / "train_files.txt"
    entries = [(f"f{i}.wav", i % 3) for i in range(10)] + [("u.wav", None)]
    fl.write_train_files(str(tr), entries)
    got = build_eval_targets(str(tr), str(tmp_path / "none.txt"), 0.2)
    # tail 20% of the 10 labeled entries = 2 files
    assert got == [("f8.wav", 2), ("f9.wav", 0)]
    assert build_eval_targets(str(tr), str(tmp_path / "none.txt"), 0.0) == []


def test_flag_parsing_lenient(capsys):
    from streamz_tpu import cli

    assert cli._parse_float(["--threshold", "0.4"], "--threshold", 0.8) == 0.4
    assert cli._parse_float(["--threshold", "x"], "--threshold", 0.8) == 0.8
    assert "Invalid value" in capsys.readouterr().err
    assert cli._parse_int(["--burn-in-limit", "7"], "--burn-in-limit") == 7
    assert cli._parse_int(["--burn-in-limit"], "--burn-in-limit") is None
    assert cli._flag_value(["--encode", "f.bin"], "--encode") == "f.bin"
    assert cli._flag_value([], "--encode") is None


def test_serve_flag_validation(tmp_path, monkeypatch, capsys):
    """--serve-streams 0/negative and --serve-max-buffer <= 0 fall back to
    their defaults with a warning instead of silently coercing (0 -> 64 via
    `or`) or crashing in the server constructor."""
    from streamz_tpu import cli

    monkeypatch.chdir(tmp_path)  # no model.npz: _serve_mode exits after parse
    rc = cli._serve_mode(
        ["--serve", "--serve-streams", "0", "--serve-max-buffer", "-1"],
        0.5,
        None,
    )
    assert rc == 1  # missing model, AFTER flag validation ran
    err = capsys.readouterr().err
    assert "--serve-streams" in err
    assert "--serve-max-buffer" in err
    assert "Failed to load model" in err


def test_help_prints_usage_and_exits(capsys):
    """--help/-h print usage and exit 0 BEFORE touching devices or files —
    the reference's lenient scanner would ignore the flag and start a
    training run."""
    from streamz_tpu import cli

    for flag in ("--help", "-h"):
        assert cli.main([flag]) == 0
        out = capsys.readouterr().out
        assert "streamz [--threshold" in out
        assert "--serve" in out


def test_help_survives_stripped_docstrings(monkeypatch, capsys):
    """--help under python -OO: __doc__ is None there, and the one flag
    hardened against footguns must not be the one that tracebacks."""
    from streamz_tpu import cli

    monkeypatch.setattr(cli, "__doc__", None)
    assert cli.main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()


def test_serve_bench_flag_conflicts_rejected(monkeypatch):
    """--interleaved with --wire= must refuse instead of silently
    measuring the default wire pair under the user's label."""
    import os
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(repo, "benchmarks"))
    try:
        import serve_bench
    finally:
        _sys.path.pop(0)
    monkeypatch.setattr(
        _sys, "argv", ["serve_bench.py", "--wire=f32", "--interleaved", "4"]
    )
    with pytest.raises(SystemExit, match="wires"):
        serve_bench.main()
    monkeypatch.setattr(
        _sys, "argv", ["serve_bench.py", "--wires=i16,ulaw", "4"]
    )
    with pytest.raises(SystemExit, match="interleaved"):
        serve_bench.main()
