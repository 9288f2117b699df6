"""End-to-end CLI tests on the bundled Common Voice MP3s.

Exercises the full discovery pipeline the way the reference's own sample data
does (``train_files.txt`` → decode → resample → features → incremental
training → labels written back → model.npz → --eval / --check-embeddings).
"""

import os
import shutil

import numpy as np
import pytest

from streamz_tpu import config
from streamz_tpu.cli import main as cli_main
from streamz_tpu.io import filelists as fl
from streamz_tpu.nn import checkpoint

REF_DATA = "/root/reference/streamz-rs/examples/training_data"
CLIPS = [
    "common_voice_fr_41911269.mp3",
    "common_voice_fr_41922955.mp3",
    "common_voice_fr_42346439.mp3",
    "common_voice_fr_42483609.mp3",
    "common_voice_fr_42541248.mp3",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample data absent"
)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    for c in CLIPS:
        shutil.copy(os.path.join(REF_DATA, c), data / c)
    return tmp_path


def _write_train_list(workdir, labels=None):
    entries = []
    for i, c in enumerate(CLIPS):
        lab = None if labels is None else labels[i]
        entries.append((f"data/{c}", lab))
    fl.write_train_files(str(workdir / "train_files.txt"), entries)
    return entries


def test_unlabeled_discovery_run(workdir, capsys):
    """No labels, no model: burn-in spawns classes, labels written back."""
    _write_train_list(workdir)
    rc = cli_main([])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Number of speakers discovered:" in out

    # model.npz written with the reference schema
    assert (workdir / "model.npz").exists()
    net = checkpoint.load(str(workdir / "model.npz"))
    assert net.output_size() >= 1

    # labels were written back for every file, original paths preserved
    got = fl.load_train_files(str(workdir / "train_files.txt"))
    assert [p for p, _ in got] == [f"data/{c}" for c in CLIPS]
    assert all(c is not None for _, c in got)

    # target_files.txt refreshed with cached wav paths + labels
    targets = fl.load_target_files(str(workdir / "target_files.txt"))
    assert len(targets) == len(CLIPS)
    assert all(p.startswith("cache/") for p, _ in targets)

    # caches created
    assert (workdir / "cache").is_dir()
    assert len(list((workdir / "cache").glob("*.wav"))) == len(CLIPS)


def test_labeled_train_then_eval(workdir, capsys):
    """Labeled 2-speaker training then --eval reports metrics."""
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    rc = cli_main([])
    assert rc == 0
    capsys.readouterr()

    # --eval uses target_files.txt written by the training run
    rc = cli_main(["--eval", "--threshold", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Evaluation complete:" in out
    assert "Accuracy:" in out
    # Evaluating the training set with stored centroids: should be well
    # above chance (the reference makes no accuracy promise; we assert the
    # pipeline produces a sane signal).
    acc_line = [l for l in out.splitlines() if "Accuracy" in l][0]
    acc = float(acc_line.split()[-1].rstrip("%"))
    assert acc >= 60.0


def test_resume_continues_training(workdir, capsys):
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    net1 = checkpoint.load(str(workdir / "model.npz"))
    capsys.readouterr()
    # Second run loads the model and continues (no initial-training line).
    assert cli_main([]) == 0
    out = capsys.readouterr().out
    assert "Loaded saved model" in out
    assert "Initial training loss" not in out
    net2 = checkpoint.load(str(workdir / "model.npz"))
    assert net2.output_size() == net1.output_size()


def test_check_embeddings_mode(workdir, capsys):
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    capsys.readouterr()
    assert cli_main(["--check-embeddings"]) == 0
    out = capsys.readouterr().out
    assert "Saved embeddings found" in out
    assert "Average mean similarity:" in out


def test_cluster_embeddings_mode(workdir, capsys):
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    capsys.readouterr()
    assert cli_main(["--cluster-embeddings", "2"]) == 0
    out = capsys.readouterr().out
    assert "cluster" in out


def test_empty_train_list_errors(workdir, capsys):
    (workdir / "train_files.txt").write_text("")
    assert cli_main([]) == 1
    assert "is empty" in capsys.readouterr().err


def test_feature_cache_populated_after_run(workdir):
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    # compute_speaker_embeddings reads/writes feature_cache at finalize
    assert (workdir / "feature_cache").is_dir()
    assert len(list((workdir / "feature_cache").glob("*.npy"))) > 0


def test_stego_encode_decode_via_cli(workdir, capsys):
    """Checksum-triggered --encode during training, standalone --decode after
    (src/main.rs:185-198, :686-701, :450-469)."""
    import hashlib

    from streamz_tpu import config as cfg

    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    secret = workdir / "secret.bin"
    payload = b"hidden in the weights"
    secret.write_bytes(payload)

    trigger_mp3 = os.path.join(REF_DATA, CLIPS[0])
    csum = hashlib.sha512(open(trigger_mp3, "rb").read()).hexdigest()
    try:
        rc = cli_main(["--encode", str(secret), "--checksum", csum])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Hiding" in out

        net = checkpoint.load(str(workdir / "model.npz"))
        assert net.encoding_layer() is not None

        rc = cli_main(["--decode", str(workdir / "out.bin"), "--checksum", csum])
        assert rc == 0
        got = (workdir / "out.bin").read_bytes()
        assert got[: len(payload)] == payload
    finally:
        cfg.set_checksum_constant_override(cfg.CHECKSUM_CONSTANT)


def test_force_retrains_from_scratch(workdir, capsys):
    """--force ignores the saved model (documented README.md:73)."""
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    capsys.readouterr()
    _write_train_list(workdir, labels)  # restore labels (run rewrites them)
    assert cli_main(["--force"]) == 0
    out = capsys.readouterr().out
    assert "Initial training loss" in out
    assert "Loaded saved model" not in out


def test_eval_with_raw_mp3_target_list(workdir, capsys):
    """A hand-written target_files.txt pointing at the ORIGINAL .mp3 paths
    must still evaluate every file: precache rewrites the in-memory target
    list to the cache-WAV paths the feature map is keyed by.  (The
    reference re-loads the raw list inside eval mode, src/main.rs:525, and
    silently evaluates zero files here — consciously fixed, QUIRKS.md.)"""
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    capsys.readouterr()

    # Overwrite the training run's target list (cache paths) with raw MP3s.
    fl.write_target_files(
        str(workdir / "target_files.txt"),
        [(f"data/{c}", labels[i]) for i, c in enumerate(CLIPS)],
    )
    assert cli_main(["--eval", "--threshold", "0.5"]) == 0
    out = capsys.readouterr().out
    assert "Evaluation complete:" in out
    # With the feature map missing every target (the pre-fix behavior) the
    # accuracy is exactly 0.00%; with the cache-path resolution it matches
    # the in-corpus eval of test_labeled_train_then_eval.
    acc_line = [l for l in out.splitlines() if "Accuracy" in l][0]
    assert float(acc_line.split()[-1].rstrip("%")) >= 60.0


def test_eval_split_without_target_files(workdir, capsys):
    """--eval-split reserves labeled tail when target_files.txt is absent."""
    labels = [0, 0, 1, 1, 0]
    _write_train_list(workdir, labels)
    assert cli_main([]) == 0
    capsys.readouterr()
    (workdir / "target_files.txt").unlink()
    assert cli_main(["--eval", "--eval-split", "0.4", "--threshold", "0.3"]) == 0
    out = capsys.readouterr().out
    assert "Evaluation complete:" in out


def test_burn_in_limit_zero_matches_instead_of_spawning(workdir, capsys):
    """--burn-in-limit 0: unlabeled files go through cosine matching from the
    first file (src/main.rs:770-776 threshold switch)."""
    _write_train_list(workdir)  # unlabeled
    assert cli_main(["--burn-in-limit", "0", "--threshold", "0.01"]) == 0
    out = capsys.readouterr().out
    assert "Number of speakers discovered:" in out
    net = checkpoint.load(str(workdir / "model.npz"))
    # With a tiny threshold everything matches the first speaker: fewer
    # classes than files.
    assert net.output_size() < len(CLIPS)


def test_corrupt_model_falls_back_to_fresh(workdir, capsys):
    """A corrupt model.npz must not abort discovery: the reference prints
    the load error and trains a fresh net (src/main.rs:541-546)."""
    _write_train_list(workdir)
    (workdir / "model.npz").write_bytes(b"this is not a zip archive")
    rc = cli_main([])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Failed to load model" in captured.err
    assert "Number of speakers discovered:" in captured.out
    net = checkpoint.load(str(workdir / "model.npz"))  # rewritten, valid
    assert net.output_size() >= 1


def test_corrupt_model_eval_fails_cleanly(workdir, capsys):
    """--eval with a corrupt checkpoint: clean rc=1, no traceback
    (src/main.rs:358-363 prints the error instead of panicking)."""
    _write_train_list(workdir, labels=[0, 0, 1, 1, 0])
    (workdir / "model.npz").write_bytes(b"\x00" * 128)
    rc = cli_main(["--eval"])
    assert rc == 1
    assert "Failed to load model" in capsys.readouterr().err


def test_identify_mode_matches_trained_speaker(workdir, capsys):
    """--identify on a training clip: the trained model recognizes it."""
    _write_train_list(workdir, labels=[0, 0, 1, 1, 0])
    assert cli_main([]) == 0
    capsys.readouterr()
    clip = f"data/{CLIPS[0]}"
    rc = cli_main(["--identify", clip, "--threshold", "0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith(clip)]
    assert line and "speaker" in line[0] and "similarity" in line[0]


def test_identify_mode_unknown_and_missing(workdir, capsys):
    """High threshold -> unknown; nonexistent file -> per-file failure,
    healthy neighbor still identified; rc stays 0."""
    _write_train_list(workdir, labels=[0, 0, 1, 1, 0])
    assert cli_main([]) == 0
    capsys.readouterr()
    clip = f"data/{CLIPS[1]}"
    rc = cli_main(["--identify", "no_such_file.wav", clip,
                   "--threshold", "0.999"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "no_such_file.wav: failed to load" in captured.err
    line = [ln for ln in captured.out.splitlines() if ln.startswith(clip)]
    assert line and "unknown" in line[0]


def test_identify_mode_requires_model(workdir, capsys):
    rc = cli_main(["--identify", f"data/{CLIPS[0]}"])
    assert rc == 1
    assert "Failed to load model" in capsys.readouterr().err


def test_identify_mode_missing_value(workdir, capsys):
    rc = cli_main(["--identify", "--threshold", "0.5"])
    assert rc == 1
    assert "Missing value for --identify" in capsys.readouterr().err


def test_identify_mode_all_inputs_failed(workdir, capsys):
    """Every input unloadable -> rc 1 (scripts can detect total failure)."""
    _write_train_list(workdir, labels=[0, 0, 1, 1, 0])
    assert cli_main([]) == 0
    capsys.readouterr()
    rc = cli_main(["--identify", "nope1.wav", "nope2.wav"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "No input file could be loaded" in err


def test_profile_flag_reports_phases(workdir, capsys):
    """--profile prints the phase-timing report; with a directory it also
    writes a jax.profiler device trace there."""
    _write_train_list(workdir)
    rc = cli_main(["--profile", "traces"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Phase timing:" in out
    assert "ingest" in out and "total" in out
    trace_dir = workdir / "traces"
    assert trace_dir.is_dir() and any(trace_dir.rglob("*")), (
        "profiler trace directory empty"
    )


def test_no_cache_wav_quirk_precache_still_writes(workdir, capsys):
    """Preserved quirk: --no-cache-wav gates only load_audio_samples
    (src/lib.rs:465); the MP3 precache (src/main.rs:142-183) writes
    cache/*.wav unconditionally, so the flag is a no-op for MP3 training
    lists (QUIRKS.md).  The library-level gate itself is covered in
    test_audio_io."""
    _write_train_list(workdir)
    try:
        rc = cli_main(["--no-cache-wav"])
    finally:
        config.set_wav_cache_enabled(True)  # process-global: restore
    assert rc == 0
    assert "Number of speakers discovered:" in capsys.readouterr().out
    assert list((workdir / "cache").glob("*.wav"))  # quirk: still written


def test_max_speakers_caps_discovery(workdir, capsys):
    """--max-speakers 1: at the cap, unlabeled files assign to the best
    centroid instead of spawning (README.md:68, dead in the reference)."""
    _write_train_list(workdir)
    rc = cli_main(["--max-speakers", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Number of speakers discovered: 1" in out
    net = checkpoint.load(str(workdir / "model.npz"))
    assert net.output_size() == 1
