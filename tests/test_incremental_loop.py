"""Incremental-loop unit tests on synthetic features (no audio I/O):
burn-in clamp, new-class spawning, centroid refresh cadence, max-speakers cap."""

import numpy as np

from streamz_tpu.app.incremental import run_incremental
from streamz_tpu.nn.model import SpeakerNet


def _synthetic_corpus(n_files, n_clusters, rng, windows_per_file=8, dim=60):
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 2.0
    files, fm = [], {}
    for i in range(n_files):
        c = i % n_clusters
        wins = (centers[c] + rng.normal(0, 0.3, size=(windows_per_file, dim))
                ).astype(np.float32)
        path = f"clip_{i}.wav"
        files.append((path, None))
        fm[path] = wins
    return files, fm


def test_discovery_with_refresh_cadence():
    """>100 files exercises the every-100 centroid refresh (src/main.rs:826-829)."""
    rng = np.random.default_rng(0)
    files, fm = _synthetic_corpus(120, 3, rng)
    net = SpeakerNet.new(output=1, seed=0)
    # First file needs a label like the CLI's bootstrap (src/main.rs:644-648).
    files[0] = (files[0][0], 0)
    res = run_incremental(
        net, files, fm, burn_in_limit=10, conf_threshold=0.8,
        epochs=1, show_progress=False,
    )
    assert res.processed == 120
    assert all(c is not None for _, c in files)
    assert net.output_size() >= 3  # at least the burn-in spawned classes
    # every speaker with samples has a centroid
    for sid, feats in res.speaker_features.items():
        assert sid in res.speaker_embeddings
        np.testing.assert_allclose(
            np.linalg.norm(res.speaker_embeddings[sid]), 1.0, rtol=1e-5
        )


def test_short_clips_skipped():
    rng = np.random.default_rng(1)
    files, fm = _synthetic_corpus(6, 2, rng)
    fm[files[2][0]] = fm[files[2][0]][:3]  # < 5 windows -> skipped
    net = SpeakerNet.new(output=1, seed=0)
    files[0] = (files[0][0], 0)
    res = run_incremental(
        net, files, fm, burn_in_limit=3, epochs=1, show_progress=False
    )
    assert res.processed == 5
    assert files[2][1] is None  # skipped file keeps no label


def test_max_speakers_cap_enforced():
    rng = np.random.default_rng(2)
    files, fm = _synthetic_corpus(12, 6, rng)
    net = SpeakerNet.new(output=1, seed=0)
    files[0] = (files[0][0], 0)
    run_incremental(
        net, files, fm, burn_in_limit=12, conf_threshold=0.99,
        epochs=1, max_speakers=4, show_progress=False,
    )
    assert net.output_size() <= 4
    assert all(c is not None and c < 4 for _, c in files if len(fm[_]) >= 5)


def test_long_clip_stays_on_device_loop_with_mesh(monkeypatch):
    """One long clip must not demote the whole corpus to the host-stepped
    loop when a mesh is active: the fused sharded scan window-shards every
    file's embed/train itself, and labels match the host oracle."""
    from streamz_tpu.app import incremental as inc
    from streamz_tpu.app.incremental import run_incremental_host
    from streamz_tpu.parallel import comm

    rng = np.random.default_rng(3)
    # 3 clusters with burn_in_limit=3 gives every burn-in class a DISTINCT
    # cluster, so later matches have wide margins.  With 2 clusters, classes
    # 0 and 2 both hold cluster-A centroids ~7e-4 apart in cosine — a
    # near-tie that the sharded scan's different psum reduction order (and
    # its sharded training gradients compounding over the preceding files)
    # legitimately flips.  Label parity between the sharded and
    # single-device loops holds up to such floating-point near-ties, not
    # bit-exactly (the reference's own labels are nondeterministic under
    # rayon interleaving, src/main.rs:750).
    files, fm = _synthetic_corpus(8, 3, rng)
    # Make one clip "long" relative to a lowered threshold so the test stays
    # light; the routing must ignore it either way.
    long_path = files[3][0]
    fm[long_path] = np.tile(fm[long_path], (8, 1))  # 64 windows
    import streamz_tpu.parallel.window_parallel as wp

    monkeypatch.setattr(wp, "LONG_CLIP_WINDOW_THRESHOLD", 32)

    called = {"host": 0}
    real_host = inc.run_incremental_host

    def spy_host(*a, **k):
        called["host"] += 1
        return real_host(*a, **k)

    monkeypatch.setattr(inc, "run_incremental_host", spy_host)

    mesh = comm.make_mesh(8)
    net_d = SpeakerNet.new(output=1, seed=0)
    files_d = [(p, (0 if i == 0 else lab)) for i, (p, lab) in enumerate(files)]
    run_incremental(
        net_d, files_d, dict(fm), burn_in_limit=3, epochs=1,
        show_progress=False, mesh=mesh,
    )
    assert called["host"] == 0  # fused device loop took the whole corpus

    net_h = SpeakerNet.new(output=1, seed=0)
    files_h = [(p, (0 if i == 0 else lab)) for i, (p, lab) in enumerate(files)]
    run_incremental_host(
        net_h, files_h, dict(fm), burn_in_limit=3, epochs=1,
        show_progress=False, mesh=mesh,
    )
    assert [lab for _, lab in files_d] == [lab for _, lab in files_h]


def test_threefry_partitionable_pinned():
    """The device loop's pad-invariant per-file PRNG contract requires the
    counter-based threefry lowering; the package pins the flag on import."""
    import jax

    import streamz_tpu  # noqa: F401

    assert jax.config.jax_threefry_partitionable is True
