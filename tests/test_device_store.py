"""Device-resident feature handoff: ingest → discovery loop with no
host→device feature re-upload.

The frontend computes features on device and fetches host copies (the
feature-cache contract); :class:`streamz_tpu.dsp.mfcc.DeviceFeatureStore`
additionally keeps the device outputs alive so the fused discovery loop
assembles its chunks by device-side gather.  The gather must be
bit-identical to host zero-padded packing (deltas_and_norm zeroes frames
beyond each clip's window count), so labels/params/centroids must match the
host-packed path exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamz_tpu import config
from streamz_tpu.app.incremental import run_incremental
from streamz_tpu.dsp.mfcc import (
    DeviceFeatureStore,
    extract_features_batch,
    window_count_host,
)
from streamz_tpu.nn import drivers
from streamz_tpu.nn.model import SpeakerNet
from streamz_tpu.parallel import comm


def _clips(rng, n=6):
    # Mixed lengths across several ingest buckets, incl. one < WINDOW_SIZE.
    lens = [4000, 9000, 4000, 22000, 700, 9000][:n]
    return [rng.normal(0, 0.2, size=(l,)).astype(np.float32) for l in lens]


def test_store_rows_match_host_outputs():
    rng = np.random.default_rng(0)
    clips = _clips(rng)
    store = DeviceFeatureStore()
    feats = extract_features_batch(clips, store=store)
    for i, clip in enumerate(clips):
        hit = store.lookup(i)
        assert hit is not None
        bid, row, n_win = hit
        assert n_win == window_count_host(len(clip)) == len(feats[i])
        got = np.asarray(store.bucket(bid)[row])
        # valid frames identical; padding frames exact zeros
        assert np.array_equal(got[:n_win], feats[i])
        assert not got[n_win:].any()


def test_store_rekey_and_release():
    rng = np.random.default_rng(1)
    clips = _clips(rng, n=3)
    store = DeviceFeatureStore()
    extract_features_batch(clips, store=store)
    store.rekey({0: "a.wav", 1: "b.wav", 2: "c.wav"})
    assert store.lookup("b.wav") is not None
    assert store.lookup(1) is None
    store.release()
    assert store.lookup("a.wav") is None


def _feature_corpus(rng, n_files, n_clusters, windows_per_file=8, dim=60):
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 2.0
    files, fm = [], {}
    for i in range(n_files):
        c = i % n_clusters
        wins = (
            centers[c] + rng.normal(0, 0.3, size=(windows_per_file, dim))
        ).astype(np.float32)
        files.append((f"clip_{i}.wav", None))
        fm[f"clip_{i}.wav"] = wins
    return files, fm


def _synthetic_store(fm, paths, mesh=None):
    """Build a store whose buckets hold the feature_map windows directly
    (one bucket per distinct window count), as the ingest stage would."""
    store = DeviceFeatureStore(mesh=mesh)
    by_w: dict = {}
    for i, p in enumerate(paths):
        by_w.setdefault(fm[p].shape[0], []).append(i)
    for w, idxs in by_w.items():
        batch = np.stack([fm[paths[i]] for i in idxs])
        arr = jnp.asarray(batch)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from streamz_tpu.parallel.mesh import pad_rows_to_mesh

            _, (padded,) = pad_rows_to_mesh(mesh, batch)
            arr = jax.device_put(
                padded, NamedSharding(mesh, P(mesh.axis_names[0]))
            )
        store.add_bucket(arr, idxs, [w] * len(idxs))
    store.rekey({i: p for i, p in enumerate(paths)})
    return store


def _run_loop(files, fm, *, mesh=None, device_store=None, **kw):
    drivers._key_counter[0] = 1000  # identical PRNG streams across runs
    net = SpeakerNet.new(output=1, seed=0)
    fs = [tuple(f) for f in files]
    run_incremental(
        net, fs, dict(fm), show_progress=False, mesh=mesh,
        device_store=device_store, **kw,
    )
    return net, [c for _, c in fs]


def test_loop_with_store_bit_identical_single_device():
    rng = np.random.default_rng(2)
    files, fm = _feature_corpus(rng, 20, 3)
    files[0] = (files[0][0], 0)
    paths = [p for p, _ in files]
    store = _synthetic_store(fm, paths)
    kw = dict(burn_in_limit=4, conf_threshold=0.8, epochs=1)
    net_h, labels_h = _run_loop(files, fm, **kw)
    net_s, labels_s = _run_loop(files, fm, device_store=store, **kw)
    assert labels_s == labels_h
    for k in net_h.params:
        assert np.array_equal(
            np.asarray(net_h.params[k]), np.asarray(net_s.params[k])
        ), k


def test_loop_with_store_bit_identical_sharded():
    mesh = comm.make_mesh(8)
    rng = np.random.default_rng(3)
    files, fm = _feature_corpus(rng, 16, 4)
    files[0] = (files[0][0], 0)
    paths = [p for p, _ in files]
    kw = dict(burn_in_limit=4, conf_threshold=0.8, epochs=1)
    net_h, labels_h = _run_loop(files, fm, mesh=mesh, **kw)
    store = _synthetic_store(fm, paths, mesh=mesh)
    net_s, labels_s = _run_loop(files, fm, mesh=mesh, device_store=store, **kw)
    assert labels_s == labels_h
    for k in net_h.params:
        assert np.array_equal(
            np.asarray(net_h.params[k]), np.asarray(net_s.params[k])
        ), k


def test_loop_store_miss_falls_back_per_chunk():
    """A file missing from the store (e.g. routed through the PCM-sharded
    long-clip frontend) host-packs its chunk; results stay identical."""
    rng = np.random.default_rng(4)
    files, fm = _feature_corpus(rng, 12, 3)
    files[0] = (files[0][0], 0)
    paths = [p for p, _ in files]
    store = _synthetic_store(fm, [p for p in paths if p != paths[5]])
    kw = dict(burn_in_limit=3, conf_threshold=0.8, epochs=1)
    net_h, labels_h = _run_loop(files, fm, **kw)
    net_s, labels_s = _run_loop(files, fm, device_store=store, **kw)
    assert labels_s == labels_h
    for k in net_h.params:
        assert np.array_equal(
            np.asarray(net_h.params[k]), np.asarray(net_s.params[k])
        ), k


def test_loop_mesh_mismatched_store_is_ignored():
    """A store built under a different sharding than the loop's effective
    one must be dropped, not fed to a scan traced for other devices."""
    mesh = comm.make_mesh(8)
    rng = np.random.default_rng(5)
    files, fm = _feature_corpus(rng, 8, 2)
    files[0] = (files[0][0], 0)
    paths = [p for p, _ in files]
    store = _synthetic_store(fm, paths, mesh=mesh)  # mesh-sharded buckets
    kw = dict(burn_in_limit=2, conf_threshold=0.8, epochs=1)
    # Single-device loop (no mesh): the mesh-built store must be ignored.
    net_h, labels_h = _run_loop(files, fm, **kw)
    net_s, labels_s = _run_loop(files, fm, device_store=store, **kw)
    assert labels_s == labels_h


def test_cli_build_feature_map_returns_path_keyed_store(tmp_path):
    from streamz_tpu.cli import build_feature_map
    from streamz_tpu.dsp.features import FeatureExtractor
    from streamz_tpu.io import wav

    rng = np.random.default_rng(6)
    paths = []
    for i in range(3):
        pcm = (rng.normal(0, 0.1, size=(4000 + 2000 * i,)) * 20000).astype(
            np.int16
        )
        p = tmp_path / f"c{i}.wav"
        wav.write_wav(str(p), pcm, config.DEFAULT_SAMPLE_RATE)
        paths.append(str(p))
    fmap, store = build_feature_map(
        paths, FeatureExtractor("jax"), keep_device=True
    )
    assert store is not None
    for p in paths:
        hit = store.lookup(p)
        assert hit is not None
        bid, row, n_win = hit
        assert np.array_equal(
            np.asarray(store.bucket(bid)[row])[:n_win], fmap[p]
        )
    store.release()
