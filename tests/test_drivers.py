"""Raw-PCM training-driver and identification-path tests."""

import numpy as np
import pytest

from streamz_tpu.dsp.features import FeatureExtractor
from streamz_tpu.infer import identify
from streamz_tpu.io import wav as wavio
from streamz_tpu.nn import drivers
from streamz_tpu.nn.model import SpeakerNet


def _tone(n, freq, rate=44100, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


@pytest.fixture(scope="module")
def tones():
    # two easily separable "speakers": low vs high tone mixtures
    rng = np.random.default_rng(0)
    low = _tone(44100, 220) + _tone(44100, 330) // 2
    high = _tone(44100, 1500) + _tone(44100, 2200) // 2
    noise = rng.normal(0, 300, 44100).astype(np.int16)
    return (low + noise).astype(np.int16), (high + noise).astype(np.int16)


def test_pretrain_network_learns(tones):
    """Raw-PCM path: augment → extract → train (src/lib.rs:348-397).

    Keys are pinned: with the implicit ``drivers._fresh_key()`` counter the
    augment/shuffle draws depend on how many driver calls earlier suites made,
    and the reference's saturating sigmoid-MSE delta (src/lib.rs:926-927) can
    wedge this 2-epoch toy problem for ~25% of key regions regardless of
    extra epochs — measured, not a framework regression.
    """
    import jax

    low, high = tones
    net = SpeakerNet.new(output=2, seed=3)
    ex = FeatureExtractor()
    key = jax.random.PRNGKey(11)
    for i in range(3):
        loss_a = drivers.pretrain_network(
            net, low, 0, 2, 2, 0.05, 0.0, 8, ex, key=jax.random.fold_in(key, 2 * i))
        loss_b = drivers.pretrain_network(
            net, high, 1, 2, 2, 0.05, 0.0, 8, ex, key=jax.random.fold_in(key, 2 * i + 1))
    assert np.isfinite(loss_a) and np.isfinite(loss_b)
    assert identify.identify_speaker(net, low, ex) == 0
    assert identify.identify_speaker(net, high, ex) == 1


def test_identify_speaker_list_raw_pcm(tones):
    low, high = tones
    net = SpeakerNet.new(output=2, seed=3)
    ex = FeatureExtractor()
    for _ in range(3):
        drivers.pretrain_network(net, low, 0, 2, 2, 0.05, 0.0, 8, ex)
        drivers.pretrain_network(net, high, 1, 2, 2, 0.05, 0.0, 8, ex)
    mixed = np.concatenate([low[:22050], high[:22050]])
    speakers = identify.identify_speaker_list(net, mixed, 0.6, ex)
    assert set(speakers) <= {0, 1}
    assert len(speakers) >= 1


def test_train_from_files_decay(tmp_path, tones, monkeypatch):
    """File-list trainer with the 0.99^step decay (src/lib.rs:668-732)."""
    monkeypatch.chdir(tmp_path)
    low, high = tones
    pa = str(tmp_path / "a.wav")
    pb = str(tmp_path / "b.wav")
    wavio.write_wav(pa, low[:22050])
    wavio.write_wav(pb, high[:22050])
    net = SpeakerNet.new(output=2, seed=4)
    before = np.asarray(net.params["w1"]).copy()
    drivers.train_from_files(
        net, [(pa, 0), (pb, 1), ("missing.wav", 0)], 2, epochs=2,
        lr=0.05, dropout=0.0, batch_size=8,
    )
    assert not np.allclose(np.asarray(net.params["w1"]), before)
    assert pa in net.file_lists[0]
    assert pb in net.file_lists[1]


def test_batch_size_zero_clamped_like_reference():
    """batch_size=0 trains with chunks of 1 (the reference's
    chunks(batch_size.max(1)), src/lib.rs:602) instead of crashing."""
    from streamz_tpu.nn.drivers import pretrain_from_features
    from streamz_tpu.nn.model import SpeakerNet

    import jax

    rng = np.random.default_rng(0)
    net = SpeakerNet.new(output=2, seed=0)
    wins = rng.normal(size=(6, 60)).astype(np.float32)
    # Same explicit key: the key drives the per-epoch shuffle, and with
    # batch_size=1 the SGD order changes the loss.
    key = jax.random.PRNGKey(7)
    loss0 = pretrain_from_features(net, wins, 0, 2, 1, 0.05, 0.0, 0, key=key)
    net1 = SpeakerNet.new(output=2, seed=0)
    loss1 = pretrain_from_features(net1, wins, 0, 2, 1, 0.05, 0.0, 1, key=key)
    assert np.isfinite(loss0) and loss0 == loss1  # identical to batch_size=1


def test_pretrain_masked_target_class_raises():
    """A target class at or beyond net.num_speakers trains as a silent
    no-target update (the logit mask blocks its gradient) — the driver
    must refuse instead."""
    from streamz_tpu.nn.drivers import pretrain_from_features

    net = SpeakerNet.new(output=1, seed=0)
    wins = np.random.default_rng(0).normal(size=(8, 60)).astype(np.float32)
    with pytest.raises(ValueError, match="masked"):
        pretrain_from_features(net, wins, target_class=1, num_classes=2,
                               epochs=1, lr=0.05, dropout=0.0, batch_size=8)
