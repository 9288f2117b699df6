"""Multi-stream batched serving (app/serve.py).

Each slot of :class:`MultiStreamIdentifier` must reproduce the
single-stream :class:`StreamingIdentifier` — and therefore the offline
pipeline — exactly, for any interleaving of feeds across streams; slots
must be independent, reusable after ``close()``, and the slot axis must
shard across the data mesh without changing any verdict.
"""

import numpy as np
import pytest

from streamz_tpu.app.serve import MultiStreamIdentifier
from streamz_tpu.app.stream import StreamingIdentifier
from streamz_tpu.infer.identify import identify_speaker_with_threshold
from streamz_tpu.nn.model import SpeakerNet


@pytest.fixture(scope="module")
def net():
    return SpeakerNet.new(output=5, seed=0)


def _assert_verdict_close(got, ref):
    """Speaker ids must match exactly; confidences are vote sums whose
    accumulation grouping differs across dispatch patterns and SPMD
    partitions, so they match to float tolerance, not bit-exactly."""
    if ref is None:
        assert got is None
        return
    assert got is not None and got[0] == ref[0]
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-5)


def _clips(n, seed=0, seconds=1.0):
    rng = np.random.default_rng(seed)
    return [
        rng.normal(0, 3000, size=int(44100 * seconds) + 37 * i).astype(
            np.int16
        )
        for i in range(n)
    ]


def _feed_interleaved(srv, sids, clips, seed=1):
    """Feed all clips through their streams in random-size interleaved
    chunks, ticking between feeds."""
    rng = np.random.default_rng(seed)
    pos = [0] * len(sids)
    while any(p < len(c) for p, c in zip(pos, clips)):
        for i, (sid, clip) in enumerate(zip(sids, clips)):
            if pos[i] < len(clip):
                n = int(rng.integers(1, 7000))
                srv.feed(sid, clip[pos[i] : pos[i] + n])
                pos[i] += n
        srv.tick()


def test_multi_stream_matches_single_stream(net):
    clips = _clips(3)
    srv = MultiStreamIdentifier(net, n_streams=4, threshold=0.0)
    sids = [srv.open() for _ in clips]
    _feed_interleaved(srv, sids, clips)
    for sid, clip in zip(sids, clips):
        got = srv.finalize(sid)
        ref = StreamingIdentifier(net, threshold=0.0)
        ref.feed(clip)
        _assert_verdict_close(got, ref.finalize())
        speaker, _ = got
        assert speaker == identify_speaker_with_threshold(net, clip, 0.0)


def test_streams_are_independent(net):
    """A slot's verdict must not depend on what other slots are fed."""
    clip = _clips(1, seed=5)[0]
    alone = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    s0 = alone.open()
    alone.feed(s0, clip)
    alone.tick()
    ref = alone.finalize(s0)

    noisy = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    a = noisy.open()
    b = noisy.open()
    other = _clips(1, seed=6, seconds=2.0)[0]
    _feed_interleaved(noisy, [a, b], [clip, other])
    _assert_verdict_close(noisy.finalize(a), ref)


def test_slot_reuse_after_close(net):
    clip = _clips(1, seed=7)[0]
    srv = MultiStreamIdentifier(net, n_streams=1, threshold=0.0)
    s0 = srv.open()
    srv.feed(s0, _clips(1, seed=8, seconds=0.5)[0])
    srv.tick()
    srv.finalize(s0)
    srv.close(s0)

    s1 = srv.open()
    assert s1 == s0  # the slot was reclaimed
    srv.feed(s1, clip)
    srv.tick()
    got = srv.finalize(s1)
    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip)
    _assert_verdict_close(got, ref.finalize())


def test_rolling_current_and_empty_tick(net):
    srv = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    sid = srv.open()
    assert srv.tick() == 0  # nothing buffered: no dispatch
    srv.feed(sid, _clips(1, seed=9)[0])
    assert srv.tick() >= 1
    cur = srv.current(sid)
    assert cur is not None and 0.0 < cur[1] <= 1.0
    with pytest.raises(KeyError):
        srv.current(99)


def test_slot_exhaustion_raises(net):
    srv = MultiStreamIdentifier(net, n_streams=1)
    srv.open()
    with pytest.raises(RuntimeError):
        srv.open()


def test_bounded_tick_and_pending_blocks(net):
    """tick(drain=False) issues exactly one dispatch of <= block_batch
    blocks per slot; pending_blocks reports the leftover backlog."""
    from streamz_tpu import config

    srv = MultiStreamIdentifier(net, n_streams=2, threshold=0.0, block_batch=4)
    sid = srv.open()
    srv.feed(sid, np.zeros(10 * config.HOP_SIZE, np.int16))
    assert srv.pending_blocks() == 10
    assert srv.tick(drain=False) == 1
    assert srv.pending_blocks() == 6  # one dispatch drained k=4 blocks
    assert srv.tick() == 2  # 6 remaining blocks at k=4: two more dispatches
    assert srv.pending_blocks() == 0


def test_mixed_dtype_wire_parity(net):
    """A stream fed f32 chunks alongside streams fed i16 must produce the
    same verdicts as all-i16 feeding — the wire format is an optimization,
    never a semantic."""
    clips = _clips(2, seed=21, seconds=0.7)
    ref = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    mix = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    r0, r1 = ref.open(), ref.open()
    m0, m1 = mix.open(), mix.open()
    # ref: both i16; mix: slot 0 fed pre-converted f32, slot 1 i16.
    f32_clip = clips[0].astype(np.float32) / 32767.0
    step = 5000
    for i in range(0, max(len(c) for c in clips), step):
        ref.feed(r0, clips[0][i : i + step])
        ref.feed(r1, clips[1][i : i + step])
        mix.feed(m0, f32_clip[i : i + step])
        mix.feed(m1, clips[1][i : i + step])
        ref.tick()
        mix.tick()
    _assert_verdict_close(mix.finalize(m0), ref.finalize(r0))
    _assert_verdict_close(mix.finalize(m1), ref.finalize(r1))


def test_mixed_fleet_wire_policy(net):
    """A mixed fleet ships ONE f32 dispatch (the transfer is one dense
    (S,k,block) array, so dtype-splitting would ship the buffer twice),
    and the downgrade is transient: a slot returns to the i16 wire once
    its f32 remainder is gone (close/reopen)."""
    clips = _clips(3, seed=31, seconds=0.5)
    srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0)
    sids = [srv.open() for _ in clips]

    wires = []
    orig_f32, orig_i16 = srv._step, srv._step_i16
    srv._step = lambda *a: (wires.append("f32"), orig_f32(*a))[1]
    srv._step_i16 = lambda *a: (wires.append("i16"), orig_i16(*a))[1]

    srv.feed(sids[0], clips[0].astype(np.float32) / 32767.0)
    srv.feed(sids[1], clips[1])
    srv.feed(sids[2], clips[2])
    srv.tick()
    assert "f32" in wires and "i16" not in wires  # one wire per dispatch

    # Mixed dispatch never changes a verdict.
    for sid, clip in zip(sids, clips):
        ref = StreamingIdentifier(net, threshold=0.0)
        ref.feed(clip)
        _assert_verdict_close(srv.finalize(sid), ref.finalize())

    # The f32 slot's stream ends; after close the fleet is i16 again.
    for sid in sids:
        srv.close(sid)
    wires.clear()
    s = srv.open()
    srv.feed(s, clips[1])
    srv.tick()
    assert wires and all(w == "i16" for w in wires)


def test_serving_accepts_custom_axis_mesh(net):
    """A mesh whose leading axis is not named 'data' (e.g. a window-axis
    mesh) must shard the slot axis over its own axis name, not crash."""
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8, axis=comm.WINDOW_AXIS)
    clip = _clips(1, seed=41, seconds=0.5)[0]
    srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0, mesh=mesh)
    assert srv.n_slots == 8
    sid = srv.open()
    srv.feed(sid, clip)
    srv.tick()
    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip)
    _assert_verdict_close(srv.finalize(sid), ref.finalize())
    assert not srv._carry[4].sharding.is_fully_replicated
    # the slot axis really lands one shard per device
    assert len(srv._carry[4].sharding.device_set) == 8


def test_serving_shards_over_multi_axis_mesh(net):
    """A multi-axis mesh with a leading size-1 axis (('replica','data'))
    must still shard the slot axis across all 8 devices — not silently
    replicate it over the trivial first axis."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh

    mesh = Mesh(np_.array(jax.devices()[:8]).reshape(1, 8),
                ("replica", "data"))
    clip = _clips(1, seed=42, seconds=0.5)[0]
    srv = MultiStreamIdentifier(net, n_streams=5, threshold=0.0, mesh=mesh)
    assert srv.n_slots == 8
    votes = srv._carry[4]
    assert not votes.sharding.is_fully_replicated
    # 8-way sharded along the slot axis: each device holds 1 of 8 rows
    assert votes.sharding.shard_shape(votes.shape)[0] == 1
    sid = srv.open()
    srv.feed(sid, clip)
    srv.tick()
    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip)
    _assert_verdict_close(srv.finalize(sid), ref.finalize())


def test_multihost_guard(net, monkeypatch):
    """Multi-host processes must get a clear error, not a hang/crash at the
    first device_put of non-addressable shards."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(NotImplementedError):
        MultiStreamIdentifier(net, n_streams=4)


def test_serving_shards_over_mesh(net):
    """With a mesh the slot axis is sharded; verdicts are identical to the
    unsharded server on the same feeds, and slots pad to the mesh size."""
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8)
    clips = _clips(5, seed=11, seconds=0.6)

    plain = MultiStreamIdentifier(net, n_streams=5, threshold=0.0)
    shard = MultiStreamIdentifier(net, n_streams=5, threshold=0.0, mesh=mesh)
    assert shard.n_slots == 8  # padded to fill the mesh

    p_sids = [plain.open() for _ in clips]
    s_sids = [shard.open() for _ in clips]
    _feed_interleaved(plain, p_sids, clips, seed=12)
    _feed_interleaved(shard, s_sids, clips, seed=12)

    for ps, ss, clip in zip(p_sids, s_sids, clips):
        _assert_verdict_close(shard.finalize(ss), plain.finalize(ps))

    # the carry really is distributed over the mesh's data axis
    votes = shard._carry[4]
    assert votes.sharding.spec == comm.batch_sharded(mesh).spec


def test_serve_bench_runs(net):
    """The serving benchmark harness stays runnable: it reaches into the
    server's carry for its readback fence, so a carry-layout change (e.g.
    inserting the Kahan compensation array) must break this test rather
    than silently nulling bench.py's ``serve64_aggregate_rtf``."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
        ),
    )
    from serve_bench import bench_slots

    out = bench_slots(2, chunk_ms=100.0, ticks=2)
    assert out["streams"] == 2
    assert out["aggregate_rtf"] > 0


# -- G.711 companded wire (io/g711.py) ----------------------------------------


def _spy_wires(srv):
    """Record which wire each dispatch used ('f32' | 'i16' | 'u8')."""
    wires = []
    f32, i16, u8 = srv._step, srv._step_i16, srv._step_u8
    srv._step = lambda *a: (wires.append("f32"), f32(*a))[1]
    srv._step_i16 = lambda *a: (wires.append("i16"), i16(*a))[1]
    srv._step_u8 = lambda *a: (wires.append("u8"), u8(*a))[1]
    return wires


def test_ulaw_wire_bit_parity(net):
    """Feeding G.711 mu-law bytes must be BIT-identical to host-decoding
    those bytes to i16 and feeding the i16 — the device table gather runs
    the same exact values through the same /32767 conversion."""
    from streamz_tpu.io import g711

    clips = _clips(2, seed=51, seconds=0.7)
    codes = [g711.ulaw_encode(c) for c in clips]

    u8 = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    i16 = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    wires = _spy_wires(u8)
    u_sids = [u8.open() for _ in clips]
    d_sids = [i16.open() for _ in clips]
    step = 5000
    for i in range(0, max(len(c) for c in codes), step):
        for sid, c in zip(u_sids, codes):
            u8.feed(sid, c[i : i + step], encoding="ulaw")
        for sid, c in zip(d_sids, codes):
            i16.feed(sid, g711.ulaw_decode(c[i : i + step]))
        u8.tick()
        i16.tick()
    assert wires and all(w == "u8" for w in wires)
    np.testing.assert_array_equal(
        np.asarray(u8._carry[4]), np.asarray(i16._carry[4])
    )
    for us, ds in zip(u_sids, d_sids):
        got, ref = u8.finalize(us), i16.finalize(ds)
        assert (got is None) == (ref is None)
        if ref is not None:
            assert got[0] == ref[0] and got[1] == ref[1]


def test_alaw_wire_matches_host_decode(net):
    from streamz_tpu.io import g711

    clip = _clips(1, seed=52, seconds=0.6)[0]
    codes = g711.alaw_encode(clip)

    srv = MultiStreamIdentifier(net, n_streams=1, threshold=0.0)
    wires = _spy_wires(srv)
    sid = srv.open()
    srv.feed(sid, codes.tobytes(), encoding="alaw")  # raw bytes accepted
    srv.tick()
    assert wires == ["u8"] * len(wires) and wires

    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(g711.alaw_decode(codes))
    _assert_verdict_close(srv.finalize(sid), ref.finalize())


def test_g711_mixed_fleet_downgrades_exactly(net):
    """mu-law + i16 slots share an i16 dispatch (G.711 expands to exact
    i16, so nothing is lost); adding an f32 slot downgrades to f32; and
    mu-law + A-law slots cannot share a table so they ship i16."""
    from streamz_tpu.io import g711

    clips = _clips(3, seed=53, seconds=0.5)

    def fresh(feeds):
        srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0)
        wires = _spy_wires(srv)
        sids = [srv.open() for _ in feeds]
        for sid, (pcm, enc) in zip(sids, feeds):
            srv.feed(sid, pcm, encoding=enc)
        srv.tick()
        return srv, sids, wires

    srv, sids, wires = fresh([
        (g711.ulaw_encode(clips[0]), "ulaw"),
        (clips[1], None),
        (clips[2], None),
    ])
    assert set(wires) == {"i16"}
    # Verdicts equal the single-stream reference on the decoded audio.
    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(g711.ulaw_decode(g711.ulaw_encode(clips[0])))
    _assert_verdict_close(srv.finalize(sids[0]), ref.finalize())

    _, _, wires = fresh([
        (g711.ulaw_encode(clips[0]), "ulaw"),
        (clips[1].astype(np.float32) / 32767.0, None),
        (clips[2], None),
    ])
    assert set(wires) == {"f32"}

    _, _, wires = fresh([
        (g711.ulaw_encode(clips[0]), "ulaw"),
        (g711.alaw_encode(clips[1]), "alaw"),
        (clips[2][:0], None),  # empty linear feed: no remainder, no vote
    ])
    assert set(wires) == {"i16"}


def test_g711_slot_switches_wire_midstream(net):
    """One slot fed mu-law bytes then linear i16 must equal feeding the
    decoded concatenation — representation changes are never semantic."""
    from streamz_tpu.io import g711

    clip = _clips(1, seed=54, seconds=0.8)[0]
    half = len(clip) // 2
    codes = g711.ulaw_encode(clip[:half])

    srv = MultiStreamIdentifier(net, n_streams=1, threshold=0.0)
    sid = srv.open()
    srv.feed(sid, codes[: half // 2], encoding="ulaw")
    # switch to linear while G.711 bytes are still buffered
    srv.feed(sid, g711.ulaw_decode(codes[half // 2 :]))
    srv.feed(sid, clip[half:])
    srv.tick()

    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(np.concatenate([g711.ulaw_decode(codes), clip[half:]]))
    _assert_verdict_close(srv.finalize(sid), ref.finalize())


def test_g711_feed_validation(net):
    srv = MultiStreamIdentifier(net, n_streams=1, threshold=0.0)
    sid = srv.open()
    with pytest.raises(TypeError):  # ambiguous u8 without an encoding
        srv.feed(sid, np.zeros(10, np.uint8))
    with pytest.raises(ValueError):
        srv.feed(sid, np.zeros(10, np.uint8), encoding="g722")
    with pytest.raises(TypeError):  # G.711 chunks must be bytes
        srv.feed(sid, np.zeros(10, np.int16), encoding="ulaw")


def test_streaming_identifier_accepts_g711(net):
    from streamz_tpu.io import g711

    clip = _clips(1, seed=55, seconds=0.5)[0]
    codes = g711.ulaw_encode(clip)
    a = StreamingIdentifier(net, threshold=0.0)
    a.feed(codes, encoding="ulaw")
    b = StreamingIdentifier(net, threshold=0.0)
    b.feed(g711.ulaw_decode(codes))
    ra, rb = a.finalize(), b.finalize()
    assert (ra is None) == (rb is None)
    if rb is not None:
        assert ra[0] == rb[0] and ra[1] == rb[1]


def test_g711_wire_shards_over_mesh(net):
    """The u8 wire composes with the slot-sharded mesh: same verdicts,
    decode table replicated, blocks sharded."""
    from streamz_tpu.io import g711
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8)
    clips = _clips(3, seed=56, seconds=0.5)
    codes = [g711.ulaw_encode(c) for c in clips]

    plain = MultiStreamIdentifier(net, n_streams=3, threshold=0.0)
    shard = MultiStreamIdentifier(net, n_streams=3, threshold=0.0, mesh=mesh)
    wires = _spy_wires(shard)
    p_sids = [plain.open() for _ in clips]
    s_sids = [shard.open() for _ in clips]
    for sid, c in zip(p_sids, codes):
        plain.feed(sid, c, encoding="ulaw")
    for sid, c in zip(s_sids, codes):
        shard.feed(sid, c, encoding="ulaw")
    plain.tick()
    shard.tick()
    assert wires and all(w == "u8" for w in wires)
    for ps, ss in zip(p_sids, s_sids):
        _assert_verdict_close(shard.finalize(ss), plain.finalize(ps))


def test_serve_lifecycle_fuzz(net):
    """Randomized open/feed/tick/finalize/close interleavings: every
    finalized stream must match the single-stream oracle on exactly the
    audio it was fed, across slot reuse, wire mixes, and partial ticks."""
    from streamz_tpu.io import g711

    rng = np.random.default_rng(99)
    srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0)
    live = {}   # sid -> list of fed (decoded) PCM pieces
    checked = 0

    def random_chunk():
        n = int(rng.integers(1, 4000))
        return (rng.normal(0, 3000, size=n)).astype(np.int16)

    for step in range(120):
        op = rng.choice(["open", "feed", "tick", "finish"])
        if op == "open" and len(live) < srv.n_slots:
            sid = srv.open()
            live[sid] = []
        elif op == "feed" and live:
            sid = int(rng.choice(list(live)))
            pcm = random_chunk()
            kind = rng.choice(["i16", "f32", "ulaw", "alaw"])
            if kind == "i16":
                srv.feed(sid, pcm)
                live[sid].append(pcm)
            elif kind == "f32":
                srv.feed(sid, pcm.astype(np.float32) / 32767.0)
                live[sid].append(pcm)
            else:
                enc = g711.ulaw_encode if kind == "ulaw" else g711.alaw_encode
                codes = enc(pcm)
                srv.feed(sid, codes, encoding=kind)
                live[sid].append(g711.decode(codes, kind))
        elif op == "tick":
            srv.tick(drain=bool(rng.integers(0, 2)))
        elif op == "finish" and live:
            sid = int(rng.choice(list(live)))
            got = srv.finalize(sid)
            ref = StreamingIdentifier(net, threshold=0.0)
            for piece in live[sid]:
                ref.feed(piece)
            _assert_verdict_close(got, ref.finalize())
            srv.close(sid)
            del live[sid]
            checked += 1

    for sid in list(live):
        got = srv.finalize(sid)
        ref = StreamingIdentifier(net, threshold=0.0)
        for piece in live[sid]:
            ref.feed(piece)
        _assert_verdict_close(got, ref.finalize())
        checked += 1
    assert checked >= 5  # the schedule really exercised finalization


def test_serve_stats_accounting(net):
    """stats() counters reflect exactly what tick() shipped."""
    from streamz_tpu import config

    srv = MultiStreamIdentifier(net, n_streams=2, threshold=0.0, block_batch=4)
    assert srv.stats()["dispatches"] == 0
    sid = srv.open()
    # 6 full blocks at block_batch=4 -> 2 dispatches when draining
    srv.feed(sid, np.zeros(6 * config.HOP_SIZE, np.int16))
    n = srv.tick()
    st = srv.stats()
    assert n == 2 and st["dispatches"] == 2
    assert st["wire_dispatches"] == {"u8": 0, "i16": 2, "f32": 0}
    per = 2 * 4 * config.HOP_SIZE * 2 + 2 * 4  # (S,k,block) i16 + counts
    assert st["bytes_shipped"] == 2 * per
    assert st["open_slots"] == 1 and st["n_slots"] == 2
    assert st["pending_blocks"] == 0 and st["buffered_samples"] == 0


# -- online model hot-swap -----------------------------------------------------


def test_update_model_same_capacity(net):
    """Swapping params (same capacity) mid-stream matches the single-stream
    oracle performing the identical swap."""
    clip = _clips(1, seed=61, seconds=1.0)[0]
    half = len(clip) // 2
    net2 = SpeakerNet.new(output=5, seed=7)
    assert net2.capacity == net.capacity

    srv = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    sid = srv.open()
    srv.feed(sid, clip[:half])
    srv.tick()
    srv.update_model(net2)
    srv.feed(sid, clip[half:])
    srv.tick()

    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip[:half])
    ref.update_model(net2)
    ref.feed(clip[half:])
    _assert_verdict_close(srv.finalize(sid), ref.finalize())


def test_update_model_capacity_growth(net):
    """Growing the classifier (new speakers discovered while serving) pads
    the vote carries; accumulated votes keep their meaning and the verdict
    matches the oracle with the identical swap."""
    clip = _clips(1, seed=62, seconds=1.0)[0]
    half = len(clip) // 2
    grown = SpeakerNet.new(output=5, seed=0)
    grown.ensure_capacity(net.capacity + 1)  # force a capacity doubling
    assert grown.capacity > net.capacity

    srv = MultiStreamIdentifier(net, n_streams=2, threshold=0.0)
    a, b = srv.open(), srv.open()
    other = _clips(1, seed=63, seconds=0.6)[0]
    srv.feed(a, clip[:half])
    srv.feed(b, other)
    srv.tick()
    srv.update_model(grown)
    srv.feed(a, clip[half:])
    srv.tick()

    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip[:half])
    ref.update_model(grown)
    ref.feed(clip[half:])
    _assert_verdict_close(srv.finalize(a), ref.finalize())

    # the untouched slot is unaffected by the fleet-wide swap pad
    ref_b = StreamingIdentifier(net, threshold=0.0)
    ref_b.feed(other)
    ref_b.update_model(grown)
    _assert_verdict_close(srv.finalize(b), ref_b.finalize())


def test_update_model_growth_over_mesh(net):
    """The carry pad preserves the slot sharding."""
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8)
    grown = SpeakerNet.new(output=5, seed=0)
    grown.ensure_capacity(net.capacity + 1)

    clip = _clips(1, seed=64, seconds=0.5)[0]
    srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0, mesh=mesh)
    sid = srv.open()
    srv.feed(sid, clip[: len(clip) // 2])
    srv.tick()
    srv.update_model(grown)
    assert not srv._carry[4].sharding.is_fully_replicated
    srv.feed(sid, clip[len(clip) // 2 :])
    srv.tick()

    ref = StreamingIdentifier(net, threshold=0.0)
    ref.feed(clip[: len(clip) // 2])
    ref.update_model(grown)
    ref.feed(clip[len(clip) // 2 :])
    _assert_verdict_close(srv.finalize(sid), ref.finalize())


def test_update_model_rejects_shrink(net):
    grown = SpeakerNet.new(output=5, seed=0)
    grown.ensure_capacity(net.capacity + 1)
    srv = MultiStreamIdentifier(grown, n_streams=1, threshold=0.0)
    with pytest.raises(ValueError):
        srv.update_model(net)
    s = StreamingIdentifier(grown, threshold=0.0)
    with pytest.raises(ValueError):
        s.update_model(net)


def test_mesh_padding_slots_not_admitted(net):
    """Mesh padding rounds n_slots up for shape only: open() admits at
    most the CONFIGURED n_streams, so an operator's capacity plan is not
    silently exceeded by up to mesh_size-1 extra streams."""
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8)
    srv = MultiStreamIdentifier(net, n_streams=5, threshold=0.0, mesh=mesh)
    assert srv.n_slots == 8 and srv.n_streams == 5
    sids = [srv.open() for _ in range(5)]
    assert sids == list(range(5))
    with pytest.raises(RuntimeError, match="all 5 stream slots"):
        srv.open()
    st = srv.stats()
    assert st["n_streams"] == 5 and st["n_slots"] == 8
    srv.close(sids[0])
    assert srv.open() == 0  # released slot is reusable


def test_refresh_verdicts_snapshot_parity(net):
    """current() served from the one-readback snapshot (refresh_verdicts,
    the high-RTT daemon path) must equal the exact per-slot readback, track
    invalidation on every carry advance, and mirror close()'s row zeroing."""
    srv = MultiStreamIdentifier(net, n_streams=3, threshold=0.0)
    a, b = srv.open(), srv.open()
    rng = np.random.default_rng(11)
    srv.feed(a, rng.normal(0, 3000, size=44100).astype(np.int16))
    srv.feed(b, rng.normal(0, 1500, size=22050).astype(np.int16))
    srv.tick()
    assert srv._vcache is None  # dispatches invalidate
    exact = {sid: srv.current(sid) for sid in (a, b)}  # device readbacks
    srv.refresh_verdicts()
    assert srv._vcache is not None
    for sid in (a, b):
        got = srv.current(sid)  # served host-side
        assert (got is None) == (exact[sid] is None)
        if got is not None:
            assert got[0] == exact[sid][0]
            np.testing.assert_allclose(got[1], exact[sid][1], rtol=1e-6)
    # Carry advance invalidates the snapshot.
    srv.feed(a, rng.normal(0, 3000, size=4410).astype(np.int16))
    srv.tick()
    assert srv._vcache is None
    # close() under a valid snapshot zeroes the row: a recycled slot must
    # never serve the previous stream's verdict from the cache.
    srv.refresh_verdicts()
    assert srv.current(a) is not None
    srv.close(a)
    a2 = srv.open()
    assert a2 == a
    assert srv.current(a2) is None


def test_refresh_verdicts_under_mesh_matches_readback(net):
    """The one-transfer verdict snapshot must gather correctly from a
    slot-SHARDED carry: snapshot-served current() equals the per-slot
    device readback on every open slot of a meshed fleet."""
    from streamz_tpu.parallel import comm

    mesh = comm.make_mesh(8)
    srv = MultiStreamIdentifier(net, n_streams=5, threshold=0.0, mesh=mesh)
    rng = np.random.default_rng(21)
    sids = [srv.open() for _ in range(3)]
    for i, sid in enumerate(sids):
        srv.feed(
            sid,
            rng.normal(0, 1000 * (i + 1), size=22050 * (i + 1)).astype(
                np.int16
            ),
        )
    srv.tick()
    exact = {sid: srv.current(sid) for sid in sids}  # per-slot readbacks
    srv.refresh_verdicts()
    assert srv._vcache is not None and srv._vcache.shape[0] == srv.n_slots
    for sid in sids:
        got = srv.current(sid)
        assert (got is None) == (exact[sid] is None)
        if got is not None:
            assert got[0] == exact[sid][0]
            np.testing.assert_allclose(got[1], exact[sid][1], rtol=1e-6)
