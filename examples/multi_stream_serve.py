"""Multi-stream serving demo: many concurrent callers, one TPU program.

The reference's serving surface is a single-microphone stub
(``examples/live_stream.rs:1-9``).  This demo shows the TPU-first serving
shape instead: N independent PCM streams (simulated callers feeding ~100 ms
chunks at different phases) advance together in ONE batched dispatch per
tick via :class:`streamz_tpu.app.serve.MultiStreamIdentifier`, and each
stream's verdict still matches the offline pipeline exactly.

Usage:
    python examples/multi_stream_serve.py [n_streams] [clip ...]

Without clips it synthesizes distinct tone+noise sources.  With a trained
``model.npz`` in the CWD the real model is used; otherwise a fresh net with
random speakers demonstrates the mechanics.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # Honor the env var even when a site hook pre-imported jax first
    # (see tests/conftest.py).
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from streamz_tpu import config
from streamz_tpu.app.serve import MultiStreamIdentifier
from streamz_tpu.nn import checkpoint
from streamz_tpu.nn.model import SpeakerNet


def make_net():
    if os.path.exists("model.npz"):
        net = checkpoint.load("model.npz")
        print(f"loaded model.npz ({net.num_speakers} speakers)")
        return net
    net = SpeakerNet.new(output=8, seed=0)
    print("no model.npz found — using a fresh 8-speaker net (mechanics demo)")
    return net


def make_sources(n, argv_clips):
    rate = config.DEFAULT_SAMPLE_RATE
    clips = []
    for path in argv_clips:
        from streamz_tpu.io.audio import load_and_resample_file

        clips.append(load_and_resample_file(path)[0])
    rng = np.random.default_rng(0)
    while len(clips) < n:
        i = len(clips)
        t = np.arange(int(3.0 * rate)) / rate
        tone = 6000 * np.sin(2 * np.pi * (180 + 45 * i) * t)
        noise = rng.normal(0, 1200, size=t.shape)
        clips.append((tone + noise).astype(np.int16))
    return clips[:n]


def main():
    args = sys.argv[1:]
    wire = None
    if args and args[0].startswith("--wire="):
        # --wire=ulaw / --wire=alaw: simulate telephony callers — clips are
        # G.711-companded on the host ONCE (as a PSTN source would deliver
        # them) and the raw bytes ship to the device each tick.
        wire = args.pop(0).split("=", 1)[1]
    n = int(args[0]) if args and args[0].isdigit() else 8
    clip_args = args[1:] if args and args[0].isdigit() else args

    net = make_net()
    clips = make_sources(n, clip_args)
    if wire:
        from streamz_tpu.io import g711

        enc = g711.ulaw_encode if wire == "ulaw" else g711.alaw_encode
        clips = [enc(c) for c in clips]
        print(f"G.711 {wire} wire: u8 bytes shipped raw, expanded on device")
    srv = MultiStreamIdentifier(net, n_streams=n, threshold=0.0)
    sids = [srv.open() for _ in range(n)]

    # Warm the jit cache on a throwaway server (same shapes -> same
    # programs) so the timed loop below measures serving, not compilation.
    warm = MultiStreamIdentifier(net, n_streams=n, threshold=0.0)
    w = warm.open()
    warm.feed(w, np.zeros(2 * config.WINDOW_SIZE, np.int16))
    warm.tick()
    warm.finalize(w)

    chunk = int(0.1 * config.DEFAULT_SAMPLE_RATE)  # ~100 ms per tick
    pos = [int(i * 0.01 * config.DEFAULT_SAMPLE_RATE) for i in range(n)]
    ticks = 0
    t0 = time.perf_counter()
    while any(p < len(c) for p, c in zip(pos, clips)):
        for i, sid in enumerate(sids):
            if pos[i] < len(clips[i]):
                srv.feed(sid, clips[i][pos[i] : pos[i] + chunk],
                         encoding=wire)
                pos[i] += chunk
        srv.tick()
        ticks += 1
        if ticks % 10 == 0:
            # One readback refreshes every stream's rolling verdict; the
            # current() polls below are then host memory — on a high-RTT
            # link this is the difference between N RTTs and one per poll
            # round (the TCP daemon does the same after every working
            # tick; benchmarks/daemon_bench.py measured it 10.7x).
            srv.refresh_verdicts()
            row = ", ".join(
                f"s{sid}:{v[0]}@{v[1]:.2f}" if (v := srv.current(sid)) else f"s{sid}:?"
                for sid in sids[: min(n, 6)]
            )
            print(f"tick {ticks:3d}: {row}")
    wall = time.perf_counter() - t0

    print("\nfinal verdicts (exact offline parity):")
    for i, sid in enumerate(sids):
        v = srv.finalize(sid)
        audio_s = len(clips[i]) / config.DEFAULT_SAMPLE_RATE
        label = f"speaker {v[0]} conf {v[1]:.3f}" if v else "below threshold"
        print(f"  stream {sid}: {audio_s:.1f}s audio -> {label}")
    total_audio = sum(len(c) for c in clips) / config.DEFAULT_SAMPLE_RATE
    print(
        f"\n{n} streams, {total_audio:.1f}s total audio in {wall:.2f}s wall "
        f"-> {total_audio / wall:.1f}x aggregate real-time"
    )
    st = srv.stats()
    print(
        f"server stats: {st['dispatches']} dispatches, "
        f"{st['bytes_shipped'] / 1e6:.2f} MB shipped, "
        f"wires {st['wire_dispatches']}"
    )


if __name__ == "__main__":
    main()
