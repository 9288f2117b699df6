"""Multi-stream serving throughput: aggregate real-time factor vs slots.

Each tick feeds every open stream one ``chunk_ms`` chunk of PCM and issues
ONE batched device dispatch (`app/serve.py`); a slot's audio advances
``chunk_ms`` per tick, so

    aggregate_rtf = n_streams * chunk_ms/1000 * ticks_per_second.

The host loop (chunk buffering, padding, device transfer) is deliberately
inside the measurement — this is the serving number, not a kernel number.
Timing reads back one scalar per measurement to fence the tunnel's lazy
sync (same convention as bench.py).

Usage: python benchmarks/serve_bench.py [slots ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_slots(n_streams: int, chunk_ms: float = 100.0, ticks: int = 30,
                wire: str = "i16"):
    from streamz_tpu.app.serve import MultiStreamIdentifier
    from streamz_tpu.nn.model import SpeakerNet

    net = SpeakerNet.new(output=5, seed=0)
    srv = MultiStreamIdentifier(net, n_streams=n_streams, threshold=0.0)
    sids = [srv.open() for _ in range(n_streams)]

    rng = np.random.default_rng(0)
    chunk_len = int(44100 * chunk_ms / 1000.0)
    chunks = rng.normal(0, 3000, size=(n_streams, chunk_len)).astype(np.int16)
    enc = None
    if wire == "f32":
        chunks = chunks.astype(np.float32) / 32767.0
    elif wire in ("ulaw", "alaw"):
        # The telephony wire: G.711 bytes shipped raw, expanded on device —
        # half the i16 transfer (the measured serving bottleneck).
        from streamz_tpu.io import g711

        chunks = np.stack([
            (g711.ulaw_encode if wire == "ulaw" else g711.alaw_encode)(c)
            for c in chunks
        ])
        enc = wire
    elif wire != "i16":
        raise ValueError(f"unknown wire {wire!r}")

    def one_tick():
        for sid in sids:
            srv.feed(sid, chunks[sid], encoding=enc)
        srv.tick()

    def fence():
        # Read back one scalar to fence the tunnel's lazy sync: the last
        # carry element is the per-slot window count ([S] int32) — indexed
        # from the end so inserting new per-slot state (e.g. the Kahan
        # compensation array) does not silently break the fence.
        float(np.asarray(srv._carry[-1][0]))

    for _ in range(3):  # warm: compile + autotune settle
        one_tick()
    fence()

    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(ticks):
            one_tick()
        fence()
        best = min(best, (time.perf_counter() - start) / ticks)

    rtf = n_streams * (chunk_ms / 1000.0) / best
    return {
        "streams": n_streams,
        "wire": wire,
        "tick_ms": round(best * 1e3, 2),
        "aggregate_rtf": round(rtf, 1),
        "rtf_per_stream": round(rtf / n_streams, 2),
    }


def main():
    args = sys.argv[1:]
    wire = "i16"
    if args and args[0].startswith("--wire="):
        wire = args.pop(0).split("=", 1)[1]
    slot_counts = [int(a) for a in args] or [16, 64, 256]
    for s in slot_counts:
        print(bench_slots(s, wire=wire))


if __name__ == "__main__":
    main()
