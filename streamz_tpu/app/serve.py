"""Multi-stream batched serving: N concurrent live streams on one program.

The reference's serving story is one microphone (`streamz-rs/examples/
live_stream.rs:1-9`, a stub).  On TPU the economics invert: a single
hop-400 stream keeps the MXU a fraction of a percent busy, so the
production-serving design batches MANY independent streams into every
dispatch — one fixed-shape program whose leading axis is the stream slot.

Design (TPU-first):

- The per-stream streaming step (:mod:`streamz_tpu.app.stream`) is already a
  pure function of carry × blocks, so the batched step is literally
  ``jax.vmap`` over the slot axis — same split-block GEMM formulation, same
  exact offline parity per stream, one dispatch per tick for the whole
  fleet.  No recompilation as streams come and go: the slot count is
  static, occupancy is data (``n_new = 0`` slots are algebraic no-ops).
- With a :class:`jax.sharding.Mesh` the slot axis is sharded across the
  data mesh (`NamedSharding(P('data'))`); each device serves
  ``n_streams / n_dev`` streams with zero cross-device traffic inside a
  tick — serving scales linearly over ICI-connected chips and the jitted
  step is identical on every device (SPMD).
- Host-side, each slot keeps only a <400-sample PCM remainder; ``tick()``
  drains up to ``block_batch`` hop blocks from every slot per dispatch.

Throughput: `benchmarks/serve_bench.py` measures aggregate real-time
factor vs slot count (one chip sustains hundreds of concurrent streams).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamz_tpu import config
from streamz_tpu.app.stream import (
    _make_stream_step,
    check_capacity_growth,
    grow_vote_carry,
    vote_verdict,
)
from streamz_tpu.dsp.mfcc import _to_f32
from streamz_tpu.io import g711


@lru_cache(maxsize=16)
def _batched_step(capacity: int, k: int):
    """vmapped streaming step over the stream-slot axis.

    Returns (f32_step, i16_step, u8_step).  The i16 entry takes raw int16
    blocks and converts on device — serving PCM is i16 on the wire, and
    shipping it unconverted halves the host→device transfer, the dominant
    cost of a tick through a remote tunnel (benchmarks/serve_bench.py).
    The u8 entry takes G.711-companded bytes plus the 256-entry decode
    table (mu-law or A-law, :mod:`streamz_tpu.io.g711`) and expands them on
    device — halving the wire again for telephony sources.
    """
    step = jax.vmap(_make_stream_step(capacity, k),
                    in_axes=(None, 0, 0, 0, None))

    def step_i16(params, carry, blocks_i16, n_new, num_speakers):
        # Division (not reciprocal-multiply) for bit parity with the host
        # conversion in dsp.mfcc._to_f32.
        blocks = blocks_i16.astype(jnp.float32) / 32767.0
        return step(params, carry, blocks, n_new, num_speakers)

    def step_u8(params, carry, codes_u8, n_new, num_speakers, table):
        # Table gather yields the exact linear i16 value (as f32, exact for
        # small integers), then the SAME /32767 conversion as the i16 wire:
        # a companded byte is bit-identical to host-decoding it to i16 and
        # shipping that (tests/test_serve.py::test_ulaw_wire_bit_parity).
        lin = table[codes_u8.astype(jnp.int32)]
        return step(params, carry, lin / 32767.0, n_new, num_speakers)

    return jax.jit(step), jax.jit(step_i16), jax.jit(step_u8)


@jax.jit
def _slot_votes_count(carry, sid):
    """One slot's verdict inputs packed as ``[capacity + 1]`` f32 — ONE
    device→host transfer per CURRENT poll instead of two (votes row, then
    count), which through a remote tunnel doubles per-poll latency and
    the server-lock hold time for every polling client."""
    return jnp.concatenate(
        [carry[4][sid], carry[6][sid].astype(jnp.float32)[None]]
    )


@jax.jit
def _all_votes_counts(carry):
    """EVERY slot's verdict inputs packed as ``[S, capacity + 1]`` f32 —
    ONE device→host transfer refreshes every stream's rolling verdict.
    Through a high-RTT link (the measured regime that motivates this: the
    TCP daemon behind a ~300 ms tunnel served CURRENT polls at p50 1.6 s
    because each poll paid its own readback RTT serialized under the
    server lock — benchmarks/daemon_bench.py) the ticker calls
    :meth:`MultiStreamIdentifier.refresh_verdicts` once per working tick
    and every CURRENT poll is then served host-side."""
    return jnp.concatenate(
        [carry[4], carry[6].astype(jnp.float32)[:, None]], axis=1
    )


@jax.jit
def _slot_state(carry, sid):
    """Extract one slot's full carry ON DEVICE for finalize — the previous
    host round trip pulled all 7 components to numpy and re-uploaded
    them (14 tunnel transfers per finalize)."""
    return tuple(c[sid] for c in carry)


class MultiStreamIdentifier:
    """Serve ``n_streams`` concurrent live identification streams batched.

    >>> srv = MultiStreamIdentifier(net, n_streams=64, threshold=0.5)
    >>> sid = srv.open()                  # claim a slot
    >>> srv.feed(sid, chunk)              # per-stream PCM, any chunk size
    >>> srv.tick()                        # ONE device dispatch for all slots
    >>> srv.current(sid)                  # rolling (speaker, confidence)
    >>> srv.finalize(sid)                 # exact offline-parity result
    >>> srv.close(sid)                    # slot becomes reusable

    With ``mesh`` the slot axis is sharded across the data mesh; slots are
    padded up to a multiple of the mesh size.
    """

    def __init__(
        self,
        net,
        n_streams: int,
        threshold: float = config.DEFAULT_CONF_THRESHOLD,
        block_batch: int = 16,
        mesh=None,
    ):
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        if jax.process_count() > 1:
            # Feeds/verdicts are host-local (device_put + np.asarray of the
            # carry require fully-addressable devices).  Multi-host serving
            # is per-host: run one server per process on its local mesh —
            # the harness for exactly that is streamz_tpu.app.fleet
            # (LocalFleet launcher + FleetClient round-robin placement;
            # per-host entry: ``python -m streamz_tpu.app.fleet``).
            # Verdict-parity with a single big fleet is pinned in
            # tests/test_fleet.py.
            raise NotImplementedError(
                "MultiStreamIdentifier is single-process: run one server "
                "per host via streamz_tpu.app.fleet (one "
                "`python -m streamz_tpu.app.fleet --checkpoint m.npz` per "
                "host + FleetClient round-robin in front)"
            )
        self.net = net
        self.threshold = float(threshold)
        self.k = int(block_batch)
        self.mesh = mesh
        # n_streams is the ADMISSION bound (what the operator configured);
        # n_slots pads it up to a mesh multiple for shape only — open()
        # never hands out a padding slot, or a --serve-streams capacity
        # plan would silently admit up to mesh_size-1 extra streams.
        self.n_streams = int(n_streams)
        n = self.n_streams
        if mesh is not None:
            nd = int(mesh.devices.size)
            n = -(-n // nd) * nd  # pad slots to fill every device shard
        self.n_slots = n
        cap = net.capacity
        self._step, self._step_i16, self._step_u8 = _batched_step(cap, self.k)
        self._sharding = None
        if mesh is not None:
            from streamz_tpu.parallel import comm

            # Shard the slot axis over EVERY mesh axis jointly (n_slots is
            # padded to mesh.devices.size above): robust to custom axis
            # names and to multi-axis meshes — a leading size-1 axis (e.g.
            # ('replica', 'data')) must not silently replicate the fleet.
            self._sharding = comm.batch_sharded(
                mesh, axis=tuple(mesh.axis_names)
            )

        S = self.n_slots
        carry = (
            jnp.zeros((S, 2 * config.N_FFT_BINS), jnp.float32),
            jnp.zeros((S,), jnp.float32),
            jnp.zeros((S, 4, config.MFCC_SIZE), jnp.float32),
            jnp.zeros((S,), jnp.int32),
            jnp.zeros((S, cap), jnp.float32),
            jnp.zeros((S, cap), jnp.float32),  # Kahan compensation
            jnp.zeros((S,), jnp.int32),
        )
        self._carry = self._place(carry)

        @jax.jit
        def zero_slot(carry, sid):
            return tuple(c.at[sid].set(0) for c in carry)

        self._zero_slot = zero_slot
        # host state per slot; _renc tags a uint8 remainder with its G.711
        # encoding ('ulaw' | 'alaw'), None for linear PCM remainders.
        self._rem: List[np.ndarray] = [
            np.zeros((0,), np.float32) for _ in range(S)
        ]
        self._renc: List[Optional[str]] = [None] * S
        self._tables: Dict[str, jax.Array] = {}
        self._open = [False] * S
        self._final: Dict[int, Optional[Tuple[int, float]]] = {}
        # observability counters (stats())
        self._n_dispatches = 0
        self._bytes_shipped = 0
        self._wire_counts: Dict[str, int] = {"u8": 0, "i16": 0, "f32": 0}
        # Host-side verdict snapshot [S, cap+1] (votes row + count), valid
        # only between refresh_verdicts() and the next carry mutation.
        # None = serve current() from a per-slot device readback (exact,
        # the pre-round-5 behavior; fine on low-RTT links).
        self._vcache: Optional[np.ndarray] = None

    def _table(self, enc: str):
        """Device-resident (replicated under a mesh) G.711 decode table."""
        tab = self._tables.get(enc)
        if tab is None:
            tab = jnp.asarray(g711.TABLES[enc][0])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                tab = jax.device_put(
                    tab, NamedSharding(self.mesh, PartitionSpec())
                )
            self._tables[enc] = tab
        return tab

    def _place(self, carry):
        if self._sharding is None:
            return tuple(jnp.asarray(c) for c in carry)
        return tuple(jax.device_put(c, self._sharding) for c in carry)

    # -- slot lifecycle ------------------------------------------------------

    def open(self) -> int:
        """Claim a free slot and return its stream id (only the configured
        ``n_streams`` are admissible; mesh-padding slots exist for shape)."""
        for sid in range(self.n_streams):
            if not self._open[sid]:
                self._open[sid] = True
                self._final.pop(sid, None)
                return sid
        raise RuntimeError(f"all {self.n_streams} stream slots in use")

    def close(self, sid: int) -> None:
        """Release a slot: its carry state is zeroed for the next stream."""
        self._check(sid)
        self._open[sid] = False
        self._final.pop(sid, None)
        self._rem[sid] = np.zeros((0,), np.float32)
        self._renc[sid] = None
        # Device-side single-row zeroing: no fleet-state round trip, and
        # under a mesh the update stays sharded.
        self._carry = self._zero_slot(self._carry, sid)
        if self._vcache is not None:
            self._vcache[sid] = 0.0  # mirror the zeroed row; cache stays valid

    def _check(self, sid: int) -> None:
        if not (0 <= sid < self.n_slots) or not self._open[sid]:
            raise KeyError(f"stream {sid} is not open")

    # -- model hot-swap --------------------------------------------------------

    def update_model(self, net) -> None:
        """Swap in an updated model for the WHOLE fleet without dropping any
        live stream — the serving counterpart of incremental discovery
        (training grows the classifier while streams are live; speaker ids
        are stable because growth only appends output columns,
        ``src/lib.rs:797-821``).  Same-capacity swaps are free: params are
        an argument of every dispatch.  Capacity growth zero-pads every
        slot's vote carry to the new width (on device, preserving the slot
        sharding) and re-resolves the jitted programs.  Already-finalized
        slots keep their verdicts."""
        pad = check_capacity_growth(self.net.capacity, net.capacity)
        self._vcache = None  # capacity/verdict basis may change
        if pad:
            self._carry = self._place(
                grow_vote_carry(self._carry, pad, batched=True)
            )
            self._step, self._step_i16, self._step_u8 = _batched_step(
                net.capacity, self.k
            )
            # _zero_slot retraces on the new carry shapes automatically.
        self.net = net

    # -- feeding -------------------------------------------------------------

    def feed(self, sid: int, pcm, encoding: Optional[str] = None) -> None:
        """Buffer the next PCM chunk (i16, f32, or G.711 bytes) for ``sid``.

        int16 chunks stay int16 on the host and convert on *device* —
        half the host→device bytes per tick, bit-identical features (the
        same ``/32767`` conversion runs in the jitted step).  With
        ``encoding='ulaw'`` or ``'alaw'`` the chunk is raw G.711-companded
        bytes — the telephony wire — kept as uint8 and expanded on device:
        half the bytes again, bit-identical to host-decoding to i16.
        """
        self._check(sid)
        if sid in self._final:
            raise RuntimeError(f"stream {sid} already finalized")
        if isinstance(pcm, (bytes, bytearray)):
            pcm = np.frombuffer(pcm, np.uint8)
        pcm = np.asarray(pcm)
        buf, tag = self._rem[sid], self._renc[sid]
        if encoding is not None:
            if encoding not in g711.TABLES:
                raise ValueError(f"unknown G.711 encoding {encoding!r}")
            if pcm.dtype != np.uint8:
                raise TypeError("G.711 chunks must be uint8 bytes")
            if len(buf) == 0 or tag == encoding:
                self._rem[sid] = np.concatenate(
                    [buf.astype(np.uint8), pcm]
                )
                self._renc[sid] = encoding
                return
            # Remainder holds a different representation: expand the G.711
            # chunk (exact i16 values) and fall through to the linear rules.
            pcm = g711.decode(pcm, encoding)
        elif pcm.dtype == np.uint8:
            raise TypeError(
                "uint8 chunks are ambiguous: pass encoding='ulaw'/'alaw' "
                "for G.711 bytes, or convert linear PCM to int16/float32"
            )
        if tag is not None:
            # Linear PCM after G.711 bytes: expand the buffered bytes
            # (exact) and continue on the linear wire.
            buf = g711.decode(buf, tag)
            self._renc[sid] = None
        if pcm.dtype == np.int16 and (buf.dtype == np.int16 or len(buf) == 0):
            self._rem[sid] = np.concatenate([buf.astype(np.int16), pcm])
        else:
            self._rem[sid] = np.concatenate([_to_f32(buf), _to_f32(pcm)])

    def pending_blocks(self) -> int:
        """Max number of full hop blocks buffered on any slot."""
        return max(
            (len(r) // config.HOP_SIZE for r in self._rem), default=0
        )

    def buffered_samples(self, sid: int) -> int:
        """Host-buffered samples waiting on one slot (transport-level
        backpressure accounting — see :mod:`streamz_tpu.app.server`)."""
        self._check(sid)
        return len(self._rem[sid])

    def stats(self) -> Dict[str, object]:
        """Serving counters for production observability: dispatch count,
        bytes shipped to the device, per-wire dispatch histogram, slot
        occupancy, and host-buffered backlog."""
        return {
            "dispatches": self._n_dispatches,
            "bytes_shipped": self._bytes_shipped,
            "wire_dispatches": dict(self._wire_counts),
            "open_slots": sum(self._open),
            "n_streams": self.n_streams,
            "n_slots": self.n_slots,
            "pending_blocks": self.pending_blocks(),
            "buffered_samples": sum(len(r) for r in self._rem),
        }

    def tick(self, drain: bool = True) -> int:
        """Process buffered PCM for ALL slots in batched dispatches.

        Each dispatch drains up to ``block_batch`` hop blocks per slot; with
        ``drain`` (default) dispatches repeat until no slot holds a full
        block.  Returns the number of dispatches issued.
        """
        block = config.HOP_SIZE
        S, k = self.n_slots, self.k
        dispatches = 0
        while True:
            counts = np.array(
                [
                    0 if sid in self._final else len(self._rem[sid]) // block
                    for sid in range(S)
                ],
                np.int32,
            )
            counts = np.minimum(counts, k)
            if not counts.any():
                return dispatches
            # One dtype per dispatch — the transfer is ONE dense
            # (S, k, block) array, so splitting by dtype would ship the
            # full-size buffer multiple times.  Narrowest wire that covers
            # every contributing slot exactly:
            #   u8  — all slots hold G.711 bytes of the SAME encoding
            #         (expanded on device via the table gather);
            #   i16 — no f32 remainder (G.711 slots host-expand to their
            #         exact i16 values, so mixing u8+i16 loses nothing);
            #   f32 — anything else.
            # Downgrades are transient: feed() returns a slot to its
            # narrow wire whenever its remainder empties, close() resets.
            live = [sid for sid in range(S) if counts[sid]]
            tags = {self._renc[sid] for sid in live}
            wire_u8 = (
                len(tags) == 1
                and None not in tags
                and all(self._rem[sid].dtype == np.uint8 for sid in live)
            )
            wire_i16 = not wire_u8 and all(
                self._rem[sid].dtype != np.float32 for sid in live
            )
            dtype = (
                np.uint8 if wire_u8
                else np.int16 if wire_i16
                else np.float32
            )
            blocks = np.zeros((S, k, block), dtype)
            for sid in live:
                nb = int(counts[sid])
                take = nb * block
                chunk = self._rem[sid][:take]
                if chunk.dtype == np.uint8 and not wire_u8:
                    chunk = g711.decode(chunk, self._renc[sid])
                if dtype == np.float32:
                    chunk = _to_f32(chunk)
                blocks[sid, :nb] = chunk.reshape(nb, block)
                self._rem[sid] = self._rem[sid][take:]
            # One transfer: device_put the host arrays straight into the
            # slot sharding (an asarray-then-reshard would ship them twice).
            if self._sharding is not None:
                xb = jax.device_put(blocks, self._sharding)
                xn = jax.device_put(counts, self._sharding)
            else:
                xb = jnp.asarray(blocks)
                xn = jnp.asarray(counts)
            if wire_u8:
                self._carry, _, _ = self._step_u8(
                    self.net.params,
                    self._carry,
                    xb,
                    xn,
                    jnp.int32(self.net.num_speakers),
                    self._table(next(iter(tags))),
                )
            else:
                step = self._step_i16 if wire_i16 else self._step
                self._carry, _, _ = step(
                    self.net.params,
                    self._carry,
                    xb,
                    xn,
                    jnp.int32(self.net.num_speakers),
                )
            dispatches += 1
            self._vcache = None  # carry advanced; snapshot is stale
            self._n_dispatches += 1
            self._bytes_shipped += blocks.nbytes + counts.nbytes
            self._wire_counts[
                "u8" if wire_u8 else "i16" if wire_i16 else "f32"
            ] += 1
            if not drain:
                return dispatches

    # -- results -------------------------------------------------------------

    def _verdict(self, votes, count) -> Optional[Tuple[int, float]]:
        return vote_verdict(
            votes, count, self.net.output_size(), self.threshold
        )

    def refresh_verdicts(self) -> None:
        """Pull EVERY slot's rolling-verdict inputs host-side in ONE
        device→host transfer; until the carry next advances, ``current()``
        is served from this snapshot with no device round trip.

        Votes only change at tick dispatches, so a post-tick snapshot is
        *exact* until the next working tick — call this right after
        ``tick()`` (the TCP daemon's ticker does) and N polling clients
        cost one readback per tick instead of one each.  Measured motive:
        behind a ~300 ms-RTT tunnel the daemon's per-poll readbacks,
        serialized under its lock, put CURRENT at p50 1.6 s for 64 streams
        (benchmarks/daemon_bench.py); amortized, a poll is host memory.
        Callers that never refresh keep the exact per-slot readback path.
        """
        # copy(): np.asarray of a jax array is a read-only view, and
        # close() mirrors its row-zeroing into this cache in place.
        self._vcache = np.asarray(_all_votes_counts(self._carry)).copy()

    def current(self, sid: int) -> Optional[Tuple[int, float]]:
        """Rolling identification for one stream (finalized frames so far)."""
        self._check(sid)
        if sid in self._final:
            return self._final[sid]
        if self._vcache is not None:
            vc = self._vcache[sid]
        else:
            vc = np.asarray(_slot_votes_count(self._carry, jnp.int32(sid)))
        return self._verdict(vc[:-1], float(vc[-1]))

    def finalize(self, sid: int) -> Optional[Tuple[int, float]]:
        """Flush ``sid``'s lookahead frames; identical to the offline
        pipeline on that stream's full PCM.  Drains every slot's buffered
        full blocks first (one batched dispatch — other streams' rolling
        state advances by exactly the audio they were already fed)."""
        self._check(sid)
        if sid in self._final:
            return self._final[sid]
        self.tick()  # drain any buffered full blocks first
        from streamz_tpu.app.stream import _programs

        fin = _programs(self.net.capacity, self.k)[1]
        slot = _slot_state(self._carry, jnp.int32(sid))
        votes, count, _, _ = fin(
            self.net.params, slot, jnp.int32(self.net.num_speakers)
        )
        res = self._verdict(np.asarray(votes), float(count))
        self._final[sid] = res
        return res
