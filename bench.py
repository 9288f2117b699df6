"""Benchmark harness: end-to-end identification pipeline, device vs CPU spec.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
*measured* reference-spec pipeline on CPU — the same algorithmic structure
the Rust binary executes per clip (its end-to-end hot path):

  1. MFCC+Δ+ΔΔ extraction (HOT LOOP A, ``streamz-rs/src/main.rs:500-508``) —
     the numpy golden spec, vectorized across windows (generous to the
     baseline: the reference FFTs one window at a time);
  2. the classifier forward per window (``src/lib.rs:880-891``) — computed
     per-window exactly as the reference does: its linear algebra is
     single-vector ndarray math with no batching (SURVEY.md §3.5);
  3. the vote-sum aggregation of ``identify_speaker`` (``src/lib.rs:1285-1303``).

``value`` is the device (TPU when available) throughput of the batched
jit-fused pipeline (Pallas/XLA frontend + batched forward + on-device vote
sums) in windows/s; ``vs_baseline`` is the speedup over the CPU spec.
Extra keys on the same line: ``frontend`` (the measured-winner backend,
benchmarks/ROOFLINE.md), ``algo_tflops``/``mfu`` (algorithmic FLOP/s and
its fraction of bf16 peak — the MFU convention), ``hw_util`` (executed
FLOP/s incl. padding and multi-pass bf16 emulation, over the same peak —
what the MXU actually streams), and the self-attribution set (VERDICT
r4 #3): ``cpu_windows_per_sec`` (the vs_baseline denominator),
``norm_win_per_s_per_tf`` / ``prior_norm_median`` / ``vs_prior_norm`` /
``perf_flag`` (throttle-normalized rate fenced against every committed
``BENCH_r*.json`` — see :func:`annotate_cross_round`), and ``attempts``
(stamped by the supervisor).  Serve rows are measured wire-interleaved
(``serve_bench.bench_slots_interleaved``).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_CLASSES = 64  # plausible grown speaker count; capacity pads to 128


def _make_net():
    from streamz_tpu.nn.model import SpeakerNet

    return SpeakerNet.new(output=_CLASSES, seed=0)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeat bench runs skip the (slow,
    tunnel-bound) device compile."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# bf16 peak TFLOP/s per chip, keyed on device_kind substring (public specs).
_BF16_PEAK_TFLOPS = (
    ("v6", 918.0), ("v5p", 459.0), ("v5", 197.0), ("v4", 275.0),
    ("v3", 123.0), ("v2", 45.0),
)


def _bf16_peak() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for tag, peak in _BF16_PEAK_TFLOPS:
        if tag in kind:
            return peak * 1e12
    return 197.0e12  # assume v5e-class when unknown


def _pick_frontend():
    """The measured winner (XLA vs Pallas v3) on this chip; see
    benchmarks/ROOFLINE.md for the policy."""
    from streamz_tpu.dsp import features as feats
    from streamz_tpu.dsp.mfcc import mfcc_features

    try:
        name = feats.autotune_frontend()
        return name, feats.frontend_core(name)
    except Exception:
        return "jax", mfcc_features


def _bench_device(net, frontend_core, batch_clips: int = 32,
                  clip_seconds: float = 10.0, iters: int = 50):
    import jax
    import jax.numpy as jnp

    from streamz_tpu import config
    from streamz_tpu.dsp.mfcc import window_count
    from streamz_tpu.nn.model import forward

    rate = config.DEFAULT_SAMPLE_RATE
    t = int(clip_seconds * rate)
    t -= t % config.HOP_SIZE
    n_win = (t - config.WINDOW_SIZE) // config.HOP_SIZE + 1

    rng = np.random.default_rng(0)
    pcm = jnp.asarray(
        rng.normal(0.0, 0.1, size=(batch_clips, t)).astype(np.float32)
    )
    n_samples = jnp.full((batch_clips,), t, jnp.int32)
    params = net.params
    num_speakers = net.num_speakers

    def pipeline(pcm, n_samples):
        feats = frontend_core(pcm, n_samples)             # [B, W, 60]
        probs = forward(params, feats, num_speakers)      # [B, W, cap]
        valid = (
            jnp.arange(feats.shape[1])[None, :]
            < window_count(n_samples)[:, None]
        )
        return (probs * valid[..., None]).sum(axis=1)     # vote sums

    # Iterations are chained through a data dependency inside one jitted
    # scan, and only a scalar is read back: the axon tunnel's
    # block_until_ready does not reliably block, and bulk host readbacks
    # would measure the tunnel, not the chip.
    @jax.jit
    def chained(pcm, n_samples):
        def body(c, _):
            sums = pipeline(pcm + c, n_samples)
            # Consume via a per-clip max (argmax-like, the app's own
            # aggregation): a plain sum over classes would equal the valid
            # window count if the algebraic simplifier ever cancels
            # softmax's exp/Σexp, deleting the classifier GEMMs.  (Checked:
            # today's HLO keeps them even under sum; max is structurally
            # collapse-proof.)
            return jnp.sum(jnp.max(sums, axis=-1)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(pcm, n_samples))  # compile + warm
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(chained(pcm, n_samples))
        best = min(best, (time.perf_counter() - start) / iters)

    # Two FLOP counts per invocation (see benchmarks/ROOFLINE.md):
    # - algorithmic (MFU convention — useful math only, unpadded, one pass):
    #   DFT 2*400*(2*401) + mel 2*401*20 + DCT 2*20*20 + classifier
    #   2*(60*H1 + H1*H2 + H2*live)
    # - executed, from XLA cost_analysis (includes padding and the Pallas
    #   kernel's bf16x3 passes): what the MXU actually streams.
    from streamz_tpu import config as _cfg

    live = int(net.num_speakers)
    algo_per_win = (
        2 * 400 * (2 * 401) + 2 * 401 * _cfg.N_MELS + 2 * _cfg.N_MELS * 20
        + 2 * (60 * _cfg.HIDDEN1 + _cfg.HIDDEN1 * _cfg.HIDDEN2
               + _cfg.HIDDEN2 * live)
    )
    algo_flops = batch_clips * n_win * algo_per_win
    try:
        cost = jax.jit(pipeline).lower(pcm, n_samples).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        exec_flops = float(cost["flops"])
        if not exec_flops > 0:
            raise ValueError(exec_flops)
    except Exception:
        exec_flops = algo_flops
    return batch_clips * n_win / best, algo_flops / best, exec_flops / best


def _bench_cpu_baseline(net, clip_seconds: float = 3.0, iters: int = 2):
    from streamz_tpu import config
    from streamz_tpu.dsp.mfcc_ref import extract_features_np

    w1 = np.asarray(net.params["w1"]); b1 = np.asarray(net.params["b1"])
    w2 = np.asarray(net.params["w2"]); b2 = np.asarray(net.params["b2"])
    w3, b3 = net.output_layer()

    def forward_one(x):
        # Reference forward: per-window single-vector math (src/lib.rs:880-891).
        h1 = np.maximum(x @ w1 + b1, 0.0)
        h2 = np.tanh(h1 @ w2 + b2)
        z = h2 @ w3 + b3
        e = np.exp(z - z.max())
        return e / e.sum()

    rate = config.DEFAULT_SAMPLE_RATE
    t = int(clip_seconds * rate)
    rng = np.random.default_rng(1)
    clip = (rng.normal(0, 3000, size=t)).astype(np.int16)

    feats = extract_features_np(clip)  # warm
    sums = np.zeros(w3.shape[1])
    for win in feats:
        sums += forward_one(win)

    start = time.perf_counter()
    n_win = 0
    for _ in range(iters):
        feats = extract_features_np(clip)
        sums = np.zeros(w3.shape[1])
        for win in feats:
            sums += forward_one(win)
        int(sums.argmax())
        n_win += len(feats)
    elapsed = time.perf_counter() - start
    return n_win / elapsed


def _norm_rate(parsed: dict):
    """windows/s per session-peak-TFLOP — the cross-round comparable rate.

    Dividing the headline by the same-session achievable MXU rate cancels
    tunnel/session throttle (both numerator and denominator scale with it),
    so what remains is kernel efficiency: executed-FLOPs-per-window and how
    well the pipeline streams relative to the canonical GEMM.  Measured
    r03/r04: 392.2 vs 392.7 k win/s/TF across sessions whose absolute rates
    differed 15% — the stability that makes this a regression fence.
    Caveat: when the pipeline itself sets the session peak
    (session_peak_source == "pipeline"), a kernel slowdown is visible in
    this ratio only once the pipeline falls below the canonical-GEMM probe.
    """
    try:
        v = float(parsed["value"])
        pk = float(parsed["session_peak_tflops"])
    except (KeyError, TypeError, ValueError):
        return None
    return v / pk if v > 0 and pk > 0 else None


def annotate_cross_round(result: dict, prior_dir=None,
                         threshold: float = 0.85) -> dict:
    """Self-attribution + regression fence for the bench JSON (VERDICT r4 #3).

    Adds ``norm_win_per_s_per_tf`` (this run, throttle-normalized),
    ``prior_norm_median`` over every committed ``BENCH_r*.json`` next to
    this file, ``vs_prior_norm`` (this/median) and ``perf_flag``
    ("ok" / "regression" when the normalized rate drops below
    ``threshold``x the prior median / "no_prior" / "no_norm").  Mutates and
    returns ``result`` so a reader of BENCH_rN.json alone can tell whether
    the device, the host CPU leg, or the kernels moved.
    """
    import glob

    if prior_dir is None:
        prior_dir = os.path.dirname(os.path.abspath(__file__))
    norm = _norm_rate(result)
    result["norm_win_per_s_per_tf"] = round(norm, 1) if norm else None
    priors = {}
    for p in sorted(glob.glob(os.path.join(prior_dir, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        n = _norm_rate(parsed)
        if n:
            priors[os.path.basename(p)] = n
    if not priors or not norm:
        result["prior_norm_median"] = None
        result["vs_prior_norm"] = None
        result["perf_flag"] = "no_prior" if norm else "no_norm"
        return result
    vals = sorted(priors.values())
    med = vals[len(vals) // 2]  # upper median; exactness is irrelevant here
    ratio = norm / med
    result["prior_norm_median"] = round(med, 1)
    result["vs_prior_norm"] = round(ratio, 3)
    result["perf_flag"] = "regression" if ratio < threshold else "ok"
    return result


# Shared wedge-proof preflight + canonical-GEMM peak probe: single
# implementation in streamz_tpu/runtime/measure.py, used by every harness
# (also benchmarks/gemm_probe.py, benchmarks/run_all.py).
def _wait_device_healthy(max_wait_s: float | None = None) -> bool:
    from streamz_tpu.runtime.measure import wait_device_healthy

    return wait_device_healthy(max_wait_s)


def _session_peak_tflops(iters: int = 8) -> float:
    from streamz_tpu.runtime.measure import session_peak_tflops

    return session_peak_tflops(iters)


def main() -> None:
    if not _wait_device_healthy():
        # Proceeding would hang at device-client init (wedged tunnel) and
        # burn the whole attempt window; exit so the supervisor retries a
        # cheap child instead and catches any recovery within minutes.
        print("device preflight never went healthy; giving up this attempt",
              file=sys.stderr)
        sys.exit(3)
    _enable_compile_cache()
    net = _make_net()
    frontend_name, frontend_core = _pick_frontend()
    # The chip's delivered rate drifts *within* a session (measured: the
    # canonical GEMM gave 38.9 TF minutes after the pipeline phase ran at
    # an effective ~57 TF), so bracket the pipeline with two peak
    # measurements and normalize against the larger one.
    try:
        peak_before = _session_peak_tflops()
    except Exception:
        peak_before = 0.0
    device_rate, algo_fps, exec_fps = _bench_device(net, frontend_core)
    try:
        peak_after = _session_peak_tflops()
    except Exception:
        peak_after = 0.0
    cpu_rate = _bench_cpu_baseline(net)
    peak = _bf16_peak()
    session_peak = max(peak_before, peak_after)
    exec_tflops = exec_fps / 1e12
    # The tunnel time-slices the chip, so the delivered rate drifts *within*
    # a session (measured 21-100% of nameplate).  When the pipeline itself
    # sustained a higher executed-FLOP rate than either bracketing
    # canonical-GEMM probe caught, the pipeline's own rate is the best
    # available lower bound on what the chip could do this session — use it
    # as the denominator (a ">1 utilization" would only measure probe
    # timing luck) and record which program set the peak.
    peak_source = "gemm_probe"
    if exec_tflops > session_peak:
        session_peak = exec_tflops
        peak_source = "pipeline"
    # Import once, outside both measurement blocks: an import-time
    # failure used to surface in the second block as a NameError that had
    # nothing to do with the ulaw path.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from serve_bench import bench_slots_interleaved
    except Exception:
        bench_slots_interleaved = None
    # Multi-stream serving at 64 slots, i16 and G.711 mu-law u8 wires
    # measured on ONE fleet with the timing batches interleaved wire-wise,
    # so a tunnel-degraded phase cannot land on a single wire and fake a
    # wire effect (VERDICT r4 weak #2; benchmarks/serve_bench.py has the
    # full slot-count sweep and the methodology note).
    serve_rtf = serve_rtf_ulaw = None
    try:
        if bench_slots_interleaved:
            rows = bench_slots_interleaved(64, ticks=10, reps=2)
            serve_rtf = rows["i16"]["aggregate_rtf"]
            serve_rtf_ulaw = rows["ulaw"]["aggregate_rtf"]
    except Exception:
        pass
    print(
        json.dumps(
            annotate_cross_round({
                "metric": "identify_pipeline_windows_per_sec",
                "value": round(device_rate, 1),
                "unit": "windows/s",
                "vs_baseline": round(device_rate / cpu_rate, 2),
                # The vs_baseline denominator, in the artifact itself: a
                # reader of BENCH_rN.json alone can now tell whether the
                # device or the (contended, 1-CPU) host leg moved when the
                # ratio swings across rounds (VERDICT r4 weak #3).
                "cpu_windows_per_sec": round(cpu_rate, 1),
                "frontend": frontend_name,
                "algo_tflops": round(algo_fps / 1e12, 2),
                "mfu": round(algo_fps / peak, 4),
                "hw_util": round(exec_fps / peak, 4),
                # Same-session achievable MXU rate (max of canonical-GEMM
                # probes bracketing the pipeline phase, and of the pipeline's
                # own executed rate) and utilization against it — the
                # denominator that separates session throttling from kernel
                # efficiency (benchmarks/ROOFLINE.md round 3).
                "exec_tflops": round(exec_tflops, 2),
                "session_peak_tflops": round(session_peak, 1),
                "session_peak_source": peak_source,
                "util_vs_session_peak": (
                    round(exec_fps / (session_peak * 1e12), 4)
                    if session_peak else None
                ),
                # 64 concurrent live streams, 100 ms chunks, i16 wire
                # (transfer-bound through the tunnel — ROOFLINE.md), and
                # the same fleet on the G.711 mu-law u8 wire.
                "serve64_aggregate_rtf": serve_rtf,
                "serve64_aggregate_rtf_ulaw": serve_rtf_ulaw,
            })
        )
    )


def _extract_json_line(out: str) -> str | None:
    """The bench JSON line from a child's stdout, ignoring any other noise."""
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                json.loads(line)
            except ValueError:
                continue
            return line
    return None


def _supervise() -> int:
    """Re-run the bench in child processes until one prints the JSON line.

    The axon tunnel can wedge *between* a successful health probe and the
    main process building its own device client (observed: the preflight
    subprocess passes, then ``get_backend('axon')`` raises UNAVAILABLE and
    the process dies with a traceback and no JSON).  A failed backend init
    is cached for the life of a JAX process, so recovery means a fresh
    process: supervise children until one succeeds or the budget runs out.
    Each child probes briefly (STREAMZ_BENCH_PREFLIGHT_S) and the long
    waiting happens across retries, so a child that wedges mid-run is
    killed and retried instead of eating the whole budget.
    """
    from streamz_tpu.runtime.procs import run_abandonable

    budget_s = float(os.environ.get("STREAMZ_BENCH_BUDGET_S", 4200.0))
    attempt_s = float(os.environ.get("STREAMZ_BENCH_ATTEMPT_S", 1800.0))
    sleep_s = float(os.environ.get("STREAMZ_BENCH_SLEEP_S", 60.0))
    deadline = time.monotonic() + budget_s
    env = dict(os.environ, STREAMZ_BENCH_CHILD="1")
    env.setdefault("STREAMZ_BENCH_PREFLIGHT_S", "240")
    attempt = 0
    last_err = ""
    while time.monotonic() < deadline:
        attempt += 1
        remaining = deadline - time.monotonic()
        rc, timed_out, out, err = run_abandonable(
            [sys.executable, "-u", os.path.abspath(__file__)],
            timeout=min(attempt_s, max(30.0, remaining)),
            env=env, capture=True,
        )
        if timed_out:
            err = (err + "\n[attempt timed out]").strip()
        found = _extract_json_line(out)
        if found:
            # Stamp how many attempts the artifact cost (VERDICT r4 #3):
            # a rate recorded on attempt 3 of a wedging session reads very
            # differently from a first-try success.
            rec = json.loads(found)
            rec["attempts"] = attempt
            print(json.dumps(rec))
            return 0
        last_err = err or out
        # Per-attempt failure tail (VERDICT r3 #6): without it, a driver
        # capture like "attempt 1 failed (rc=3)" is unattributable (wedged
        # tunnel vs real regression).  ~10 lines of the child's stderr —
        # or stdout when stderr is empty — travel with the rc.
        tail = "\n".join((err or out).strip().splitlines()[-10:])
        print(
            f"bench attempt {attempt} failed (rc={rc}); "
            f"{max(0.0, deadline - time.monotonic()):.0f}s of budget left"
            + (f"; child tail:\n{tail}" if tail else ""),
            file=sys.stderr,
        )
        if time.monotonic() + sleep_s < deadline:
            time.sleep(sleep_s)
    print(f"bench budget exhausted; last error:\n{last_err[-2000:]}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("STREAMZ_BENCH_CHILD"):
        # Supervisor self-test hooks (tests/test_bench_supervisor.py): fake
        # a child that dies before JSON, or one that prints noise + JSON.
        if os.environ.get("STREAMZ_BENCH_SELFTEST_FAIL"):
            print("selftest: dying before any JSON", file=sys.stderr)
            sys.exit(2)
        if os.environ.get("STREAMZ_BENCH_SELFTEST_OK"):
            print("WARNING: selftest noise line")
            print(json.dumps({"metric": "selftest", "value": 1, "unit": "n/a",
                              "vs_baseline": 1.0}))
            sys.exit(0)
        main()
    else:
        sys.exit(_supervise())
