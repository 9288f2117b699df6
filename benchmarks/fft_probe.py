"""Probe: factorized-DFT frontends vs the shipped dense-basis v4 kernel.

Round-3 ROOFLINE rejected FFT factorization by argument ("small-radix
stages utilize the 256-lane MXU far worse per pass") while the measured
decomposition says the dense DFT GEMM is ~85% of kernel time — the one
perf door closed by assertion instead of measurement (VERDICT r3 #1).
This probe closes it with data.  Candidates, all computing the one-sided
800-point power spectrum (bins 0..400) per hop-400 window:

  rfft          jnp.abs(jnp.fft.rfft(frames))**2 — XLA's native TPU FFT,
                f32 (exceeds the parity gate by construction).
  ct_bf16x3     two-stage Cooley-Tukey GEMM factorization, 800 = 32x25:
                inner 25-point DFT over n2 (n = n1 + 32*n2), f32 twiddle
                by W_800^{n1*m}, outer 32-point DFT over n1, one-sided
                truncation j <= 16 (k = m + 25*j).  Both stages bf16x3
                (the precision the 1e-3 parity gate requires, measured in
                round 2).  ~66k algorithmic FLOP/window vs the dense
                formulation's ~819k.
  ct_bf16x1     same, single-pass bf16 — the *optimistic floor* for any
                factorized variant (known to fail the parity gate; if even
                this loses, the door is closed).
  dense_bf16x3  the dense one-sided [800, 1024] cos|sin basis as a plain
                XLA 3-pass GEMM (the formulation the Pallas kernels
                optimize; HBM-bound on its [*, 1024] parts output).
  v4_full       the SHIPPED packed-basis Pallas kernel via its public
                wrapper — the incumbent anchor.  Note it amortizes the
                50% window overlap (each hop-400 block projected once,
                parity-combined into two windows) and runs the whole
                mel/log/DCT epilogue, so its per-window time covers MORE
                work than the DFT-only candidates above.

Why the algorithmic 12x FLOP saving is expected NOT to materialize (the
measurement confirms or refutes this): the MXU executes 128-wide K and
lane tiles, so stage-1 [B*32, 25]x[25, 50] pads K 25->128 and N 50->128
(a ~10x executed-FLOP inflation), and stage-2 [B*25, 64]x[64, 68] pads
similarly; per window the factorized form EXECUTES ~1.9 MFLOP/pass vs the
dense block formulation's ~0.92 MFLOP/pass — more, despite 12x fewer
algorithmic FLOPs — plus two relayout transposes and a VPU twiddle the
dense form doesn't have.  Reference for the stage being replaced:
streamz-rs/src/lib.rs:296 (rustfft process call).

Run on TPU:  python benchmarks/fft_probe.py [--iters N]
Prints one JSON line per candidate: {"variant", "ns_per_win", "win_per_s",
"max_rel_err"} (error vs the float64 numpy power spectrum).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

N = 800
N1, N2 = 32, 25          # n = n1 + N1_STRIDE... decimation n = n1 + 32*n2
N_BINS = 401
N_J = 17                 # outer bins kept: k = m + 25*j, j<=16 covers k<=416
ITERS = 16


def _bf16_split_np(a: np.ndarray):
    import ml_dtypes

    a = a.astype(np.float32)
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _dot3(x, w_hi, w_lo):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    p = jnp.dot(xh, w_hi, preferred_element_type=jnp.float32)
    p += jnp.dot(xh, w_lo, preferred_element_type=jnp.float32)
    p += jnp.dot(xl, w_hi, preferred_element_type=jnp.float32)
    return p


def _dot1(x, w_hi, _w_lo):
    return jnp.dot(x.astype(jnp.bfloat16), w_hi,
                   preferred_element_type=jnp.float32)


def make_ct(dot):
    """Two-stage Cooley-Tukey GEMM power spectrum, 800 = 32 x 25.

    n = n1 + 32*n2 (n1 in [0,32), n2 in [0,25)); k = m + 25*j.
      inner: Y[n1, m] = sum_n2 x[n1 + 32 n2] * W25^{n2 m}      (25-pt DFT)
      twiddle: Z[n1, m] = Y[n1, m] * W800^{n1 m}
      outer: X[m + 25 j] = sum_n1 Z[n1, m] * W32^{n1 j}        (32-pt DFT)
    """
    # Inner-stage basis [25, 50]: cos | -sin over m in [0, 25).
    n2 = np.arange(N2)[:, None]
    m = np.arange(N2)[None, :]
    ang2 = 2.0 * np.pi * n2 * m / N2
    inner = np.concatenate([np.cos(ang2), -np.sin(ang2)], axis=1)  # [25, 50]
    in_hi, in_lo = _bf16_split_np(inner)

    # Twiddle W800^{n1 m} as f32 planes [32, 25].
    n1g = np.arange(N1)[:, None]
    ang_t = 2.0 * np.pi * n1g * np.arange(N2)[None, :] / N
    tc = jnp.asarray(np.cos(ang_t), dtype=jnp.float32)
    ts = jnp.asarray(-np.sin(ang_t), dtype=jnp.float32)

    # Outer-stage basis over n1, K-stacked for [Zc | Zs] inputs, N-packed
    # Re | Im outputs: [64, 2*N_J].
    j = np.arange(N_J)[None, :]
    ang1 = 2.0 * np.pi * n1g * j / N1
    c1, s1 = np.cos(ang1), np.sin(ang1)
    # Xr = Zc@c1 + Zs@s1 ; Xi = -Zc@s1 + Zs@c1   (Z = Zc + i Zs, W = c - i s)
    outer = np.block([[c1, -s1], [s1, c1]])  # [[Zc],[Zs]] rows -> [Re|Im]
    out_hi, out_lo = _bf16_split_np(outer)

    def ct_power(frames):  # [B, 800] f32 -> scalar-consumable power
        B = frames.shape[0]
        x = frames.reshape(B, N2, N1)            # [b, n2, n1]
        x = jnp.transpose(x, (0, 2, 1))          # [b, n1, n2]
        y = dot(x.reshape(B * N1, N2), in_hi, in_lo)   # [B*32, 50]
        y = y.reshape(B, N1, 2 * N2)
        yc, ys = y[:, :, :N2], y[:, :, N2:]
        zc = yc * tc - ys * ts
        zs = yc * ts + ys * tc
        z = jnp.concatenate([zc, zs], axis=1)    # [b, 2*n1, m]
        z = jnp.transpose(z, (0, 2, 1))          # [b, m, 2*n1]
        xri = dot(z.reshape(B * N2, 2 * N1), out_hi, out_lo)  # [B*25, 2*17]
        xr, xi = xri[:, :N_J], xri[:, N_J:]
        return xr * xr + xi * xi                 # [B*25, 17]: bin k = m+25j

    def ct_power_ordered(frames):  # [B, 401] in k order, for parity checks
        B = frames.shape[0]
        p = ct_power(frames).reshape(B, N2, N_J)     # [b, m, j]
        p = jnp.transpose(p, (0, 2, 1)).reshape(B, N2 * N_J)
        return p[:, :N_BINS]

    return ct_power, ct_power_ordered


def make_dense(dot):
    n = np.arange(N)[:, None]
    k = np.arange(512)[None, :]
    ang = 2.0 * np.pi * n * k / N
    mask = (k < N_BINS).astype(np.float64)
    basis = np.concatenate([np.cos(ang) * mask, -np.sin(ang) * mask], axis=1)
    b_hi, b_lo = _bf16_split_np(basis)

    def dense_power(frames):
        parts = dot(frames, b_hi, b_lo)          # [B, 1024]
        re, im = parts[:, :512], parts[:, 512:]
        return re * re + im * im

    return dense_power, lambda f: dense_power(f)[:, :N_BINS]


def _time(fn, frames, iters):
    @jax.jit
    def chained(f):
        def body(c, _):
            return jnp.sum(fn(f + c)) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chained(frames))  # compile + warm
    times = []
    for _ in range(3):
        t = time.perf_counter()
        float(chained(frames))
        times.append(time.perf_counter() - t)
    return sorted(times)[1] / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/streamz_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    iters = ITERS
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    n_win = 32 * 1024
    rng = np.random.default_rng(0)
    frames_np = rng.normal(0.0, 0.1, size=(n_win, N)).astype(np.float32)
    frames = jnp.asarray(frames_np)

    # float64 reference power spectrum on a checking subset
    chk = 256
    ref = np.abs(np.fft.rfft(frames_np[:chk].astype(np.float64), axis=1)) ** 2
    scale = np.abs(ref).max()

    ct3, ct3_ord = make_ct(_dot3)
    ct1, ct1_ord = make_ct(_dot1)
    dense3, dense3_ord = make_dense(_dot3)

    def rfft_power(f):
        return jnp.abs(jnp.fft.rfft(f, axis=1)) ** 2

    from streamz_tpu.dsp.pallas_mfcc import mfcc_base_pallas_v4

    def v4_full(f):
        # Incumbent anchor: full shipped kernel on an equivalent window
        # count.  Feed pcm with n_win hop-400 blocks -> n_win-1 windows
        # (and the whole mel/log/DCT epilogue included).
        return mfcc_base_pallas_v4(f)

    pcm = jnp.asarray(
        rng.normal(0.0, 0.1, size=(1, (n_win + 1) * 400)).astype(np.float32)
    )

    variants = [
        ("dense_xla_bf16x3", dense3, dense3_ord, frames, n_win),
        ("ct_bf16x3", ct3, ct3_ord, frames, n_win),
        ("ct_bf16x1", ct1, ct1_ord, frames, n_win),
        ("v4_full_shipped", v4_full, None, pcm, n_win),
        # rfft LAST (and preferably in its own process via --only): XLA's
        # FFT lowering on the tunnel-attached chip is the likeliest wedge.
        ("rfft", rfft_power, lambda f: rfft_power(f)[:, :N_BINS], frames, n_win),
    ]
    if "--only" in sys.argv:
        want = sys.argv[sys.argv.index("--only") + 1].split(",")
        variants = [v for v in variants if v[0] in want]
    for name, fn, ordered, arg, nw in variants:
        try:
            if ordered is not None:
                got = np.asarray(jax.jit(ordered)(arg[:chk]))
                err = float(np.abs(got - ref).max() / scale)
            else:
                err = None
            t = _time(fn, arg, iters)
            print(json.dumps({
                "variant": name,
                "ns_per_win": round(1e9 * t / nw, 2),
                "win_per_s": round(nw / t, 1),
                "max_rel_err": None if err is None else float(f"{err:.3e}"),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
