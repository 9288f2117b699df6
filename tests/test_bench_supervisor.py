"""The bench harness's supervisor: JSON extraction + retry/budget loop."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

sys.path.pop(0)


def test_extract_json_line_filters_noise():
    good = json.dumps({"metric": "x", "value": 1})
    out = "\n".join([
        "WARNING: platform blah",
        "{not json, but has \"metric\"",   # malformed: skipped
        "  " + good,                        # padded: stripped and returned
        "{\"other\": 1}",                   # valid JSON, wrong shape
    ])
    assert bench._extract_json_line(out) == good
    assert bench._extract_json_line("no json here") is None


def test_supervisor_retries_and_exhausts_budget(tmp_path):
    """A child that always dies before printing JSON: the supervisor must
    retry within the budget and exit 1 without a stdout JSON line."""
    env = dict(
        os.environ,
        STREAMZ_BENCH_BUDGET_S="8",
        STREAMZ_BENCH_ATTEMPT_S="3",
        STREAMZ_BENCH_SLEEP_S="1",
        # Force the child to crash instantly at import-time device use.
        STREAMZ_BENCH_SELFTEST_FAIL="1",
        JAX_PLATFORMS="cpu",
    )
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode == 1
    assert bench._extract_json_line(proc.stdout) is None
    assert "bench attempt 1 failed" in proc.stderr
    # Per-attempt failure tails (VERDICT r3 #6): each failed attempt's
    # message carries the child's last stderr lines, so driver-recorded
    # artifacts are attributable without re-running.
    assert "child tail:" in proc.stderr
    assert "selftest: dying before any JSON" in proc.stderr
    assert "budget exhausted" in proc.stderr


def test_supervisor_forwards_child_json(tmp_path):
    """A child that prints noise + a JSON line: the supervisor forwards
    exactly the JSON line and exits 0."""
    env = dict(
        os.environ,
        STREAMZ_BENCH_SELFTEST_OK="1",
        JAX_PLATFORMS="cpu",
    )
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode == 0
    line = proc.stdout.strip()
    rec = json.loads(line)
    assert rec["metric"] == "selftest"


def test_supervisor_stamps_attempt_count():
    """The forwarded artifact carries how many attempts it cost (r4 #3)."""
    env = dict(os.environ, STREAMZ_BENCH_SELFTEST_OK="1", JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode == 0
    assert json.loads(proc.stdout.strip())["attempts"] == 1


def _write_prior(d, n, value, peak):
    with open(os.path.join(d, f"BENCH_r{n:02d}.json"), "w") as f:
        json.dump({"parsed": {
            "value": value, "session_peak_tflops": peak}}, f)


def test_cross_round_fence_flags_synthetic_regression(tmp_path):
    """Normalized-rate fence (VERDICT r4 #3): feed priors at ~393 k win/s
    per session-peak-TF (the real r03/r04 band) and a run whose normalized
    rate halved — the flag must trip; a same-band run must read ok; and the
    session-throttle case (both value and peak halved) must NOT trip."""
    _write_prior(tmp_path, 3, 23728496.2, 60.5)
    _write_prior(tmp_path, 4, 20697827.7, 52.7)

    ok = bench.annotate_cross_round(
        {"value": 22.0e6, "session_peak_tflops": 56.0}, prior_dir=str(tmp_path))
    assert ok["perf_flag"] == "ok"
    assert abs(ok["vs_prior_norm"] - 1.0) < 0.05
    assert ok["prior_norm_median"] is not None

    # Genuine kernel regression: same session peak, half the rate.
    bad = bench.annotate_cross_round(
        {"value": 11.0e6, "session_peak_tflops": 56.0}, prior_dir=str(tmp_path))
    assert bad["perf_flag"] == "regression"
    assert bad["vs_prior_norm"] < 0.85

    # Session throttle: device rate and achievable peak halve together —
    # the normalized rate is unchanged, so no false alarm.
    throttled = bench.annotate_cross_round(
        {"value": 11.0e6, "session_peak_tflops": 28.0}, prior_dir=str(tmp_path))
    assert throttled["perf_flag"] == "ok"


def test_cross_round_fence_degrades_gracefully(tmp_path):
    """No priors / no normalizable fields: annotated, never raising."""
    res = bench.annotate_cross_round(
        {"value": 1e6, "session_peak_tflops": 50.0}, prior_dir=str(tmp_path))
    assert res["perf_flag"] == "no_prior"
    res = bench.annotate_cross_round({"value": 1e6}, prior_dir=str(tmp_path))
    assert res["perf_flag"] == "no_norm"
    # Corrupt prior files are skipped, not fatal.
    with open(os.path.join(tmp_path, "BENCH_r09.json"), "w") as f:
        f.write("{not json")
    _write_prior(tmp_path, 3, 23728496.2, 60.5)
    res = bench.annotate_cross_round(
        {"value": 23.7e6, "session_peak_tflops": 60.5}, prior_dir=str(tmp_path))
    assert res["perf_flag"] == "ok"


def test_committed_artifacts_pass_their_own_fence():
    """The real BENCH_r03/r04 artifacts sit inside each other's band — the
    fence applied to the repo's own committed history reads ok."""
    parsed = json.load(open(os.path.join(REPO, "BENCH_r04.json")))["parsed"]
    res = bench.annotate_cross_round(dict(parsed), prior_dir=REPO)
    assert res["perf_flag"] == "ok", res
