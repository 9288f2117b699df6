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
