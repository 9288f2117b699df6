"""Ledger-citation fence (VERDICT r4 #1).

Round 4's ROOFLINE described a "BENCH_r04.json" whose numbers belonged to a
different (unarchived builder) session — the second occurrence of the
numbers-attributed-to-artifacts-that-don't-back-them defect class (ADVICE
r3 #1).  This fence makes that class mechanically impossible to recommit:

- every ``BENCH_rN`` citation in the ledgers must refer to a *committed*
  ``BENCH_rN.json`` (no prospective naming of driver artifacts);
- every numeric claim adjacent to such a citation (M win/s, vs_baseline,
  exec-TF session peak, the serve64 i16/u8 pair, util_vs_session_peak)
  must match the committed JSON within rounding tolerance.

The checker is a plain function over (text, artifacts) so the self-test can
replay round 4's actual mismatch and assert it would have been caught.
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every ledger a reader (or the judge) would take numbers from.
DOCS = [
    "benchmarks/ROOFLINE.md",
    "BASELINE.md",
    "README.md",
    "PARITY.md",
    "ROADMAP.md",
    "QUIRKS.md",
    "DESIGN.md",
    "MIGRATION.md",
]


def committed_artifacts() -> dict:
    """round number -> parsed JSON dict for every committed BENCH_rN.json."""
    out = {}
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        with open(p) as f:
            d = json.load(f)
        out[int(m.group(1))] = d.get("parsed") or {}
    return out


def _cited_rounds(para: str) -> list:
    """Round numbers cited in a paragraph, expanding r01–r03 style ranges."""
    rounds = set()
    for m in re.finditer(r"BENCH_r(\d+)(?:[–—-]r?(\d+))?", para):
        lo = int(m.group(1))
        hi = int(m.group(2)) if m.group(2) else lo
        rounds.update(range(lo, hi + 1))
    return sorted(rounds)


def _close(claim: float, actual, rel: float = 0.01, abs_tol: float = 0.0) -> bool:
    if actual is None:
        return False
    actual = float(actual)
    return abs(claim - actual) <= max(abs_tol, rel * abs(actual))


# (pattern, [json keys], transform(actual)->claim-scale, abs tolerance)
# Each extractor yields claims that must match the cited artifact(s).
def _claims(para: str):
    for m in re.finditer(r"(\d+(?:\.\d+)?)\s*M win/s", para):
        yield ("value (M win/s)", float(m.group(1)),
               lambda a: (None if a.get("value") is None
                          else a["value"] / 1e6), 0.06)
    for m in re.finditer(r"vs_baseline\s+(\d+(?:\.\d+)?)", para):
        yield ("vs_baseline", float(m.group(1)),
               lambda a: a.get("vs_baseline"), 0.6)
    # "measured 862×/1097×/954×" — per-round vs_baseline lists.
    for m in re.finditer(r"measured\s+((?:\d+(?:\.\d+)?×/?)+)", para):
        for part in m.group(1).split("/"):
            part = part.strip().rstrip("×")
            if part:
                yield ("vs_baseline", float(part),
                       lambda a: a.get("vs_baseline"), 0.6)
    for m in re.finditer(r"(\d+(?:\.\d+)?)\s*exec-TF", para):
        yield ("session_peak_tflops", float(m.group(1)),
               lambda a: a.get("session_peak_tflops"), 0.15)
    for m in re.finditer(
        r"serve64 i16/u8\s+(\d+(?:\.\d+)?)×/(\d+(?:\.\d+)?)×", para
    ):
        yield ("serve64_aggregate_rtf", float(m.group(1)),
               lambda a: a.get("serve64_aggregate_rtf"), 0.15)
        yield ("serve64_aggregate_rtf_ulaw", float(m.group(2)),
               lambda a: a.get("serve64_aggregate_rtf_ulaw"), 0.15)
    for m in re.finditer(r"util_vs_session_peak\s+(\d+(?:\.\d+)?)", para):
        yield ("util_vs_session_peak", float(m.group(1)),
               lambda a: a.get("util_vs_session_peak"), 0.006)


def check_text(text: str, artifacts: dict, where: str = "doc") -> list:
    """All citation violations in ``text`` against ``artifacts``.

    A paragraph citing a single round must have every adjacent claim match
    that round's committed JSON; a paragraph citing several rounds (e.g. a
    BENCH_r01–r03 summary) must have each claim match at least one of them.
    """
    violations = []
    for i, para in enumerate(re.split(r"\n\s*\n", text)):
        rounds = _cited_rounds(para)
        if not rounds:
            continue
        missing = [r for r in rounds if r not in artifacts]
        if missing:
            violations.append(
                f"{where} para {i}: cites BENCH_r{missing} with no committed"
                f" artifact (prospective naming is banned)"
            )
            continue
        cited = [artifacts[r] for r in rounds]
        for name, claim, getter, abs_tol in _claims(para):
            if not any(_close(claim, getter(a), abs_tol=abs_tol) for a in cited):
                actuals = [getter(a) for a in cited]
                violations.append(
                    f"{where} para {i}: claims {name}={claim} adjacent to a"
                    f" BENCH_r{rounds} citation, but the committed artifact(s)"
                    f" record {actuals}"
                )
    return violations


def test_every_bench_citation_matches_committed_artifact():
    artifacts = committed_artifacts()
    assert artifacts, "no committed BENCH_r*.json found at repo root"
    violations = []
    for rel in DOCS:
        p = os.path.join(ROOT, rel)
        if not os.path.exists(p):
            continue
        with open(p, encoding="utf-8") as f:
            violations += check_text(f.read(), artifacts, where=rel)
    assert not violations, "\n".join(violations)


def test_fence_catches_the_round4_mismatch():
    """Replay the actual round-4 defect: ROOFLINE attributed 24.0 M win/s /
    vs_baseline 810 / 61.1 exec-TF / serve64 315×/583× to BENCH_r04.json,
    whose committed content is 20.7 M / 1856.84 / 52.7 / 139.9×/284.1×.
    The fence must flag every one of those four claims."""
    bad = (
        "Round-4 re-verification (raw JSON archived by the driver as\n"
        "`BENCH_r04.json`): 24.0 M win/s (vs_baseline 810×),\n"
        "util_vs_session_peak 1.00 (61.1 exec-TF session peak), and\n"
        "serve64 i16/u8 315×/583× aggregate RTF.\n"
    )
    artifacts = {4: {
        "value": 20697827.7, "vs_baseline": 1856.84,
        "session_peak_tflops": 52.7, "util_vs_session_peak": 1.0,
        "serve64_aggregate_rtf": 139.9, "serve64_aggregate_rtf_ulaw": 284.1,
    }}
    v = check_text(bad, artifacts)
    flagged = " ".join(v)
    for field in ("value (M win/s)", "vs_baseline",
                  "session_peak_tflops", "serve64_aggregate_rtf"):
        assert field in flagged, (field, v)
    # And the corrected wording passes.
    good = (
        "The driver's round-4 artifact (`BENCH_r04.json`) recorded\n"
        "20.7 M win/s (vs_baseline 1856.84), util_vs_session_peak 1.00\n"
        "(52.7 exec-TF peak), serve64 i16/u8 139.9×/284.1×.\n"
    )
    assert check_text(good, artifacts) == []


def test_fence_rejects_prospective_artifact_naming():
    v = check_text("Next round `BENCH_r99.json` will show 50 M win/s.", {4: {}})
    assert v and "prospective" in v[0]


def test_suite_counts_in_ledgers_match_reality():
    """PARITY/ROADMAP/MIGRATION quote suite/test counts; they must equal
    the live collection (the 'keep the ledgers exact' discipline,
    mechanized).  Collection runs in a subprocess so this test sees the
    same set the user's `pytest tests/` would."""
    import re
    import subprocess
    import sys

    n_suites = len(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=300, cwd=ROOT,
    )
    # A partial collection failure still prints a (reduced) "N tests
    # collected, 1 error" line — distinguish a broken environment from
    # genuine ledger drift before comparing any counts.
    assert proc.returncode == 0, (
        f"collection itself failed (rc={proc.returncode}):\n"
        + proc.stdout[-2000:] + proc.stderr[-500:]
    )
    m = re.search(r"(\d+) tests collected", proc.stdout)
    assert m, proc.stdout[-2000:]
    n_tests = int(m.group(1))

    checks = [
        ("PARITY.md", rf"\({n_suites} suites, {n_tests} tests\)"),
        ("ROADMAP.md", rf"tests \({n_tests} passing\)"),
        ("MIGRATION.md", rf"{n_tests} tests / {n_suites} suites"),
    ]
    for rel, pattern in checks:
        with open(os.path.join(ROOT, rel), encoding="utf-8") as f:
            text = f.read()
        assert re.search(pattern, text), (
            f"{rel} does not carry the live counts "
            f"({n_suites} suites / {n_tests} tests): update the ledger"
        )
