"""The deployable-serving bench harness (benchmarks/daemon_bench.py).

Tiny CPU-pinned end-to-end runs: the harness must produce every promised
row (aggregate RTF per wire, client-observed verdict percentiles, server
tick percentiles) from a REAL server subprocess over real sockets, for
both the single daemon and the 2-process fleet.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import daemon_bench  # noqa: E402


@pytest.mark.slow
def test_daemon_bench_rows_complete():
    rows = daemon_bench.bench_daemon(
        n_streams=3, phase_s=1.0, reps=2, warm_s=0.5,
        env={"JAX_PLATFORMS": "cpu"},
    )
    for w in ("i16", "ulaw"):
        assert rows[f"daemon3_{w}_aggregate_rtf"] > 0
        p50 = rows[f"daemon3_{w}_verdict_ms_p50"]
        p95 = rows[f"daemon3_{w}_verdict_ms_p95"]
        p99 = rows[f"daemon3_{w}_verdict_ms_p99"]
        assert 0 < p50 <= p95 <= p99
    assert rows["daemon3_ticks_measured"] >= 1
    assert rows["daemon3_tick_ms_p50"] <= rows["daemon3_tick_ms_p99"]
    assert rows["daemon3_overflows"] == 0


@pytest.mark.slow
def test_fleet_bench_rows_complete():
    rows = daemon_bench.bench_fleet(
        n_servers=2, n_streams=4, phase_s=1.0, reps=1
    )
    for w in ("i16", "ulaw"):
        assert rows[f"fleet2x4_{w}_aggregate_rtf"] > 0
        assert (
            0
            < rows[f"fleet2x4_{w}_verdict_ms_p50"]
            <= rows[f"fleet2x4_{w}_verdict_ms_p99"]
        )
