"""Runtime utilities: phase timer, trace no-op, watchdog."""

import time

from streamz_tpu.runtime.profiler import PhaseTimer, trace
from streamz_tpu.runtime.watchdog import watchdog


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.phases["a"] >= 0.02
    rep = t.report()
    assert "a" in rep and "b" in rep and "total" in rep


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not require jax or start a profiler


def test_watchdog_fires_and_clears(capsys):
    with watchdog("fast-phase", timeout_s=60.0):
        pass  # finishes long before the deadline; no output
    assert "[watchdog]" not in capsys.readouterr().err

    with watchdog("slow-phase", timeout_s=0.05):
        time.sleep(0.3)
    err = capsys.readouterr().err
    assert "slow-phase" in err and "[watchdog]" in err
