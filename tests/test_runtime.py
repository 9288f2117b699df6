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


def test_no_autotune_escape(monkeypatch, tmp_path):
    """STREAMZ_NO_AUTOTUNE=1 skips measurement probes (static default, no
    pinning) while cached decisions are still honored."""
    import json

    from streamz_tpu.runtime import autotune

    monkeypatch.setattr(autotune, "on_tpu", lambda: True)
    cache = tmp_path / "cache.json"
    monkeypatch.setattr(autotune, "_CACHE_PATH", str(cache))
    monkeypatch.setenv("STREAMZ_NO_AUTOTUNE", "1")
    autotune.reset()

    probed = {"n": 0}

    def probe():
        probed["n"] += 1
        return 1.0

    # Cold cache: default wins, nothing probed, nothing pinned.
    got = autotune.measured_choice("t_stage", {"a": probe, "b": probe}, "b")
    assert got == "b" and probed["n"] == 0
    assert not cache.exists()

    # A cached decision still applies without probing.
    import jax

    key = f"t_stage:{jax.devices()[0].device_kind}"
    cache.write_text(json.dumps({key: "a"}))
    autotune.reset()
    got = autotune.measured_choice("t_stage", {"a": probe, "b": probe}, "b")
    assert got == "a" and probed["n"] == 0

    # With the escape off, the probe runs and pins the winner.
    monkeypatch.delenv("STREAMZ_NO_AUTOTUNE")
    cache.unlink()
    autotune.reset()
    got = autotune.measured_choice("t_stage", {"a": probe, "b": probe}, "b")
    assert probed["n"] == 2
    autotune.reset()
