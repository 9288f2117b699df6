"""The multi-stream serving example runs end-to-end on the CPU mesh."""

import os
import runpy
import sys

import numpy as np


def test_multi_stream_serve_example(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(
        sys, "argv", ["multi_stream_serve.py", "3"], raising=False
    )
    runpy.run_path(
        os.path.join(repo, "examples", "multi_stream_serve.py"),
        run_name="__main__",
    )
    out = capsys.readouterr().out
    assert "final verdicts (exact offline parity):" in out
    for sid in range(3):
        assert f"stream {sid}: 3.0s audio -> speaker " in out
    assert "aggregate real-time" in out


def test_multi_stream_serve_example_ulaw_wire(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(
        sys, "argv", ["multi_stream_serve.py", "--wire=ulaw", "2"],
        raising=False,
    )
    runpy.run_path(
        os.path.join(repo, "examples", "multi_stream_serve.py"),
        run_name="__main__",
    )
    out = capsys.readouterr().out
    assert "G.711 ulaw wire" in out
    assert "final verdicts (exact offline parity):" in out
    assert "server stats:" in out
    # every dispatch rode the u8 wire
    assert "'i16': 0" in out and "'f32': 0" in out
