"""The quickstart example runs end-to-end and classifies correctly."""

import runpy
import os


def test_quickstart(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runpy.run_path(os.path.join(repo, "examples", "quickstart.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "probe0 -> 0" in out
    assert "probe1 -> 1" in out
    assert "cosine match -> 1" in out
    assert "checkpoint round trip: 3 speakers" in out
