"""Logging / profiling utility tests."""
import numpy as np

from kbslam.utils.logging import log, info, error
from kbslam.utils.profiling import StageTimer


def test_logging_gated(capsys, monkeypatch):
    monkeypatch.delenv("KBSLAM_DEBUG", raising=False)
    log("hidden")
    info("hidden")
    error("shown")
    cap = capsys.readouterr()
    assert "hidden" not in cap.out
    assert "shown" in cap.err

    monkeypatch.setenv("KBSLAM_DEBUG", "1")
    info("now visible")
    assert "now visible" in capsys.readouterr().out


def test_stage_timer():
    t = StageTimer()
    for _ in range(3):
        with t.span("track"):
            x = np.ones(1000).sum()
    with t.span("ba"):
        pass
    s = t.summary()
    assert s["track"]["count"] == 3
    assert s["ba"]["count"] == 1
    assert "track" in t.report()
