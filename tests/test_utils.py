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


def test_blueprint_spec_matches_reference_entity_paths():
    """The blueprint analogue (Viewer.cpp:8's visual_odometry.rbl) must
    cover the world view and all three camera feeds, and degrade to
    None without the SDK."""
    from kbslam.viz.rerun_viewer import (BLUEPRINT_SPEC, HAVE_RERUN,
                                         make_blueprint)

    assert BLUEPRINT_SPEC["world"]["origin"] == "/world"
    for feed in ("rgb", "depth", "mask"):
        assert BLUEPRINT_SPEC[feed]["origin"] == f"/camera/0/{feed}"
    bp = make_blueprint()
    assert (bp is None) == (not HAVE_RERUN)
