"""Live-training web GUI: HTTP surface + train/pause + fly-through export.

The GUI runs its device work on the caller's thread (TrainingGUI.run);
the test drives HTTP requests from a helper thread while the training
loop runs, mirroring a browser session.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from test_training import make_trainer
from threedgrut_tpu.playground.live_gui import TrainingGUI


def _get(url, timeout=300):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


@pytest.fixture(scope="module")
def gui_session():
    tr = make_trainer("gs")
    gui = TrainingGUI(tr, center=(0.0, 0.0, 4.0), resolution=(64, 48),
                      port=18765, out_dir="/tmp/test_live_gui")
    gui.export_frames_per_key = 3
    base = gui.start()
    results = {}

    def browser():
        try:
            results["page"] = _get(base)
            results["state0"] = json.loads(_get(base + "state")[1])
            results["frame"] = _get(base + "frame.jpg?az=0.3&el=0.1&dist=5"
                                    "&mode=rgb")
            results["depth"] = _get(base + "frame.jpg?az=0&el=0&dist=5"
                                    "&mode=depth")
            results["points"] = _get(base + "frame.jpg?az=0&el=0&dist=5"
                                     "&mode=points")
            _get(base + "cmd?op=toggle_pause")
            time.sleep(0.2)
            results["paused_state"] = json.loads(_get(base + "state")[1])
            _get(base + "cmd?op=toggle_pause")
            # fly-through: two keys + export
            _get(base + "cmd?op=addkey&az=0&el=0&dist=5")
            _get(base + "cmd?op=addkey&az=1.0&el=0.2&dist=4")
            _get(base + "cmd?op=export")
            # wait for the device thread to render the video
            for _ in range(360):
                st = json.loads(_get(base + "state")[1])
                if st.get("video"):
                    results["video_state"] = st
                    results["video"] = _get(base + "video.mp4")
                    break
                time.sleep(0.5)
            results["final_state"] = json.loads(_get(base + "state")[1])
        finally:
            _get(base + "cmd?op=stop")

    t = threading.Thread(target=browser)
    t.start()
    gui.run(max_steps=60)          # device thread: trains + serves renders
    t.join(timeout=600)
    gui.stop()
    return results


class TestLiveGUI:
    def test_page_serves(self, gui_session):
        status, body = gui_session["page"]
        assert status == 200
        assert b"threedgrut_tpu live" in body

    def test_training_progresses(self, gui_session):
        st = gui_session["final_state"]
        assert st["step"] > 0
        assert np.isfinite(st["loss"])

    def test_frames_render(self, gui_session):
        for key in ("frame", "depth", "points"):
            status, body = gui_session[key]
            assert status == 200, key
            assert body[:2] == b"\xff\xd8", f"{key}: not a JPEG"

    def test_pause_toggle(self, gui_session):
        assert gui_session["paused_state"]["paused"] is True

    def test_flythrough_export(self, gui_session):
        assert "video" in gui_session, "video export never completed"
        status, body = gui_session["video"]
        assert status == 200
        assert len(body) > 1000
        assert gui_session["video_state"]["nkeys"] == 2
