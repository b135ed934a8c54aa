"""Web viewer: server round-trip with a dummy render callback."""

import urllib.request

import numpy as np

from threedgrut_tpu.playground.web_gui import ViewerServer, orbit_camera


def test_viewer_serves_frames():
    calls = []

    def render(az, el, dist):
        calls.append((az, el, dist))
        return np.full((32, 32, 3), 128, np.uint8)

    server = ViewerServer(render, resolution=(32, 32), port=18491)
    url = server.start(blocking=False)
    try:
        page = urllib.request.urlopen(url, timeout=10).read().decode()
        assert "threedgrut_tpu viewer" in page
        jpg = urllib.request.urlopen(
            url + "frame.jpg?az=0.5&el=0.1&dist=3", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        assert calls and abs(calls[-1][0] - 0.5) < 1e-6
    finally:
        server.stop()


def test_orbit_camera_looks_at_center():
    import jax.numpy as jnp
    from threedgrut_tpu.ops.quaternion import quat_to_rotmat

    cam = orbit_camera(0.3, 0.2, 5.0, center=(0, 0, 4))
    # camera center: -R^T t; forward = third row of R_wc^T... check the
    # center projects to the principal point
    r = quat_to_rotmat(cam.q_start)
    center_cam = r @ jnp.asarray([0.0, 0.0, 4.0]) + cam.t_start
    assert abs(float(center_cam[0])) < 1e-4
    assert abs(float(center_cam[1])) < 1e-4
    assert float(center_cam[2]) > 0
