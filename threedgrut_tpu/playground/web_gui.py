"""Dependency-free web viewer for the playground / live training.

The reference ships polyscope and viser GUIs (threedgrut/utils/gui.py,
viser_gui_util.py, threedgrut_playground/ps_gui.py); neither library is
available in this environment, so this module provides a self-contained
HTTP viewer: a background http.server serving an HTML page with WASD/drag
camera controls that requests JPEG frames rendered on demand by a
user-supplied callback. Works in any browser, zero dependencies.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>threedgrut_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#v{display:block;margin:auto}#hud{position:fixed;top:8px;left:8px}</style>
</head><body>
<div id="hud">drag = orbit | wheel = dolly | r = reset</div>
<img id="v" width="__W__" height="__H__">
<script>
let az=0, el=0, dist=5, busy=false;
const img=document.getElementById('v');
async function refresh(){
  if(busy) return; busy=true;
  img.src = `/frame.jpg?az=${az}&el=${el}&dist=${dist}&t=${Date.now()}`;
  await img.decode().catch(()=>{}); busy=false;
}
let dragging=false, lx=0, ly=0;
img.onmousedown=e=>{dragging=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>dragging=false;
window.onmousemove=e=>{ if(!dragging) return;
  az+=(e.clientX-lx)*0.01; el+=(e.clientY-ly)*0.01;
  el=Math.max(-1.5,Math.min(1.5,el)); lx=e.clientX; ly=e.clientY; refresh();};
window.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001); refresh();};
window.onkeydown=e=>{if(e.key=='r'){az=0;el=0;dist=5;refresh();}};
refresh(); setInterval(refresh, 500);
</script></body></html>"""


class ViewerServer:
    """Serves an interactive orbit-camera view of a render callback.

    render_fn(azimuth, elevation, distance) -> uint8 RGB [H, W, 3].
    """

    def __init__(self, render_fn: Callable[[float, float, float], np.ndarray],
                 resolution=(512, 512), port: int = 8090):
        self.render_fn = render_fn
        self.resolution = resolution
        self.port = port
        self._server: Optional[ThreadingHTTPServer] = None

    def start(self, blocking: bool = False):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                from urllib.parse import parse_qs, urlparse

                url = urlparse(self.path)
                if url.path == "/":
                    page = (_PAGE.replace("__W__", str(viewer.resolution[0]))
                            .replace("__H__", str(viewer.resolution[1])))
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(page.encode())
                    return
                if url.path == "/frame.jpg":
                    q = parse_qs(url.query)
                    az = float(q.get("az", ["0"])[0])
                    el = float(q.get("el", ["0"])[0])
                    dist = float(q.get("dist", ["5"])[0])
                    img = viewer.render_fn(az, el, dist)
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(np.asarray(img, np.uint8)).save(
                        buf, format="JPEG", quality=90)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                self.send_response(404)
                self.end_headers()

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        if blocking:
            self._server.serve_forever()
        else:
            t = threading.Thread(target=self._server.serve_forever,
                                 daemon=True)
            t.start()
        return f"http://localhost:{self.port}/"

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server = None


def orbit_camera(azimuth: float, elevation: float, distance: float,
                 center=(0.0, 0.0, 4.0), resolution=(512, 512)):
    """Orbit camera around a center point (right-down-front convention)."""
    import jax.numpy as jnp

    from ..ops.cameras import make_pinhole
    from ..train.trainer import _rotmat_to_quat

    c = np.asarray(center, np.float64)
    eye = c + distance * np.asarray([
        np.cos(elevation) * np.sin(azimuth),
        -np.sin(elevation),
        -np.cos(elevation) * np.cos(azimuth)])
    fwd = c - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray([0.0, -1.0, 0.0]))
    if np.linalg.norm(right) < 1e-6:
        right = np.asarray([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    r_c2w = np.stack([right, down, fwd], axis=1)
    r_wc = r_c2w.T
    t_wc = -r_wc @ eye
    w, h = resolution
    return make_pinhole(resolution, (0.9 * w, 0.9 * w), (w / 2, h / 2),
                        t=t_wc.astype(np.float32),
                        q=_rotmat_to_quat(r_wc).astype(np.float32))
