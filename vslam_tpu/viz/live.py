"""Live trajectory/odometry viewer — the RViz channel without ROS.

Role parity: the reference's NodeMapping publishes, per frame, an
Odometry message (camera-in-world pose, its 6x6 covariance, and the twist),
a growing Path, and a TF transform; RViz subscribes and renders them live
(reference src/ros/nodes/NodeMapping.cpp:231-272 and
config/rviz/odom_eval.rviz). This module fills the same role with the
stdlib only:

- ``LiveViz`` is the publisher. ``publish_odometry`` / ``publish_keyframe``
  / ``publish_landmarks`` mirror the reference's /odom, keyframe markers
  and map-point cloud. Publishing is lock-guarded appends to an in-memory
  state — O(1) per frame, never on the device path, and safe to call from
  the pipelined retire thread.
- A background ``ThreadingHTTPServer`` exposes the state:
  ``GET /state.json`` is the message bus (poll it from any tool), and
  ``GET /`` serves a self-contained HTML page that polls state.json and
  renders a top-down SVG trajectory with pose/covariance/fps readouts —
  the RViz view, in a browser, with zero extra dependencies.

Conventions: publishers take WORLD->CAMERA poses (the pipeline's native
``Frame::pose`` convention) and the viewer displays camera-in-world, the
same inversion the reference applies at its publish boundary
(NodeMapping.cpp:238, ``pose().inverse()``).

The path ring decimates by 2 when it exceeds ``max_path`` points, so a
multi-hour run keeps a bounded, uniformly thinned trail (nav_msgs/Path in
the reference grows unboundedly; bounding it is deliberate).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..io.tum import matrix_to_quat
from ..utils.log import get_logger

_log = get_logger("viz")


def _cam_in_world(pose_w2c: np.ndarray) -> np.ndarray:
    """Invert a world->camera SE(3) matrix (R^T, -R^T t) without np.linalg."""
    T = np.asarray(pose_w2c, dtype=np.float64)
    out = np.eye(4)
    out[:3, :3] = T[:3, :3].T
    out[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return out


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>vslam_tpu live</title>
<style>
 body{background:#111;color:#ddd;font:13px monospace;margin:0;display:flex}
 #panel{padding:12px;min-width:260px}
 #panel h1{font-size:14px;margin:0 0 8px}
 #panel td{padding:1px 6px 1px 0}
 svg{flex:1;height:100vh;background:#181818}
 .path{fill:none;stroke:#4cc;stroke-width:1.5}
 .kf{fill:#fa0}.lm{fill:#555}.cur{fill:#f44}
</style></head><body>
<div id="panel"><h1>vslam_tpu live</h1><table id="stats"></table></div>
<svg id="view" viewBox="-1 -1 2 2" preserveAspectRatio="xMidYMid meet"></svg>
<script>
const fmt=(x,n=3)=>Number(x).toFixed(n);
async function tick(){
 try{
  const s=await (await fetch('state.json')).json();
  const rows=[['frames',s.n_frames],['keyframes',s.n_keyframes],
   ['landmarks',s.n_landmarks],['fps',fmt(s.fps,1)],
   ['t (s)',fmt(s.t_ns/1e9,3)],
   ['pos (m)',s.position.map(v=>fmt(v)).join(' ')],
   ['speed (m/s)',fmt(s.speed,3)],
   ['sigma_t (m)',fmt(s.sigma_translation,5)]];
  document.getElementById('stats').innerHTML=
   rows.map(r=>`<tr><td>${r[0]}</td><td>${r[1]}</td></tr>`).join('');
  const xs=s.path.map(p=>p[0]), zs=s.path.map(p=>p[2]);
  if(!xs.length) return;
  const lo=[Math.min(...xs),Math.min(...zs)], hi=[Math.max(...xs),Math.max(...zs)];
  const c=[(lo[0]+hi[0])/2,(lo[1]+hi[1])/2];
  const span=Math.max(hi[0]-lo[0],hi[1]-lo[1],0.1)*1.15;
  const X=x=>(x-c[0])/span*2, Z=z=>(z-c[1])/span*2;
  const pts=s.path.map(p=>`${X(p[0])},${Z(p[2])}`).join(' ');
  const kfs=s.keyframes.map(p=>
   `<circle class="kf" cx="${X(p[0])}" cy="${Z(p[2])}" r="0.018"/>`).join('');
  const lms=s.landmarks.map(p=>
   `<circle class="lm" cx="${X(p[0])}" cy="${Z(p[2])}" r="0.006"/>`).join('');
  const last=s.path[s.path.length-1];
  document.getElementById('view').innerHTML=
   lms+`<polyline class="path" points="${pts}"/>`+kfs+
   `<circle class="cur" cx="${X(last[0])}" cy="${Z(last[2])}" r="0.025"/>`;
 }catch(e){}
}
setInterval(tick,500); tick();
</script></body></html>
"""


class LiveViz:
    """In-process live odometry/path/map publisher + HTTP viewer.

    ``port=0`` binds an ephemeral port (read ``.port`` after construction);
    the server thread is a daemon so it never blocks interpreter exit, but
    call ``close()`` for deterministic shutdown (tests do).
    """

    def __init__(
        self,
        port: int = 0,
        host: str = "127.0.0.1",
        max_path: int = 4096,
        max_landmarks: int = 4096,
    ):
        self._lock = threading.Lock()
        self._max_path = int(max_path)
        self._max_landmarks = int(max_landmarks)
        self._path: list = []  # [x,y,z] camera-in-world
        self._keyframes: list = []
        self._landmarks: list = []
        self._n_frames = 0
        self._latest: dict = {
            "t_ns": 0,
            "position": [0.0, 0.0, 0.0],
            "quaternion": [0.0, 0.0, 0.0, 1.0],
            "sigma_translation": 0.0,
            "speed": 0.0,
            "fps": 0.0,
        }
        self._last_wall: Optional[float] = None
        self._fps_ema = 0.0

        viz = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # route HTTP chatter to our logger
                _log.debug("http: " + a[0], *a[1:])

            def do_GET(self):
                if self.path.split("?")[0] in ("/state.json", "/state"):
                    body = viz.state_json().encode()
                    ctype = "application/json"
                elif self.path in ("/", "/index.html"):
                    body = _PAGE.encode()
                    ctype = "text/html; charset=utf-8"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, int(port)), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="vslam-viz", daemon=True
        )
        self._thread.start()
        _log.info("live viz at http://%s:%d/", host, self.port)

    # -- publisher surface (NodeMapping::publish parity) ---------------------

    def publish_odometry(
        self,
        t_ns: int,
        pose_w2c: np.ndarray,
        cov: Optional[np.ndarray] = None,
        twist: Optional[np.ndarray] = None,
        wall_time: Optional[float] = None,
    ) -> None:
        """Per-frame odometry: pose (world->camera, inverted for display as
        the reference does at NodeMapping.cpp:238), optional 6x6 covariance
        (sigma_translation readout = sqrt trace of the 3x3 translation
        block), optional 6-twist (|v| readout = /odom twist role)."""
        T = _cam_in_world(pose_w2c)
        pos = T[:3, 3].tolist()
        quat = list(matrix_to_quat(T[:3, :3]))
        sigma_t = 0.0
        if cov is not None:
            c = np.asarray(cov, dtype=np.float64)
            sigma_t = float(np.sqrt(max(np.trace(c[:3, :3]), 0.0)))
        speed = 0.0
        if twist is not None:
            speed = float(np.linalg.norm(np.asarray(twist, np.float64)[:3]))
        if wall_time is None:
            import time

            wall_time = time.perf_counter()
        with self._lock:
            if self._last_wall is not None:
                dt = max(wall_time - self._last_wall, 1e-6)
                inst = 1.0 / dt
                self._fps_ema = (
                    inst if self._fps_ema == 0.0
                    else 0.9 * self._fps_ema + 0.1 * inst
                )
            self._last_wall = wall_time
            self._n_frames += 1
            self._path.append(pos)
            if len(self._path) > self._max_path:
                self._path = self._path[::2]
            self._latest.update(
                t_ns=int(t_ns),
                position=pos,
                quaternion=quat,
                sigma_translation=sigma_t,
                speed=speed,
                fps=round(self._fps_ema, 2),
            )

    def publish_keyframe(self, t_ns: int, pose_w2c: np.ndarray) -> None:
        """Keyframe marker (the reference's keyframe TF/marker role)."""
        pos = _cam_in_world(pose_w2c)[:3, 3].tolist()
        with self._lock:
            self._keyframes.append(pos)
            if len(self._keyframes) > self._max_path:
                self._keyframes = self._keyframes[::2]

    def publish_landmarks(self, points: np.ndarray) -> None:
        """Replace the displayed map-point cloud (world-frame Nx3). Capped at
        ``max_landmarks`` by uniform subsampling."""
        pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        if len(pts) > self._max_landmarks:
            idx = np.linspace(0, len(pts) - 1, self._max_landmarks).astype(int)
            pts = pts[idx]
        with self._lock:
            self._landmarks = pts.tolist()

    # -- state bus ------------------------------------------------------------

    def state(self) -> dict:
        with self._lock:
            return {
                "n_frames": self._n_frames,
                "n_keyframes": len(self._keyframes),
                "n_landmarks": len(self._landmarks),
                "path": list(self._path),
                "keyframes": list(self._keyframes),
                "landmarks": list(self._landmarks),
                **self._latest,
            }

    def state_json(self) -> str:
        return json.dumps(self.state())

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5.0)
