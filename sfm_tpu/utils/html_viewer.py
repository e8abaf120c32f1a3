"""Interactive point-cloud viewer (GUI parity).

The reference renders its map in an SFML/OpenGL window with a mouse orbit
camera and optional side-by-side stereo with adjustable eye separation
(demo/gui.cc:17-223: drag to orbit, S toggles stereo, E/D adjust
separation). A TPU pod has no display, so the equivalents here are:

  * ``export_html`` — a fully self-contained WebGL page (no external
    assets, works offline) written next to the PLY export; points embedded
    as a base64 Float32 buffer.
  * ``LiveViewer`` — the live-rendering equivalent of the reference GUI
    thread (gui.cc:17-131: viewer thread + mutex-guarded point buffer):
    a daemon-thread HTTP server on localhost; the processing loop calls
    ``update(points)`` per frame (cheap copy under a lock, like
    PointCloudViewer::update gui.cc:121-126) and any browser pointed at
    the URL re-fetches the buffer twice a second.
  * ``NullViewer`` — no-op stand-in (gui.hh:15-24's Null viewer for
    headless builds).

Both pages: drag = orbit, wheel = dolly, S toggles side-by-side stereo,
E/D change eye separation, axes overlay like the reference's drawAxes.
"""

from __future__ import annotations

import base64
import threading

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>sfm_tpu point cloud</title>
<style>
 html,body{margin:0;height:100%;background:#111;overflow:hidden;color:#ddd;
           font:12px monospace}
 #hud{position:fixed;left:8px;top:8px;user-select:none}
 canvas{display:block;width:100vw;height:100vh}
</style></head><body>
<div id="hud">sfm_tpu viewer — drag: orbit · wheel: dolly · S: stereo ·
E/D: eye separation · <span id="npts">%%NPTS%% points</span></div>
<canvas id="c"></canvas>
<script>
"use strict";
let N = 0;
let CEN = [%%CX%%, %%CY%%, %%CZ%%];

const canvas = document.getElementById("c");
const gl = canvas.getContext("webgl");
const vsrc = `attribute vec3 p; uniform mat4 mvp; uniform float psize;
varying float d;
void main(){ gl_Position = mvp*vec4(p,1.0); d = gl_Position.w;
             gl_PointSize = max(1.0, psize/max(d,0.1)); }`;
const fsrc = `precision mediump float; varying float d;
void main(){ float s = clamp(1.6 - d*0.02, 0.25, 1.0);
             gl_FragColor = vec4(0.55*s+0.3, 0.85*s, 0.4*s+0.2, 1.0); }`;
function sh(t, s){ const o = gl.createShader(t); gl.shaderSource(o, s);
  gl.compileShader(o); return o; }
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, vsrc));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, fsrc));
gl.linkProgram(prog); gl.useProgram(prog);
const vbo = gl.createBuffer();
const loc = gl.getAttribLocation(prog, "p");
gl.enableVertexAttribArray(loc);
const uMvp = gl.getUniformLocation(prog, "mvp");
const uPsize = gl.getUniformLocation(prog, "psize");

function setPoints(f32){
  N = f32.length / 3;
  gl.bindBuffer(gl.ARRAY_BUFFER, vbo);
  gl.bufferData(gl.ARRAY_BUFFER, f32, gl.DYNAMIC_DRAW);
  document.getElementById("npts").textContent = N + " points";
}

// axes overlay (reference drawAxes)
const axes = new Float32Array([0,0,0, 3,0,0, 0,0,0, 0,3,0, 0,0,0, 0,0,3]);
const abo = gl.createBuffer();
gl.bindBuffer(gl.ARRAY_BUFFER, abo);
gl.bufferData(gl.ARRAY_BUFFER, axes, gl.STATIC_DRAW);

// orbit state (gui.cc:193-223)
let yaw = 0.6, elev = 0.4, dist = 40, sep = 0.0, stereo = false;
let dragging = false, lx = 0, ly = 0;
canvas.addEventListener("mousedown", e => {dragging = true; lx = e.clientX; ly = e.clientY;});
window.addEventListener("mouseup", () => dragging = false);
window.addEventListener("mousemove", e => { if (!dragging) return;
  yaw  += (e.clientX - lx) * 0.008; elev += (e.clientY - ly) * 0.008;
  elev = Math.max(-1.5, Math.min(1.5, elev)); lx = e.clientX; ly = e.clientY;});
canvas.addEventListener("wheel", e => { dist *= Math.exp(e.deltaY * 0.001); });
window.addEventListener("keydown", e => {
  if (e.key === "s" || e.key === "S") { stereo = !stereo; if (stereo && sep === 0) sep = 0.4; }
  if (e.key === "e" || e.key === "E") sep += 0.05;
  if (e.key === "d" || e.key === "D") sep = Math.max(0, sep - 0.05);
});

function mat(eyeOff, aspect){
  const cy = Math.cos(yaw), sy = Math.sin(yaw);
  const ce = Math.cos(elev), se = Math.sin(elev);
  // camera position orbiting the centroid
  const cx = CEN[0], cyc = CEN[1], cz = CEN[2];
  const ex = cx + dist*sy*ce + eyeOff*cy, ey = cyc - dist*se,
        ez = cz - dist*cy*ce + eyeOff*sy;
  // look-at
  let fx = cx-ex, fy = cyc-ey, fz = cz-ez;
  const fl = Math.hypot(fx,fy,fz); fx/=fl; fy/=fl; fz/=fl;
  // right = f x up with up=(0,-1,0): image-style y-down world
  let ux = 0, uy = -1, uz = 0;
  let r0 = fy*uz - fz*uy, r1 = fz*ux - fx*uz, r2 = fx*uy - fy*ux;
  const rl = Math.hypot(r0,r1,r2); r0/=rl; r1/=rl; r2/=rl;
  const u0 = r1*fz - r2*fy, u1 = r2*fx - r0*fz, u2 = r0*fy - r1*fx;
  const n = 0.1, f = 2000, t = n*Math.tan(0.5), r = t*aspect;
  const view = [r0,u0,-fx,0, r1,u1,-fy,0, r2,u2,-fz,0,
    -(r0*ex+r1*ey+r2*ez), -(u0*ex+u1*ey+u2*ez), fx*ex+fy*ey+fz*ez, 1];
  const projm = [n/r,0,0,0, 0,n/t,0,0, 0,0,-(f+n)/(f-n),-1, 0,0,-2*f*n/(f-n),0];
  // mvp = proj * view (column major)
  const m = new Float32Array(16);
  for (let c = 0; c < 4; c++) for (let rr = 0; rr < 4; rr++){
    let s = 0; for (let k = 0; k < 4; k++) s += projm[k*4+rr]*view[c*4+k];
    m[c*4+rr] = s;
  }
  return m;
}

function draw(){
  const w = canvas.clientWidth, h = canvas.clientHeight;
  if (canvas.width !== w || canvas.height !== h){ canvas.width = w; canvas.height = h; }
  gl.clearColor(0.07, 0.07, 0.08, 1);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  const views = stereo ? [[0, w/2, -sep], [w/2, w/2, sep]] : [[0, w, 0]];
  for (const [x0, vw, off] of views){
    gl.viewport(x0, 0, vw, h);
    const m = mat(off, vw/h);
    gl.uniformMatrix4fv(uMvp, false, m);
    gl.uniform1f(uPsize, 120.0);
    gl.bindBuffer(gl.ARRAY_BUFFER, vbo);
    gl.vertexAttribPointer(loc, 3, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.POINTS, 0, N);
    gl.bindBuffer(gl.ARRAY_BUFFER, abo);
    gl.vertexAttribPointer(loc, 3, gl.FLOAT, false, 0, 0);
    gl.drawArrays(gl.LINES, 0, 6);
  }
  requestAnimationFrame(draw);
}
%%LOADER%%
draw();
</script></body></html>
"""

# static page: points embedded as base64 (works from file://, webgl marker
# string kept lowercase for grep-ability)
_STATIC_LOADER = """
setPoints((() => {
  const raw = atob("%%DATA%%");
  const buf = new ArrayBuffer(raw.length);
  const u8 = new Uint8Array(buf);
  for (let i = 0; i < raw.length; i++) u8[i] = raw.charCodeAt(i);
  return new Float32Array(buf);
})());
"""

# live page: poll the buffer from the embedded HTTP server
_LIVE_LOADER = """
async function poll(){
  try {
    const r = await fetch("points.bin", {cache: "no-store"});
    const buf = await r.arrayBuffer();
    const f32 = new Float32Array(buf);
    if (f32.length >= 3) {
      let sx=0, sy=0, sz=0;
      for (let i = 0; i < f32.length; i += 3){ sx+=f32[i]; sy+=f32[i+1]; sz+=f32[i+2]; }
      CEN = [sx/(f32.length/3), sy/(f32.length/3), sz/(f32.length/3)];
    }
    setPoints(f32);
  } catch (e) {}
  setTimeout(poll, 500);
}
poll();
"""


def _render(loader: str, npts, cx, cy, cz) -> str:
    return (_PAGE
            .replace("%%LOADER%%", loader)
            .replace("%%NPTS%%", str(npts))
            .replace("%%CX%%", f"{cx:.3f}")
            .replace("%%CY%%", f"{cy:.3f}")
            .replace("%%CZ%%", f"{cz:.3f}"))


def export_html(points: np.ndarray, path: str) -> None:
    """Write a self-contained interactive WebGL viewer for an [N, 3] cloud."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    data = base64.b64encode(pts.tobytes()).decode("ascii")
    c = np.median(pts, axis=0) if len(pts) else np.zeros(3)
    loader = _STATIC_LOADER.replace("%%DATA%%", data)
    with open(path, "w") as f:
        f.write(_render(loader, len(pts), c[0], c[1], c[2]))


class NullViewer:
    """Headless no-op viewer (gui.hh:15-24)."""

    url = None

    def update(self, points, pose=None) -> None:
        pass

    def close(self) -> None:
        pass


class LiveViewer:
    """Per-frame live point-cloud viewer over HTTP.

    Equivalent of the reference PointCloudViewer thread (gui.cc:17-131):
    the caller's processing loop calls ``update(points)`` each frame —
    a copy under a mutex, never blocking on rendering — while a daemon
    HTTP server serves the viewer page and the current buffer at
    ``self.url``. ``close()`` shuts the server down.
    """

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        viewer = self
        self._lock = threading.Lock()
        self._buf = b""
        self._n = 0

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path.split("?")[0] == "/points.bin":
                    with viewer._lock:
                        body = viewer._buf
                    ctype = "application/octet-stream"
                else:
                    body = _render(_LIVE_LOADER, 0, 0, 0, 10).encode()
                    ctype = "text/html; charset=utf-8"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence request logging
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.url = f"http://{host}:{self._server.server_address[1]}/"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True,
            name="sfm-live-viewer")
        self._thread.start()

    def update(self, points, pose=None) -> None:
        """Publish the current cloud (PointCloudViewer::update,
        gui.cc:121-126). `pose` accepted for interface symmetry."""
        pts = np.ascontiguousarray(
            np.asarray(points, np.float32).reshape(-1, 3))
        with self._lock:
            self._buf = pts.tobytes()
            self._n = len(pts)

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
