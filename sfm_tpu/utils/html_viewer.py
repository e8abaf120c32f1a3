"""Interactive point-cloud viewer export (GUI parity).

The reference renders its map in an SFML/OpenGL window with a mouse orbit
camera and optional side-by-side stereo with adjustable eye separation
(demo/gui.cc:17-223: drag to orbit, S toggles stereo, E/D adjust
separation). A TPU pod has no display, so the equivalent here is a fully
self-contained WebGL page — no external assets, works offline — written
next to the PLY export:

  * drag = orbit, wheel = dolly (gui.cc:193-223 camera),
  * S toggles side-by-side stereo, E/D change eye separation
    (gui.cc:68-114, 175-183),
  * axes overlay like the reference's drawAxes.

Points are embedded as a base64 Float32 buffer.
"""

from __future__ import annotations

import base64
import json

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
E/D: eye separation · %%NPTS%% points</div>
<canvas id="c"></canvas>
<script>
"use strict";
const PTS = (() => {
  const raw = atob("%%DATA%%");
  const buf = new ArrayBuffer(raw.length);
  const u8 = new Uint8Array(buf);
  for (let i = 0; i < raw.length; i++) u8[i] = raw.charCodeAt(i);
  return new Float32Array(buf);
})();
const N = PTS.length / 3;

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
gl.bindBuffer(gl.ARRAY_BUFFER, vbo);
gl.bufferData(gl.ARRAY_BUFFER, PTS, gl.STATIC_DRAW);
const loc = gl.getAttribLocation(prog, "p");
gl.enableVertexAttribArray(loc);
gl.vertexAttribPointer(loc, 3, gl.FLOAT, false, 0, 0);
const uMvp = gl.getUniformLocation(prog, "mvp");
const uPsize = gl.getUniformLocation(prog, "psize");

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
  const cx = %%CX%%, cz = %%CZ%%, cyc = %%CY%%;
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
draw();
</script></body></html>
"""


def export_html(points: np.ndarray, path: str) -> None:
    """Write a self-contained interactive WebGL viewer for an [N, 3] cloud."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    data = base64.b64encode(pts.tobytes()).decode("ascii")
    if len(pts):
        c = np.median(pts, axis=0)
    else:
        c = np.zeros(3)
    page = (_PAGE
            .replace("%%DATA%%", data)
            .replace("%%NPTS%%", str(len(pts)))
            .replace("%%CX%%", f"{c[0]:.3f}")
            .replace("%%CY%%", f"{c[1]:.3f}")
            .replace("%%CZ%%", f"{c[2]:.3f}"))
    with open(path, "w") as f:
        f.write(page)
