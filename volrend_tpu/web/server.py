"""Interactive web viewer — the TPU-native equivalent of the reference web
app (``web/main_web.cpp`` + ``web/js/*``).

The reference compiles the GL renderer to WASM and runs client-side; the
TPU build inverts this: rendering stays server-side on the accelerator and
the browser is a thin canvas + input layer. The JS API surface mirrors the
embind bindings (``web/main_web.cpp:455-545``): camera orbit/pan/zoom with
the reference drag semantics (DragCamera), get/set RenderOptions, mesh
layer visibility, FPS readout.

Endpoints:
  GET  /                     viewer page
  GET  /info                 tree metadata + mesh layers + options
  GET  /frame?w=&h=&q=       current-state render as PNG (q = jpeg-ish
                             downscale factor for interactivity)
  POST /event                {type: down|move|up|wheel|key, ...} input
  POST /options              partial RenderOptions update
  POST /mesh                 {name, visible} layer toggle
"""

from __future__ import annotations

import dataclasses
import io
import json
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from volrend_tpu.models.mesh import Mesh
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops.camera import DragCamera
from volrend_tpu.utils.options import RenderOptions
from volrend_tpu.utils.profiling import fps_counter
from volrend_tpu.utils import png as png_mod

_INDEX_HTML = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>volrend-tpu viewer</title>
<style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif;
       display:flex; height:100vh; overflow:hidden }
#view { flex:1; display:flex; align-items:center; justify-content:center }
canvas { background:#000; cursor:grab; max-width:100%; max-height:100% }
#panel { width:260px; padding:12px; background:#1b1b1f; overflow-y:auto }
#panel h3 { margin:10px 0 4px; font-size:13px; color:#9cf }
.row { display:flex; justify-content:space-between; margin:3px 0 }
.row input[type=range] { width:130px }
#fps { position:fixed; left:10px; top:8px; color:#6f6; font-weight:bold }
label { user-select:none }
</style></head><body>
<div id="view"><canvas id="c" width="640" height="640"></canvas></div>
<div id="panel">
  <h3>Camera</h3>
  <div class="row"><span>drag: orbit &middot; shift/right: pan &middot;
    wheel: dolly</span></div>
  <h3>Render</h3>
  <div id="opts"></div>
  <h3>Layers</h3>
  <div id="layers"></div>
  <h3>Lumisphere probe</h3>
  <div class="row">
    <input id="px" type="number" value="0" step="0.1" style="width:55px">
    <input id="py" type="number" value="0" step="0.1" style="width:55px">
    <input id="pz" type="number" value="0" step="0.1" style="width:55px">
    <button onclick="probe()">probe</button>
  </div>
  <img id="probeimg" width="100" height="100" style="background:#000">
</div>
<div id="fps"></div>
<script>
const canvas = document.getElementById('c');
let busy = false, dirty = true;
async function refresh() {
  if (busy) { dirty = true; return; }
  busy = true; dirty = false;
  const t0 = performance.now();
  const r = await fetch(`/frame?w=${canvas.width}&h=${canvas.height}`);
  const blob = await r.blob();
  const img = await createImageBitmap(blob);
  canvas.getContext('2d').drawImage(img, 0, 0);
  const dt = performance.now() - t0;
  document.getElementById('fps').textContent = (1000/dt).toFixed(1) + ' fps';
  busy = false;
  if (dirty) refresh();
}
async function post(path, body) {
  await fetch(path, {method:'POST', body: JSON.stringify(body)});
  refresh();
}
let dragging = false;
canvas.addEventListener('mousedown', e => {
  dragging = true;
  post('/event', {type:'down', x:e.offsetX, y:e.offsetY,
                  pan: e.shiftKey || e.button !== 0, about_origin: true});
});
window.addEventListener('mousemove', e => {
  if (!dragging) return;
  const r = canvas.getBoundingClientRect();
  post('/event', {type:'move', x:e.clientX-r.left, y:e.clientY-r.top});
});
window.addEventListener('mouseup', () => {
  if (dragging) { dragging = false; post('/event', {type:'up'}); }
});
canvas.addEventListener('contextmenu', e => e.preventDefault());
canvas.addEventListener('wheel', e => {
  e.preventDefault();
  post('/event', {type:'wheel', dy: e.deltaY});
});
window.addEventListener('keydown', e => {
  const k = e.key.toLowerCase();
  if ('wasdqe'.includes(k)) post('/event', {type:'key', key:k});
});
async function probe() {
  const v = k => document.getElementById(k).value;
  const r = await fetch(`/probe?x=${v('px')}&y=${v('py')}&z=${v('pz')}`);
  document.getElementById('probeimg').src =
    URL.createObjectURL(await r.blob());
}
const OPT_SLIDERS = [
  ['step_size', 1e-5, 2e-3, 'log'],
  ['sigma_thresh', 0.0, 1.0, 'lin'],
  ['stop_thresh', 0.0, 0.2, 'lin'],
  ['background_brightness', 0.0, 1.0, 'lin'],
];
async function init() {
  const info = await (await fetch('/info')).json();
  const od = document.getElementById('opts');
  for (const [name, lo, hi] of OPT_SLIDERS) {
    const v = info.options[name];
    od.insertAdjacentHTML('beforeend',
      `<div class="row"><label>${name}</label>
       <input type="range" min="${lo}" max="${hi}" step="${(hi-lo)/200}"
        value="${v}" oninput="post('/options', {${name}: +this.value})">
       </div>`);
  }
  od.insertAdjacentHTML('beforeend',
    `<div class="row"><label>show grid</label>
     <input type="checkbox" onchange="post('/options',
      {show_grid: this.checked})"></div>`);
  const ld = document.getElementById('layers');
  for (const m of info.meshes) {
    ld.insertAdjacentHTML('beforeend',
      `<div class="row"><label>${m.name}</label>
       <input type="checkbox" ${m.visible ? 'checked' : ''}
        onchange="post('/mesh', {name:'${m.name}',
                  visible:this.checked})"></div>`);
  }
  refresh();
}
init();
</script></body></html>
"""


class ViewerState:
    def __init__(self, tree: N3Tree, meshes: Optional[List[Mesh]] = None,
                 use_slab: bool = True):
        self.tree = tree
        self.dev = tree.to_device(lut_depth=None)
        self.meshes = list(meshes or [])
        self.opt = RenderOptions(max_steps=2048)
        if tree.use_ndc and tree.ndc is not None:
            # LLFF/NDC scene: mean-pose camera init (main.cpp:731-741)
            from volrend_tpu.ops.camera import ndc_camera
            self.cam = ndc_camera(tree.ndc, width=640, height=640)
            self.fixed_focal = True
        else:
            self.cam = DragCamera(width=640, height=640, fx=300.0)
            self.cam.update_basis(
                v_back=np.array([-0.7071, 0.0, 0.7071]),
                center=np.array([-3.55, 0.0, 3.55]) / max(tree.scale))
            self.fixed_focal = False
        self.grid = None
        if use_slab:
            try:
                from volrend_tpu.ops import dense_grid
                self.grid = dense_grid.bake_dense(self.dev)
            except Exception:
                self.grid = None
        self.lock = threading.Lock()
        self.fps = fps_counter()

    def render(self, w: int, h: int) -> bytes:
        with self.lock:
            self.cam.width, self.cam.height = w, h
            if not self.fixed_focal:
                self.cam.fx = self.cam.fy = 0.55 * max(w, h) / np.tan(0.35)
            any_mesh = any(m.visible for m in self.meshes) or \
                self.opt.show_grid
            img = None
            if self.grid is not None and not any_mesh:
                from volrend_tpu.ops import slab_render
                if slab_render.compatible(self.grid, self.cam.transform,
                                          self.cam.fx, self.cam.fy, w, h):
                    img = slab_render.render_image(
                        self.grid, self.cam, self.opt, gi=512)
            if img is None:
                from volrend_tpu.ops import composite
                img = composite.render_frame_with_meshes(
                    self.dev, self.cam, self.opt, self.meshes,
                    host_tree=self.tree)
            buf = io.BytesIO()
            _write_png_bytes(buf, img)
            return buf.getvalue()

    def handle_event(self, ev: dict) -> None:
        with self.lock:
            t = ev.get("type")
            if t == "down":
                self.cam.begin_drag(ev["x"], ev["y"], bool(ev.get("pan")),
                                    bool(ev.get("about_origin", True)))
            elif t == "move":
                self.cam.drag_update(ev["x"], ev["y"])
            elif t == "up":
                self.cam.end_drag()
            elif t == "wheel":
                # wheel up (negative dy) dollies in
                sp = 1.0 + np.clip(ev.get("dy", 0.0), -100, 100) * 0.002
                c = self.cam.center - self.cam.origin
                self.cam.update_basis(center=self.cam.origin + c * sp)
            elif t == "key":
                step = 0.1
                moves = {"w": -self.cam.v_back, "s": self.cam.v_back,
                         "a": -self.cam.v_right, "d": self.cam.v_right,
                         "q": -self.cam.v_up, "e": self.cam.v_up}
                if ev.get("key") in moves:
                    self.cam.move(moves[ev["key"]] * step)

    def probe(self, point, size: int = 100) -> bytes:
        """Lumisphere probe ball (the reference GUI's inset display)."""
        from volrend_tpu.ops.composite import probe_image
        with self.lock:
            img = probe_image(self.dev, point, size=size)
        buf = io.BytesIO()
        _write_png_bytes(buf, img)
        return buf.getvalue()

    def info(self) -> dict:
        return {
            "data_dim": self.tree.data_dim,
            "basis_dim": self.tree.data_format.basis_dim,
            "format": self.tree.data_format.to_string(),
            "options": {k: v for k, v in dataclasses.asdict(
                self.opt).items()
                if isinstance(v, (int, float, bool))},
            "meshes": [{"name": m.name, "visible": bool(m.visible)}
                       for m in self.meshes],
            "ndc": (None if not self.tree.use_ndc or self.tree.ndc is None
                    else {"focal": float(self.tree.ndc.focal),
                          "avg_up": list(self.tree.ndc.avg_up),
                          "avg_back": list(self.tree.ndc.avg_back),
                          "avg_cen": list(self.tree.ndc.avg_cen)}),
        }


def _write_png_bytes(fh, img) -> None:
    data = png_mod.rgba_to_bytes(np.asarray(img))
    import struct
    h, w, c = data.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = np.empty((h, w * c + 1), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = data.reshape(h, w * c)
    comp = zlib.compress(raw.tobytes(), 1)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    fh.write(b"\x89PNG\r\n\x1a\n")
    fh.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                        0, 0, 0)))
    fh.write(chunk(b"IDAT", comp))
    fh.write(chunk(b"IEND", b""))


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, _INDEX_HTML.encode(), "text/html")
            elif u.path == "/info":
                self._send(200, json.dumps(state.info()).encode())
            elif u.path == "/frame":
                q = parse_qs(u.query)
                w = int(q.get("w", ["640"])[0])
                h = int(q.get("h", ["640"])[0])
                self._send(200, state.render(w, h), "image/png")
            elif u.path == "/probe":
                q = parse_qs(u.query)
                pt = tuple(float(q.get(k, ["0"])[0]) for k in "xyz")
                size = int(q.get("size", ["100"])[0])
                self._send(200, state.probe(pt, size), "image/png")
            else:
                self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/event":
                state.handle_event(body)
            elif self.path == "/options":
                with state.lock:
                    state.opt = state.opt.replace(**{
                        k: (tuple(v) if isinstance(v, list) else v)
                        for k, v in body.items()})
            elif self.path == "/mesh":
                with state.lock:
                    for m in state.meshes:
                        if m.name == body.get("name"):
                            m.visible = bool(body.get("visible", True))
            self._send(200, b"{}")

    return Handler


def serve(tree_path: str, draw: Optional[str] = None, port: int = 8781,
          use_slab: bool = True):
    from volrend_tpu.models import mesh as mesh_mod
    tree = N3Tree(tree_path)
    meshes: List[Mesh] = []
    if draw:
        if draw.endswith(".obj"):
            meshes = [mesh_mod.load_basic_obj(draw)]
        else:
            meshes = mesh_mod.open_drawlist(draw)
    state = ViewerState(tree, meshes, use_slab=use_slab)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"volrend-tpu viewer: http://localhost:{port}/")
    httpd.serve_forever()
