"""Interactive-viewer latency/fps measurement (VERDICT r4 item 8).

The reference surfaces its interactivity as the GUI title-bar FPS
(main.cpp:37-58) and the web viewer's 20-frame FPS average
(web/main_web.cpp:38-76). This measures the analog here: the
`web/server.py` per-request frame path (ViewerState.render — slab fast
path, RGBA8 download through the tunnel, PNG encode) driven by a
simulated orbit drag, exactly what the browser does per frame.

Reports median/p90 frame latency and fps, split into render vs PNG
encode, and writes docs/VIEWER_PERF.json.

Usage: python tools/bench_viewer.py [--frames 40] [--size 800]
       [--cpu-smoke]
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(m):
    print(f"[viewer-bench +{time.perf_counter() - _T0:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--cpu-smoke", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.size, args.depth, args.frames = 64, 3, 4

    from volrend_tpu.models.n3tree import N3Tree
    from volrend_tpu.web.server import ViewerState

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_tree_cache.npz")
    if not args.cpu_smoke and os.path.isfile(cache):
        _log("loading bench tree cache")
        tree = N3Tree(cache)
    else:
        from volrend_tpu.models.synthetic import make_test_tree
        tree = make_test_tree(max_depth=args.depth, basis_dim=16, seed=3,
                              n_blobs=6, sigma_scale=60.0)

    _log(f"viewer state init (bake + payload prep), "
         f"backend={jax.default_backend()}")
    state = ViewerState(tree)
    W = H = args.size

    # warm: first frame compiles
    t0 = time.perf_counter()
    png = state.render(W, H)
    _log(f"first frame (compile) {time.perf_counter() - t0:.1f}s, "
         f"{len(png)} bytes, backend={state.last_backend}")

    # simulated orbit drag: the browser sends a drag event, then fetches a
    # frame — per-frame latency is what the user feels
    lat, enc = [], []
    state.handle_event({"type": "down", "x": W // 2, "y": H // 2,
                        "button": 0})
    for i in range(args.frames):
        state.handle_event({"type": "move",
                            "x": W // 2 + 3 * (i + 1), "y": H // 2})
        t0 = time.perf_counter()
        png = state.render(W, H)
        lat.append(time.perf_counter() - t0)
    state.handle_event({"type": "up", "x": 0, "y": 0, "button": 0})

    # drag-time adaptive resolution (the r5 frontend requests half-res
    # frames while dragging — 4x smaller tunnel transfer)
    lat_drag = []
    state.handle_event({"type": "down", "x": W // 2, "y": H // 2,
                        "button": 0})
    hw = (W // 2 // 4) * 4
    state.render(hw, hw)  # compile the half-res trace
    for i in range(min(args.frames, 20)):
        state.handle_event({"type": "move",
                            "x": W // 2 - 3 * (i + 1), "y": H // 2})
        t0 = time.perf_counter()
        state.render(hw, hw)
        lat_drag.append(time.perf_counter() - t0)
    state.handle_event({"type": "up", "x": 0, "y": 0, "button": 0})

    # PNG-encode share (re-encode the last numpy frame the same way)
    from volrend_tpu.web.server import _write_png_bytes
    import jax.numpy as jnp
    from volrend_tpu.ops import slab_render
    img = slab_render.render_image(state.grid, state.cam, state.opt,
                                   payload_cache=state._payload_cache,
                                   out_dtype=jnp.uint8)
    for _ in range(min(10, args.frames)):
        t0 = time.perf_counter()
        buf = io.BytesIO()
        _write_png_bytes(buf, img)
        enc.append(time.perf_counter() - t0)

    lat_ms = np.asarray(lat) * 1e3
    drag_ms = np.asarray(lat_drag) * 1e3
    rec = {
        "metric": "viewer_frame_latency_ms",
        "value": round(float(np.median(lat_ms)), 1),
        "unit": "ms",
        "fps": round(1e3 / float(np.median(lat_ms)), 1),
        "drag_halfres_ms": round(float(np.median(drag_ms)), 1),
        "drag_halfres_fps": round(1e3 / float(np.median(drag_ms)), 1),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
        "png_encode_ms": round(float(np.median(enc) * 1e3), 1),
        "frames": args.frames,
        "resolution": [H, W],
        "backend": state.last_backend,
        "platform": jax.default_backend(),
        "note": ("per-request path of web/server.py (render + RGBA8 "
                 "download + PNG encode), simulated orbit drag — the "
                 "reference GUI title-bar FPS analog (main.cpp:37-58)"),
    }
    out = args.out or (None if args.cpu_smoke
                       else os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                           "docs", "VIEWER_PERF.json"))
    if out:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        _log(f"wrote {out}")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
