"""Round-3: 4x4-block superquad in situ — Mosaic compile + A/B timing.

The B=4 superquad fits only near-slab-axis poses (slope-space stretch at
off-axis frame edges blows the 4x4 window — measured 4/16 bench orbit
poses at gi=256). This probe times render_frames on an ALIGNED pose group
(the geometry B=4 serves: forward-facing / NDC viewing) with the
production block cascade (4 -> 2 -> ref) vs forced block=2, plus a
generic bench orbit group (expected unchanged), and gates PSNR vs exact.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, display_warp, render_jax, slab_render
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


FLOOR = 0.027
W = H = 800
N = 24
GI = 256


def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def aligned_poses(n, radius=2.8):
    """Poses whose view direction hugs the +x slab axis: the B=4 regime."""
    cams = []
    for i in range(n):
        th = -0.10 + 0.20 * i / max(n - 1, 1)
        el = 0.06 * np.sin(3.1 * i)
        back = np.array([np.cos(th) * np.cos(el),
                         np.sin(th) * np.cos(el), np.sin(el)])
        cams.append(Camera.from_vectors(
            center=tuple(radius * back), v_back=tuple(back),
            width=W, height=H))
    return cams


def main():
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    opt = RenderOptions(max_steps=1024)
    log("setup")

    def group(cams):
        gs = {}
        for c in cams:
            perm, flip, _ = slab_render.choose_axis(
                grid, c.transform, c.fx, c.fy, W, H)
            gs.setdefault((perm, flip), []).append(c)
        (perm, flip), cs = max(gs.items(), key=lambda kv: len(kv[1]))
        trs = jnp.asarray(np.stack([c.transform for c in cs]), jnp.float32)
        pay = slab_render.prepare_payload(grid, perm, opt)
        return perm, flip, trs, pay, cs

    for label, cams in (("aligned", aligned_poses(N)),
                        ("orbit", bench_mod.orbit_poses(N))):
        perm, flip, trs, pay, cs = group(cams)
        fx, fy = cs[0].fx, cs[0].fy
        g = slab_render.FrameGeom(grid, jnp.asarray(cs[0].transform), fx,
                                  fy, perm, flip, W, H, opt, GI)
        fits4 = bool(display_warp._sub_geometry(
            g.R, g.fx, g.fy, W, H, GI, perm, g.u0, g.du, g.v0, g.dv,
            g.scale, B=4)[5])
        log(f"{label}: {trs.shape[0]} poses in group, pose0 fits4={fits4}")

        @jax.jit
        def render(ts, pa):
            out = slab_render.render_frames(
                grid, ts, fx, fy, perm, flip, W, H, opt, gi=GI, payload=pa)
            return jnp.sum(out, dtype=jnp.float32, axis=(1, 2))

        t = sync_time(render, trs, pay)
        log(f"{label} cascade(4->2->ref): {1e3 * t / trs.shape[0]:5.2f} "
            f"ms/frame")

        # force block=2 at the call site for the A/B
        orig = display_warp.warp_to_screen_sq
        display_warp.warp_to_screen_sq = (
            lambda *a, block=2, **k: orig(*a, **{**k, "block": 2}))
        jax.clear_caches()
        try:
            t2 = sync_time(render, trs, pay)
        finally:
            display_warp.warp_to_screen_sq = orig
            jax.clear_caches()
        log(f"{label} forced block=2:     {1e3 * t2 / trs.shape[0]:5.2f} "
            f"ms/frame")

        # quality gate (cascade), pose 0, stride 10
        frame = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cs[0].transform), fx, fy, perm, flip, W, H,
            opt, gi=GI, payload=pay))
        ys = np.arange(0, H, 10)
        xs = np.arange(0, W, 10)
        o, d = cs[0].pixel_rays(xp=np)
        sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
        exact = np.asarray(render_jax.render_rays(
            dev, jnp.asarray(o[sel]), jnp.asarray(d[sel]), opt))
        got = frame[ys][:, xs].reshape(-1, 4)
        mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
        p = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
        log(f"{label} psnr_vs_exact {p:.2f} dB")
        assert p >= 40.0, f"{label} quality gate failed"


if __name__ == "__main__":
    main()
