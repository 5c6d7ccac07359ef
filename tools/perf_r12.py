"""Round-3 (cont): int8 window table + RGBA8 kernel emit A/B on TPU.

Measures in-situ ms/frame on the bench's largest pose group across
(table dtype) x (out dtype) and the bench-protocol PSNR for the
production combination, to price the two byte-halving knobs
(display_warp._TABLE_INT8, render_frames(out_dtype=jnp.uint8)).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, display_warp, render_jax, slab_render
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
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def main():
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    groups = {}
    for c in cams:
        perm, flip, _ = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        groups.setdefault((perm, flip), []).append(c)
    (perm, flip), cs = max(groups.items(), key=lambda kv: len(kv[1]))
    fx, fy = cs[0].fx, cs[0].fy
    trs = jnp.asarray(np.stack([c.transform for c in cs[:N]]), jnp.float32)
    pay = slab_render.prepare_payload(grid, perm, opt)
    pay.block_until_ready()
    log("setup")

    ys = np.arange(0, H, 10)
    xs = np.arange(0, W, 10)
    o, d = cs[0].pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(o[sel]), jnp.asarray(d[sel]), opt))
    log("exact rays done")

    def render(ts_, pa, od):
        out = slab_render.render_frames(
            grid, ts_, fx, fy, perm, flip, W, H, opt, gi=GI, payload=pa,
            out_dtype=od)
        return jnp.sum(out.astype(jnp.float32), axis=(1, 2))

    jrender = jax.jit(render, static_argnames=("od",))

    for tbl_int8 in (False, True):
        for od in (None, jnp.uint8):
            display_warp._TABLE_INT8 = tbl_int8
            jax.clear_caches()
            t = sync_time(jrender, trs, pay, od)
            frame = np.asarray(slab_render.render_frame(
                grid, trs[0], fx, fy, perm, flip, W, H, opt, gi=GI,
                payload=pay, out_dtype=od))
            if od == jnp.uint8:
                frame = frame.astype(np.float32) / 255.0
            got = frame[ys][:, xs].reshape(-1, 4)
            mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
            p = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
            log(f"table_int8={tbl_int8} out={od}: {1e3 * t / N:5.2f} "
                f"ms/frame, psnr_vs_exact {p:.2f} dB")
    display_warp._TABLE_INT8 = True


if __name__ == "__main__":
    main()
