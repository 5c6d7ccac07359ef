"""Slab-renderer perf bisect on the real chip.

Times variants of the march structure with proper tunnel sync
(host transfer of a scalar; ~26 ms floor subtracted).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

FLOOR = 0.027
W = H = 800


def sync_time(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / n - FLOOR


def log(msg):
    print(msg, flush=True)


def main():
    t0 = time.perf_counter()
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    log(f"setup {time.perf_counter()-t0:.0f}s")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(12)
    # pick two poses sharing a perm group
    chosen = []
    want = None
    for c in cams:
        perm, flip, sl = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        if want is None:
            want = (perm, flip)
        if (perm, flip) == want:
            chosen.append(c)
        if len(chosen) == 2:
            break
    perm, flip = want
    cam = chosen[0]
    tr = jnp.asarray(cam.transform)
    log(f"perm={perm} flip={flip}")

    for gi in (512, 384):
        f = partial(slab_render.render_frame, perm=perm, flip=flip,
                    width=W, height=H, opt=opt, gi=gi)
        fn = jax.jit(lambda g, t: f(g, t, cam.fx, cam.fy))
        t = sync_time(fn, grid, tr)
        log(f"while gi={gi}: {t*1e3:7.1f} ms/frame  {W*H/t/1e6:6.1f} Mrays/s")

    # fixed overhead probe: transpose + final warp only (march 1 slab)
    opt1 = opt.replace(max_steps=1024, render_bbox=(0.0, 0.0, 0.0,
                                                    0.004, 0.004, 0.004))
    f1 = partial(slab_render.render_frame, perm=perm, flip=flip,
                 width=W, height=H, opt=opt1, gi=512)
    fn1 = jax.jit(lambda g, t: f1(g, t, cam.fx, cam.fy))
    t = sync_time(fn1, grid, tr)
    log(f"fixed overhead (~1 slab): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
