"""Round-4 sweep: display-path window thickness (k_per_step) with dir_win.

With dir_win the whole basis build is per-window, so K=8 halves that
plus the liveness/pre-plane work vs K=4. Risk: sparse scenes cull at
window granularity — an 8-slab window with one occupied slab streams
all 8 — so both scenes are measured, with PSNR.

Usage: python tools/perf_r14.py   (on the TPU, ~10 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", flush=True)


def psnr_cached(grid, cam, opt, sel, exact):
    import jax.numpy as jnp
    from volrend_tpu.ops import slab_render
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, bench.W, bench.H)
    frame = bench._as_float_frame(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        bench.W, bench.H, opt, gi=bench.GI))
    got = frame.reshape(-1, 4)[sel]
    return bench._psnr(got[:, :3], exact[:, :3])


def main():
    import jax
    from volrend_tpu.ops import pallas_slab
    from volrend_tpu.utils.options import RenderOptions

    opt = RenderOptions(max_steps=512)
    k0 = pallas_slab._K_STEP

    scenes = []
    dtree = bench.get_tree()
    ddev, dgrid = bench.setup_scene(dtree, "dense")
    dcams = bench.orbit_poses(bench.N_POSES)
    scenes.append(("DENSE", ddev, dgrid, dcams, bench.N_POSES))
    stree = bench.get_sparse_tree()
    sdev, sgrid = bench.setup_scene(stree, "sparse")
    scams = bench.orbit_poses(bench.N_POSES_SPARSE)
    scenes.append(("SPARSE", sdev, sgrid, scams, bench.N_POSES_SPARSE))

    for name, dev, grid, cams, n in scenes:
        trs, pays, pf = bench.group_poses(grid, cams, opt)
        log(f"{name}: exact rays (once)")
        sel, exact = bench._exact_rays(dev, cams[0], opt, 8)
        for K in (4, 8, 16):
            pallas_slab._K_STEP = K
            jax.clear_caches()
            try:
                m, _ = bench.run_throughput(
                    grid, trs, pays, pf, cams[0].fx, cams[0].fy, opt, n)
                p = psnr_cached(grid, cams[0], opt, sel, exact)
                log(f"{name} K={K}: {m:.1f} Mrays/s, {p:.2f} dB")
            except Exception as e:
                log(f"{name} K={K} FAILED: {type(e).__name__}: {e}")
    pallas_slab._K_STEP = k0


if __name__ == "__main__":
    main()
