"""Round-4 sweep: sparse-scene gi ladder + dense march chunk size.

Two questions, one chip session (reuses bench.py's protocol machinery):

1. The sparse solid scene (the NeRF-synthetic-like comparison point,
   BASELINE.md) runs 336 Mrays/s at 46.8 dB with gi=256. Solid scenes
   are edge-limited, not grid-limited like the fog scene, so a finer
   intermediate grid may buy PSNR; culling keeps the march cheap there.
   Sweep gi in {256, 320, 384}: Mrays/s + PSNR-vs-exact per point.

2. Dense fog scene at gi=256 marches in 2 chunk dispatches
   (_CHUNK=128); try one dispatch (_CHUNK=256) for the whole G=256
   volume (r3 measured 32 -> 128 as a big win; is 256 more?).

Usage: python tools/perf_r13.py   (on the TPU, ~8-12 min)
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

    # ---- 1. sparse gi ladder ----------------------------------------------
    log("sparse tree")
    stree = bench.get_sparse_tree()
    sdev, sgrid = bench.setup_scene(stree, "sparse")
    scams = bench.orbit_poses(bench.N_POSES_SPARSE)
    strs, spays, spf = bench.group_poses(sgrid, scams, opt)
    log("exact rays (once)")
    sel, exact = bench._exact_rays(sdev, scams[0], opt, 8)

    for gi in (256, 320, 384):
        bench.GI = gi
        jax.clear_caches()
        try:
            m, _ = bench.run_throughput(
                sgrid, strs, spays, spf, scams[0].fx, scams[0].fy, opt,
                bench.N_POSES_SPARSE)
            p = psnr_cached(sgrid, scams[0], opt, sel, exact)
            log(f"SPARSE gi={gi}: {m:.1f} Mrays/s, {p:.2f} dB")
        except Exception as e:
            log(f"SPARSE gi={gi} FAILED: {type(e).__name__}: {e}")
    bench.GI = 256

    # ---- 2. dense chunk size ----------------------------------------------
    log("dense tree")
    dtree = bench.get_tree()
    ddev, dgrid = bench.setup_scene(dtree, "dense")
    dcams = bench.orbit_poses(bench.N_POSES)
    dtrs, dpays, dpf = bench.group_poses(dgrid, dcams, opt)
    log("exact rays (once)")
    dsel, dexact = bench._exact_rays(ddev, dcams[0], opt, 8)

    chunk0 = pallas_slab._CHUNK
    for chunk in (128, 256):
        pallas_slab._CHUNK = chunk
        jax.clear_caches()
        try:
            m, _ = bench.run_throughput(
                dgrid, dtrs, dpays, dpf, dcams[0].fx, dcams[0].fy, opt,
                bench.N_POSES)
            p = psnr_cached(dgrid, dcams[0], opt, dsel, dexact)
            log(f"DENSE chunk={chunk}: {m:.1f} Mrays/s, {p:.2f} dB")
        except Exception as e:
            log(f"DENSE chunk={chunk} FAILED: {type(e).__name__}: {e}")
    pallas_slab._CHUNK = chunk0


if __name__ == "__main__":
    main()
