"""CPU probe: slab-vs-exact PSNR at bench scale, as a function of gi.

Diagnoses the bench quality gate without touching the TPU: loads the cached
bench tree, renders one 800x800 pose through the XLA slab path at several
intermediate resolutions, and compares against exact T2 rays on a subsampled
pixel grid (the same protocol bench.py's gate uses).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, render_jax, slab_render
from volrend_tpu.utils.options import RenderOptions

W = H = 800


def main():
    t0 = time.perf_counter()
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    gridf = dense_grid.bake_dense(dev)
    print(f"setup {time.perf_counter()-t0:.0f}s", flush=True)

    opt = RenderOptions(max_steps=1024)
    cam = bench_mod.orbit_poses(bench_mod.N_POSES)[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)

    ys = np.arange(0, H, 5)
    xs = np.arange(0, W, 5)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    t0 = time.perf_counter()
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    print(f"exact rays {time.perf_counter()-t0:.0f}s", flush=True)

    gis = tuple(int(x) for x in os.environ.get(
        "QP_GIS", "448,640,800,1024").split(","))
    grids = ((grid, "int8"), (gridf, "f16"))
    if os.environ.get("QP_INT8_ONLY"):
        grids = ((grid, "int8"),)
    for g, label in grids:
        for gi in gis:
            t0 = time.perf_counter()
            frame = np.asarray(slab_render.render_frame(
                g, jnp.asarray(cam.transform), cam.fx, cam.fy,
                perm, flip, W, H, opt, gi=gi))
            got = frame[ys][:, xs].reshape(-1, 4)
            mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
            psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
            amax = float(np.max(np.abs(got[:, :3] - exact[:, :3])))
            print(f"{label} gi={gi}: psnr={psnr:6.2f} dB  maxabs={amax:.3f}"
                  f"  ({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
