"""r5 march compute-vs-stream split probe.

The march measures 1.13 ms/frame at gi=256 against a 1.03 ms int8 stream
floor. Whether the remaining lever is multi-pose stream sharing (time =
max(stream, P*compute)) depends on how much VPU compute hides UNDER the
stream. VPU work scales ~gi^2 while the stream is gi-independent, so
march-only times at gi in {128, 192, 256, 320} separate the two:
flat-in-gi => stream-bound (compute small; multi-pose could ~halve the
march); steep-in-gi => compute-bound (multi-pose stays parked, r3 call).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, pallas_slab, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()


def log(m):
    print(f"[r17 +{time.perf_counter() - t0:6.1f}s] {m}", flush=True)


def main():
    W = H = 800
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)][:24]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    fx, fy = cam.fx, cam.fy
    payload = slab_render.prepare_payload(grid, perm, opt)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
    log(f"setup done; {n} poses, payload {payload.shape}")

    crop = slab_render.inplane_crop(grid, perm, float(opt.sigma_thresh))

    def march_all(pay, ts, gi):
        def one(tr):
            g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                      opt, gi)
            params, zb = slab_render._pallas_frame_fields(
                grid, g, perm, flip, opt)
            acc4 = pallas_slab.march_slabs(
                pay, params, grid.qscale, zb, grid.G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=slab_ids,
                sig2=grid.quantized, flip=flip, bbox_full=True,
                dir_win=pallas_slab._DIR_WIN,
                k_per_step=pallas_slab._K_STEP, crop=crop)
            return jnp.sum(acc4, dtype=jnp.float32)

        return lax.map(one, ts)

    for gi in (128, 192, 256, 320):
        jax.clear_caches()
        f = jax.jit(lambda pay, ts, gi=gi: march_all(pay, ts, gi))
        out = np.asarray(f(payload, trs))  # compile + sync
        dts = []
        for _ in range(3):
            tt = time.perf_counter()
            out = np.asarray(f(payload, trs))
            dts.append(time.perf_counter() - tt)
        assert np.all(np.isfinite(out))
        log(f"gi={gi}: {min(dts) / n * 1e3:7.3f} ms/frame (march only)")


if __name__ == "__main__":
    main()
