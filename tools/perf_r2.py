"""Round-2 perf decomposition on the real chip.

Isolates: march kernel alone (bf16 vs int8 grid), full frame, batched
frames, finalize+warp alone. Run under timeout; one process owns the chip.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, pallas_slab
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    tt = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - tt) / reps - FLOOR


def main():
    W = H = 800
    gi = 448
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=1024)

    for dtype in ("int8", "f16"):
        grid = dense_grid.bake_dense(dev, dtype=dtype)
        G = grid.G
        cams = bench_mod.orbit_poses(12)
        cam = cams[0]
        perm, flip, _ = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, W, H)
        tr = jnp.asarray(cam.transform)
        ids = grid.slab_ids(perm[0], flip, float(opt.sigma_thresh))
        log(f"=== {dtype}: G={G} occupied slabs {len(ids)}/{G}")

        gplanar, _ = slab_render._permuted_grid(grid, perm, True)
        gplanar.block_until_ready()
        params = jnp.zeros((30,), jnp.float32).at[0].set(-2.0).at[4].set(
            4.0 / gi).at[3].set(-2.0).at[5].set(-2.0).at[6].set(4.0 / gi).at[
            7].set(1.0).at[8].set(2.0).at[9].set(2.0).at[10].set(2.0).at[
            11].set(2.0).at[12].set(2.0).at[13].set(2.0).at[14].set(1e-2).at[
            15].set(1e-2).at[17].set(1.0).at[19].set(1.0).at[29].set(-2.0)
        _slot = {perm[0]: 0, perm[1]: 1, perm[2]: 2}
        for _a in range(3):
            params = params.at[20 + 3 * _a + _slot[_a]].set(2.0)
        zb = jnp.stack([jnp.zeros((gi, gi)), jnp.ones((gi, gi))])

        @jax.jit
        def march_only(gp, p, z):
            return pallas_slab.march_slabs(
                gp, p, grid.qscale, z, G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=ids, sig2=grid.quantized)
        t = sync_time(march_only, gplanar, params, zb)
        log(f"march kernel alone  : {t*1e3:7.2f} ms "
            f"({len(ids)} slabs, no z-cull)")

        # full frame (single pose; includes FrameGeom, march, warp)
        f = jax.jit(lambda g, t_: slab_render.render_frame(
            g, t_, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
        t = sync_time(f, grid, tr)
        log(f"full frame (1 pose) : {t*1e3:7.2f} ms "
            f"-> {W*H/t/1e6:6.1f} Mrays/s")

        # batched
        same = [c for c in cams if slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
        trs = jnp.asarray(np.stack([c.transform for c in same]))
        fb = jax.jit(lambda g, ts: slab_render.render_frames(
            g, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
        t = sync_time(fb, grid, trs, reps=2)
        log(f"batched {len(same)} poses     : {t*1e3:7.2f} ms total, "
            f"{t/len(same)*1e3:6.2f} ms/frame "
            f"-> {len(same)*W*H/t/1e6:6.1f} Mrays/s")

        # warp alone: tiny bbox -> ~0 slabs live
        opt1 = opt.replace(render_bbox=(0.0, 0.0, 0.0, 0.004, 0.004, 0.004))
        f1 = jax.jit(lambda g, t_: slab_render.render_frame(
            g, t_, cam.fx, cam.fy, perm, flip, W, H, opt1, gi))
        t = sync_time(f1, grid, tr)
        log(f"fixed overhead      : {t*1e3:7.2f} ms (geom+warp, ~0 slabs)")


if __name__ == "__main__":
    main()
