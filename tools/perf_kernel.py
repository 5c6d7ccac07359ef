"""Kernel-level perf decomposition on the real chip (one process)."""

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
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    opt = RenderOptions(max_steps=1024)
    G = grid.G
    log(f"setup done G={G}")

    cams = bench_mod.orbit_poses(12)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform)

    # 1) march kernel alone (with fixed params/zbounds)
    gplanar = jnp.transpose(
        grid.data, (perm[0], 3, perm[1], perm[2])).astype(jnp.bfloat16)
    gi = 512
    params = jnp.zeros((30,), jnp.float32).at[0].set(-2.0).at[4].set(
        4.0 / gi).at[3].set(-2.0).at[5].set(-2.0).at[6].set(4.0 / gi).at[
        7].set(1.0).at[8].set(2.0).at[9].set(2.0).at[10].set(2.0).at[
        11].set(2.0).at[12].set(2.0).at[13].set(2.0).at[14].set(1e-2).at[
        15].set(1e-2).at[17].set(1.0).at[19].set(1.0)
    # dirM affine slope->dir map (params[20:29], see _pack_params): the
    # slot-based construction sgn * inv_scale[a] * e_{slot[a]}
    slot = {perm[0]: 0, perm[1]: 1, perm[2]: 2}
    for a in range(3):
        params = params.at[20 + 3 * a + slot[a]].set(2.0)
    params = params.at[29].set(-2.0)     # depth t origin (= cz)
    zb = jnp.stack([jnp.zeros((gi, gi)), jnp.ones((gi, gi))])

    ids = grid.slab_ids(perm[0], flip, float(opt.sigma_thresh))
    log(f"occupied slabs: {len(ids)}/{G}")

    @jax.jit
    def march_only(gp, p, z):
        return pallas_slab.march_slabs(gp, p, grid.qscale, z, G, gi,
                                       grid.data_dim, grid.basis_dim, perm,
                                       slab_ids=ids, sig2=grid.quantized)
    t = sync_time(march_only, gplanar, params, zb)
    log(f"march kernel alone  : {t*1e3:7.2f} ms")

    # 2) full frame (single pose, includes transpose+warp)
    f = jax.jit(lambda g, t_: slab_render.render_frame(
        g, t_, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(f, grid, tr)
    log(f"full frame (1 pose) : {t*1e3:7.2f} ms")

    # 3) batched frames per-pose cost (transpose amortized)
    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]))
    fb = jax.jit(lambda g, ts: slab_render.render_frames(
        g, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(fb, grid, trs, reps=2)
    log(f"batched {len(same)} poses     : {t*1e3:7.2f} ms total, "
        f"{t/len(same)*1e3:6.2f} ms/frame")


if __name__ == "__main__":
    main()
