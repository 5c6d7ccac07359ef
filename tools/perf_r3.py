"""Post-warp-fix breakdown: chunk-size sweep + in-batch decomposition."""

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
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def main():
    W = H = 800
    gi = 448
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    G = grid.G
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    ids = grid.slab_ids(perm[0], flip, float(opt.sigma_thresh))
    log(f"setup done; {len(ids)} slabs")

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

    for chunk, K in ((32, 4), (64, 4), (128, 4), (256, 4), (64, 8),
                     (256, 8)):
        pallas_slab._CHUNK = chunk
        jax.clear_caches()

        @jax.jit
        def march_only(gp, p, z):
            return pallas_slab.march_slabs(
                gp, p, grid.qscale, z, G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=ids, sig2=grid.quantized,
                k_per_step=K)
        t = sync_time(march_only, gplanar, params, zb)
        log(f"march 256 slabs CHUNK={chunk:3d} K={K}: {t*1e3:7.2f} ms")
    pallas_slab._CHUNK = 32
    jax.clear_caches()

    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]))
    n = len(same)
    fb = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(fb, grid, trs, reps=3)
    log(f"batched {n} full     : {t/n*1e3:6.2f} ms/frame "
        f"({n*W*H/t/1e6:6.1f} Mrays/s)")

    opt1 = opt.replace(render_bbox=(0.0, 0.0, 0.0, 0.004, 0.004, 0.004))
    fb1 = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, cam.fx, cam.fy, perm, flip, W, H, opt1, gi))
    t = sync_time(fb1, grid, trs, reps=3)
    log(f"batched {n} fixed ovh: {t/n*1e3:6.2f} ms/frame (geom+warp only)")


if __name__ == "__main__":
    main()
