"""Multi-pose march sweep: P poses per kernel pass, march-only ms/frame.

RESULT (v5e, G=256 int8, gi=448): P=1: 2.25  P=2: 2.46  P=3: 2.26
P=4: 2.74 ms/frame — batching poses over one volume pass NEVER wins: the
march is compute-bound (~2.2 ms vs ~1.3 ms DMA floor), so sharing the HBM
stream saves nothing while P accumulators eat VMEM. The multi-pose kernel
was reverted; optimize in-kernel compute instead."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, pallas_slab
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
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
    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)][:24]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    fx, fy = cam.fx, cam.fy
    log(f"setup done; {n} poses")

    payload, _ = slab_render._permuted_grid(grid, perm, True)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)

    def geom_fields(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        inv_scale_t = 1.0 / g.scale
        params = pallas_slab._pack_params(
            g.cz, g.cy, g.cx, g.u0, g.du, g.v0, g.dv,
            jnp.asarray(-1.0 if flip else 1.0),
            (inv_scale_t[perm[0]], inv_scale_t[perm[1]],
             inv_scale_t[perm[2]]),
            (inv_scale_t[0], inv_scale_t[1], inv_scale_t[2]),
            jnp.asarray(opt.sigma_thresh), jnp.asarray(opt.stop_thresh),
            g.lo[1], g.hi[1], g.lo[2], g.hi[2], g.dirM, g.z0_depth)
        zb = jnp.stack([g.z_lo_pix, g.z_hi_pix])
        return params, zb

    def march_batched(pay, ts, P):
        tb = ts.reshape(n // P, P, 3, 4)

        def one(trb):
            params, zb = jax.vmap(geom_fields)(trb)
            acc4 = pallas_slab.march_slabs(
                pay, params, grid.qscale, zb, G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=slab_ids,
                sig2=grid.quantized, flip=flip)
            return jnp.sum(acc4, dtype=jnp.float32)

        return lax.map(one, tb)

    for P in (1, 2, 3, 4, 6):
        jax.clear_caches()
        f = jax.jit(lambda pay, ts, P=P: march_batched(pay, ts, P))
        try:
            t = sync_time(f, payload, trs, reps=3)
            log(f"P={P}: {t/n*1e3:7.2f} ms/frame")
        except Exception as e:
            log(f"P={P}: FAILED {str(e)[:150]}")


if __name__ == "__main__":
    main()
