"""March DMA/compute overlap sweep: K (slabs/grid-step) x VMEM limit.

At K=4/100MB the march measures ~2.16 ms vs a ~1.3 ms DMA floor (m4 depth
probe) — DMA and compute look serial. Smaller blocks / more VMEM headroom
may let Mosaic double-buffer the 13.4 MB window blocks.
Also times the full frame with the f16-combine warp to get the new total.
"""

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
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    fx, fy = cam.fx, cam.fy
    log(f"setup done; {n} poses")

    payload, _ = slab_render._permuted_grid(grid, perm, True)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)

    def march_one(pay, tr, k):
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
        acc4 = pallas_slab.march_slabs(
            pay, params, grid.qscale, zb, G, gi, grid.data_dim,
            grid.basis_dim, perm, slab_ids=slab_ids, sig2=grid.quantized,
            flip=flip, k_per_step=k)
        return jnp.sum(acc4, dtype=jnp.float32)

    # pure-DMA floor: same block stream, near-zero compute
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    Dp = payload.shape[1]
    n_win = G // 4
    ids = jnp.arange(n_win, dtype=jnp.int32)

    def dma_kernel(ids_ref, slab_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += slab_ref[0, 0, :8, :128].astype(jnp.float32)

    def dma_once(pay):
        return pl.pallas_call(
            dma_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_win,),
                in_specs=[pl.BlockSpec((4, Dp, G, G),
                                       lambda i, ids: (ids[i], 0, 0, 0))],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ids, pay)

    f = jax.jit(lambda pay, ts: lax.map(
        lambda tr: jnp.sum(dma_once(pay)) + jnp.sum(tr), ts))
    t = sync_time(f, payload, trs, reps=3)
    gb = payload.size * payload.dtype.itemsize / 1e9
    log(f"pure DMA stream  : {t/n*1e3:7.2f} ms/frame "
        f"({gb/(t/n):6.0f} GB/s)")

    for vmem in (100, 120):
        pallas_slab._VMEM_LIMIT = vmem * 1024 * 1024
        for k in (1, 2, 4):
            jax.clear_caches()
            f = jax.jit(lambda pay, ts, k=k: lax.map(
                lambda tr: march_one(pay, tr, k), ts))
            try:
                t = sync_time(f, payload, trs, reps=3)
                log(f"vmem={vmem} K={k}: {t/n*1e3:7.2f} ms/frame")
            except Exception as e:
                log(f"vmem={vmem} K={k}: FAILED {str(e)[:120]}")
    pallas_slab._VMEM_LIMIT = 100 * 1024 * 1024
    jax.clear_caches()

    # full frame with the f16-combine warp
    full = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, fx, fy, perm, flip, W, H, opt, gi))
    t = sync_time(full, grid, trs, reps=3)
    log(f"full (f16 warp)  : {t/n*1e3:7.2f} ms/frame "
        f"({n*W*H/t/1e6:6.1f} Mrays/s)")


if __name__ == "__main__":
    main()
