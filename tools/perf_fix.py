"""Decompose the per-frame fixed overhead (everything but the march kernel).

Times, all batched over 25 poses inside one jit (bench-style):
  full        : render_frames as shipped
  march+sum   : march only, acc summed (no finalize/warp)
  geom only   : FrameGeom construction (zbounds etc.)
  warp only   : _finalize_and_warp from a precomputed intermediate
  warp stages : screen slopes / gather / bilinear+bg, separately
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
def sync_time(fn, *args, reps=4):
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
    log(f"setup done; {n} poses, group {perm} flip={flip}")

    # full
    full = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, fx, fy, perm, flip, W, H, opt, gi))
    t = sync_time(full, grid, trs, reps=3)
    log(f"full               : {t/n*1e3:7.2f} ms/frame ({n*W*H/t/1e6:6.1f} Mrays/s)")

    # march only (reuse internals): permute once, map FrameGeom+kernel
    use_pallas = slab_render._pallas_ok(grid, opt)
    payload, _ = slab_render._permuted_grid(grid, perm, use_pallas)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)

    def march_one(pay, tr):
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
            flip=flip)
        return jnp.sum(acc4, dtype=jnp.float32)

    # payload must be an argument, not a closure capture (the remote
    # compiler rejects GB-size HLO constants)
    marchf = jax.jit(lambda pay, ts: lax.map(
        lambda tr: march_one(pay, tr), ts))
    t = sync_time(marchf, payload, trs, reps=3)
    log(f"geom+march only    : {t/n*1e3:7.2f} ms/frame")

    # geom only
    def geom_one(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        return jnp.sum(g.z_lo_pix) + jnp.sum(g.z_hi_pix) + g.u0 + g.v0

    geomf = jax.jit(lambda ts: lax.map(geom_one, ts))
    t = sync_time(geomf, trs)
    log(f"geom only          : {t/n*1e3:7.2f} ms/frame")

    # warp only from a fixed intermediate
    inter = jnp.ones((gi, gi, 4), jnp.float32) * 0.5

    def warp_one(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        out = slab_render._warp_to_screen(
            inter, opt, g.R, g.fx, g.fy, W, H, gi, perm,
            g.u0, g.du, g.v0, g.dv, g.scale)
        return jnp.sum(out, dtype=jnp.float32)

    warpf = jax.jit(lambda ts: lax.map(warp_one, ts))
    t = sync_time(warpf, trs)
    log(f"geom+warp only     : {t/n*1e3:7.2f} ms/frame")

    # warp sub-stage: slopes+indices only (no gather/bilinear)
    def slopes_one(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        px = (jnp.arange(W, dtype=jnp.float32) - 0.5 * W) / g.fx
        py = -(jnp.arange(H, dtype=jnp.float32) - 0.5 * H) / g.fy
        d_cam = jnp.stack([
            jnp.broadcast_to(px[None, :], (H, W)),
            jnp.broadcast_to(py[:, None], (H, W)),
            -jnp.ones((H, W), jnp.float32)], -1)
        d_tree_s = jnp.einsum("hwc,kc->hwk", d_cam, g.R) * g.scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - g.u0) / g.du
        gx = (vs - g.v0) / g.dv
        return jnp.sum(gy) + jnp.sum(gx)

    slopef = jax.jit(lambda ts: lax.map(slopes_one, ts))
    t = sync_time(slopef, trs)
    log(f"geom+slopes only   : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
