"""March-kernel and final-warp variants, timed in ONE chip session.

March variants (batched over poses, kernel only):
  m1 current (K=4)           m2 K=8          m3 CHUNK=256 (via K)
  m4 depth mode (drops 3 of 4 stage-2 matmuls -> isolates matmul share)

Warp variants (from a fixed intermediate):
  w1 current precise=False   w2 f16 combine (no astype f32)
  w3 w16 lane-slice combine  w4 nearest 4-wide row (lower bound)
  w5 affine-ratio slopes (no d_cam einsum)
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
    log(f"setup done; {n} poses, group {perm} flip={flip}")

    payload, _ = slab_render._permuted_grid(grid, perm, True)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
    log(f"{len(slab_ids)}/{G} slabs occupied")

    def march_one(pay, tr, k_per_step, depth):
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
            depth=depth, flip=flip, k_per_step=k_per_step)
        return jnp.sum(acc4, dtype=jnp.float32)

    for name, k, depth in (("m1 K=4      ", 4, False),
                           ("m2 K=8      ", 8, False),
                           ("m4 depth    ", 4, True)):
        f = jax.jit(lambda pay, ts, k=k, d=depth: lax.map(
            lambda tr: march_one(pay, tr, k, d), ts))
        t = sync_time(f, payload, trs, reps=3)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")

    # ---- warp variants ----------------------------------------------------
    g = slab_render.FrameGeom(grid, trs[0], fx, fy, perm, flip, W, H, opt,
                              gi)
    inter = jnp.ones((gi, gi, 4), jnp.float32) * 0.5

    def warp_common(tr):
        gg = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                   gi)
        px = (jnp.arange(W, dtype=jnp.float32) - 0.5 * W) / gg.fx
        py = -(jnp.arange(H, dtype=jnp.float32) - 0.5 * H) / gg.fy
        d_cam = jnp.stack([
            jnp.broadcast_to(px[None, :], (H, W)),
            jnp.broadcast_to(py[:, None], (H, W)),
            -jnp.ones((H, W), jnp.float32)], -1)
        d_tree_s = jnp.einsum("hwc,kc->hwk", d_cam, gg.R) * gg.scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - gg.u0) / gg.du
        gx = (vs - gg.v0) / gg.dv
        return gg, gy, gx

    def warp_common_affine(tr):
        """slopes as ratios of affine iota planes (no (H,W,3) d_cam)."""
        gg = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                   gi)
        Rs = gg.R * gg.scale[:, None]          # rows: tree axes
        xcol = (lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(
            jnp.float32) - 0.5 * W) / gg.fx
        yrow = -(lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(
            jnp.float32) - 0.5 * H) / gg.fy

        def plane(a):
            return Rs[a, 0] * xcol + Rs[a, 1] * yrow - Rs[a, 2]

        dz = plane(perm[0])
        safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
        inv = 1.0 / safe
        gy = (plane(perm[1]) * inv - gg.u0) / gg.du
        gx = (plane(perm[2]) * inv - gg.v0) / gg.dv
        return gg, gy, gx

    def taps(gy, gx):
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        return ok, y0, x0, gy - y0, gx - x0

    inter16 = inter.astype(jnp.float16)
    quad = jnp.concatenate([
        inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
        inter16[1:, 1:]], -1)
    flatq = quad.reshape((gi - 1) * (gi - 1), 16)
    flatq.block_until_ready()

    def w1(fq, tr):   # current
        gg, gy, gx = warp_common(tr)
        ok, y0, x0, fy_, fx_ = taps(gy, gx)
        q = fq[jnp.minimum(y0, gi - 2) * (gi - 1)
               + jnp.minimum(x0, gi - 2)].reshape(H, W, 4, 4)
        q = q.astype(jnp.float32)
        fy_, fx_ = fy_[..., None], fx_[..., None]
        v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :], q[..., 2, :],
                              q[..., 3, :])
        out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
               + (v10 * (1 - fx_) + v11 * fx_) * fy_)
        return jnp.sum(jnp.where(ok[..., None], out, 0.0))

    def w2(fq, tr):   # f16 combine
        gg, gy, gx = warp_common(tr)
        ok, y0, x0, fy_, fx_ = taps(gy, gx)
        q = fq[jnp.minimum(y0, gi - 2) * (gi - 1)
               + jnp.minimum(x0, gi - 2)].reshape(H, W, 4, 4)
        fy_ = fy_[..., None].astype(jnp.float16)
        fx_ = fx_[..., None].astype(jnp.float16)
        v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :], q[..., 2, :],
                              q[..., 3, :])
        out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
               + (v10 * (1 - fx_) + v11 * fx_) * fy_)
        return jnp.sum(jnp.where(ok[..., None], out, 0.0)
                       .astype(jnp.float32))

    def w3(fq, tr):   # w16 lane-slice combine, f16
        gg, gy, gx = warp_common(tr)
        ok, y0, x0, fy_, fx_ = taps(gy, gx)
        q16 = fq[jnp.minimum(y0, gi - 2) * (gi - 1)
                 + jnp.minimum(x0, gi - 2)]        # (H, W, 16)
        w00 = ((1 - fx_) * (1 - fy_)).astype(jnp.float16)[..., None]
        w01 = (fx_ * (1 - fy_)).astype(jnp.float16)[..., None]
        w10 = ((1 - fx_) * fy_).astype(jnp.float16)[..., None]
        w11 = (fx_ * fy_).astype(jnp.float16)[..., None]
        out = (q16[..., 0:4] * w00 + q16[..., 4:8] * w01
               + q16[..., 8:12] * w10 + q16[..., 12:16] * w11)
        return jnp.sum(jnp.where(ok[..., None], out, 0.0)
                       .astype(jnp.float32))

    def w4(fq4, tr):  # nearest single-tap (lower bound)
        gg, gy, gx = warp_common(tr)
        ok, y0, x0, fy_, fx_ = taps(gy, gx)
        q = fq4[y0 * gi + x0]
        return jnp.sum(jnp.where(ok[..., None], q, 0.0)
                       .astype(jnp.float32))

    def w5(fq, tr):   # affine-ratio slopes + w3 combine
        gg, gy, gx = warp_common_affine(tr)
        ok, y0, x0, fy_, fx_ = taps(gy, gx)
        q16 = fq[jnp.minimum(y0, gi - 2) * (gi - 1)
                 + jnp.minimum(x0, gi - 2)]
        w00 = ((1 - fx_) * (1 - fy_)).astype(jnp.float16)[..., None]
        w01 = (fx_ * (1 - fy_)).astype(jnp.float16)[..., None]
        w10 = ((1 - fx_) * fy_).astype(jnp.float16)[..., None]
        w11 = (fx_ * fy_).astype(jnp.float16)[..., None]
        out = (q16[..., 0:4] * w00 + q16[..., 4:8] * w01
               + q16[..., 8:12] * w10 + q16[..., 12:16] * w11)
        return jnp.sum(jnp.where(ok[..., None], out, 0.0)
                       .astype(jnp.float32))

    flat4 = inter16.reshape(gi * gi, 4)
    flat4.block_until_ready()
    for name, fn, tab in (("w1 current  ", w1, flatq),
                          ("w2 f16 comb ", w2, flatq),
                          ("w3 w16 slice", w3, flatq),
                          ("w4 nearest  ", w4, flat4),
                          ("w5 affine   ", w5, flatq)):
        f = jax.jit(lambda tb, ts, fn=fn: lax.map(
            lambda tr: fn(tb, tr), ts))
        t = sync_time(f, tab, trs)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
