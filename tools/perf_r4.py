"""One-session frame decomposition + superquad-warp prototype.

All numbers are comparable ONLY within one run (session-to-session drift
is ~0.2 ms/frame through the axon tunnel).

march:
  m1 production march_slabs (static window path)
  m4 depth mode (isolates shading share)
warp (fixed (gi,gi,4) intermediate, per-pose geometry):
  w2  current display warp (_warp_to_screen precise=False)
  w6  slopes+taps only (einsum + gy/gx + floor/clip, no gather)
  w8  superquad: 2x2 output blocks gather ONE (4x4 cells x 4ch) row from
      a stride-1 table -> 4x fewer gather rows (XLA gathers run ~1 row/
      cycle, so the H*W quad gather is row-rate-bound); per-pixel bilinear
      as tent-weighted 4x4 reduce.
pieces:
  g1  vmapped FrameGeom (all poses at once)
  f1  finalize (no warp)
full:
  production render_frames
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

    def march_one(pay, tr, depth):
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
            depth=depth, flip=flip)
        return jnp.sum(acc4, dtype=jnp.float32)

    for name, depth in (("m1 march    ", False), ("m4 depth    ", True)):
        f = jax.jit(lambda pay, ts, d=depth: lax.map(
            lambda tr: march_one(pay, tr, d), ts))
        t = sync_time(f, payload, trs, reps=3)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")

    # ---- per-pose warp pieces from a fixed intermediate -------------------
    inter = jnp.ones((gi, gi, 4), jnp.float32) * 0.5

    def geom_of(tr):
        return slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                     opt, gi)

    def slopes(tr):
        gg = geom_of(tr)
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
        return gy, gx

    def w2(it, tr):
        gg = geom_of(tr)
        out = slab_render._warp_to_screen(
            it, opt, gg.R, gg.fx, gg.fy, W, H, gi, perm,
            gg.u0, gg.du, gg.v0, gg.dv, gg.scale, precise=False)
        return jnp.sum(out)

    def w6(it, tr):
        gy, gx = slopes(tr)
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        return (jnp.sum(y0) + jnp.sum(x0) + jnp.sum(gy) + jnp.sum(gx)
                + jnp.sum(ok) + jnp.sum(it[0, 0]))

    def w8(it, tr):
        gy, gx = slopes(tr)
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        it16 = it.astype(jnp.float16)
        # stride-1 table: T[Y,X] = 4x4 cell window x 4ch, (gi-3, gi-3, 64)
        tbl = jnp.concatenate(
            [it16[i:gi - 3 + i, j:gi - 3 + j]
             for i in range(4) for j in range(4)], -1)
        tblf = tbl.reshape((gi - 3) * (gi - 3), 64)
        gyb = gy.reshape(H // 2, 2, W // 2, 2)
        gxb = gx.reshape(H // 2, 2, W // 2, 2)
        Y0 = jnp.clip(jnp.floor(jnp.min(gyb, axis=(1, 3))).astype(
            jnp.int32), 0, gi - 4)                       # (H/2, W/2)
        X0 = jnp.clip(jnp.floor(jnp.min(gxb, axis=(1, 3))).astype(
            jnp.int32), 0, gi - 4)
        q = tblf[Y0 * (gi - 3) + X0].reshape(
            H // 2, W // 2, 4, 4, 4).astype(jnp.float16)
        # per-pixel tent weights over the 4 window rows/cols
        ry = (gyb - Y0[:, None, :, None]).astype(jnp.float16)  # (H/2,2,W/2,2)
        rx = (gxb - X0[:, None, :, None]).astype(jnp.float16)
        iy = jnp.arange(4, dtype=jnp.float16)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            ry[..., None] - iy))                      # (H/2,2,W/2,2,4)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - iy))
        out = jnp.einsum("hawbi,hawbj,hwijc->hawbc", wy, wx, q)
        out = out.reshape(H, W, 4).astype(jnp.float32)
        out = jnp.where(ok[..., None], out, 0.0)
        return jnp.sum(out)

    for name, f_ in (("w2 cur warp ", w2), ("w6 slopes   ", w6),
                     ("w8 superquad", w8)):
        f = jax.jit(lambda it, ts, f_=f_: lax.map(
            lambda tr: f_(it, tr), ts))
        t = sync_time(f, inter, trs, reps=3)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")

    # vmapped geometry, all poses at once
    def gfields(tr):
        gg = geom_of(tr)
        return (gg.u0, gg.du, gg.v0, gg.dv, gg.z_lo_pix, gg.z_hi_pix,
                gg.k0)

    f = jax.jit(lambda ts: jax.vmap(gfields)(ts))
    t = sync_time(f, trs, reps=3)
    log(f"g1 vmap geom: {t/n*1e3:7.2f} ms/frame")

    # full production frame batch
    f = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, fx, fy, perm, flip, W, H, opt, gi))
    t = sync_time(f, grid, trs, reps=3)
    log(f"FULL frame  : {t/n*1e3:7.2f} ms/frame ({n*W*H/(t)/1e6:6.1f} "
        f"Mrays/s-equiv over {n} poses)")


if __name__ == "__main__":
    main()
