"""Fine-grained warp decomposition + shared-qs march, one session.

march:
  m1  production march (now with shared-per-k dequant: 48 -> 16 plane
      multiplies per slab)
warp pieces (fixed inputs, 24-pose lax.map to amortize dispatch):
  p1  quad-row gather only (precomputed flat indices)
  p2  p1 + bilinear combine in f16 (fixed fractional weights)
  p3  p2 + ok-where + background composite (the full finalize tail)
  p4  nearest 8-byte-row gather (row-rate reference)
  p6  combine only (fixed pre-gathered q)
  w2  production _warp_to_screen display path (for the same-session total)
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

    f = jax.jit(lambda pay, ts: lax.map(lambda tr: march_one(pay, tr), ts))
    t = sync_time(f, payload, trs, reps=3)
    log(f"m1 march qs16 : {t/n*1e3:7.2f} ms/frame")

    # ---- warp pieces ------------------------------------------------------
    rng = np.random.RandomState(0)
    inter = jnp.asarray(rng.rand(gi, gi, 4), jnp.float32)
    inter16 = inter.astype(jnp.float16)
    quad = jnp.concatenate([
        inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
        inter16[1:, 1:]], -1)
    flatq = quad.reshape((gi - 1) * (gi - 1), 16)
    idx = jnp.asarray(
        rng.randint(0, (gi - 1) * (gi - 1), (H, W)), jnp.int32)
    # smooth plausible indices (scanline-ish) for realistic locality
    yy = np.clip((np.arange(H) * (gi - 2) / H).astype(np.int32), 0, gi - 2)
    xx = np.clip((np.arange(W) * (gi - 2) / W).astype(np.int32), 0, gi - 2)
    idx_s = jnp.asarray(yy[:, None] * (gi - 1) + xx[None, :], jnp.int32)
    fxw = jnp.asarray(rng.rand(H, W, 1), jnp.float16)
    fyw = jnp.asarray(rng.rand(H, W, 1), jnp.float16)
    okm = jnp.asarray(rng.rand(H, W) > 0.1)
    nearest = inter16.reshape(gi * gi, 4)
    idx_n = jnp.minimum(idx_s, gi * gi - 1)
    qfix = jnp.asarray(rng.rand(H, W, 4, 4), jnp.float16)

    def _si(i2, salt, lim):
        # salt the indices so lax.map can't hoist the gather out of the loop
        return jnp.minimum(i2 + salt.astype(jnp.int32), lim - 1)

    def p1(fq, i2, salt):
        return jnp.sum(fq[_si(i2, salt, fq.shape[0])]
                       .astype(jnp.float32))

    def combine(q):
        v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :], q[..., 2, :],
                              q[..., 3, :])
        out = ((v00 * (1 - fxw) + v01 * fxw) * (1 - fyw)
               + (v10 * (1 - fxw) + v11 * fxw) * fyw)
        return out

    def p2(fq, i2, salt):
        q = fq[_si(i2, salt, fq.shape[0])].reshape(H, W, 4, 4)
        return jnp.sum(combine(q).astype(jnp.float32))

    def p3(fq, i2, salt):
        q = fq[_si(i2, salt, fq.shape[0])].reshape(H, W, 4, 4)
        out = combine(q)
        out = jnp.where(okm[..., None], out, 0.0).astype(jnp.float32)
        rgb = out[..., :3] + 1.0 * (1.0 - out[..., 3:4])
        return jnp.sum(jnp.concatenate([rgb, out[..., 3:4]], -1)) + salt

    def p4(fq, i2, salt):
        return jnp.sum(nearest[_si(i2, salt, gi * gi)]
                       .astype(jnp.float32))

    def p6(fq, i2, salt):
        return jnp.sum(combine(qfix + salt.astype(jnp.float16))
                       .astype(jnp.float32))

    salts = jnp.arange(n, dtype=jnp.float32)
    for name, fn, table, ii in (
            ("p1 quad gather", p1, flatq, idx_s),
            ("p2 +combine   ", p2, flatq, idx_s),
            ("p3 +ok+bg     ", p3, flatq, idx_s),
            ("p4 nearest 8B ", p4, nearest, idx_n),
            ("p6 combine fix", p6, flatq, idx_s)):
        f = jax.jit(lambda tab, i2, s, fn=fn: lax.map(
            lambda salt: fn(tab, i2, salt), s))
        t = sync_time(f, table, ii, salts, reps=3)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")

    def w2(it, tr):
        gg = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                   opt, gi)
        out = slab_render._warp_to_screen(
            it, opt, gg.R, gg.fx, gg.fy, W, H, gi, perm,
            gg.u0, gg.du, gg.v0, gg.dv, gg.scale, precise=False)
        return jnp.sum(out)

    f = jax.jit(lambda it, ts: lax.map(lambda tr: w2(it, tr), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"w2 cur warp   : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
