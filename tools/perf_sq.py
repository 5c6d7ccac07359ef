"""Superquad warp: build/gather/combine decomposition, one session.

The 800^2 display warp is gather-row-rate bound (p1: 640k 32 B quad rows
= 1.40 ms at ~457 Mrow/s; 8 B rows are 5x SLOWER -> wider rows don't
cost). A 2x2 output block shares one 4x4-cell window = ONE 128 B row
(the documented fast alignment), quartering the row count.

  q7a  stride-1 table build from 16 shifted slices of inter16
  q7b  table build from 4 shifted slices of the existing quad table
  q8   gather only: 160k x 128 B rows
  q9   full superquad warp (build B + gather + explicit-ops combine)
  w2   production warp (same-session reference)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
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

    rng = np.random.RandomState(0)
    inter = jnp.asarray(rng.rand(gi, gi, 4), jnp.float32)
    inter16 = jax.jit(lambda x: x.astype(jnp.float16))(inter)
    inter16.block_until_ready()
    Ts = (gi - 3) * (gi - 3)
    salts = jnp.arange(n, dtype=jnp.float32)

    def build_a(it16, salt):
        it = it16 + salt.astype(jnp.float16)
        tbl = jnp.concatenate(
            [it[i:gi - 3 + i, j:gi - 3 + j]
             for i in range(4) for j in range(4)], -1)
        return jnp.sum(tbl[0, 0].astype(jnp.float32))

    def make_quad(it):
        return jnp.concatenate([
            it[:-1, :-1], it[:-1, 1:], it[1:, :-1], it[1:, 1:]], -1)

    def build_b(it16, salt):
        it = it16 + salt.astype(jnp.float16)
        q = make_quad(it)                       # (gi-1, gi-1, 16)
        tbl = jnp.concatenate([
            q[:-2, :-2], q[:-2, 2:], q[2:, :-2], q[2:, 2:]], -1)
        return jnp.sum(tbl[0, 0].astype(jnp.float32))

    for name, fn in (("q7a build 16-slice", build_a),
                     ("q7b build quad^2  ", build_b)):
        f = jax.jit(lambda it, s, fn=fn: lax.map(
            lambda salt: fn(it, salt), s))
        t = sync_time(f, inter16, salts, reps=3)
        log(f"{name}: {t/n*1e3:7.2f} ms/frame")

    # fixed table + block indices for the pure gather
    q = make_quad(inter16)
    tblfix = jnp.concatenate([
        q[:-2, :-2], q[:-2, 2:], q[2:, :-2], q[2:, 2:]], -1)
    tblfix = jax.jit(lambda x: x.reshape(Ts, 64))(tblfix)
    tblfix.block_until_ready()
    yy = np.clip((np.arange(H // 2) * (gi - 5) // (H // 2)), 0, gi - 5)
    xx = np.clip((np.arange(W // 2) * (gi - 5) // (W // 2)), 0, gi - 5)
    idx_b = jnp.asarray(yy[:, None] * (gi - 3) + xx[None, :], jnp.int32)

    def q8(tab, i2, salt):
        i2s = jnp.minimum(i2 + salt.astype(jnp.int32), Ts - 1)
        return jnp.sum(tab[i2s].astype(jnp.float32))

    f = jax.jit(lambda tab, i2, s: lax.map(
        lambda salt: q8(tab, i2, salt), s))
    t = sync_time(f, tblfix, idx_b, salts, reps=3)
    log(f"q8 gather 160k x 128B: {t/n*1e3:7.2f} ms/frame")

    # ---- full superquad warp ---------------------------------------------
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

    def q9(it, tr):
        gy, gx = slopes(tr)
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        it16 = it.astype(jnp.float16)
        qd = make_quad(it16)
        tbl = jnp.concatenate([
            qd[:-2, :-2], qd[:-2, 2:], qd[2:, :-2], qd[2:, 2:]],
            -1).reshape(Ts, 64)
        gyb = gy.reshape(H // 2, 2, W // 2, 2)
        gxb = gx.reshape(H // 2, 2, W // 2, 2)
        Y0 = jnp.clip(jnp.floor(jnp.min(gyb, axis=(1, 3))).astype(
            jnp.int32), 0, gi - 4)
        X0 = jnp.clip(jnp.floor(jnp.min(gxb, axis=(1, 3))).astype(
            jnp.int32), 0, gi - 4)
        qg = tbl[Y0 * (gi - 3) + X0].reshape(
            H // 2, W // 2, 2, 2, 2, 2, 4)   # [a, b, i, j, c] quad layout
        ry = gyb - Y0[:, None, :, None].astype(jnp.float32)
        rx = gxb - X0[:, None, :, None].astype(jnp.float32)
        # tent weights for absolute cell offsets 2a+i / 2b+j
        out = jnp.zeros((H // 2, 2, W // 2, 2, 4), jnp.float16)
        for a in range(2):
            for i in range(2):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                    ry - (2 * a + i))).astype(jnp.float16)
                for b in range(2):
                    for j in range(2):
                        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                            rx - (2 * b + j))).astype(jnp.float16)
                        w = (wy * wx)[:, :, :, :, None]
                        cell = qg[:, :, a, b, i, j, :]   # (H/2, W/2, 4)
                        out = out + w * cell[:, None, :, None, :]
        out = out.reshape(H, W, 4).astype(jnp.float32)
        out = jnp.where(ok[..., None], out, 0.0)
        rgb = out[..., :3] + 1.0 * (1.0 - out[..., 3:4])
        return jnp.sum(jnp.concatenate([rgb, out[..., 3:4]], -1))

    f = jax.jit(lambda it, ts: lax.map(lambda tr: q9(it, tr), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"q9 superquad warp    : {t/n*1e3:7.2f} ms/frame")

    def w2(it, tr):
        gg = geom_of(tr)
        out = slab_render._warp_to_screen(
            it, opt, gg.R, gg.fx, gg.fy, W, H, gi, perm,
            gg.u0, gg.du, gg.v0, gg.dv, gg.scale, precise=False)
        return jnp.sum(out)

    f = jax.jit(lambda it, ts: lax.map(lambda tr: w2(it, tr), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"w2 current warp      : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
