"""Cumulative-stage decomposition of _finalize_and_warp at bench scale.

Each stage is a separate jit over a 24-pose batch (lax.map), consuming
real acc4 inputs and ending in a host-transferred checksum, so XLA can't
DCE work and the tunnel sync rules hold. Stage deltas = true costs.

  s0 finalize (renorm/alpha -> inter)
  s1 + quad table build (f16 shifted concat)
  s2 + screen ray planes (d_cam einsum, slopes, gy/gx/ok/floor)
  s3 + whole-table gather
  s4 + bilinear combine + bg composite  (== production)
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
    _ = float(jnp.sum(out))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


_F32 = jnp.float32


def main():
    W = H = 800
    gi = 448
    N = 24
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    log("setup")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    groups = {}
    for c in cams:
        perm, flip, _ = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        groups.setdefault((perm, flip), []).append(c.transform)
    (perm, flip), trs_all = max(groups.items(), key=lambda kv: len(kv[1]))
    fx, fy = cams[0].fx, cams[0].fy
    trs = jnp.asarray(np.stack(trs_all[:N]), jnp.float32)

    def fields(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        return g.R, g.u0, g.du, g.v0, g.dv, g.origin_w

    rng = np.random.default_rng(0)
    acc4s = jnp.asarray(rng.uniform(0.1, 0.9, (N, 4, gi, gi)), jnp.float32)

    def finalize(acc4):
        acc = jnp.moveaxis(acc4[:3], 0, -1)
        T = acc4[3]
        stopped = T < _F32(opt.stop_thresh)
        renorm = stopped & opt.renormalize
        inter_rgb = jnp.where(renorm[..., None],
                              acc / (1.0 - T[..., None]), acc)
        inter_alpha = jnp.where(stopped, 1.0, 1.0 - T)
        return jnp.concatenate([inter_rgb, inter_alpha[..., None]], -1)

    def build(inter):
        inter16 = inter.astype(jnp.float16)
        return jnp.concatenate([
            inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
            inter16[1:, 1:]], -1)

    def planes(R, u0, du, v0, dv):
        px = (jnp.arange(W, dtype=_F32) - 0.5 * W) / fx
        py = -(jnp.arange(H, dtype=_F32) - 0.5 * H) / fy
        d_cam = jnp.stack([
            jnp.broadcast_to(px[None, :], (H, W)),
            jnp.broadcast_to(py[:, None], (H, W)),
            -jnp.ones((H, W), _F32)], -1)
        d_world_s = jnp.einsum("hwc,kc->hwk", d_cam, R)
        d_tree_s = d_world_s * grid.scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - u0) / du
        gx = (vs - v0) / dv
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        return ok, gy, gx, y0, x0

    def gather(quad, y0, x0):
        y0c = jnp.minimum(y0, gi - 2)
        x0c = jnp.minimum(x0, gi - 2)
        return quad.reshape((gi - 1) * (gi - 1), 16)[
            y0c * (gi - 1) + x0c].reshape(H, W, 4, 4)

    def combine(q, ok, gy, gx, y0, x0):
        fy_ = (gy - y0)[..., None].astype(jnp.float16)
        fx_ = (gx - x0)[..., None].astype(jnp.float16)
        v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :], q[..., 2, :],
                              q[..., 3, :])
        out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
               + (v10 * (1 - fx_) + v11 * fx_) * fy_)
        out = jnp.where(ok[..., None], out, 0.0).astype(_F32)
        rgb = out[..., :3] + _F32(opt.background_brightness) * (
            1.0 - out[..., 3:4])
        return jnp.concatenate([rgb, out[..., 3:4]], -1)

    # ---- stages --------------------------------------------------------
    @jax.jit
    def s0(accs):
        return lax.map(lambda a: jnp.sum(finalize(a), dtype=_F32), accs)

    @jax.jit
    def s1(accs):
        return lax.map(lambda a: jnp.sum(build(finalize(a)), dtype=_F32),
                       accs)

    @jax.jit
    def s2(ts, accs):
        st = jax.vmap(fields)(ts)

        def one(args):
            a, R, u0, du, v0, dv = args
            quad = build(finalize(a))
            ok, gy, gx, y0, x0 = planes(R, u0, du, v0, dv)
            return (jnp.sum(quad, dtype=_F32) + jnp.sum(gy) + jnp.sum(gx)
                    + jnp.sum(y0) + jnp.sum(x0))

        return lax.map(one, (accs, st[0], st[1], st[2], st[3], st[4]))

    @jax.jit
    def s3(ts, accs):
        st = jax.vmap(fields)(ts)

        def one(args):
            a, R, u0, du, v0, dv = args
            quad = build(finalize(a))
            ok, gy, gx, y0, x0 = planes(R, u0, du, v0, dv)
            q = gather(quad, y0, x0)
            return jnp.sum(q, dtype=_F32) + jnp.sum(gy) + jnp.sum(gx)

        return lax.map(one, (accs, st[0], st[1], st[2], st[3], st[4]))

    @jax.jit
    def s4(ts, accs):
        st = jax.vmap(fields)(ts)

        def one(args):
            a, R, u0, du, v0, dv = args
            quad = build(finalize(a))
            ok, gy, gx, y0, x0 = planes(R, u0, du, v0, dv)
            q = gather(quad, y0, x0)
            return jnp.sum(combine(q, ok, gy, gx, y0, x0), dtype=_F32)

        return lax.map(one, (accs, st[0], st[1], st[2], st[3], st[4]))

    @jax.jit
    def s4p(ts, accs):
        st = jax.vmap(fields)(ts)

        def one(args):
            a, R, u0, du, v0, dv = args
            acc = jnp.moveaxis(a[:3], 0, -1)
            T = a[3]
            stopped = T < _F32(opt.stop_thresh)
            return jnp.sum(slab_render._finalize_and_warp(
                grid, acc, T, stopped, opt, R, fx, fy, W, H, gi, perm,
                u0, du, v0, dv, grid.scale, origin=None), dtype=_F32)

        return lax.map(one, (accs, st[0], st[1], st[2], st[3], st[4]))

    r0 = sync_time(s0, acc4s)
    log(f"s0 finalize          : {1e3 * r0 / N:6.2f} ms/frame")
    r1 = sync_time(s1, acc4s)
    log(f"s1 + quad build      : {1e3 * r1 / N:6.2f} (+{1e3*(r1-r0)/N:.2f})")
    r2 = sync_time(s2, trs, acc4s)
    log(f"s2 + ray planes      : {1e3 * r2 / N:6.2f} (+{1e3*(r2-r1)/N:.2f})")
    r3 = sync_time(s3, trs, acc4s)
    log(f"s3 + gather          : {1e3 * r3 / N:6.2f} (+{1e3*(r3-r2)/N:.2f})")
    r4 = sync_time(s4, trs, acc4s)
    log(f"s4 + combine+bg      : {1e3 * r4 / N:6.2f} (+{1e3*(r4-r3)/N:.2f})")
    r4p = sync_time(s4p, trs, acc4s)
    log(f"s4p production       : {1e3 * r4p / N:6.2f} ms/frame")


if __name__ == "__main__":
    main()
