"""Superquad table BUILD cost: the per-pose 64-channel shifted concat is
what re-spends the gather win (XLA materializes it badly). Variants:

  b0  production ref warp (quad build + 640k gather + combine)
  b1  sq current: double-concat build
  b2  sq: stack + transpose build
  b3  sq: Pallas build kernel (planar acc4 in, interleaved 64ch out,
      finalize fused)
Each runs in-situ: per-pose inter derived from per-pose acc4 (no
loop-invariant hoisting), lax.map over 24 poses, host-transfer sync.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, display_warp
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


def build_pallas(it_planar, gi, BH=16):
    """Interleaved build: full planar input VMEM-resident; out blocks
    (BH, gi-3, 64) written per grid step with dynamic halo slicing."""
    nb = -(-(gi - 3) // BH)
    Hp = nb * BH

    def kernel(it_ref, out_ref):
        i = pl.program_id(0)
        r0 = i * BH
        cols = []
        for cy in range(4):
            for cx in range(4):
                for c in range(4):
                    cols.append(it_ref[c, pl.ds(r0 + cy, BH),
                                       cx:cx + (gi - 3)])
        out_ref[...] = jnp.stack(cols, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((BH, gi - 3, 64), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, gi - 3, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(it_planar)


def build_pallas_planar(it_planar, gi, BH=16):
    """Planar build (64, BH, gi-3) blocks -> XLA transpose after."""
    nb = -(-(gi - 3) // BH)
    Hp = nb * BH

    def kernel(it_ref, out_ref):
        i = pl.program_id(0)
        r0 = i * BH
        for cy in range(4):
            for cx in range(4):
                for c in range(4):
                    out_ref[_chan_idx(cy, cx, c)] = it_ref[
                        c, pl.ds(r0 + cy, BH), cx:cx + (gi - 3)]

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((64, BH, gi - 3), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((64, Hp, gi - 3), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(it_planar)


def _chan_idx(cy, cx, c):
    a, i = cy // 2, cy % 2
    b, j = cx // 2, cx % 2
    return a * 32 + b * 16 + i * 8 + j * 4 + c


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
        return g.R, g.u0, g.du, g.v0, g.dv

    rng = np.random.default_rng(0)
    acc4s = jnp.asarray(rng.uniform(0.1, 0.9, (N, 4, gi, gi)), jnp.float32)

    def finalize(a):
        acc = jnp.moveaxis(a[:3], 0, -1)
        T = a[3]
        stopped = T < _F32(opt.stop_thresh)
        renorm = stopped & opt.renormalize
        inter_rgb = jnp.where(renorm[..., None],
                              acc / (1.0 - T[..., None]), acc)
        inter_alpha = jnp.where(stopped, 1.0, 1.0 - T)
        return jnp.concatenate([inter_rgb, inter_alpha[..., None]], -1)

    Hh, Wh = H // 2, W // 2
    Ts = (gi - 3) * (gi - 3)

    def sub_stuff(R, u0, du, v0, dv):
        subs = []
        for p in range(2):
            for q in range(2):
                xs = (jnp.arange(Wh, dtype=_F32) * 2 + q - 0.5 * W) / fx
                ys = -(jnp.arange(Hh, dtype=_F32) * 2 + p - 0.5 * H) / fy
                d_cam = jnp.stack([
                    jnp.broadcast_to(xs[None, :], (Hh, Wh)),
                    jnp.broadcast_to(ys[:, None], (Hh, Wh)),
                    -jnp.ones((Hh, Wh), _F32)], -1)
                d_world = jnp.einsum("hwc,kc->hwk", d_cam, R)
                d_tree = d_world * grid.scale
                us, vs = slab_render._slopes_from_dirs(d_tree, perm)
                gy = (us - u0) / du
                gx = (vs - v0) / dv
                ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
                subs.append((jnp.clip(gy, 0.0, gi - 1 - 1e-6),
                             jnp.clip(gx, 0.0, gi - 1 - 1e-6),
                             ok.astype(_F32)))
        gys = jnp.stack([s[0] for s in subs])
        gxs = jnp.stack([s[1] for s in subs])
        okm = jnp.stack([s[2] for s in subs])
        big = _F32(1e9)
        inb = okm > 0.5
        any_in = jnp.any(inb, 0)
        ymin = jnp.where(any_in, jnp.min(jnp.where(inb, gys, big), 0), 0.0)
        xmin = jnp.where(any_in, jnp.min(jnp.where(inb, gxs, big), 0), 0.0)
        Y0 = jnp.clip(jnp.floor(ymin).astype(jnp.int32), 0, gi - 4)
        X0 = jnp.clip(jnp.floor(xmin).astype(jnp.int32), 0, gi - 4)
        return gys, gxs, okm, Y0, X0

    def tail(tbl_rows, gys, gxs, okm, Y0, X0, stride):
        qg = tbl_rows[Y0 * stride + X0]
        qgp = jnp.transpose(qg, (2, 0, 1))
        ry = gys - Y0.astype(_F32)[None]
        rx = gxs - X0.astype(_F32)[None]
        out16 = display_warp._combine(qgp, ry, rx, okm, Hh, Wh, 1.0)
        out = out16.reshape(2, 2, 4, Hh, Wh)
        return jnp.transpose(out, (3, 0, 4, 1, 2)).reshape(H, W, 4)

    def b1(args):
        a, R, u0, du, v0, dv = args
        inter = finalize(a)
        it = inter.astype(jnp.bfloat16)
        qd = jnp.concatenate([
            it[:-1, :-1], it[:-1, 1:], it[1:, :-1], it[1:, 1:]], -1)
        tbl = jnp.concatenate([
            qd[:-2, :-2], qd[:-2, 2:], qd[2:, :-2], qd[2:, 2:]],
            -1).reshape(Ts, 64)
        return tail(tbl, *sub_stuff(R, u0, du, v0, dv), gi - 3)

    def b2(args):
        a, R, u0, du, v0, dv = args
        inter = finalize(a)
        it = inter.astype(jnp.bfloat16)
        parts = [it[cy:cy + (gi - 3), cx:cx + (gi - 3)]
                 for cy in range(4) for cx in range(4)]
        tbl = jnp.stack(parts, axis=2)          # (gi-3, gi-3, 16, 4)
        tbl = tbl.reshape(Ts, 64)
        return tail(tbl, *sub_stuff(R, u0, du, v0, dv), gi - 3)

    def b3(args):
        a, R, u0, du, v0, dv = args
        inter = finalize(a)                     # (gi, gi, 4)
        itp = jnp.transpose(inter, (2, 0, 1)).astype(jnp.bfloat16)
        tblp = build_pallas(itp, gi)            # (Hp, gi-3, 64)
        tbl = tblp[:gi - 3].reshape((gi - 3) * (gi - 3), 64)
        return tail(tbl, *sub_stuff(R, u0, du, v0, dv), gi - 3)

    def b4(args):
        a, R, u0, du, v0, dv = args
        inter = finalize(a)
        itp = jnp.transpose(inter, (2, 0, 1)).astype(jnp.bfloat16)
        tblp = build_pallas_planar(itp, gi)     # (64, Hp, gi-3)
        tbl = jnp.transpose(tblp[:, :gi - 3], (1, 2, 0)).reshape(
            (gi - 3) * (gi - 3), 64)
        return tail(tbl, *sub_stuff(R, u0, du, v0, dv), gi - 3)

    def b0(args):
        a, R, u0, du, v0, dv = args
        inter = finalize(a)
        return slab_render._warp_to_screen_ref(
            inter, opt, R, fx, fy, W, H, gi, perm, u0, du, v0, dv,
            grid.scale)

    for name, fn in (("b0 ref quad", b0), ("b1 concat", b1),
                     ("b2 stack+T", b2), ("b3 pallas ilv", b3),
                     ("b4 pallas+T", b4)):
        @jax.jit
        def wall(ts, accs, fn=fn):
            st = jax.vmap(fields)(ts)
            out = lax.map(fn, (accs, st[0], st[1], st[2], st[3], st[4]))
            return jnp.sum(out, dtype=_F32, axis=(1, 2, 3))
        try:
            r = sync_time(wall, trs, acc4s)
            log(f"{name}: {1e3 * r / N:6.2f} ms/frame")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
