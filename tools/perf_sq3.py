"""Superquad warp with a PALLAS tent-combine kernel.

The 160k x 128 B superquad gather runs 0.24 ms (6x the 640k quad gather),
but XLA generates ~150x-roofline code for the 41 MFLOP tent combine
(1.9-2.2 ms total, tools/perf_sq2.py). This prototype moves the combine
into a Pallas kernel with explicit planar layout:

  XLA:    4x subpixel slope grids (free) -> Y0/X0 -> table build (4
          shifted slices of the quad table) -> 160k x 128 B gather ->
          planar transpose (64, Hh, Wh)
  Pallas: 16 output planes [p, q, c] = sum over 16 cells of
          tent(ry[p]-cy) * tent(rx[q]-cx) * qg[chan], + ok mask + bg
  XLA:    (2,2,4,Hh,Wh) -> (H, W, 4) interleave

  s1  correctness vs the production warp (interpret mode, CPU-safe)
  s2  TPU timing vs production w2
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def chan(cy, cx, c):
    a, i = cy // 2, cy % 2
    b, j = cx // 2, cx % 2
    return a * 32 + b * 16 + i * 8 + j * 4 + c


def make_combine_kernel(Hh, Wh, BH, bg):
    def kernel(qg_ref, ry_ref, rx_ref, ok_ref, out_ref):
        for s in range(4):                     # subpixel p*2+q
            ryv = ry_ref[s]
            rxv = rx_ref[s]
            wy = [jnp.maximum(0.0, 1.0 - jnp.abs(ryv - cy))
                  for cy in range(4)]
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(rxv - cx))
                  for cx in range(4)]
            ok = ok_ref[s]
            rgba = []
            for c in range(4):
                acc = jnp.zeros((BH, Wh), jnp.float32)
                for cy in range(4):
                    for cx in range(4):
                        acc = acc + (wy[cy] * wx[cx]) * qg_ref[
                            chan(cy, cx, c)].astype(jnp.float32)
                rgba.append(acc)
            alpha = rgba[3]
            for c in range(3):
                out_ref[s * 4 + c] = jnp.where(
                    ok > 0.5, rgba[c] + bg * (1.0 - alpha), bg)
            out_ref[s * 4 + 3] = jnp.where(ok > 0.5, alpha, 0.0)

    return kernel


def combine_pallas(qgp, ry, rx, okm, Hh, Wh, BH, bg, interpret):
    kern = make_combine_kernel(Hh, Wh, BH, bg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Hh // BH,),
        in_specs=[
            pl.BlockSpec((64, BH, Wh), lambda i: (0, i, 0)),
            pl.BlockSpec((4, BH, Wh), lambda i: (0, i, 0)),
            pl.BlockSpec((4, BH, Wh), lambda i: (0, i, 0)),
            pl.BlockSpec((4, BH, Wh), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((16, BH, Wh), lambda i: (0, i, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, Hh, Wh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qgp, ry, rx, okm)


def superquad_warp(inter, gg, grid, perm, W, H, gi, opt, interpret):
    """Full superquad display warp for one pose."""
    Hh, Wh = H // 2, W // 2
    Ts = (gi - 3) * (gi - 3)

    def sub_slopes(p, q):
        xs = (jnp.arange(Wh, dtype=jnp.float32) * 2 + q - 0.5 * W) / gg.fx
        ys = -(jnp.arange(Hh, dtype=jnp.float32) * 2 + p
               - 0.5 * H) / gg.fy
        d_cam = jnp.stack([
            jnp.broadcast_to(xs[None, :], (Hh, Wh)),
            jnp.broadcast_to(ys[:, None], (Hh, Wh)),
            -jnp.ones((Hh, Wh), jnp.float32)], -1)
        d_tree_s = jnp.einsum("hwc,kc->hwk", d_cam, gg.R) * gg.scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - gg.u0) / gg.du
        gx = (vs - gg.v0) / gg.dv
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        return (jnp.clip(gy, 0.0, gi - 1 - 1e-6),
                jnp.clip(gx, 0.0, gi - 1 - 1e-6),
                ok.astype(jnp.float32))

    subs = [sub_slopes(p, q) for p in range(2) for q in range(2)]
    gys = jnp.stack([s[0] for s in subs])        # (4, Hh, Wh): [p*2+q]
    gxs = jnp.stack([s[1] for s in subs])
    okm = jnp.stack([s[2] for s in subs])
    Y0 = jnp.clip(jnp.floor(jnp.min(gys, 0)).astype(jnp.int32), 0, gi - 4)
    X0 = jnp.clip(jnp.floor(jnp.min(gxs, 0)).astype(jnp.int32), 0, gi - 4)

    it16 = inter.astype(jnp.bfloat16)   # Mosaic has no f16; bf16 rows
    qd = jnp.concatenate([
        it16[:-1, :-1], it16[:-1, 1:], it16[1:, :-1], it16[1:, 1:]], -1)
    tbl = jnp.concatenate([
        qd[:-2, :-2], qd[:-2, 2:], qd[2:, :-2], qd[2:, 2:]],
        -1).reshape(Ts, 64)
    qg = tbl[Y0 * (gi - 3) + X0]                 # (Hh, Wh, 64)
    qgp = jnp.transpose(qg, (2, 0, 1))           # planar

    # per-subpixel window-relative positions (gy/gx vary with BOTH
    # subpixel axes under perspective)
    Y0f = Y0.astype(jnp.float32)
    X0f = X0.astype(jnp.float32)
    ry = gys - Y0f[None]
    rx = gxs - X0f[None]

    out16 = combine_pallas(qgp, ry, rx, okm, Hh, Wh, 8,
                           float(opt.background_brightness), interpret)
    out = out16.reshape(2, 2, 4, Hh, Wh)
    out = jnp.transpose(out, (3, 0, 4, 1, 2)).reshape(H, W, 4)
    return out


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
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)][:24]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    fx, fy = cam.fx, cam.fy
    log(f"setup done; {n} poses")

    rng = np.random.RandomState(0)
    inter = jnp.asarray(rng.rand(gi, gi, 4), jnp.float32)

    # s1: correctness vs production (one pose)
    gg = slab_render.FrameGeom(grid, trs[0], fx, fy, perm, flip, W, H,
                               opt, gi)
    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen(
        it, opt, gg.R, gg.fx, gg.fy, W, H, gi, perm, gg.u0, gg.du, gg.v0,
        gg.dv, gg.scale, precise=False))(inter))
    got = np.asarray(jax.jit(lambda it: superquad_warp(
        it, gg, grid, perm, W, H, gi, opt, False))(inter))
    err = float(np.abs(got - ref).max())
    log(f"s1 max |superquad - production| = {err:.5f} "
        f"({'OK' if err < 3e-3 else 'MISMATCH'})")

    # s2: timing
    def sq(it, tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                  opt, gi)
        return jnp.sum(superquad_warp(it, g, grid, perm, W, H, gi, opt,
                                      False))

    f = jax.jit(lambda it, ts: lax.map(lambda tr: sq(it, tr), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"s2 superquad+pallas : {t/n*1e3:7.2f} ms/frame")

    def w2(it, tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                  opt, gi)
        return jnp.sum(slab_render._warp_to_screen(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale, precise=False))

    f = jax.jit(lambda it, ts: lax.map(lambda tr: w2(it, tr), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"w2 production       : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
