"""Precise screen-warp VJP: scatter baseline vs window-gather adjoint.

The training step's largest remaining backward sink is the precise warp's
transpose (~9 ms: XLA scatter-add of 640k x 4-tap contributions into the
(gi,gi) quad table). The warp is an invertible projective map, so its
adjoint can be computed WITHOUT a scatter: for each intermediate cell,
gather the 6x6 window of screen pixels around the inverse-mapped point
and tent-weight them (every pixel whose bilinear taps touch the cell lies
in that window when |d(gy)/d(pixel)| < 1, i.e. gi < min(H, W)).

  v0  baseline: jax.vjp of the production precise warp
  v1  scatter alone (vjp of a plain 640k quad gather)
  v2  window table build alone (36 shifted slices of g_out)
  v3  table + 200k x 288 B gather
  v4  full window-gather adjoint (build + gather + tent combine)

RESULT (v5e, 800^2/gi=448): v0 10.03  v1 scatter-alone 8.97
v3 build+gather 4.31  v4 full adjoint 4.62 ms/frame -> the gather
formulation is 2.2x the scatter, worth ~5 ms on the 30 ms training step.
NOT productionized: the step already runs at 2.1x its own forward, and an
exact adjoint must reproduce the forward's clamped edge taps bit-for-bit
(y0c = min(y0, gi-2) asymmetric weights) — revisit if training throughput
becomes the bottleneck.
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
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)][:8]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    fx, fy = cam.fx, cam.fy
    log(f"setup done; {n} poses")

    rng = np.random.RandomState(0)
    inter = jnp.asarray(rng.rand(gi, gi, 4), jnp.float32)
    cot = jnp.asarray(rng.rand(H, W, 4), jnp.float32)

    # v0: production precise-warp VJP
    def wv(it, tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        out, pull = jax.vjp(lambda x: slab_render._warp_to_screen(
            x, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale, precise=True), it)
        return pull(cot)[0]

    f = jax.jit(lambda it, ts: lax.map(lambda tr: jnp.sum(wv(it, tr)), ts))
    t = sync_time(f, inter, trs, reps=3)
    log(f"v0 precise warp VJP : {t/n*1e3:7.2f} ms/frame")

    # v1: scatter alone — vjp of a bare quad gather with smooth indices
    yy = np.clip((np.arange(H) * (gi - 2) / H).astype(np.int32), 0, gi - 2)
    xx = np.clip((np.arange(W) * (gi - 2) / W).astype(np.int32), 0, gi - 2)
    idx = jnp.asarray(yy[:, None] * (gi - 1) + xx[None, :], jnp.int32)
    fq = jnp.asarray(rng.rand((gi - 1) * (gi - 1), 16), jnp.float32)
    cot16 = jnp.asarray(rng.rand(H, W, 16), jnp.float32)

    def gv(tab, salt):
        i2 = jnp.minimum(idx + salt.astype(jnp.int32),
                         (gi - 1) * (gi - 1) - 1)
        _, pull = jax.vjp(lambda x: x[i2], tab)
        return jnp.sum(pull(cot16)[0])

    salts = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda tab, s: lax.map(lambda salt: gv(tab, salt), s))
    t = sync_time(f, fq, salts, reps=3)
    log(f"v1 scatter alone    : {t/n*1e3:7.2f} ms/frame")

    # ---- window-gather adjoint pieces ------------------------------------
    WIN = 6
    g16 = cot.astype(jnp.float16)
    Tn = (H - WIN + 1) * (W - WIN + 1)

    def build(g_, salt):
        g2 = g_ + salt.astype(jnp.float16)
        tbl = jnp.concatenate(
            [g2[i:H - WIN + 1 + i, j:W - WIN + 1 + j]
             for i in range(WIN) for j in range(WIN)], -1)
        return jnp.sum(tbl[::97, ::97].astype(jnp.float32))

    f = jax.jit(lambda g_, s: lax.map(lambda salt: build(g_, salt), s))
    t = sync_time(f, g16, salts, reps=3)
    log(f"v2 table build      : {t/n*1e3:7.2f} ms/frame  (DCE risk: only "
        f"subsampled rows consumed)")

    # inverse map (affine synthetic, same shapes as the real solve)
    uy = np.arange(gi, dtype=np.float32)
    py_c = np.clip(uy * (H - 1) / (gi - 1), 2.0, H - 4.0)
    px_c = np.clip(uy * (W - 1) / (gi - 1), 2.0, W - 4.0)
    PY = jnp.asarray(np.broadcast_to(py_c[:, None], (gi, gi)))
    PX = jnp.asarray(np.broadcast_to(px_c[None, :], (gi, gi)))

    def adjoint(g_, salt):
        g2 = g_ + salt.astype(jnp.float16)
        tbl = jnp.concatenate(
            [g2[i:H - WIN + 1 + i, j:W - WIN + 1 + j]
             for i in range(WIN) for j in range(WIN)],
            -1).reshape(Tn, WIN * WIN * 4)
        # window top-left pixel per cell
        y0 = jnp.clip(jnp.floor(PY - 0.5 * WIN + 1).astype(jnp.int32), 0,
                      H - WIN)
        x0 = jnp.clip(jnp.floor(PX - 0.5 * WIN + 1).astype(jnp.int32), 0,
                      W - WIN)
        qg = tbl[y0 * (W - WIN + 1) + x0]       # (gi, gi, 144)
        # tent weights vs the cell's preimage (affine synthetic: each
        # window pixel p has gy(p) = u + (py - PY)*J)
        J = (gi - 1) / (H - 1)
        acc = jnp.zeros((gi, gi, 4), jnp.float16)
        ry = (PY - y0.astype(jnp.float32))
        rx = (PX - x0.astype(jnp.float32))
        for i in range(WIN):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                (i - ry) * J)).astype(jnp.float16)[..., None]
            for j in range(WIN):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                    (j - rx) * J)).astype(jnp.float16)[..., None]
                ch = (i * WIN + j) * 4
                acc = acc + (wy * wx) * qg[..., ch:ch + 4]
        return jnp.sum(acc.astype(jnp.float32))

    # v3: build + gather only (weights skipped)
    def v3(g_, salt):
        g2 = g_ + salt.astype(jnp.float16)
        tbl = jnp.concatenate(
            [g2[i:H - WIN + 1 + i, j:W - WIN + 1 + j]
             for i in range(WIN) for j in range(WIN)],
            -1).reshape(Tn, WIN * WIN * 4)
        y0 = jnp.clip(jnp.floor(PY - 0.5 * WIN + 1).astype(jnp.int32), 0,
                      H - WIN)
        x0 = jnp.clip(jnp.floor(PX - 0.5 * WIN + 1).astype(jnp.int32), 0,
                      W - WIN)
        return jnp.sum(tbl[y0 * (W - WIN + 1) + x0].astype(jnp.float32))

    for name, fn in (("v3 build+gather    ", v3),
                     ("v4 full adjoint    ", adjoint)):
        f = jax.jit(lambda g_, s, fn=fn: lax.map(
            lambda salt: fn(g_, salt), s))
        t = sync_time(f, g16, salts, reps=3)
        log(f"{name} : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
