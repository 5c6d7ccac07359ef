"""Superquad warp round 2: TPU-friendly combine formulations.

q8   gather only (reference: 0.24 ms last session)
q10  planar combine: transpose gathered (160k, 64) -> (64, H/2, W/2)
     once, then all tent-weight FMAs run on full-lane (H/2, W/2) planes;
     assemble (H, W, 4) with one small transpose at the end.
q10b subimage combine: 4 output subimages (H/2, W/2, 4) from contiguous
     channel slices (no strided views, but last-dim-4 ops).
w2   production warp (same-session reference)

Both q10 variants compute gy/gx per subpixel directly (slopes are free)
instead of stride-2-slicing the full-res slope grid.
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
    Ts = (gi - 3) * (gi - 3)
    Hh, Wh = H // 2, W // 2

    def make_tbl(it16):
        q = jnp.concatenate([
            it16[:-1, :-1], it16[:-1, 1:], it16[1:, :-1], it16[1:, 1:]],
            -1)
        return jnp.concatenate([
            q[:-2, :-2], q[:-2, 2:], q[2:, :-2], q[2:, 2:]],
            -1).reshape(Ts, 64)

    # channel index for absolute cell (cy, cx) in the quad^2 layout
    def chan(cy, cx, c):
        a, i = cy // 2, cy % 2
        b, j = cx // 2, cx % 2
        return a * 32 + b * 16 + i * 8 + j * 4 + c

    def sub_slopes(gg, p, q):
        xs = (jnp.arange(Wh, dtype=jnp.float32) * 2 + q - 0.5 * W) / gg.fx
        ys = -(jnp.arange(Hh, dtype=jnp.float32) * 2 + p - 0.5 * H) / gg.fy
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
                jnp.clip(gx, 0.0, gi - 1 - 1e-6), ok)

    def gather_blocks(it, tr):
        gg = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                   opt, gi)
        subs = [[sub_slopes(gg, p, q) for q in range(2)] for p in range(2)]
        gymin = jnp.minimum(jnp.minimum(subs[0][0][0], subs[0][1][0]),
                            jnp.minimum(subs[1][0][0], subs[1][1][0]))
        gxmin = jnp.minimum(jnp.minimum(subs[0][0][1], subs[0][1][1]),
                            jnp.minimum(subs[1][0][1], subs[1][1][1]))
        Y0 = jnp.clip(jnp.floor(gymin).astype(jnp.int32), 0, gi - 4)
        X0 = jnp.clip(jnp.floor(gxmin).astype(jnp.int32), 0, gi - 4)
        tbl = make_tbl(it.astype(jnp.float16))
        qg = tbl[Y0 * (gi - 3) + X0]            # (Hh, Wh, 64)
        return subs, Y0, X0, qg

    def q10(it, tr):
        subs, Y0, X0, qg = gather_blocks(it, tr)
        planes = jnp.transpose(qg, (2, 0, 1)).astype(_F := jnp.float32)
        Y0f = Y0.astype(jnp.float32)
        X0f = X0.astype(jnp.float32)
        outs = []
        for p in range(2):
            row = []
            for q in range(2):
                gy, gx, ok = subs[p][q]
                ry = gy - Y0f
                rx = gx - X0f
                wy = [jnp.maximum(0.0, 1.0 - jnp.abs(ry - cy))
                      for cy in range(4)]
                wx = [jnp.maximum(0.0, 1.0 - jnp.abs(rx - cx))
                      for cx in range(4)]
                ch4 = []
                for c in range(4):
                    acc = jnp.zeros((Hh, Wh), jnp.float32)
                    for cy in range(4):
                        for cx in range(4):
                            acc = acc + (wy[cy] * wx[cx]) * planes[
                                chan(cy, cx, c)]
                    ch4.append(jnp.where(ok, acc, 0.0))
                row.append(jnp.stack(ch4, -1))          # (Hh, Wh, 4)
            outs.append(row)
        out = jnp.stack([jnp.stack(r, 0) for r in outs], 0)  # (2,2,Hh,Wh,4)
        out = jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(H, W, 4)
        rgb = out[..., :3] + 1.0 * (1.0 - out[..., 3:4])
        return jnp.sum(jnp.concatenate([rgb, out[..., 3:4]], -1))

    def q10b(it, tr):
        subs, Y0, X0, qg = gather_blocks(it, tr)
        Y0f = Y0.astype(jnp.float32)
        X0f = X0.astype(jnp.float32)
        outs = []
        for p in range(2):
            row = []
            for q in range(2):
                gy, gx, ok = subs[p][q]
                ry = (gy - Y0f).astype(jnp.float16)[..., None]
                rx = (gx - X0f).astype(jnp.float16)[..., None]
                acc = jnp.zeros((Hh, Wh, 4), jnp.float16)
                for cy in range(4):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - cy))
                    for cx in range(4):
                        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - cx))
                        ch = chan(cy, cx, 0)
                        acc = acc + (wy * wx) * qg[..., ch:ch + 4]
                out4 = jnp.where(ok[..., None], acc.astype(jnp.float32),
                                 0.0)
                row.append(out4)
            outs.append(row)
        out = jnp.stack([jnp.stack(r, 0) for r in outs], 0)
        out = jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(H, W, 4)
        rgb = out[..., :3] + 1.0 * (1.0 - out[..., 3:4])
        return jnp.sum(jnp.concatenate([rgb, out[..., 3:4]], -1))

    for name, fn in (("q10 planar  ", q10), ("q10b subimg ", q10b)):
        f = jax.jit(lambda it, ts, fn=fn: lax.map(
            lambda tr: fn(it, tr), ts))
        t = sync_time(f, inter, trs, reps=3)
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
    log(f"w2 current  : {t/n*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
