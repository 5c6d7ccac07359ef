"""Final-warp micro-probe on the real chip: banded-gather variants.

Also measures in-batch per-frame fixed overhead (march disabled via a
~0-slab bbox) so the permute amortizes like in the bench.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(out))
    tt = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.perf_counter() - tt) / reps - FLOOR


def warp_variant(inter, y0c, x0c, fy_, fx_, ok, gi, H, W, SB, BAND,
                 mode):
    """Reimplementation of _warp_to_screen's gather core for timing."""
    inter16 = inter.astype(jnp.float16)
    quad = jnp.concatenate([
        inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
        inter16[1:, 1:],
    ], -1)
    if mode == "full":
        q = quad.reshape((gi - 1) * (gi - 1), 16)[
            y0c * (gi - 1) + x0c].reshape(H, W, 4, 4)
    else:
        y0b = y0c.reshape(H // SB, SB, W)
        x0b = x0c.reshape(H // SB, SB, W)

        def wblock(args):
            y0_b, x0_b = args
            b0 = jnp.clip(jnp.min(y0_b), 0, (gi - 1) - BAND)
            sub = lax.dynamic_slice(quad, (b0, 0, 0), (BAND, gi - 1, 16))
            li = (jnp.clip(y0_b - b0, 0, BAND - 1) * (gi - 1) + x0_b)
            return sub.reshape(BAND * (gi - 1), 16)[li]

        if mode == "map":
            q = lax.map(wblock, (y0b, x0b)).reshape(H, W, 4, 4)
        else:
            q = jax.vmap(wblock)((y0b, x0b)).reshape(H, W, 4, 4)
    q = q.astype(jnp.float32)
    v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :], q[..., 2, :],
                          q[..., 3, :])
    out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
           + (v10 * (1 - fx_) + v11 * fx_) * fy_)
    return jnp.where(ok[..., None], out, 0.0)


def main():
    W = H = 800
    gi = 448
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(24)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    log("setup done")

    # build realistic warp inputs once (host)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    px = (np.arange(W, dtype=np.float32) - 0.5 * W) / cam.fx
    py = -(np.arange(H, dtype=np.float32) - 0.5 * H) / cam.fy
    d_cam = np.stack(np.broadcast_arrays(px[None, :], py[:, None],
                                         -np.ones((H, W), np.float32)), -1)
    R = np.asarray(cam.transform[:, :3], np.float32)
    d_tree = d_cam @ R.T * np.asarray(grid.scale)
    us = d_tree[..., perm[1]] / d_tree[..., perm[0]]
    vs = d_tree[..., perm[2]] / d_tree[..., perm[0]]
    gy = (us - float(g.u0)) / float(g.du)
    gx = (vs - float(g.v0)) / float(g.dv)
    ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
    gy = np.clip(gy, 0, gi - 1 - 1e-6)
    gx = np.clip(gx, 0, gi - 1 - 1e-6)
    y0 = np.floor(gy).astype(np.int32)
    x0 = np.floor(gx).astype(np.int32)
    fy_ = (gy - y0)[..., None].astype(np.float32)
    fx_ = (gx - x0)[..., None].astype(np.float32)
    y0c = jnp.asarray(np.minimum(y0, gi - 2))
    x0c = jnp.asarray(np.minimum(x0, gi - 2))
    fy_, fx_, okd = jnp.asarray(fy_), jnp.asarray(fx_), jnp.asarray(ok)
    rng = np.random.default_rng(0)
    inter = jnp.asarray(rng.random((gi, gi, 4), np.float32))
    spans = y0.reshape(H // 50, 50, W)
    log(f"row-block spans (SB=50): max {np.max(spans.max((1,2)) - spans.min((1,2)))}")

    for mode, SB, BAND in (("full", 0, 0), ("map", 50, 160),
                           ("vmap", 50, 160), ("map", 25, 64),
                           ("vmap", 25, 64), ("vmap", 16, 64),
                           ("vmap", 8, 32)):
        f = jax.jit(partial(warp_variant, gi=gi, H=H, W=W, SB=SB,
                            BAND=BAND, mode=mode))
        t = sync_time(f, inter, y0c, x0c, fy_, fx_, okd)
        log(f"warp {mode:4s} SB={SB:3d} BAND={BAND:3d}: {t*1e3:7.2f} ms")

    # in-batch fixed overhead: 24 poses, ~0-slab bbox
    opt1 = opt.replace(render_bbox=(0.0, 0.0, 0.0, 0.004, 0.004, 0.004))
    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]))
    fb = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, cam.fx, cam.fy, perm, flip, W, H, opt1, gi))
    t = sync_time(fb, grid, trs, reps=2)
    log(f"batched fixed overhead ({len(same)} poses): "
        f"{t/len(same)*1e3:6.2f} ms/frame")

    # and the true batched full render for reference
    fb2 = jax.jit(lambda g_, ts: slab_render.render_frames(
        g_, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(fb2, grid, trs, reps=2)
    log(f"batched full render ({len(same)} poses): "
        f"{t/len(same)*1e3:6.2f} ms/frame -> "
        f"{len(same)*W*H/t/1e6:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
