"""Decompose the non-march frame overhead (~2.0 ms measured as a lump).

Stages, each jitted + synced separately (same inputs as production):
  g0  frame geometry only (FrameGeom + zb planes + params)
  g1  screen ray planes (d_cam einsum + slopes + gy/gx + ok)
  g2  g1 + quad-table build (shifted concat, f16)
  g3  g2 + whole-table gather
  g4  full _warp_to_screen (adds bilinear combine + bg composite)
  g5  full production frame (march included) for reference
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
def sync_time(fn, *args, reps=4):
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
    cam = bench_mod.orbit_poses(12)[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform, jnp.float32)
    fx, fy = cam.fx, cam.fy
    rng = np.random.RandomState(0)
    inter = jnp.asarray(rng.rand(gi, gi, 4), jnp.float32)
    log(f"setup done G={grid.G}")

    def geom(tr_):
        g = slab_render.FrameGeom(grid, tr_, fx, fy, perm, flip, W, H,
                                  opt, gi)
        params, zb = slab_render._pallas_frame_fields(grid, g, perm, flip,
                                                      opt)
        return params, zb, g.R, g.u0, g.du, g.v0, g.dv

    t = sync_time(jax.jit(geom), tr)
    log(f"g0 geometry+zb      : {t*1e3:7.2f} ms")
    params, zb, R, u0, du, v0, dv = jax.jit(geom)(tr)
    scale = grid.scale

    def rays(R_):
        px = (jnp.arange(W, dtype=jnp.float32) - 0.5 * W) / fx
        py = -(jnp.arange(H, dtype=jnp.float32) - 0.5 * H) / fy
        d_cam = jnp.stack([
            jnp.broadcast_to(px[None, :], (H, W)),
            jnp.broadcast_to(py[:, None], (H, W)),
            -jnp.ones((H, W), jnp.float32)], -1)
        d_tree_s = jnp.einsum("hwc,kc->hwk", d_cam, R_) * scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - u0) / du
        gx = (vs - v0) / dv
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        return gy, gx, ok

    t = sync_time(jax.jit(rays), R)
    log(f"g1 ray planes       : {t*1e3:7.2f} ms")

    def build(it):
        i16 = it.astype(jnp.float16)
        return jnp.concatenate([i16[:-1, :-1], i16[:-1, 1:], i16[1:, :-1],
                                i16[1:, 1:]], -1)

    t = sync_time(jax.jit(lambda it, R_: build(it)
                          + jnp.float16(jnp.sum(rays(R_)[0]) * 0)),
                  inter, R)
    log(f"g2 rays+quad build  : {t*1e3:7.2f} ms")

    def gath(it, R_):
        gy, gx, ok = rays(R_)
        y0 = jnp.minimum(jnp.floor(gy).astype(jnp.int32), gi - 2)
        x0 = jnp.minimum(jnp.floor(gx).astype(jnp.int32), gi - 2)
        quad = build(it)
        return quad.reshape((gi - 1) * (gi - 1), 16)[y0 * (gi - 1) + x0]

    t = sync_time(jax.jit(gath), inter, R)
    log(f"g3 + whole gather   : {t*1e3:7.2f} ms")

    def full(it, R_):
        return slab_render._warp_to_screen(it, opt, R_, fx, fy, W, H, gi,
                                           perm, u0, du, v0, dv, scale)

    t = sync_time(jax.jit(full), inter, R)
    log(f"g4 full warp+bg     : {t*1e3:7.2f} ms")

    f5 = jax.jit(lambda g, t_: slab_render.render_frame(
        g, t_, fx, fy, perm, flip, W, H, opt, gi))
    t = sync_time(f5, grid, tr, reps=2)
    log(f"g5 full frame       : {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
