"""Round-3 training-step breakdown at 800^2 / G=128 (single-chip probe
scale): where do the ~30 ms/step go now, and what would a superquad
precise-warp VJP buy?

Phases (each its own jit, host-transfer synced):
  t0  full loss+grad step (FrameTrainer's loss_and_grad_frame)
  t1  forward only (render_frame_train)
  t2  warp-only fwd (precise _warp_to_screen on a fixed inter)
  t3  warp-only VJP (jax.vjp of t2)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import dense_grid, slab_render, slab_grad
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions

t0_ = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0_:6.1f}s] {m}", flush=True)

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
    gi = 512
    tree = make_test_tree(max_depth=6, basis_dim=16, seed=3, n_blobs=6,
                          sigma_scale=60.0)          # G=128 probe scale
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    bmap = slab_grad.build_bake_map(dev)
    data32 = jnp.asarray(np.asarray(dev.data), jnp.float32)
    log(f"setup G={grid.G}")
    opt = RenderOptions(max_steps=1024, stop_thresh=0.0, renormalize=False)
    back = np.asarray((1.0, 0.25, 0.35))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.8 * back), v_back=tuple(back),
                              width=W, height=H)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    @jax.jit
    def step(d):
        return slab_grad.loss_and_grad_frame(
            d, bmap, grid, tr, cam.fx, cam.fy, perm, flip, W, H, target,
            opt, gi=gi)

    t = sync_time(step, data32)
    log(f"t0 loss+grad step : {1e3 * t:7.2f} ms")

    @jax.jit
    def fwd(d):
        return slab_grad.render_frame_train(
            d, bmap, grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt, gi)

    t = sync_time(fwd, data32)
    log(f"t1 forward only   : {1e3 * t:7.2f} ms")

    geom = slab_render.FrameGeom(grid, tr, cam.fx, cam.fy, perm, flip,
                                 W, H, opt, gi)
    inter = jnp.asarray(rng.uniform(0, 1, (gi, gi, 4)), jnp.float32)

    def warp(it):
        return slab_render._warp_to_screen(
            it, opt, geom.R, geom.fx, geom.fy, W, H, gi, perm, geom.u0,
            geom.du, geom.v0, geom.dv, geom.scale, precise=True)

    t = sync_time(jax.jit(warp), inter)
    log(f"t2 precise warp fwd: {1e3 * t:7.2f} ms")

    g = jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32)

    @jax.jit
    def warp_vjp(it, ct):
        out, f_vjp = jax.vjp(warp, it)
        return f_vjp(ct)[0]

    t = sync_time(warp_vjp, inter, g)
    log(f"t3 precise warp fwd+VJP: {1e3 * t:7.2f} ms")


if __name__ == "__main__":
    main()
