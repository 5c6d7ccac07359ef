"""Measure the slab-path training step on the real chip vs forward render.

VERDICT item 1's done-criterion: a jitted 800^2 training step on TPU within
~5x of forward slab throughput. Prints ms/frame for (a) forward fast-path
render, (b) forward training-semantics render, (c) full loss+grad step.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, slab_grad
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
    # One depth below bench scale (G=128): full-f32 training state (data +
    # baked grid + its cotangent) fits one chip; bench scale (G=256, 4.2 GB
    # params) is the leaf-sharded multi-chip regime, not single-chip.
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.models.n3tree import N3Tree
    W = H = 800
    gi = 448
    cache = "/tmp/_d6tree.npz"
    if os.path.isfile(cache):
        log("loading cached depth-6 tree")
        tree = N3Tree(cache)
    else:
        log("building depth-6 tree")
        tree = make_test_tree(max_depth=6, basis_dim=16, seed=3, n_blobs=6,
                              sigma_scale=60.0)
        tree.save_npz(cache, compressed=False)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cam = bench_mod.orbit_poses(8)[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform, jnp.float32)
    log("building bake map")
    bmap = slab_grad.build_bake_map(dev)
    log(f"bake map levels {bmap.sizes}; G={bmap.G} D={bmap.D}")

    data = jnp.asarray(dev.data, jnp.float32)
    log(f"data {data.shape} {data.nbytes/1e6:.0f} MB")

    # (a) forward fast path
    fwd = jax.jit(lambda g_, t_: slab_render.render_frame(
        g_, t_, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(fwd, grid, tr)
    log(f"forward fast path   : {t*1e3:8.2f} ms/frame")
    fwd_ms = t * 1e3

    # target for the loss
    target = fwd(grid, tr)
    target.block_until_ready()

    # grid-space (pyramid) parameter state — the production training state
    log("building pyramid")
    pyr = jax.jit(lambda d_: slab_grad.data_to_pyramid(d_, bmap))(data)
    jax.block_until_ready(pyr)
    log(f"pyramid levels {[tuple(p.shape) for p in pyr]} "
        f"{sum(p.nbytes for p in pyr)/1e6:.0f} MB")

    # (b) forward training semantics (bake + Pallas march + warp)
    fgrid = dense_grid.bake_dense(dev, dtype="f16")
    for name, params in (("leaf", data), ("pyramid", pyr)):
        tf = jax.jit(lambda d_, t_: slab_grad.render_frame_train(
            d_, bmap, fgrid, t_, cam.fx, cam.fy, perm, flip, W, H, opt,
            gi))
        t = sync_time(tf, params, tr)
        log(f"fwd train-sem {name:7s}: {t*1e3:8.2f} ms/frame")

    # (c) full loss + grad (auto backend: Pallas fwd+bwd kernels on TPU;
    #     the XLA scan backend measured 1256 ms/frame here). leaf params
    #     pay an XLA scatter bake each step; pyramid params are the
    #     scatter-free grid-space state.
    for name, params in (("leaf", data), ("pyramid", pyr)):
        lg = jax.jit(lambda d_, t_, tgt: slab_grad.loss_and_grad_frame(
            d_, bmap, fgrid, t_, cam.fx, cam.fy, perm, flip, W, H, tgt,
            opt, gi))
        t = sync_time(lg, params, tr, target)
        log(f"loss+grad {name:7s}   : {t*1e3:8.2f} ms/frame "
            f"({t*1e3/fwd_ms:.1f}x forward)")


if __name__ == "__main__":
    main()
