"""Perf probes for the render march loop (run on the real chip).

Measures per-frame step counts and compares march-loop structures:
  A) plain while_loop over all rays (current render_rays)
  B) K-step chunked while_loop (fewer cond syncs)
  C) lax.map over ray tiles (per-tile early exit)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.render_jax import (
    tree_meta, prepare_rays, _precalc_basis, _dda_world, _sample_step)
from volrend_tpu.utils.options import RenderOptions

import bench as bench_mod

W = H = 800


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def step_count(tree, origins, dirs, opt):
    """Max march iterations + per-ray active-step histogram."""
    meta = tree_meta(tree)
    cen, d, vdir, invdir, delta_scale = prepare_rays(tree, origins, dirs, opt)
    basis_vals = _precalc_basis(tree, vdir, opt)
    tmin, tmax = _dda_world(cen, invdir, opt.render_bbox)
    hit = (tmax >= 0) & (tmin <= tmax)
    Rn = cen.shape[0]

    def body(carry):
        s, i = carry
        leaf_idx, sigma, delta_t, rgb, _ = _sample_step(
            tree.data, tree.child, tree.lut, meta, opt, cen, d, invdir,
            basis_vals, s["t"])
        valid = s["active"] & (sigma > opt.sigma_thresh)
        att = jnp.exp(-delta_t * delta_scale * sigma)
        light = jnp.where(valid, s["light"] * att, s["light"])
        stopped_now = valid & (light < opt.stop_thresh)
        active = s["active"] & ~stopped_now
        t = jnp.where(active, s["t"] + delta_t, s["t"])
        active = active & (t < tmax)
        steps = s["steps"] + active.astype(jnp.int32)
        return dict(t=t, light=light, active=active, steps=steps), i + 1

    def cond(carry):
        s, i = carry
        return jnp.any(s["active"]) & (i < opt.max_steps)

    state = dict(t=jnp.where(hit, tmin, tmax), light=jnp.ones(Rn),
                 active=hit & (tmin < tmax), steps=jnp.zeros(Rn, jnp.int32))
    state, iters = lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state["steps"], iters


def main():
    tree_h = bench_mod.get_tree()
    tree = tree_h.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(1)
    origins, dirs = cams[0].pixel_rays(xp=np)
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    steps, iters = jax.jit(step_count, static_argnames=("opt",))(
        tree, origins, dirs, opt)
    steps = np.asarray(steps)
    print(f"while iters={int(iters)} steps: mean={steps.mean():.1f} "
          f"p50={np.percentile(steps,50):.0f} p90={np.percentile(steps,90):.0f}"
          f" p99={np.percentile(steps,99):.0f} max={steps.max()}")

    # A: plain
    fA = jax.jit(lambda t, o, d: render_jax.render_rays(t, o, d, opt))
    tA = timeit(fA, tree, origins, dirs)
    print(f"A plain while:      {tA*1e3:8.2f} ms  {W*H/tA/1e6:8.1f} Mrays/s")

    # C: tiled via lax.map
    for tile in (8192, 16384, 65536):
        def fC(t, o, d, tile=tile):
            o2 = o.reshape(-1, tile, 3)
            d2 = d.reshape(-1, tile, 3)
            out = lax.map(
                lambda od: render_jax.render_rays(t, od[0], od[1], opt),
                (o2, d2))
            return out.reshape(-1, 4)
        fCj = jax.jit(fC)
        tC = timeit(fCj, tree, origins, dirs)
        print(f"C tiled map {tile:6d}: {tC*1e3:8.2f} ms  "
              f"{W*H/tC/1e6:8.1f} Mrays/s")


if __name__ == "__main__":
    main()
