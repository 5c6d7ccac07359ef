"""Bisect the bench-vs-probe 13x gap: N poses per group, groups per jit."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=2):
    out = fn(*args)
    _ = float(jnp.sum(out))
    tt = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.perf_counter() - tt) / reps - FLOOR


def main():
    W = H = 800
    gi = 448
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    groups = {}
    for c in cams:
        perm, flip, _ = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        groups.setdefault((perm, flip), []).append(c.transform)
    (perm, flip), trs_all = max(groups.items(), key=lambda kv: len(kv[1]))
    fx, fy = cams[0].fx, cams[0].fy
    log(f"biggest group {perm} {flip}: {len(trs_all)} poses")

    # A: N poses, plain jit(render_frames), full output
    for n in (3, 12, 24):
        trs = jnp.asarray(np.stack(trs_all[:n]), jnp.float32)
        fb = jax.jit(lambda g, ts: slab_render.render_frames(
            g, ts, fx, fy, perm, flip, W, H, opt, gi))
        t = sync_time(fb, grid, trs)
        log(f"A n={n:2d} full-out : {t/n*1e3:7.2f} ms/frame")

    # B: same but sum-reduced inside jit (bench's shape)
    for n in (3, 24):
        trs = jnp.asarray(np.stack(trs_all[:n]), jnp.float32)
        fb = jax.jit(lambda g, ts: jnp.sum(slab_render.render_frames(
            g, ts, fx, fy, perm, flip, W, H, opt, gi),
            dtype=jnp.float32, axis=(1, 2)))
        t = sync_time(fb, grid, trs)
        log(f"B n={n:2d} sum-out  : {t/n*1e3:7.2f} ms/frame")

    # C: all 4 groups inside ONE jit (bench exactly)
    batches = [(jnp.asarray(np.stack(trs), jnp.float32), p, f)
               for (p, f), trs in groups.items()]
    static_pf = tuple((p, f) for _, p, f in batches)

    @partial(jax.jit, static_argnames=("pf",))
    def render_all(grid, trs_list, pf):
        outs = []
        for (p, f), trs in zip(pf, trs_list):
            out = slab_render.render_frames(
                grid, trs, fx, fy, p, f, W, H, opt, gi=gi)
            outs.append(jnp.sum(out, dtype=jnp.float32, axis=(1, 2)))
        return jnp.concatenate(outs)

    trs_list = tuple(t for t, _, _ in batches)
    t = sync_time(render_all, grid, trs_list, static_pf)
    log(f"C all 96 in one jit : {t/96*1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
