"""Round-3 frame breakdown at bench scale: where do 4.4 ms/frame go?

The march kernel is settled at ~1.8-2.2 ms (VPU-bound, CLAUDE.md); the
bench captures ~4.4 ms/frame (144 Mrays/s). This probe splits one pose
group's per-frame time into geom / march / finalize+warp, and prices
shade_bf16 on the real chip (measured 63 dB vs the 40 dB gate).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, pallas_slab
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def main():
    W = H = 800
    gi = 448
    N = 24
    tree = bench_mod.get_tree()
    log("tree loaded")
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    log("grid baked")
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
    log(f"group {perm} flip={flip}: timing {N} poses")
    payload = slab_render.prepare_payload(grid, perm, opt)
    payload.block_until_ready()

    # ---- full path ---------------------------------------------------------
    @jax.jit
    def full(ts, pay):
        out = slab_render.render_frames(
            grid, ts, fx, fy, perm, flip, W, H, opt, gi=gi, payload=pay)
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2, 3))

    dt = sync_time(full, trs, payload)
    log(f"full f32-shade: {1e3 * dt / N:.2f} ms/frame "
        f"({N * W * H / dt / 1e6:.1f} Mrays/s)")

    # ---- full path, bf16 shading -------------------------------------------
    pallas_slab._BF16_SHADE = True
    jax.clear_caches()

    @jax.jit
    def full_bf16(ts, pay):
        out = slab_render.render_frames(
            grid, ts, fx, fy, perm, flip, W, H, opt, gi=gi, payload=pay)
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2, 3))

    dt_b = sync_time(full_bf16, trs, payload)
    log(f"full bf16-shade: {1e3 * dt_b / N:.2f} ms/frame "
        f"({N * W * H / dt_b / 1e6:.1f} Mrays/s)")
    pallas_slab._BF16_SHADE = False
    jax.clear_caches()

    # ---- pieces (shared vmap'd geom fields) --------------------------------
    def fields(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        params, zb = slab_render._pallas_frame_fields(grid, g, perm, flip,
                                                      opt)
        return params, zb, g.R, g.u0, g.du, g.v0, g.dv, g.origin_w

    @jax.jit
    def geom_only(ts):
        st = jax.vmap(fields)(ts)
        return sum(jnp.sum(x, dtype=jnp.float32) for x in st)

    dt_g = sync_time(geom_only, trs)
    log(f"geom only: {1e3 * dt_g / N:.2f} ms/frame")

    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
    blo, bhi = opt.basis_minmax

    def march_pose(args, pay, shade_bf16):
        params, zb = args
        return pallas_slab.march_slabs(
            pay, params, grid.qscale, zb, grid.G, gi, grid.data_dim,
            grid.basis_dim, perm, slab_ids=slab_ids, basis_lo=int(blo),
            basis_hi=int(bhi), sig2=grid.quantized, extra=grid.extra,
            fmt=int(grid.fmt), flip=flip,
            bbox_full=slab_render._bbox_full(opt), shade_bf16=shade_bf16)

    @partial(jax.jit, static_argnames=("sb",))
    def march_only(ts, pay, sb):
        st = jax.vmap(fields)(ts)
        acc = lax.map(lambda a: march_pose((a[0], a[1]), pay, sb),
                      (st[0], st[1]))
        return jnp.sum(acc, dtype=jnp.float32, axis=(1, 2, 3))

    dt_m = sync_time(march_only, trs, payload, False)
    log(f"geom+march f32: {1e3 * dt_m / N:.2f} ms/frame "
        f"(march ~{1e3 * (dt_m - dt_g) / N:.2f})")
    dt_mb = sync_time(march_only, trs, payload, True)
    log(f"geom+march bf16: {1e3 * dt_mb / N:.2f} ms/frame "
        f"(march ~{1e3 * (dt_mb - dt_g) / N:.2f})")

    # ---- finalize+warp only -------------------------------------------------
    @jax.jit
    def warp_only(ts, acc4s):
        st = jax.vmap(fields)(ts)

        def one(args):
            acc4, R, u0, du, v0, dv, origin = args
            acc = jnp.moveaxis(acc4[:3], 0, -1)
            T = acc4[3]
            stopped = T < jnp.float32(opt.stop_thresh)
            return slab_render._finalize_and_warp(
                grid, acc, T, stopped, opt, R, fx, fy, W, H, gi, perm,
                u0, du, v0, dv, grid.scale, origin=origin)

        out = lax.map(one, (acc4s, st[2], st[3], st[4], st[5], st[6],
                            st[7]))
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2, 3))

    acc4s = jnp.full((N, 4, gi, gi), 0.25, jnp.float32)
    dt_w = sync_time(warp_only, trs, acc4s)
    log(f"geom+finalize+warp: {1e3 * dt_w / N:.2f} ms/frame "
        f"(warp ~{1e3 * (dt_w - dt_g) / N:.2f})")

    log(f"sum of pieces: {1e3 * (dt_m + dt_w - dt_g) / N:.2f} ms/frame "
        f"vs full {1e3 * dt / N:.2f}")


if __name__ == "__main__":
    main()
