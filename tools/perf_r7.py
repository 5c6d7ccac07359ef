"""Round-3 sweep: march k_per_step x gi, with bench-protocol PSNR.

March is pure kernel time (2.42 ms/fr at gi=448/K=4, profiled); the
frame needs march <= ~1.7 for 200 Mrays/s. VPU compute scales ~gi^2.
PSNR gate: slab frame vs exact T2 rays, stride-10 subsample (bench
protocol at stride 5; 10 here to keep the probe fast).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, pallas_slab, render_jax
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)

_F32 = jnp.float32


def main():
    W = H = 800
    N = 24
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    log("setup")
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
    payload = slab_render.prepare_payload(grid, perm, opt)
    payload.block_until_ready()
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
    blo, bhi = opt.basis_minmax

    # exact reference rays for PSNR (one pose, stride 10)
    cam = [c for c in cams
           if np.allclose(c.transform, np.asarray(trs_all[0]))][0]
    ys = np.arange(0, H, 10)
    xs = np.arange(0, W, 10)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    log("exact rays done")

    @partial(jax.jit, static_argnames=("gi", "kps"))
    def march_wall(ts, pay, gi, kps):
        def fields(tr):
            g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H,
                                      opt, gi)
            params, zb = slab_render._pallas_frame_fields(grid, g, perm,
                                                          flip, opt)
            return params, zb

        st = jax.vmap(fields)(ts)

        def one(a):
            params, zb = a
            return pallas_slab.march_slabs(
                pay, params, grid.qscale, zb, grid.G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=slab_ids, basis_lo=int(blo),
                basis_hi=int(bhi), sig2=grid.quantized, extra=grid.extra,
                fmt=int(grid.fmt), flip=flip, k_per_step=kps,
                bbox_full=slab_render._bbox_full(opt))

        acc = lax.map(one, (st[0], st[1]))
        return jnp.sum(acc, dtype=_F32, axis=(1, 2, 3))



    @partial(jax.jit, static_argnames=("gi",))
    def frame(tr, pay, gi):
        return slab_render.render_frame(grid, tr, fx, fy, perm, flip,
                                        W, H, opt, gi=gi, payload=pay)

    for gi in (256, 320, 384):
        t = sync_time(march_wall, trs, payload, gi, 4)
        fr = np.asarray(frame(trs[0], payload, gi))
        got = fr[ys][:, xs].reshape(-1, 4)
        mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
        p = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
        log(f"gi={gi}: march {1e3 * t / N:5.2f} ms/frame, "
            f"psnr_vs_exact {p:.2f} dB")


if __name__ == "__main__":
    main()
