"""Realistic-occupancy benchmark: solid objects + empty space.

The headline ``bench.py`` scene is near-worst-case for a volume renderer:
97% of voxels carry density (smooth fog), so nothing can be culled and
the march streams + shades the full 0.85 GB volume every frame. Real
PlenOctree assets are the opposite — opaque objects with crisp
silhouettes in empty space (drums/lego-class occupancy is a few percent
of the bbox). This benchmark runs the SAME production path (int8 dense
grid, Pallas slab march, f16 display warp, identical quality gate) on
``make_solid_tree`` (6% voxel / ~50% slab occupancy at G=256) to show
what slab culling + occupancy masks recover on realistic scenes.

Prints one JSON line like bench.py (metric name suffixed `_sparse`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod
from bench import H, W, orbit_poses

N_POSES = 96
BASELINE_MRAYS = 110.0
_T0 = time.perf_counter()


def _log(msg):
    print(f"[sparse +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops import dense_grid, slab_render
    from volrend_tpu.utils.options import RenderOptions

    _log("building solid tree")
    tree = make_solid_tree(max_depth=7, basis_dim=16, seed=3)
    _log(f"{tree.data.shape[0]} internal nodes; to_device")
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    _log("bake dispatched")
    opt = RenderOptions(max_steps=1024)

    cams = orbit_poses(N_POSES)
    groups = {}
    for c in cams:
        perm, flip, slope = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        assert np.isfinite(slope)
        groups.setdefault((perm, flip), []).append(c.transform)
    fx, fy = cams[0].fx, cams[0].fy
    batches = [(jnp.asarray(np.stack(trs), jnp.float32), perm, flip)
               for (perm, flip), trs in groups.items()]
    occ = [len(grid.slab_ids(p[0], f, opt.sigma_thresh)) for _, p, f
           in batches]
    _log(f"{len(batches)} pose groups; occupied slabs/group {occ} of "
         f"{grid.G}")
    static_pf = tuple((perm, flip) for _, perm, flip in batches)
    pay_by_perm = {}
    for _, perm, flip in batches:
        if perm not in pay_by_perm:
            pay_by_perm[perm] = slab_render.prepare_payload(grid, perm,
                                                               opt)
    payloads = tuple(pay_by_perm[perm] for _, perm, flip in batches)

    @partial(jax.jit, static_argnames=("pf",))
    def render_all(grid, trs_list, pays, pf):
        outs = []
        for (perm, flip), trs, pay in zip(pf, trs_list, pays):
            out = slab_render.render_frames(
                grid, trs, fx, fy, perm, flip, W, H, opt, gi=256,
                payload=pay)
            outs.append(jnp.sum(out, dtype=jnp.float32, axis=(1, 2)))
        return jnp.concatenate(outs)

    trs_list = tuple(t for t, _, _ in batches)
    np.asarray(render_all(grid, trs_list, payloads, static_pf))
    _log("compiled")
    dts = []
    for _rep in range(2):
        t0 = time.perf_counter()
        total = np.asarray(render_all(grid, trs_list, payloads, static_pf))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    assert np.all(np.isfinite(total))
    mrays = N_POSES * W * H / dt / 1e6
    _log(f"throughput {mrays:.1f} Mrays/s ({mrays / BASELINE_MRAYS:.2f}x);"
         f" reps {[round(d, 3) for d in dts]}")

    # quality gate: identical protocol to bench.py
    from volrend_tpu.ops import render_jax
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), fx, fy, perm, flip, W, H, opt,
        gi=256))
    ys = np.arange(0, H, 5)
    xs = np.arange(0, W, 5)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins.reshape(-1, 3)[sel]),
        jnp.asarray(dirs.reshape(-1, 3)[sel]), opt))
    got = frame.reshape(-1, 4)[sel]
    mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
    psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
    _log(f"psnr_vs_exact {psnr:.2f} dB")
    assert psnr >= 40.0, f"quality gate failed: {psnr:.2f} dB"

    print(json.dumps({
        "metric": "render_throughput_800x800_sh16_sparse",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "psnr_vs_exact_db": round(psnr, 2),
    }))


if __name__ == "__main__":
    main()
