"""Display-knob Pareto on chip: {int8, bf16 table} x {fast, exact emit}.

For each combo: 24-pose-group throughput (bench protocol, one jitted
lax.map, checksum host transfer) + orbit-pose PSNR vs exact T2 rays at
stride 8. Picks the bench ladder defaults on data instead of lore
(r4: the [0,127] int8 table measured 51.67 dB on the full bench; this
tool prices its affine replacement and the emit mode together).

Usage: python tools/perf_knobs.py   (TPU; ~8 min)
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bench import H, W, orbit_poses

N = 24
t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


def main():
    from volrend_tpu.ops import dense_grid, display_warp, render_jax, \
        slab_render
    from volrend_tpu.utils.options import RenderOptions

    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    opt = RenderOptions(max_steps=1024)
    cams = orbit_poses(96)
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

    # exact rays once (gate pose = first pose of the chosen group)
    cam0 = next(c for c in cams
                if any(np.allclose(c.transform, t) for t in trs_all[:1]))
    ys = np.arange(0, H, 8)
    xs = np.arange(0, W, 8)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    o, d = cam0.pixel_rays(xp=np)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(o.reshape(-1, 3)[sel]),
        jnp.asarray(d.reshape(-1, 3)[sel]), opt))
    log("setup + exact rays")

    results = {}
    for table_int8 in (True, False):
        for exact_emit in (False, True):
            name = (f"{'int8' if table_int8 else 'bf16'}-"
                    f"{'exact' if exact_emit else 'fast'}")
            display_warp._TABLE_INT8 = table_int8
            display_warp._EXACT_EMIT = exact_emit
            jax.clear_caches()

            @jax.jit
            def render(ts, pay):
                out = slab_render.render_frames(
                    grid, ts, fx, fy, perm, flip, W, H, opt, gi=256,
                    payload=pay)
                return jnp.sum(out, dtype=jnp.float32, axis=(1, 2))

            np.asarray(render(trs, payload))
            dts = []
            for _ in range(3):
                t1 = time.perf_counter()
                np.asarray(render(trs, payload))
                dts.append(time.perf_counter() - t1)
            ms = min(dts) / N * 1e3
            frame = np.asarray(slab_render.render_frame(
                grid, jnp.asarray(cam0.transform), fx, fy, perm, flip,
                W, H, opt, gi=256))
            got = frame.reshape(-1, 4)[sel]
            mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
            psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
            mrays = W * H / (ms / 1e3) / 1e6
            results[name] = {"ms_frame": round(ms, 3),
                             "mrays": round(mrays, 1),
                             "psnr_db": round(psnr, 2)}
            log(f"{name}: {ms:.3f} ms/frame = {mrays:.1f} Mrays/s, "
                f"{psnr:.2f} dB")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
