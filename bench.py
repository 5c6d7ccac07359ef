"""Benchmark: Mrays/s for 800x800 NeRF-synthetic-style rendering.

Replicates the reference's headless FPS protocol (main_headless.cpp:203-231):
render N poses end-to-end on device, excluding PNG writing; report rays/s.
No real PlenOctree assets exist in this environment, so the scene is a
deterministic procedural SH16 octree at drums-like scale (see
volrend_tpu/models/synthetic.py). Baseline: the PlenOctrees paper's ~168 FPS
on a V100 at 800x800 = ~110 Mrays/s (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 110.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_tree_cache.npz")
W = H = 800
N_POSES = 20
DEPTH = 7          # 256^3 effective resolution
BASIS_DIM = 16     # SH deg 4 path (BASELINE.json configs[1])


def get_tree():
    from volrend_tpu.models.n3tree import N3Tree
    from volrend_tpu.models.synthetic import make_test_tree

    if os.path.isfile(CACHE):
        try:
            return N3Tree(CACHE)
        except Exception:
            os.unlink(CACHE)
    tree = make_test_tree(max_depth=DEPTH, basis_dim=BASIS_DIM, seed=3,
                          n_blobs=6, sigma_scale=60.0)
    try:
        tree.save_npz(CACHE, compressed=False)
    except Exception:
        pass
    return tree


def orbit_poses(n, radius=2.8, elev=0.45):
    from volrend_tpu.ops.camera import Camera
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        back = np.array([np.cos(th) * np.cos(elev),
                         np.sin(th) * np.cos(elev), np.sin(elev)])
        cams.append(Camera.from_vectors(
            center=tuple(radius * back), v_back=tuple(back),
            width=W, height=H))
    return cams


def main():
    import jax
    import jax.numpy as jnp
    from volrend_tpu.utils.options import RenderOptions

    tree = get_tree()
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=1024)

    cams = orbit_poses(N_POSES)
    rays = [c.pixel_rays(xp=np) for c in cams]
    origins = jnp.asarray(np.stack([r[0] for r in rays]))
    dirs = jnp.asarray(np.stack([r[1] for r in rays]))

    render = None
    try:
        from volrend_tpu.ops import pallas_render
        if pallas_render.available():
            def render_one(tree, o, d):
                return pallas_render.render_rays(tree, o, d, opt)
            render = jax.jit(render_one)
    except Exception:
        render = None
    if render is None:
        from volrend_tpu.ops import render_jax

        def render_one(tree, o, d):
            return render_jax.render_rays(tree, o, d, opt)
        render = jax.jit(render_one)

    # warmup/compile
    render(dev, origins[0], dirs[0]).block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for i in range(N_POSES):
        outs.append(render(dev, origins[i], dirs[i]))
    outs[-1].block_until_ready()
    dt = time.perf_counter() - t0

    mrays = N_POSES * W * H / dt / 1e6
    print(json.dumps({
        "metric": "render_throughput_800x800_sh16",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
