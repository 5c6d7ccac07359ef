"""r5 pose-batch unroll A/B (PARKED with numbers): lax.scan unroll
over the pose batch does NOT shrink the ~0.13 ms/frame dispatch
share — U=1: 324.1, U=2: 323.6, U=4: 317.0 Mrays/s at the 96-pose
scale (v5e, 2026-08-20). _MAP_UNROLL stays 1.
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions
t0 = time.perf_counter()
def log(m): print(f"[r18 +{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

opt = RenderOptions(max_steps=1024)
tree = bench_mod.get_tree()
dev, grid = bench_mod.setup_scene(tree, "dense")
cams = bench_mod.orbit_poses(96)
trs_list, payloads, static_pf = bench_mod.group_poses(grid, cams, opt)
fx, fy = cams[0].fx, cams[0].fy
for U in (1, 2, 4, 1):
    slab_render._MAP_UNROLL = U
    jax.clear_caches()
    m, dts = bench_mod.run_throughput(grid, trs_list, payloads, static_pf,
                                      fx, fy, opt, 96, out_dtype=jnp.uint8)
    log(f"unroll={U}: {m:.1f} Mrays/s reps {[round(d,3) for d in dts]}")
