"""r5 dir_win absorption probe (the second half of the perf_r17
compute-vs-stream settlement): adding VPU work (dir_win off) costs
+0.127 ms/frame DIRECTLY (2.152 -> 2.279 at the 24-pose probe
scale; K=8 2.191) — no absorption headroom under the stream, so the
march sits at the compute/stream crossover and multi-pose stream
sharing stays parked (v5e, 2026-08-20).
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import bench as bench_mod
from volrend_tpu.ops import dense_grid, pallas_slab, slab_render
from volrend_tpu.utils.options import RenderOptions
t0 = time.perf_counter()
def log(m): print(f"[r17b +{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

W = H = 800; gi = 256
tree = bench_mod.get_tree()
dev = tree.to_device(lut_depth=None)
grid = dense_grid.bake_dense(dev, dtype="int8")
opt = RenderOptions(max_steps=1024)
cams = bench_mod.orbit_poses(96)
cam = cams[0]
perm, flip, _ = slab_render.choose_axis(grid, cam.transform, cam.fx, cam.fy, W, H)
same = [c for c in cams if slab_render.choose_axis(grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)][:24]
trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
n = len(same); fx, fy = cam.fx, cam.fy
payload = slab_render.prepare_payload(grid, perm, opt)
payload.block_until_ready()
slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
log(f"setup; {n} poses")

def march_all(pay, ts, dw, K):
    def one(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt, gi)
        params, zb = slab_render._pallas_frame_fields(grid, g, perm, flip, opt)
        acc4 = pallas_slab.march_slabs(
            pay, params, grid.qscale, zb, grid.G, gi, grid.data_dim,
            grid.basis_dim, perm, slab_ids=slab_ids, sig2=grid.quantized,
            flip=flip, bbox_full=True, dir_win=dw, k_per_step=K)
        return jnp.sum(acc4, dtype=jnp.float32)
    return lax.map(one, ts)

for tag, dw, K in (("dir_win K4", True, 4), ("no_dir_win K4", False, 4),
                   ("dir_win K8", True, 8)):
    jax.clear_caches()
    f = jax.jit(lambda pay, ts, dw=dw, K=K: march_all(pay, ts, dw, K))
    out = np.asarray(f(payload, trs))
    dts = []
    for _ in range(3):
        tt = time.perf_counter(); out = np.asarray(f(payload, trs))
        dts.append(time.perf_counter() - tt)
    log(f"{tag}: {min(dts)/n*1e3:7.3f} ms/frame")
