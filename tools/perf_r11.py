"""Round-3 (cont): identify the residual XLA ops around the kernels.

Compiles the bench's largest-group render jit (same shape as perf_r8) and
prints every non-trivial HLO op whose name matched the profiler's residual
list (copy.*, *dynamic-update-slice*, reshape.*, broadcast*, select_reduce*)
with operand/result shapes, so the layout/fold fixes target the right ops.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


GI = 256
N = 24
W = H = 800


def main():
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
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
    log("setup")

    @jax.jit
    def render(ts, pay):
        out = slab_render.render_frames(
            grid, ts, fx, fy, perm, flip, W, H, opt, gi=GI, payload=pay)
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2))

    txt = render.lower(trs, payload).compile().as_text()
    log(f"compiled HLO: {len(txt)} chars")
    pats = re.compile(
        r"^\s*[%\w.-]*(copy\.7[0-9]|copy\.6[0-9]|copy\.10[0-9]"
        r"|reshape\.43[0-9]|constant_dynamic-update-slice_fusion"
        r"|select_reduce_fusion|broadcast_clamp_fusion"
        r"|pad_maximum_fusion|copy_subtract_fusion|add_convert_fusion"
        r"|fusion\.1\b|broadcast_in_dim\.46[0-9])")
    for line in txt.splitlines():
        if pats.search(line):
            print(line.strip()[:400])


if __name__ == "__main__":
    main()
