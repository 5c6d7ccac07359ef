"""Round-2 sweep: march kernel K (slabs/window), bf16 shading, and gi.

Per-window costs (the hoisted _warp_pre/_shade_pre planes + the window
dispatch) amortize over K slabs, so larger K should cut VPU work; the
VMEM ceiling is the double-buffered (K, Dp, G, G) int8 block. _CHUNK
trades dispatch count against the coarse per-chunk early-exit points
(the in-kernel whole-frame gate only fires on fully-saturated frames,
so chunk-level z-range exits still matter for partial views).
"""

import sys, os, time, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

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
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(12)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]), jnp.float32)
    n = len(same)
    log(f"setup done; {n} poses G={grid.G}")

    # gi joined the sweep after the fractional-boundary fix: CPU quality
    # probe shows PSNR flat in gi (71.3 dB at gi=384, 70.8 at 320 — int8
    # dequant noise is the floor), so smaller intermediate grids are a
    # free composite-lane reduction if the kernel stays fast.
    for K, chunk, bf16, gi in itertools.product((4, 8), (128,),
                                                (False, True),
                                                (256, 320, 384, 448)):
        pallas_slab._CHUNK = chunk
        pallas_slab._BF16_SHADE = bf16
        jax.clear_caches()
        # render_frames reads _BF16_SHADE at trace time; k_per_step is
        # fixed inside _pallas_march_finalize, so patch the march default
        orig = pallas_slab.march_slabs
        try:
            def patched(*a, **kw):
                kw["k_per_step"] = K
                return orig(*a, **kw)
            pallas_slab.march_slabs = patched
            fb = jax.jit(lambda g, ts, gi=gi: slab_render.render_frames(
                g, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
            t = sync_time(fb, grid, trs, reps=2)
            log(f"K={K} chunk={chunk} bf16={int(bf16)} gi={gi}: "
                f"{t/n*1e3:6.2f} ms/frame")
        except Exception as e:
            log(f"K={K} chunk={chunk} bf16={int(bf16)} gi={gi}: FAILED {e}")
        finally:
            pallas_slab.march_slabs = orig
    pallas_slab._CHUNK = 128
    pallas_slab._BF16_SHADE = False


if __name__ == "__main__":
    main()
