"""Measure _BF16_SHADE: march-kernel + frame time and quality, flag off/on.

bf16 packs two values per 32-bit VPU lane, so the SH shading accumulation
(the march's dominant VPU cost) should run up to 2x faster; interpret-mode
agreement with f32 shading is 63 dB (far above the 40 dB bench gate).
"""

import sys, os, time
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
def sync_time(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    tt = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - tt) / reps - FLOOR


def main():
    W = H = 800
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    G = grid.G
    log(f"setup done G={G}")

    cams = bench_mod.orbit_poses(12)
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform)
    gi = 448

    same = [c for c in cams if slab_render.choose_axis(
        grid, c.transform, c.fx, c.fy, W, H)[:2] == (perm, flip)]
    trs = jnp.asarray(np.stack([c.transform for c in same]))

    ref = None
    for flag in (False, True):
        pallas_slab._BF16_SHADE = flag
        jax.clear_caches()
        fb = jax.jit(lambda g, ts: slab_render.render_frames(
            g, ts, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
        t = sync_time(fb, grid, trs, reps=2)
        log(f"bf16={flag}: batched {len(same)} poses {t*1e3:7.2f} ms total, "
            f"{t/len(same)*1e3:6.2f} ms/frame")
        f1 = jax.jit(lambda g, t_: slab_render.render_frame(
            g, t_, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
        frame = np.asarray(f1(grid, tr))
        if ref is None:
            ref = frame
        else:
            mse = float(np.mean((frame[..., :3] - ref[..., :3]) ** 2))
            log(f"bf16 vs f32 frame agreement: "
                f"{99.0 if mse < 1e-12 else -10*np.log10(mse):.2f} dB")
    pallas_slab._BF16_SHADE = False


if __name__ == "__main__":
    main()
