"""Split-frame slab throughput at 800^2 on the elevation sweep
(VERDICT r2 item 4 done-criterion: worst pose >= 10 Mrays/s incl.
slope > MAX_SLAB_SLOPE poses), plus a PSNR gate vs exact rays.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render, render_jax
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


def main():
    W = H = 800
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    log("setup")
    opt = RenderOptions(max_steps=1024)

    # elevation sweep at close radius + wide-ish FOV: pushes slope past
    # the MAX_SLAB_SLOPE gate and into the straddle (inf) regime
    poses = []
    for elev in (0.1, 0.5, 0.9, 1.2, 1.45):
        back = np.asarray([np.cos(elev), 0.2, np.sin(elev)])
        back /= np.linalg.norm(back)
        poses.append(Camera.from_vectors(
            center=tuple(1.35 * back), v_back=tuple(back),
            v_world_up=(0.0, 1.0, 0.0), width=W, height=H, fx=420.0))

    worst = np.inf
    cache = {}
    for i, cam in enumerate(poses):
        _, _, slope = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, W, H)
        steep = not (np.isfinite(slope)
                     and slope < slab_render.MAX_SLAB_SLOPE)
        # bench protocol: frames produced ON DEVICE, timed to a checksum
        # host transfer (downloads/PNG excluded, main_headless.cpp README
        # guidance); the per-pose floor is one ~26 ms tunnel round trip
        if steep:
            tr = jnp.asarray(cam.transform, jnp.float32)
            import volrend_tpu.ops.slab_render as sr
            # reuse the split internals for a device-resident frame
            tf = np.asarray(cam.transform, np.float64).reshape(3, 4)
            n = 33
            xs_ = np.linspace(0, W, n); ys_ = np.linspace(0, H, n)
            pxg, pyg = np.meshgrid(xs_, ys_)
            d_cam = np.stack([(pxg.reshape(-1) - 0.5 * W) / cam.fx,
                              -(pyg.reshape(-1) - 0.5 * H) / cam.fy,
                              -np.ones(n * n)], -1)
            d_tree = (d_cam @ tf[:, :3].T) * np.asarray(grid.scale,
                                                        np.float64)
            mm = np.argmax(np.abs(d_tree), -1)
            neg = d_tree[np.arange(n * n), mm] < 0
            classes = tuple(sorted({(int(a), bool(fl))
                                    for a, fl in zip(mm, neg)}))
            pays = []
            for axis, fl in classes:
                perm_ = (axis, (axis + 1) % 3, (axis + 2) % 3)
                if perm_ not in cache:
                    cache[perm_] = slab_render.prepare_payload(
                        grid, perm_, opt)
                pays.append(cache[perm_])
            pays = tuple(pays)
            def f():
                out = sr._render_split_jit(grid, tr, cam.fx, cam.fy,
                                           classes, W, H, opt, 384,
                                           payloads=pays)
                return out, float(jnp.sum(out[::97, ::101]))
        else:
            perm, flip, _ = slab_render.choose_axis(
                grid, cam.transform, cam.fx, cam.fy, W, H)
            tr = jnp.asarray(cam.transform, jnp.float32)
            def f():
                out = slab_render.render_frame(
                    grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt,
                    gi=384)
                return out, float(jnp.sum(out[::97, ::101]))
        fr_dev, _ = f()
        t1 = time.perf_counter()
        for _ in range(2):
            fr_dev, _ = f()
        dt = (time.perf_counter() - t1) / 2
        fr = np.asarray(fr_dev)
        mrays = W * H / dt / 1e6
        worst = min(worst, mrays)
        # PSNR vs exact rays, stride 20 (1600 rays)
        ys = np.arange(0, H, 20)
        xs = np.arange(0, W, 20)
        origins, dirs = cam.pixel_rays(xp=np)
        sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
        exact = np.asarray(render_jax.render_rays(
            dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
        got = np.asarray(fr)[ys][:, xs].reshape(-1, 4)
        mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
        p = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
        log(f"pose {i} (slope={slope if np.isfinite(slope) else 'inf'}, "
            f"steep={steep}): {mrays:6.1f} Mrays/s, psnr {p:.1f} dB")
    log(f"WORST pose: {worst:.1f} Mrays/s (gate >= 10)")


if __name__ == "__main__":
    main()
