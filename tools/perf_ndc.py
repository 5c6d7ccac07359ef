"""NDC/LLFF slab fast-path throughput probe (chip).

Measures 800x800 Mrays/s for an NDC tree through the slab path (the same
headless protocol as bench.py: all poses in one jitted lax.map, host
transfer sync) + a subsampled PSNR gate vs the exact T2 NDC renderer.
Before NDC slab support the only path for LLFF scenes was the per-sample
octree march (~0.04 Mrays/s on v5e) — this prices the speedup.

Poses: forward-facing cameras near the z=0 plane with small offsets/tilts
(the LLFF viewing regime; ndc_camera's default pose is the first one).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = H = 800
N_POSES = 48
DEPTH = 7
BASIS_DIM = 16
FX = 278.0      # ndc focal 1111 * 0.25 (the ndc_camera default)


def ndc_poses(n):
    from volrend_tpu.ops.camera import Camera
    rng = np.random.default_rng(7)
    cams = []
    for i in range(n):
        oz = 1e-3 + 0.25 * (i / max(n - 1, 1))        # z in [0.001, 0.25]
        ox, oy = rng.uniform(-0.08, 0.08, 2)
        tilt = rng.uniform(-0.06, 0.06, 2)
        cams.append(Camera.from_vectors(
            center=(ox, oy, oz),
            v_back=(tilt[0], tilt[1], 1.0),
            v_world_up=(0.0, 1.0, 0.0),
            width=W, height=H, fx=FX))
    return cams


def main():
    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.n3tree import NdcConfig
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import dense_grid, render_jax, slab_render
    from volrend_tpu.utils.options import RenderOptions

    t0 = time.perf_counter()

    def log(m):
        print(f"[perf_ndc +{time.perf_counter() - t0:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    log("building NDC tree")
    tree = make_test_tree(max_depth=DEPTH, basis_dim=BASIS_DIM, seed=3,
                          n_blobs=6, sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=float(W), height=float(H), focal=1111.0)
    dev = tree.to_device(lut_depth=None)
    log("baking int8 grid")
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    opt = RenderOptions(max_steps=1024)

    cams = ndc_poses(N_POSES)
    groups = {}
    for c in cams:
        perm, flip, slope = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        assert np.isfinite(slope), "NDC pose not slab-renderable"
        assert slope < slab_render.MAX_SLAB_SLOPE, slope
        groups.setdefault((perm, flip), []).append(c.transform)
    log(f"{len(groups)} pose groups "
        f"{[(k, len(v)) for k, v in groups.items()]}")

    fx, fy = cams[0].fx, cams[0].fy
    batches = [(jnp.asarray(np.stack(trs), jnp.float32), perm, flip)
               for (perm, flip), trs in groups.items()]
    static_pf = tuple((perm, flip) for _, perm, flip in batches)
    pay = {}
    for _, perm, _ in batches:
        if perm not in pay:
            pay[perm] = slab_render.prepare_payload(grid, perm, opt)
    payloads = tuple(pay[perm] for _, perm, _ in batches)

    @partial(jax.jit, static_argnames=("pf",))
    def render_all(grid, trs_list, pays, pf):
        outs = []
        for (perm, flip), trs, p in zip(pf, trs_list, pays):
            out = slab_render.render_frames(
                grid, trs, fx, fy, perm, flip, W, H, opt, gi=448,
                payload=p)
            outs.append(jnp.sum(out, dtype=jnp.float32, axis=(1, 2)))
        return jnp.concatenate(outs)

    trs_list = tuple(t for t, _, _ in batches)
    np.asarray(render_all(grid, trs_list, payloads, static_pf))
    log("compiled")
    dts = []
    for _ in range(2):
        s = time.perf_counter()
        total = np.asarray(render_all(grid, trs_list, payloads, static_pf))
        dts.append(time.perf_counter() - s)
    dt = min(dts)
    assert np.all(np.isfinite(total))
    mrays = N_POSES * W * H / dt / 1e6
    log(f"throughput {mrays:.1f} Mrays/s; reps {[round(d, 3) for d in dts]}")

    # subsampled quality gate vs exact T2 NDC rays
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), fx, fy, perm, flip, W, H, opt,
        gi=448))
    ys = np.arange(0, H, 5)
    xs = np.arange(0, W, 5)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    got = frame[ys][:, xs].reshape(-1, 4)
    mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
    psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
    log(f"psnr_vs_exact {psnr:.2f} dB")

    print(json.dumps({
        "metric": "ndc_render_throughput_800x800_sh16",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "psnr_vs_exact_db": round(psnr, 2),
    }))


if __name__ == "__main__":
    main()
