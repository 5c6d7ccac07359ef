"""Benchmark: Mrays/s for 800x800 NeRF-synthetic-style rendering.

Replicates the reference's headless FPS protocol (main_headless.cpp:203-231):
render N poses end-to-end on device, excluding PNG writing; report rays/s.
No real PlenOctree assets exist in this environment, so the scene is a
deterministic procedural SH16 octree at drums-like scale (see
volrend_tpu/models/synthetic.py). Baseline: the PlenOctrees paper's ~168 FPS
on a V100 at 800x800 = ~110 Mrays/s (BASELINE.md).

Timing notes: on the axon TPU tunnel ``block_until_ready`` does NOT actually
synchronize — only host transfers do — and every dispatch+sync round trip
costs ~26 ms. So all poses are rendered inside ONE jitted call (a
``lax.map`` over the pose batch, which is also how a production batch
renderer should be written) and the timed region ends with a host transfer
of a per-pose checksum.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 110.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_tree_cache.npz")
W = H = 800
# 200 test poses = the canonical NeRF-synthetic test-set size the reference's
# headless protocol times (main_headless.cpp:203-231 renders every pose given)
N_POSES = 200
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


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from volrend_tpu.ops import dense_grid, slab_render
    from volrend_tpu.utils.options import RenderOptions

    _log("loading tree")
    tree = get_tree()
    _log("to_device")
    dev = tree.to_device(lut_depth=None)
    _log("baking dense grid")
    # int8 colors + 14-bit fixed-point sigma, dequantized inside the march
    # kernel: halves HBM stream traffic at 76 dB PSNR vs the f16 grid
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    _log("bake dispatched")
    opt = RenderOptions(max_steps=1024)

    cams = orbit_poses(N_POSES)
    # group poses by (perm, flip) so each group is one jitted lax.map call
    groups = {}
    for c in cams:
        perm, flip, slope = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        assert np.isfinite(slope), "orbit pose not slab-renderable"
        groups.setdefault((perm, flip), []).append(c.transform)

    fx, fy = cams[0].fx, cams[0].fy

    batches = [(jnp.asarray(np.stack(trs), jnp.float32), perm, flip)
               for (perm, flip), trs in groups.items()]
    _log(f"{len(batches)} pose groups: "
         f"{[(p, f, t.shape[0]) for t, p, f in batches]}")
    static_pf = tuple((perm, flip) for _, perm, flip in batches)

    # slab-major payloads materialized once per permutation (scene prep,
    # like the reference's one-time load_cuda upload) — skips the per-call
    # permute. Keyed by the FULL perm: the in-plane axis order matters to
    # the payload layout (only flip is free, handled by march order).
    pay_by_perm = {}
    for _, perm, flip in batches:
        if perm not in pay_by_perm:
            pay_by_perm[perm] = slab_render.prepare_payload(grid, perm, opt)
    payloads = tuple(pay_by_perm[perm] for _, perm, flip in batches)

    # ALL pose groups inside one jitted call: every dispatch through the
    # tunnel costs a ~26 ms round trip, so the whole benchmark is a single
    # dispatch + a single host transfer
    # out_dtype=uint8: the display frames leave the combine kernel as
    # RGBA8 (the reference's surf2Dwrite RGBA8 framebuffer,
    # volrend.cu:166-172) — quarters the emitted/stacked frame bytes.
    # The quality gate below renders with the SAME setting so the knob
    # is priced into psnr_vs_exact.
    @partial(jax.jit, static_argnames=("pf",))
    def render_all(grid, trs_list, pays, pf):
        outs = []
        for (perm, flip), trs, pay in zip(pf, trs_list, pays):
            out = slab_render.render_frames(
                grid, trs, fx, fy, perm, flip, W, H, opt, gi=256,
                payload=pay, out_dtype=jnp.uint8)
            outs.append(jnp.sum(out, dtype=jnp.float32, axis=(1, 2)))
        return jnp.concatenate(outs)

    trs_list = tuple(t for t, _, _ in batches)
    np.asarray(render_all(grid, trs_list, payloads, static_pf))
    _log("compiled")

    # best-of-2: the axon relay occasionally stalls a single dispatch for
    # seconds right after big uploads (measured 5 vs 123 Mrays/s for the
    # same binary); the min is the honest steady-state number
    dts = []
    for _rep in range(2):
        t0 = time.perf_counter()
        total = np.asarray(render_all(grid, trs_list, payloads, static_pf))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    assert np.all(np.isfinite(total))
    mrays = N_POSES * W * H / dt / 1e6
    _log(f"throughput {mrays:.1f} Mrays/s ({mrays / BASELINE_MRAYS:.2f}x); "
         f"reps {[round(d, 3) for d in dts]}")

    # ---- quality gate: slab output vs the exact T2 octree renderer --------
    # One pose, pixel-subsampled (stride 5 -> 160x160 exact rays through the
    # per-sample octree march). This prices the bench's own quality knobs
    # (gi, int8 grid, bf16 warp) so the throughput number can't be bought by
    # degrading them silently.
    _log("quality gate: exact reference rays")
    from volrend_tpu.ops import render_jax
    cam = cams[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), fx, fy, perm, flip, W, H, opt,
        gi=256, out_dtype=jnp.uint8)).astype(np.float32) / 255.0
    ys = np.arange(0, H, 5)
    xs = np.arange(0, W, 5)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    got = frame[ys][:, xs].reshape(-1, 4)
    mse = float(np.mean((got[:, :3] - exact[:, :3]) ** 2))
    psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
    _log(f"psnr_vs_exact {psnr:.2f} dB")
    assert psnr >= 40.0, f"quality gate failed: {psnr:.2f} dB < 40 dB"

    print(json.dumps({
        "metric": "render_throughput_800x800_sh16",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "psnr_vs_exact_db": round(psnr, 2),
    }))


if __name__ == "__main__":
    main()
