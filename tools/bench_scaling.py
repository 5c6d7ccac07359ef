"""Scaling-efficiency harness (BASELINE.md: >=90% rays/s efficiency
1 chip -> 1 host -> >=2 hosts).

Protocol analog: the reference's headless timing loop
(/root/reference/main_headless.cpp:203-231) run per device count. On real
hardware this runs unchanged over ``jax.devices()`` (multi-host via
``volrend_tpu.parallel.multihost.init``). This environment exposes ONE
chip, so default execution uses N virtual CPU devices — that validates the
sharding structure and measures the collective/overhead scaling *shape*
(weak scaling: fixed per-device work, efficiency = t_1 / t_n), not ICI
bandwidth. Two axes are measured:

- **render**: the zero-collective DP forward (rays sharded over the mesh,
  ``dist.render_rays_sharded``) — efficiency is bounded only by dispatch
  overhead, so the CPU-mesh shape is the honest structural number.
- **train**: ``FrameTrainer.step_frames_sharded`` (one frame per device,
  grads psum-reduced over the mesh) — adds exactly one leaf-grad psum.

``--tpu`` appends the single-real-chip absolute numbers (the production
slab fast path over an orbit batch — the same code path bench.py times)
to the same artifact, giving the 1-chip anchor the CPU shape extrapolates
from.

Writes/merges ``docs/BENCH_SCALING.json`` (or --out) and prints the JSON.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "BENCH_SCALING.json")


def _sync(x):
    return np.asarray(x)


def _time_reps(fn, reps=3):
    fn()  # compile + warm
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dts.append(time.perf_counter() - t0)
    return min(dts)


def measure_cpu_mesh(device_counts=(1, 2, 4, 8), rays_per_dev=1 << 15,
                     frame_side=24, reps=3):
    """Weak-scaling render + train over virtual CPU devices."""
    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.parallel import dist
    from volrend_tpu.train import FrameTrainer
    from volrend_tpu.utils.options import RenderOptions

    tree = make_test_tree(max_depth=5, basis_dim=9, seed=3, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=256)

    max_n = max(device_counts)
    side = int(np.sqrt(max_n * rays_per_dev))
    cam = Camera.from_vectors(width=side, height=side, fx=side * 1.4)
    origins_all, dirs_all = cam.pixel_rays(xp=np)
    origins_all = origins_all.reshape(-1, 3)
    dirs_all = dirs_all.reshape(-1, 3)

    render_mrays, train_steps_s = {}, {}
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = dist.make_mesh(jax.devices()[:n])
        tr = dist.replicate_tree(dev, mesh)
        nr = min(n * rays_per_dev, origins_all.shape[0])
        # uniform strided subsample: every device count must see the same
        # ray distribution (a contiguous [:nr] slice is the top image rows
        # only — mostly volume misses — which made per-count work unequal).
        # Float stride: an integer floor would collapse to stride 0 (every
        # index = ray 0) whenever total isn't a multiple of nr
        idx = np.minimum(
            (np.arange(nr) * (origins_all.shape[0] / nr)).astype(np.int64),
            origins_all.shape[0] - 1)
        o, d, _ = dist.shard_rays(origins_all[idx], dirs_all[idx], mesh)

        def render():
            _sync(dist.render_rays_sharded(tr, o, d, opt, mesh))

        dt = _time_reps(render, reps)
        render_mrays[n] = nr / dt / 1e6

        # train: one small frame per device through the full sharded step
        fmesh = dist.make_mesh(jax.devices()[:n], axis_name="frames")
        trainer = FrameTrainer(dev, opt=opt, lr=1e-2, gi=32)
        cams, targets = [], []
        for i in range(n):
            th = 0.3 + 0.4 * i / max(n, 1)
            back = np.array([np.cos(th), np.sin(th), 0.4])
            back /= np.linalg.norm(back)
            cams.append(Camera.from_vectors(
                center=tuple(2.5 * back), v_back=tuple(back),
                width=frame_side, height=frame_side, fx=1.25 * frame_side))
            targets.append(np.full((frame_side, frame_side, 4), 0.5,
                                   np.float32))
        placed = trainer.place_frames(cams, targets)

        def step():
            loss = trainer.step_frames_sharded(fmesh, cams, placed)
            assert np.isfinite(loss)

        dt = _time_reps(step, reps)
        train_steps_s[n] = 1.0 / dt

    base_n = min(render_mrays)
    render_eff = {n: (render_mrays[n] / n) / (render_mrays[base_n] / base_n)
                  for n in render_mrays}
    # weak scaling: per-step work grows with n, so steps/s staying flat is
    # perfect scaling
    train_eff = {n: train_steps_s[n] / train_steps_s[base_n]
                 for n in train_steps_s}
    return {
        "render_mrays_per_count": {str(n): round(v, 3)
                                   for n, v in render_mrays.items()},
        "render_efficiency": {str(n): round(v, 3)
                              for n, v in render_eff.items()},
        "train_steps_per_s_per_count": {str(n): round(v, 3)
                                        for n, v in train_steps_s.items()},
        "train_efficiency": {str(n): round(v, 3)
                             for n, v in train_eff.items()},
        "rays_per_device": rays_per_dev,
        "physical_cores": os.cpu_count(),
        "note": ("weak scaling on virtual CPU devices: validates sharding "
                 "structure + dispatch/collective overhead shape. Virtual "
                 "devices SHARE the host's physical cores, so efficiency "
                 "at counts above the core count is bounded by "
                 "oversubscription, not by the sharding design; ICI "
                 "numbers require a real multi-chip slice"),
    }


def measure_tpu_1chip(n_poses=16, depth=6, gi=256):
    """Single-real-chip absolute render number on the production slab fast
    path (the same path bench.py's headline times), as the 1-chip anchor."""
    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import dense_grid, slab_render
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.utils.options import RenderOptions

    assert jax.default_backend() == "tpu", "run under the TPU backend"
    W = H = 800
    tree = make_test_tree(max_depth=depth, basis_dim=16, seed=3,
                          n_blobs=6, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    opt = RenderOptions(max_steps=1024)
    cams = []
    for i in range(n_poses):
        th = 2 * np.pi * i / n_poses
        back = np.array([np.cos(th) * np.cos(0.45),
                         np.sin(th) * np.cos(0.45), np.sin(0.45)])
        cams.append(Camera.from_vectors(center=tuple(2.8 * back),
                                        v_back=tuple(back),
                                        width=W, height=H))
    groups = {}
    for c in cams:
        perm, flip, slope = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        assert np.isfinite(slope)
        groups.setdefault((perm, flip), []).append(c.transform)
    payloads = {perm: slab_render.prepare_payload(grid, perm, opt)
                for (perm, _f) in groups}

    def render_all():
        tot = 0.0
        for (perm, flip), trs in groups.items():
            out = slab_render.render_frames(
                grid, jnp.asarray(np.stack(trs), jnp.float32),
                cams[0].fx, cams[0].fy, perm, flip, W, H, opt, gi=gi,
                payload=payloads[perm], out_dtype=jnp.uint8)
            tot += float(np.sum(_sync(jnp.sum(
                out, dtype=jnp.float32, axis=(1, 2, 3)))))
        assert np.isfinite(tot)

    dt = _time_reps(render_all, reps=2)
    return {"render_mrays": round(n_poses * W * H / dt / 1e6, 3),
            "n_poses": n_poses, "grid_G": grid.G, "gi": gi,
            "note": ("production slab fast path, RGBA8 emit, one jit "
                     "dispatch per pose group; headline config numbers "
                     "live in BENCH_r*.json / docs/BENCH_TRAIN.json")}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="measure the single-real-chip anchor instead of "
                         "the CPU-mesh shape")
    ap.add_argument("--out", default=_DOCS)
    ap.add_argument("--counts", default="1,2,4,8")
    ap.add_argument("--rays-per-dev", type=int, default=1 << 15)
    ap.add_argument("--frame-side", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        try:
            counts = tuple(int(c) for c in args.counts.split(","))
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", max(counts))
        except RuntimeError:
            counts = tuple(c for c in counts
                           if c <= len(jax.devices()))

    doc = {}
    if os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                doc = json.load(f)
        except Exception:
            doc = {}
    doc.setdefault("metric", "scaling_efficiency")
    doc.setdefault("target", ">=90% rays/s efficiency 1 chip -> 1 host -> "
                             ">=2 hosts (BASELINE.md)")
    if args.tpu:
        doc["tpu_1chip"] = measure_tpu_1chip()
        doc["tpu_1chip"]["date"] = time.strftime("%Y-%m-%d")
    else:
        doc["cpu_mesh"] = measure_cpu_mesh(
            counts, rays_per_dev=args.rays_per_dev,
            frame_side=args.frame_side, reps=args.reps)
        doc["cpu_mesh"]["date"] = time.strftime("%Y-%m-%d")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    main()
