"""Whole-frame training at rendering speed: recover a corrupted scene.

The fast-path trainer (``train.FrameTrainer``) optimizes grid-space
pyramid parameters through the slab renderer — bake, march, and screen
warp are all differentiated (custom-VJP Pallas march on TPU). This demo:

1. builds a realistic solid-object scene (`make_solid_tree`),
2. renders clean target frames with the same slab renderer,
3. corrupts the tree's SH/sigma payloads,
4. runs whole-frame SGD steps (~30 ms/step at 800^2 on one v5e),
5. reports per-pose PSNR before/after and writes PNGs + metrics JSON.

    python examples/train_slab_demo.py --out /tmp/slab_demo [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/slab_demo")
    ap.add_argument("--platform", default=None,
                    help="cpu to force the CPU backend")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--depth", type=int, default=6,
                    help="tree depth (6 -> G=128 fits one 16 GB chip)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--poses", type=int, default=4)
    ap.add_argument("--bank", action="store_true",
                    help="also write docs/TRAIN_DEMO.json (the banked "
                         "convergence artifact, VERDICT r4 item 5)")
    ap.add_argument("--lean", action="store_true",
                    help="FrameTrainer(lean=True): the bench-scale "
                         "memory mode (bf16 moments + bf16 grad path)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.train import FrameTrainer
    from volrend_tpu.utils.options import RenderOptions
    from volrend_tpu.utils.png import write_png

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()

    def log(m):
        print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", flush=True)

    W = H = args.size
    tree = make_solid_tree(max_depth=args.depth, basis_dim=9, seed=7)
    dev = tree.to_device(lut_depth=None)
    log(f"scene: {np.asarray(dev.data).shape[0]} leaf rows, "
        f"backend={jax.default_backend()}")

    # poses sharing one (perm, flip) group so frames batch cleanly
    cams = []
    for i in range(args.poses):
        th = 0.25 + 0.1 * i
        back = np.array([np.cos(th), np.sin(th), 0.45])
        back /= np.linalg.norm(back)
        cams.append(Camera.from_vectors(
            center=tuple(2.6 * back), v_back=tuple(back), width=W,
            height=H))

    opt = RenderOptions(max_steps=1024)
    tr = FrameTrainer(dev, opt=opt, lr=5e-2, gi=448, lean=args.lean)

    from volrend_tpu.ops import slab_render

    def render_current(cam):
        # rebake the CURRENT parameters into a display grid
        import dataclasses

        from volrend_tpu.ops import slab_grad
        g = slab_grad.bake_from_pyramid(tr.pyramid, tr.bmap)
        grid = dataclasses.replace(tr.grid, data=g.astype(jnp.float16))
        return np.asarray(slab_render.render_image(grid, cam, opt, gi=448))

    log("rendering clean targets")
    targets = [render_current(c) for c in cams]
    write_png(os.path.join(args.out, "target.png"),
              (np.clip(targets[0][..., :3], 0, 1) * 255).astype(np.uint8))

    # corrupt: damp all SH color coefficients, perturb sigma
    rng = np.random.default_rng(0)
    data = np.asarray(tr.data)
    corrupted = data.copy()
    corrupted[:, :-1] *= 0.15
    corrupted[:, -1] *= rng.uniform(0.6, 1.4, data.shape[0]).astype(
        np.float32)
    tr.data = jnp.asarray(corrupted)
    tr.opt_state = tr.optimizer.init(tr.pyramid)

    before = render_current(cams[0])
    p_before = psnr(before[..., :3], targets[0][..., :3])
    write_png(os.path.join(args.out, "before.png"),
              (np.clip(before[..., :3], 0, 1) * 255).astype(np.uint8))
    log(f"corrupted: psnr vs target {p_before:.2f} dB")

    tgt_dev = [jnp.asarray(t) for t in targets]
    losses = []
    t_steps = time.perf_counter()
    for s in range(args.steps):
        loss = tr.step_frame(cams[s % len(cams)], tgt_dev[s % len(cams)])
        losses.append(loss)
        if s in (0, 1) or (s + 1) % 20 == 0:
            log(f"step {s + 1:4d}: loss {loss:.6f}")
    # time steady-state steps (first ones pay compiles)
    n_timed = min(20, args.steps)
    t1 = time.perf_counter()
    for s in range(n_timed):
        tr.step_frame(cams[s % len(cams)], tgt_dev[s % len(cams)])
    jax.block_until_ready(tr.pyramid)
    ms_step = (time.perf_counter() - t1) / n_timed * 1e3
    log(f"{args.steps + n_timed} steps; steady-state {ms_step:.1f} ms/step")

    after = render_current(cams[0])
    p_after = psnr(after[..., :3], targets[0][..., :3])
    write_png(os.path.join(args.out, "after.png"),
              (np.clip(after[..., :3], 0, 1) * 255).astype(np.uint8))
    log(f"recovered: psnr vs target {p_after:.2f} dB "
        f"(was {p_before:.2f})")

    metrics = {
        "psnr_before_db": round(p_before, 2),
        "psnr_after_db": round(p_after, 2),
        "ms_per_step": round(ms_step, 1),
        "steps": args.steps + n_timed,
        "resolution": [H, W],
        "loss_first": round(losses[0], 6),
        "loss_last": round(losses[-1], 6),
    }
    metrics["grid"] = int(tr.grid.G)
    metrics["platform"] = jax.default_backend()
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    if args.bank:
        bank = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "TRAIN_DEMO.json")
        with open(bank, "w") as f:
            json.dump(metrics, f, indent=1)
        log(f"banked {bank}")
    print(json.dumps(metrics))
    assert p_after > p_before + 5.0, "training failed to recover the scene"


if __name__ == "__main__":
    main()
