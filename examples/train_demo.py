"""End-to-end training demo: recover a corrupted PlenOctree from images.

Builds a synthetic scene, renders ground-truth views, corrupts the tree's
SH/sigma payloads, then optimizes them back with the fused hand-written VJP
(pixel L2 -> per-leaf gradients -> Adam). Writes before/after/target PNGs
and a metrics JSON.

    python examples/train_demo.py --out /tmp/train_demo [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/train_demo")
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--platform", choices=("auto", "cpu", "tpu"),
                   default="auto")
    p.add_argument("--sharded", action="store_true",
                   help="use the 8-virtual-device sharded training step")
    args = p.parse_args()
    if args.platform != "auto":
        import jax
        jax.config.update("jax_platforms", args.platform)
        if args.sharded:
            jax.config.update("jax_num_cpu_devices", 8)

    import dataclasses
    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import render_jax
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.train import Trainer, psnr
    from volrend_tpu.utils.options import RenderOptions
    from volrend_tpu.utils.png import write_png
    from volrend_tpu.utils.profiling import Metrics

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)

    tree = make_test_tree(max_depth=4, basis_dim=9, seed=11,
                          sigma_scale=50.0)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=512, renormalize=False)

    cams = []
    for th in np.linspace(0, 2 * np.pi, 10, endpoint=False):
        b = np.array([np.cos(th), np.sin(th), 0.45])
        b /= np.linalg.norm(b)
        cams.append(Camera.from_vectors(center=tuple(2.6 * b),
                                        v_back=tuple(b),
                                        width=64, height=64, fx=80.0))
    rays = [c.pixel_rays(xp=np) for c in cams]
    targets = [np.asarray(render_jax.render_image(dev, c, opt))
               for c in cams]

    noisy_rows = (np.asarray(dev.data, np.float32)
                  + rng.normal(0, 0.4, dev.data.shape).astype(np.float32))
    noisy = dataclasses.replace(dev, data=jnp.asarray(noisy_rows,
                                                      jnp.float16))
    tr = Trainer(noisy, opt, lr=5e-2)
    metrics = Metrics()

    def eval_psnr():
        img = np.asarray(render_jax.render_image(
            tr.current_tree(), cams[0], opt))
        return psnr(img[..., :3], targets[0][..., :3]), img

    p0, img0 = eval_psnr()
    write_png(os.path.join(args.out, "before.png"), img0)
    write_png(os.path.join(args.out, "target.png"), targets[0])

    mesh = None
    if args.sharded:
        from volrend_tpu.parallel import dist
        mesh = dist.make_mesh(jax.devices()[:8])

    t0 = time.perf_counter()
    for it in range(args.steps):
        k = it % len(cams)
        (o, d), t = rays[k], targets[k].reshape(-1, 4)
        sel = rng.integers(0, o.shape[0], 1024)
        if mesh is not None:
            loss = tr.step_sharded(mesh, o[sel], d[sel], t[sel])
        else:
            loss = tr.step(o[sel], d[sel], t[sel])
        if it % 25 == 0 or it == args.steps - 1:
            metrics.log(it, loss=loss)
    train_s = time.perf_counter() - t0

    p1, img1 = eval_psnr()
    write_png(os.path.join(args.out, "after.png"), img1)
    tr.save_checkpoint(os.path.join(args.out, "ckpt.npz"))
    tr.export_npz(tree, os.path.join(args.out, "scene_optimized.npz"))
    metrics.dump(os.path.join(args.out, "metrics.json"))

    summary = {"psnr_before_db": round(p0, 2), "psnr_after_db": round(p1, 2),
               "steps": args.steps, "train_seconds": round(train_s, 1),
               "sharded": bool(mesh)}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
