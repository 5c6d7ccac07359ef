"""Scaling-efficiency harness (BASELINE.md: >=90% rays/s efficiency
1 chip -> 1 host -> >=2 hosts).

On real hardware this runs unchanged over `jax.devices()` (multi-host via
``volrend_tpu.parallel.multihost.init``). This environment exposes one chip,
so default execution uses N virtual CPU devices — that validates the
sharding structure and measures the collective/overhead scaling shape, not
ICI bandwidth. The forward render is zero-collective DP, so on real chips
efficiency is bounded only by dispatch overhead and pose-count divisibility;
the training step adds exactly one leaf-grad psum.

Prints one JSON line: rays/s per device count + parallel efficiency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(device_counts=(1, 2, 4, 8), n_rays=1 << 18, use_tpu=False):
    import jax
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(device_counts))
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.parallel import dist
    from volrend_tpu.utils.options import RenderOptions

    tree = make_test_tree(max_depth=5, basis_dim=9, seed=3, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    side = int(np.sqrt(n_rays))
    cam = Camera.from_vectors(width=side, height=side, fx=side * 1.4)
    origins, dirs = cam.pixel_rays(xp=np)
    opt = RenderOptions(max_steps=512)

    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = dist.make_mesh(jax.devices()[:n])
        tr = dist.replicate_tree(dev, mesh)
        o, d, _ = dist.shard_rays(origins, dirs, mesh)
        out = dist.render_rays_sharded(tr, o, d, opt, mesh)
        _ = float(jnp.sum(out))  # compile + sync
        t0 = time.perf_counter()
        reps = 3
        for _i in range(reps):
            out = dist.render_rays_sharded(tr, o, d, opt, mesh)
            _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        results[n] = origins.shape[0] / dt / 1e6

    base = results[min(results)]
    effs = {n: results[n] / (base * n / min(results)) for n in results}
    print(json.dumps({
        "metric": "scaling_mrays_per_s",
        "per_device_count": {str(n): round(v, 3) for n, v in results.items()},
        "efficiency_vs_linear": {str(n): round(e, 3)
                                 for n, e in effs.items()},
        "note": ("virtual CPU devices validate structure; "
                 "run on real slices for ICI numbers"),
    }))


if __name__ == "__main__":
    main()
