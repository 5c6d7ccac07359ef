"""Worker process for the multi-process distributed smoke test.

Usage: python _mp_worker.py <coordinator> <process_id> <n_procs> <out_dir>

Each process initializes the JAX multi-host runtime over the coordination
service (DCN analog), verifies the global device view, runs one psum
collective across processes, then renders its pose shard through the
idempotent RenderQueue — the multi-host batch-render deployment shape
(SURVEY.md §5.8; per-host PNG writing like main_headless.cpp:216-222).
"""

import json
import os
import sys


def poses(n=4):
    """Deterministic orbit poses shared with the test process."""
    import numpy as np
    from volrend_tpu.ops.camera import Camera
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n + 0.3
        back = np.array([np.cos(th), np.sin(th), 0.5])
        back /= np.linalg.norm(back)
        cams.append(Camera.from_vectors(
            center=tuple(2.5 * back), v_back=tuple(back),
            width=24, height=24, fx=30.0))
    return cams


def scene_tree():
    from volrend_tpu.models.synthetic import make_test_tree
    return make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)


def main():
    coord, pid, nproc, out_dir = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from volrend_tpu.parallel import multihost

    multihost.init(coordinator_address=coord, num_processes=nproc,
                   process_id=pid)
    assert multihost.process_count() == nproc, multihost.process_count()
    assert multihost.process_index() == pid

    # one real cross-process collective over the global mesh (gloo/DCN)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = multihost.global_mesh()
    n_glob = len(jax.devices())
    psum_val = None
    try:
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("rays")),
            np.ones(len(jax.local_devices()), np.float32))

        @jax.jit
        def total(x):
            return jnp.sum(x)

        psum_val = float(total(arr))
    except Exception as e:  # pragma: no cover - environment-specific
        psum_val = f"failed: {e}"

    # pose-sharded render through the resumable queue
    from volrend_tpu.ops import render_jax
    from volrend_tpu.parallel.work_queue import RenderQueue
    from volrend_tpu.utils.options import RenderOptions

    tree = scene_tree()
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions()
    cams = poses()
    q = RenderQueue(out_dir, n_items=len(cams),
                    process_index=multihost.process_index(),
                    process_count=multihost.process_count())

    def render_batch(ids):
        for i in ids:
            img = np.asarray(render_jax.render_image(dev, cams[i], opt))
            np.save(os.path.join(out_dir, f"pose_{i}.npy"), img)

    n_done = q.run(render_batch, batch_size=2)

    with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "n_global_devices": n_glob,
                   "psum": psum_val, "n_done": n_done,
                   "items": q.my_items()}, f)
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
