"""Multi-process distributed smoke test (SURVEY.md §4 item 4).

Spawns 2 real processes that jax.distributed.initialize over a local
coordinator (CPU backend, gloo collectives), run a cross-process psum, and
render a pose-sharded RenderQueue batch. Asserts both manifests complete
and the sharded images bit-match a single-process render.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_queue(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(_HERE)]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "_mp_worker.py"),
             coord, str(pid), "2", out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outs.append(stdout.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n".join(o for o in outs))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
        assert "WORKER_OK" in o

    # manifests: both processes completed their disjoint shards
    reports = []
    for pid in range(2):
        with open(os.path.join(out, f"worker_{pid}.json")) as f:
            reports.append(json.load(f))
        with open(os.path.join(out, f".manifest_p{pid:03d}.json")) as f:
            man = json.load(f)
        assert sorted(man["done"]) == reports[pid]["items"]
    assert reports[0]["items"] == [0, 2]
    assert reports[1]["items"] == [1, 3]
    # the global runtime really spanned both processes
    assert reports[0]["n_global_devices"] == 2
    # the cross-process collective ran and summed over both hosts
    assert reports[0]["psum"] == pytest.approx(2.0), reports[0]["psum"]

    # images match a single-process (current pytest process) render
    from tests._mp_worker import poses, scene_tree
    from volrend_tpu.ops import render_jax
    from volrend_tpu.utils.options import RenderOptions
    dev = scene_tree().to_device(lut_depth=None)
    opt = RenderOptions()
    for i, cam in enumerate(poses()):
        got = np.load(os.path.join(out, f"pose_{i}.npy"))
        want = np.asarray(render_jax.render_image(dev, cam, opt))
        np.testing.assert_allclose(got, want, atol=2e-6)
