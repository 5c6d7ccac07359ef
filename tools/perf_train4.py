"""Round-4 probe: decompose the FrameTrainer step (docs/BENCH_TRAIN.json
54.94 ms/step at 800^2, G=128, gi=256) into device ops via the profiler.

Traffic estimate says the step's kernels move ~1-4 GB total (fwd+bwd
march streams, pyramid bake + optimizer update) = ~5-10 ms of HBM time;
54.94 suggests significant non-kernel overhead (XLA copies, layout,
scatter) worth naming before optimizing anything.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


def self_times(trace_dir):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace json under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    tracks = defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tracks[(e["pid"], e.get("tid"))].append(
                (e["ts"], e["ts"] + e.get("dur", 0.0), e["name"]))
    tot = defaultdict(float)
    for evs in tracks.values():
        evs.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        stack = []

        def pop_one():
            st, en, nm, child = stack.pop()
            tot[nm] += (en - st) - child
            if stack:
                stack[-1][3] += en - st

        for ts, te, name in evs:
            while stack and ts >= stack[-1][1]:
                pop_one()
            stack.append([ts, te, name, 0.0])
        while stack:
            pop_one()
    return tot


def main():
    # VT_PRECISE_SQ=1 enables the (parked, default-off) precise-superquad
    # training warp so the documented +24 ms/step comparison stays
    # reproducible; =0 forces the reference-warp VJP explicitly.
    if os.environ.get("VT_PRECISE_SQ") in ("0", "1"):
        from volrend_tpu.ops import display_warp
        display_warp._PRECISE_SQ = os.environ["VT_PRECISE_SQ"] == "1"
        log(f"knob: _PRECISE_SQ={display_warp._PRECISE_SQ}")
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.train import FrameTrainer
    from volrend_tpu.utils.options import RenderOptions

    size, depth, gi = 800, 6, 256
    tree = make_solid_tree(max_depth=depth, basis_dim=16, seed=3)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=1024, renormalize=False)
    trainer = FrameTrainer(dev, opt=opt, lr=5e-3, gi=gi)
    cam = Camera.from_vectors(center=(2.3, 1.1, 1.4),
                              v_back=(0.76, 0.37, 0.53),
                              width=size, height=size)
    log("setup")

    from volrend_tpu.ops import render_jax  # target: a cheap synthetic
    target = jnp.zeros((size, size, 4), jnp.float32) + 0.5
    for _ in range(3):
        loss = trainer.step_frame(cam, target)
    log(f"warm, loss={loss:.4f}")

    dts = []
    for _ in range(5):
        t1 = time.perf_counter()
        trainer.step_frame(cam, target)
        dts.append(time.perf_counter() - t1)
    log(f"step times: {[round(d*1e3, 1) for d in dts]} ms")

    trace_dir = "/tmp/vt_trace_train4"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    trainer.step_frame(cam, target)
    jax.profiler.stop_trace()
    tot = self_times(trace_dir)
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    print("== top device ops (ms/step) ==")
    for name, us in top:
        print(f"  {us / 1e3:7.3f}  {name[:95]}")
    print(f"  {sum(tot.values()) / 1e3:7.3f}  TOTAL device", flush=True)


if __name__ == "__main__":
    main()
