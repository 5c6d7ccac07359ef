"""Round-3 frame decomposition at the production display setting (gi=256).

Renders the bench protocol's largest pose group (24 poses, one jitted
lax.map) under jax.profiler.trace and aggregates device-side op durations
from the emitted Perfetto json.gz — stage-probe timings lie under fusion
(CLAUDE.md r3 facts), the profiler does not. Output: top device ops by
total time, bucketed into march / warp-build / warp-gather / warp-combine
/ other, in ms per frame.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


GI = int(os.environ.get("GI", "256"))
N = 24
W = H = 800


def main():
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    groups = {}
    for c in cams:
        perm, flip, _ = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        groups.setdefault((perm, flip), []).append(c.transform)
    (perm, flip), trs_all = max(groups.items(), key=lambda kv: len(kv[1]))
    fx, fy = cams[0].fx, cams[0].fy
    trs = jnp.asarray(np.stack(trs_all[:N]), jnp.float32)
    payload = slab_render.prepare_payload(grid, perm, opt)
    payload.block_until_ready()
    log("setup")

    @jax.jit
    def render(ts, pay):
        out = slab_render.render_frames(
            grid, ts, fx, fy, perm, flip, W, H, opt, gi=GI, payload=pay)
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2))

    _ = np.asarray(render(trs, payload))
    log("compiled")

    trace_dir = "/tmp/vt_trace_r8"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    _ = np.asarray(render(trs, payload))
    jax.profiler.stop_trace()
    log("traced")

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace json under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]

    # device-track pids: names like "/device:TPU:0" or TensorFlow Op tracks
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    # exclusive self-time: subtract nested children on the same track
    tracks = defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tracks[(e["pid"], e.get("tid"))].append(
                (e["ts"], e["ts"] + e.get("dur", 0.0), e["name"]))
    tot = defaultdict(float)
    for evs in tracks.values():
        evs.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        stack = []  # [start, end, name, child_time]

        def pop_one():
            st, en, nm, child = stack.pop()
            dur = en - st
            tot[nm] += dur - child
            if stack:
                stack[-1][3] += dur

        for ts, te, name in evs:
            while stack and ts >= stack[-1][1]:
                pop_one()
            stack.append([ts, te, name, 0.0])
        while stack:
            pop_one()

    buckets = defaultdict(float)

    def bucket(name):
        n = name.lower()
        if "march" in n or "slab" in n and "kernel" in n:
            return "march"
        if "build" in n or "sq_table" in n:
            return "warp-build"
        if "gather" in n:
            return "gather"
        if "combine" in n or "emit" in n:
            return "warp-combine"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "layout"
        if "fusion" in n:
            return "fusion"
        return "other"

    top = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    print(f"\n== top device ops (ms/frame over {N} poses, gi={GI}) ==")
    for name, us in top:
        buckets[bucket(name)] += us
        print(f"  {us / 1e3 / N:7.3f}  {name[:100]}")
    total_us = sum(tot.values())
    print(f"\n== buckets (top-30 ops) ==")
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {us / 1e3 / N:7.3f}  {b}")
    print(f"  {total_us / 1e3 / N:7.3f}  TOTAL (all device ops)")


if __name__ == "__main__":
    main()
