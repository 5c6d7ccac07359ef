"""Round-4 probe: fresh frame decomposition at HEAD (dir_win + homography
coords + K=4) and the uint8-headline decision data.

1. Profiler decomposition of the bench inner loop (24-pose lax.map,
   gi=256) for out_dtype=None (f32 emit) AND out_dtype=uint8 (the
   reference's RGBA8 display write-out, volrend.cu:166-172): per-op
   device self-times from the Perfetto trace. The uint8 frame is 4x
   fewer HBM bytes at the emit + checksum read; this measures what that
   buys end-to-end.
2. Gate PSNR (orbit pose vs exact T2 rays) with out_dtype=uint8, for the
   dense and sparse scenes: can the RGBA8 config hold the 54.0/47.5 dB
   bench floors?  (f32-emit gate values measured 56.26 / 49.80 on chip.)
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

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)


GI = 256
N = 24
W = H = 800


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


def decompose(tag, grid, trs, payload, fx, fy, opt, perm, flip, out_dtype):
    @jax.jit
    def render(ts, pay):
        out = slab_render.render_frames(
            grid, ts, fx, fy, perm, flip, W, H, opt, gi=GI, payload=pay,
            out_dtype=out_dtype)
        return jnp.sum(out, dtype=jnp.float32, axis=(1, 2))

    _ = np.asarray(render(trs, payload))
    log(f"{tag}: compiled")
    dts = []
    for _ in range(3):
        t1 = time.perf_counter()
        _ = np.asarray(render(trs, payload))
        dts.append(time.perf_counter() - t1)
    dt = min(dts)
    mrays = N * W * H / dt / 1e6
    log(f"{tag}: {mrays:.1f} Mrays/s ({dt / N * 1e3:.2f} ms/frame), "
        f"reps {[round(d, 3) for d in dts]}")

    trace_dir = f"/tmp/vt_trace_r15_{tag}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    _ = np.asarray(render(trs, payload))
    jax.profiler.stop_trace()
    tot = self_times(trace_dir)
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:18]
    print(f"== {tag}: top device ops (ms/frame over {N} poses) ==")
    for name, us in top:
        print(f"  {us / 1e3 / N:7.3f}  {name[:90]}")
    print(f"  {sum(tot.values()) / 1e3 / N:7.3f}  TOTAL device", flush=True)
    return mrays


def main():
    opt = RenderOptions(max_steps=1024)

    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
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
    log("dense setup")

    m_f32 = decompose("f32", grid, trs, payload, fx, fy, opt, perm, flip,
                      None)
    m_u8 = decompose("u8", grid, trs, payload, fx, fy, opt, perm, flip,
                     jnp.uint8)

    # ---- gate PSNR with uint8 emit ---------------------------------------
    p8 = bench_mod.gate_orbit(dev, grid, cams[0], opt, jnp.uint8)
    pf = bench_mod.gate_orbit(dev, grid, cams[0], opt, None)
    log(f"dense orbit gate: f32 {pf:.2f} dB, uint8 {p8:.2f} dB "
        f"(floor {bench_mod.FLOOR_ORBIT})")

    stree = bench_mod.get_sparse_tree()
    sdev, sgrid = bench_mod.setup_scene(stree, "sparse")
    scams = bench_mod.orbit_poses(96)
    sp8 = bench_mod.gate_orbit(sdev, sgrid, scams[0], opt, jnp.uint8,
                               stride=8)
    spf = bench_mod.gate_orbit(sdev, sgrid, scams[0], opt, None, stride=8)
    log(f"sparse orbit gate: f32 {spf:.2f} dB, uint8 {sp8:.2f} dB "
        f"(floor {bench_mod.FLOOR_SPARSE})")

    print(json.dumps({
        "mrays_f32": round(m_f32, 1), "mrays_u8": round(m_u8, 1),
        "psnr_orbit_f32": round(pf, 2), "psnr_orbit_u8": round(p8, 2),
        "psnr_sparse_f32": round(spf, 2), "psnr_sparse_u8": round(sp8, 2),
    }))


if __name__ == "__main__":
    main()
