"""Headless batch renderer — the ``volrend_headless`` equivalent.

Flag-compatible with ``main_headless.cpp:77-235``: reads a 4x4 intrinsics
txt and N pose files (3x4 / 4x4 / 4Nx4 C2W), renders every pose, optionally
writes PNGs, and prints ``ms per frame`` / ``fps`` measured end-to-end
around the render loop (PNG writing excluded from the timer region the same
way the reference recommends omitting ``-o``; README.md:127-129).

Renderer selection: ``--renderer slab`` (default: dense-grid shear-warp fast
path, per-pose fallback to exact when a pose straddles the slab axis),
``--renderer exact`` (T2 batched octree query march — bit-faithful to the
reference semantics), ``--renderer oracle`` (NumPy reference, very slow).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from volrend_tpu.cli.opts import (add_common_opts, apply_platform,
                                  render_options_from_args)
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops.camera import Camera, poses_from_files, read_intrins
from volrend_tpu.utils.png import write_png


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="volrend_headless",
        description="TPU PlenOctree batch renderer")
    add_common_opts(p)
    p.add_argument("poses", nargs="*", help="pose txt file(s)")
    p.add_argument("-i", "--intrin", default="",
                   help="intrinsics txt (4x4); overrides --fx/--fy")
    p.add_argument("-o", "--write_images", default="",
                   help="output directory for PNG frames")
    p.add_argument("--scale", type=float, default=1.0,
                   help="image scale factor")
    p.add_argument("--max_imgs", type=int, default=0,
                   help="max images (0 = all)")
    p.add_argument("-r", "--reverse_yz", action="store_true",
                   help="poses are OpenCV convention (flip y/z)")
    p.add_argument("--renderer", choices=("slab", "exact", "oracle"),
                   default="slab")
    p.add_argument("--gi", type=int, default=None,
                   help="slab-renderer intermediate resolution "
                        "(default: grid-matched, slab_render.default_gi)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.poses:
        print("No poses specified", file=sys.stderr)
        return 1
    apply_platform(args)

    import jax.numpy as jnp
    from volrend_tpu.ops import render_jax
    from volrend_tpu.utils.options import RenderOptions

    tree = N3Tree(args.file)
    dev = tree.to_device(lut_depth=None)
    opt = render_options_from_args(args).replace(max_steps=4096)

    trans, basenames = poses_from_files(args.poses, args.reverse_yz)
    if args.max_imgs > 0:
        trans, basenames = trans[:args.max_imgs], basenames[:args.max_imgs]

    width = int(args.width * args.scale)
    height = int(args.height * args.scale)
    fx = args.fx * args.scale
    fy = args.fy * args.scale
    if args.intrin:
        ix, iy = read_intrins(args.intrin)
        fx, fy = ix * args.scale, iy * args.scale

    cams = [Camera(width, height, fx, fy, t) for t in trans]

    grid = None
    if args.renderer == "slab":
        from volrend_tpu.ops import dense_grid, slab_render
        grid = dense_grid.bake_dense(dev)
        if args.gi is None:
            args.gi = slab_render.default_gi(grid)

    def render_one(cam) -> np.ndarray:
        if args.renderer == "oracle":
            from volrend_tpu.ops import oracle
            return oracle.render_image(tree, cam, opt)
        return np.asarray(render_jax.render_image(dev, cam, opt))

    # PP overlap (SURVEY §2.3 PP row, main_headless.cpp:203-231 protocol):
    # PNG encoding runs in writer threads WHILE the next pose group
    # renders, so wall clock is ~max(render, png) instead of their sum;
    # JAX's async dispatch additionally overlaps group k+1's device
    # compute with group k's host download.
    writer = None
    futs = []
    if args.write_images:
        from concurrent.futures import ThreadPoolExecutor
        os.makedirs(args.write_images, exist_ok=True)
        writer = ThreadPoolExecutor(max_workers=8)

    def emit(i, img):
        if writer is not None:
            futs.append(writer.submit(
                write_png,
                os.path.join(args.write_images, basenames[i] + ".png"),
                img))

    if args.renderer == "slab":
        # Group poses by (perm, flip) and render each group as ONE jitted
        # lax.map dispatch (render_frames): on the axon tunnel every
        # dispatch+sync round trip costs ~26 ms, so per-pose dispatch
        # would be dispatch-bound, not render-bound. Poses the slab path
        # can't take (rays straddle the slab axis) fall back to the exact
        # renderer, one dispatch each. Matches the reference's protocol of
        # timing the whole loop (main_headless.cpp:203-231).
        import jax
        from volrend_tpu.ops import slab_render

        groups = {}
        fallback = []
        for i, cam in enumerate(cams):
            perm, flip, slope = slab_render.choose_axis(
                grid, cam.transform, cam.fx, cam.fy, width, height)
            # same gate as the viewer/animator (slab_render.compatible):
            # the box-tap warp is only accurate while per-slab spans stay
            # near one voxel, so steep poses take the exact renderer
            if np.isfinite(slope) and slope < slab_render.MAX_SLAB_SLOPE:
                groups.setdefault((perm, flip), []).append(i)
            else:
                fallback.append(i)

        split_cache = {}

        def run_groups(sink=None):
            frames = [None] * len(cams)
            # dispatch every group before downloading any (async device
            # arrays): group k+1 computes while group k transfers/writes
            # out_dtype=uint8: RGBA8 display frames off the combine
            # kernel (the reference's framebuffer format,
            # volrend.cu:166-172) — 4x fewer bytes on-device AND over
            # the device->host download the PNG writer consumes
            pend = [(idxs, slab_render.render_frames(
                grid, jnp.asarray(
                    np.stack([cams[i].transform for i in idxs]),
                    jnp.float32),
                fx, fy, perm, flip, width, height, opt, gi=args.gi,
                out_dtype=jnp.uint8))
                for (perm, flip), idxs in groups.items()]
            for idxs, out_dev in pend:
                out = np.asarray(out_dev)
                for j, i in enumerate(idxs):
                    frames[i] = out[j]
                    if sink is not None:
                        sink(i, out[j])
            for i in fallback:
                # steep/straddling poses: split-frame slab passes for
                # world trees (>> the exact path's throughput); the
                # exact renderer only for NDC trees
                if grid.ndc is None:
                    frames[i] = slab_render.render_frame_split(
                        grid, cams[i].transform, fx, fy, width, height,
                        opt, gi=args.gi, payload_cache=split_cache)
                else:
                    frames[i] = render_one(cams[i])
                if sink is not None:
                    sink(i, frames[i])
            return frames

        run_groups()                     # warmup/compile outside the timer
        t0 = time.perf_counter()
        frames = run_groups(sink=emit)
        dt = time.perf_counter() - t0
    else:
        # warmup/compile outside the timer (the reference's first-frame
        # CUDA compile cost is likewise excluded by its cudaEvent placement)
        _ = render_one(cams[0])

        frames = []
        t0 = time.perf_counter()
        for i, cam in enumerate(cams):
            frames.append(render_one(cam))
            emit(i, frames[-1])
        dt = time.perf_counter() - t0

    n = len(cams)
    print(f"{1e3 * dt / n:.10f} ms per frame")
    print(f"{n / dt:.10f} fps")

    if writer is not None:
        tw0 = time.perf_counter()
        for f in futs:
            f.result()
        writer.shutdown()
        print(f"png drain {1e3 * (time.perf_counter() - tw0):.1f} ms "
              f"(encoded concurrently with rendering)", file=sys.stderr)

    return 0


if __name__ == "__main__":
    sys.exit(main())
