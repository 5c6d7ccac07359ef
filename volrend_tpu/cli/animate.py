"""Animation renderer — the ``volrend_anim`` equivalent, headless.

The reference edits keyframes interactively (ImGui, main_anim.cpp:350-925)
and exports PNG frames at fixed fps; this CLI takes the keyframes from a
JSON script (see ``volrend_tpu.anim.load_script``) and renders the frame
sequence with the same interpolation semantics.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from volrend_tpu.anim import frame_times, interpolate, load_script
from volrend_tpu.cli.opts import (add_common_opts, apply_platform,
                                  render_options_from_args)
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.png import write_png


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="volrend_anim",
                                description="keyframe animation renderer")
    add_common_opts(p)
    p.add_argument("script", help="JSON keyframe script")
    p.add_argument("-o", "--output_folder", default="ani_out")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--renderer", choices=("slab", "exact"), default="slab")
    p.add_argument("--gi", type=int, default=512)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    apply_platform(args)

    from volrend_tpu.models import mesh as mesh_mod
    from volrend_tpu.ops import composite, render_jax

    tree = N3Tree(args.file)
    dev = tree.to_device(lut_depth=None)
    keyframes, cfg = load_script(args.script)
    if len(keyframes) < 2:
        print("need at least 2 keyframes", file=sys.stderr)
        return 1
    fps = float(cfg.get("fps", args.fps))
    world_up = np.asarray(cfg.get("world_up", (0.0, 0.0, 1.0)), float)

    meshes = []
    if args.draw:
        if args.draw.endswith(".obj"):
            meshes = [mesh_mod.load_basic_obj(args.draw)]
        else:
            meshes = mesh_mod.open_drawlist(args.draw)

    grid = None
    if args.renderer == "slab" and not meshes:
        from volrend_tpu.ops import dense_grid
        grid = dense_grid.bake_dense(dev)

    os.makedirs(args.output_folder, exist_ok=True)
    schedule = frame_times(keyframes, fps)
    for f_idx, (seg, q) in enumerate(schedule):
        center, v_back, fx, fy, opt, mstate = interpolate(
            keyframes[seg], keyframes[seg + 1], q, world_up,
            first_segment=(seg == 0))
        opt = opt.replace(max_steps=4096)
        cam = Camera.from_vectors(
            center=tuple(center), v_back=tuple(v_back),
            v_world_up=tuple(world_up), width=args.width,
            height=args.height, fx=fx, fy=fy)
        if meshes:
            for m in meshes:
                if m.name in mstate:
                    s = mstate[m.name]
                    m.rotation = np.asarray(s.rotation, np.float32)
                    m.translation = np.asarray(s.translation, np.float32)
                    m.scale = s.scale
                    m.visible = s.visible
                else:
                    m.visible = False
            img = composite.render_frame_with_meshes(
                dev, cam, opt, meshes, host_tree=tree)
        elif grid is not None:
            from volrend_tpu.ops import slab_render
            if slab_render.compatible(grid, cam.transform, fx, fy,
                                      args.width, args.height):
                img = slab_render.render_image(grid, cam, opt, gi=args.gi)
            else:
                img = np.asarray(render_jax.render_image(dev, cam, opt))
        else:
            img = np.asarray(render_jax.render_image(dev, cam, opt))
        path = os.path.join(args.output_folder, f"{f_idx:06d}.png")
        write_png(path, img)
    print(f"Wrote {len(schedule)} frames to {args.output_folder}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
