"""Shared CLI flags, mirroring the reference option layer.

Same names/defaults as ``src/opts.cpp:7-31`` (add_common_opts) and
``render_options_from_args`` (``src/opts.cpp:44-66``) so invocations are
drop-in comparable with the reference executables.
"""

from __future__ import annotations

import argparse

from volrend_tpu.utils.options import RenderOptions

__all__ = ["add_common_opts", "render_options_from_args"]


def add_common_opts(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("file", help="npz PlenOctree file")
    parser.add_argument("--draw", default=None,
                        help="npz drawlist or OBJ mesh overlay file")
    parser.add_argument("--gpu", type=int, default=-1,
                        help="device id (-1 = default)")
    parser.add_argument("-W", "--width", type=int, default=800)
    parser.add_argument("-H", "--height", type=int, default=800)
    parser.add_argument("--fx", type=float, default=-1.0,
                        help="focal x; -1 = default 1111.11")
    parser.add_argument("--fy", type=float, default=-1.0,
                        help="focal y; -1 = use fx")
    parser.add_argument("-b", "--bg", type=float, default=1.0,
                        help="background brightness")
    parser.add_argument("-s", "--step_size", type=float, default=1e-4)
    parser.add_argument("-e", "--stop_thresh", type=float, default=1e-2)
    parser.add_argument("-a", "--sigma_thresh", type=float, default=1e-2)
    parser.add_argument("--platform", choices=("auto", "cpu", "tpu"),
                        default="auto",
                        help="force the JAX backend (cpu useful when the "
                             "TPU is claimed by another process)")


def apply_platform(args) -> None:
    """Must run before the first JAX operation."""
    if getattr(args, "platform", "auto") != "auto":
        import jax
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass


def render_options_from_args(args) -> RenderOptions:
    return RenderOptions(
        step_size=args.step_size,
        sigma_thresh=args.sigma_thresh,
        stop_thresh=args.stop_thresh,
        background_brightness=args.bg,
    )
