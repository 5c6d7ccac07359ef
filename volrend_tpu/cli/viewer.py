"""Interactive viewer CLI — the ``volrend`` GUI equivalent, served over
HTTP with server-side TPU rendering (see volrend_tpu/web/server.py)."""

from __future__ import annotations

import argparse
import sys

from volrend_tpu.cli.opts import apply_platform


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="volrend_viewer")
    p.add_argument("file", help="npz PlenOctree file")
    p.add_argument("--draw", default=None, help="drawlist npz / OBJ overlay")
    p.add_argument("--port", type=int, default=8781)
    p.add_argument("--no-slab", action="store_true",
                   help="disable the dense-grid fast path")
    p.add_argument("--platform", choices=("auto", "cpu", "tpu"),
                   default="auto")
    args = p.parse_args(argv)
    apply_platform(args)
    from volrend_tpu.web.server import serve
    serve(args.file, draw=args.draw, port=args.port,
          use_slab=not args.no_slab)
    return 0


if __name__ == "__main__":
    sys.exit(main())
