"""Mesh/volume compositing frames + octree wireframe and probe helpers.

Ties together the mesh rasterizer (``ops/rasterize.py``) and the volume
renderer: the mesh pass produces per-pixel color + euclidean camera
distance; the volume march stops at the mesh distance and alpha-blends over
the mesh color — the reference's GL/CUDA two-pass contract
(``src/cuda_renderer.cpp:103-118``, ``src/cuda/volrend.cu:143-163``).

Also hosts the reference GUI's volume-adjacent viz features:
- octree wireframe overlay (``N3Tree.gen_wireframe`` -> line mesh;
  ``src/n3tree.cpp:364-434``, gated by ``opt.show_grid``);
- the lumisphere probe query (``src/cuda/volrend.cu:175-191``): fetch the
  SH/SG coefficients at a point, for the GUI's probe sphere display.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from volrend_tpu.models.mesh import Mesh
from volrend_tpu.models.n3tree import N3Tree, TreeArrays
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.rasterize import rasterize_meshes
from volrend_tpu.utils.options import RenderOptions

__all__ = ["render_frame_with_meshes", "wireframe_mesh", "probe_coeffs",
           "probe_image"]


def wireframe_mesh(tree: N3Tree, max_depth: int = 4) -> Mesh:
    """Octree wireframe as a line mesh (cuda_renderer.cpp:182-188 overlay)."""
    verts = tree.gen_wireframe(max_depth=max_depth)
    m = Mesh(np.asarray(verts, np.float32).reshape(-1, 9), face_size=2)
    m.auto_faces()
    m.unlit = True
    m.name = "wireframe"
    return m


def render_frame_with_meshes(tree: TreeArrays, cam, opt: RenderOptions,
                             meshes: Sequence[Mesh],
                             host_tree: Optional[N3Tree] = None
                             ) -> np.ndarray:
    """Full frame: mesh pass -> volume pass composited; (H, W, 4) f32."""
    meshes = list(meshes)
    if opt.show_grid and host_tree is not None:
        meshes.append(wireframe_mesh(host_tree, opt.grid_max_depth))
    buf = rasterize_meshes(meshes, cam)
    origins, dirs = cam.pixel_rays(xp=np)
    out = _render_composited(
        tree, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(buf.dist.reshape(-1)),
        jnp.asarray(buf.color.reshape(-1, 3)), opt)
    return np.asarray(out).reshape(cam.height, cam.width, 4)


@partial(jax.jit, static_argnames=("opt",))
def _render_composited(tree, origins, dirs, tmax_bg, bg_rgb,
                       opt: RenderOptions):
    return render_jax.render_rays(tree, origins, dirs, opt,
                                  tmax_bg=tmax_bg, bg_rgb=bg_rgb)


def probe_coeffs(tree: TreeArrays, point) -> np.ndarray:
    """Leaf payload at a world-space probe point
    (retrieve_cursor_lumisphere_kernel, volrend.cu:100-134, 175-191)."""
    p = jnp.asarray(point, jnp.float32)
    pos = tree.offset + tree.scale * p
    leaf_idx, _, _ = render_jax.query_batched(tree, pos[None])
    row = render_jax._fetch_rows(tree.data, leaf_idx[:1])[0]
    return np.asarray(row, np.float32)[:tree.data_dim]


def probe_image(tree: TreeArrays, point, size: int = 100) -> np.ndarray:
    """The GUI's inset lumisphere ball: evaluate the probe point's SH lobe
    over a size x size orthographic sphere patch; (size, size, 3) f32."""
    from volrend_tpu.models.data_format import BasisType
    from volrend_tpu.ops import basis as basis_mod

    coeffs = probe_coeffs(tree, point)
    bd = tree.basis_dim
    xs = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    xx, yy = np.meshgrid(xs, -xs)
    r2 = xx ** 2 + yy ** 2
    zz = np.sqrt(np.maximum(1.0 - r2, 0.0))
    dirs = np.stack([xx, yy, zz], -1)
    if bd < 0:
        rgb = np.broadcast_to(coeffs[:3], (size, size, 3)).copy()
    else:
        vals = basis_mod.eval_basis(
            BasisType(tree.fmt), bd, dirs.reshape(-1, 3),
            np.asarray(tree.extra), xp=np)
        raw = (coeffs[:3 * bd].reshape(3, bd)[None]
               * vals[:, None, :]).sum(-1)
        rgb = (1.0 / (1.0 + np.exp(-raw))).reshape(size, size, 3)
    rgb[r2 > 1.0] = 0.0
    return rgb.astype(np.float32)
