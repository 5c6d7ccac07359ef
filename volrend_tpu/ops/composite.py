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
           "probe_image", "draw_probe_inset"]


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


def draw_probe_inset(frame: np.ndarray, tree: TreeArrays, cam,
                     opt: RenderOptions) -> np.ndarray:
    """Composite the lumisphere-probe ball as an inset circle inside the
    rendered frame (the reference draws it in-kernel at the top-right,
    volrend.cu:100-134). Host-side: the inset is ~probe_disp_size^2
    pixels of SH evaluation, negligible next to a frame render.

    frame: (H, W, 4) float [0,1] or uint8 RGBA; modified copy returned in
    the same dtype. Directions are the VIEW-rotated unit hemisphere
    (cen_z = -sqrt(1-c), rotated by the camera basis — the reference's
    ``_mv3(cam.transform, cen, dir)``), and basis_minmax windowing
    applies, so the inset responds to camera orbits and SH-band viz
    exactly like the reference's.
    """
    if not opt.enable_probe:
        return frame
    from volrend_tpu.models.data_format import BasisType
    from volrend_tpu.ops import basis as basis_mod

    H, W = frame.shape[:2]
    s = int(opt.probe_disp_size)
    if s <= 0 or W < s + 5 or H < s + 5:
        return frame
    is_u8 = frame.dtype == np.uint8
    out = np.array(frame)  # copy

    coeffs = probe_coeffs(tree, opt.probe)
    # pixel block [y0:y1) x [x0:x1) covering the circle (the reference
    # iterates the square y < s+5, x >= W-s-5 and tests c <= 1)
    ys = np.arange(H)
    xs = np.arange(W)
    in_y = ys < s + 5
    in_x = xs >= W - s - 5
    yy = (ys[in_y] - 5).astype(np.float32)
    xx = (xs[in_x] - (W - s) + 5).astype(np.float32)
    cen0 = -(xx / (0.5 * s) - 1.0)                    # (w,)
    cen1 = yy / (0.5 * s) - 1.0                       # (h,)
    c = cen0[None, :] ** 2 + cen1[:, None] ** 2       # (h, w)
    inside = c <= 1.0
    if not np.any(inside):
        return out
    cen2 = -np.sqrt(np.maximum(1.0 - c, 0.0))
    cen = np.stack([np.broadcast_to(cen0[None, :], c.shape),
                    np.broadcast_to(cen1[:, None], c.shape), cen2], -1)
    R = np.asarray(cam.transform, np.float32)[:3, :3]  # [right|up|back]
    dirs = cen[inside] @ R.T                           # world dirs (n, 3)

    bd = tree.basis_dim
    if bd < 0:
        rgb = np.broadcast_to(coeffs[:3], (dirs.shape[0], 3))
    else:
        vals = basis_mod.eval_basis(BasisType(int(tree.fmt)), bd, dirs,
                                    np.asarray(tree.extra), xp=np)
        vals = basis_mod.apply_basis_window(vals, opt.basis_minmax, xp=np)
        raw = (coeffs[:3 * bd].reshape(3, bd)[None]
               * vals[:, None, :]).sum(-1)
        rgb = 1.0 / (1.0 + np.exp(-raw))
    if is_u8:
        # clip before the cast: raw-RGBA trees (basis_dim < 0) skip the
        # sigmoid, so rgb can sit outside [0, 1] and an unclipped uint8
        # cast would wrap instead of saturating
        px = np.concatenate(
            [np.clip(np.round(rgb * 255.0), 0.0, 255.0),
             np.full((rgb.shape[0], 1), 255.0)],
            -1).astype(np.uint8)
    else:
        px = np.concatenate(
            [rgb, np.ones((rgb.shape[0], 1))], -1).astype(out.dtype)
    block = out[np.ix_(ys[in_y], xs[in_x])]
    block[inside] = px[..., :block.shape[-1]]
    out[np.ix_(ys[in_y], xs[in_x])] = block
    return out
