"""Shear-warp slab renderer: the TPU-native fast path.

The reference renders by per-pixel octree pointer-chasing
(``rt_core.cuh:66-196``) — a dependent-gather chain that GPUs hide with
per-thread memory parallelism but that runs ~80 Mrows/s as XLA gathers on
v5e. This module replaces the *traversal* (not the compositing math) with a
classic shear-warp factorization re-designed for TPU dataflow:

1. **Bake** the octree to a dense [G,G,G,D] grid (``ops/dense_grid.py``) —
   piecewise-constant equivalent to the octree: splitting a leaf chord into
   same-σ/color subsegments leaves front-to-back compositing algebraically
   unchanged (telescoping of T·(1−exp(−σΔ)) terms).
2. **Permute** so the camera's dominant axis is the slab axis. Every ray
   through the pinhole center C sampled at plane z has
   ``y = C_y + (z−C_z)·(d_y/d_z)`` — affine in the ray's *slope*. On a
   uniform slope grid (the intermediate image), per-slab resampling is a
   separable scale+translate: two tiny index-vector gathers instead of
   per-sample random access. HBM traffic = the grid, streamed once,
   contiguously — what the MXU/VPU memory system is built for.
3. **Composite** slab-by-slab (``lax.while_loop`` with all-stopped early
   exit) using exactly the reference accumulation math: σ-threshold, per-ray
   world-space Δt, SH→sigmoid color, stop-threshold with alpha/renorm
   semantics of ``rt_core.cuh:176-194``.
4. **Warp** the intermediate image to the screen with one projective
   bilinear resample (small-table gathers).

Quality matches per-pixel ray marching up to (a) x/y-boundary corner voxels
that a DDA would clip at sub-slab precision and (b) the per-segment
``step_size`` epsilon; entry/exit slabs along z contribute *fractionally*
(tau scaled by the slab's overlap with the pixel's exact z-interval), so
the z boundary is sub-slab exact — see tests/test_slab_render.py
(incl. ``test_fractional_boundary_uniform_sigma``) for gates vs the exact
T2 renderer.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from volrend_tpu.models.data_format import BasisType
from volrend_tpu.ops import basis as basis_mod
from volrend_tpu.ops.dense_grid import DenseGrid
from volrend_tpu.utils.options import RenderOptions

__all__ = ["choose_axis", "compatible", "render_frame", "render_image"]

_F32 = jnp.float32

#: quad tables at or below this stay on the whole-table gather fast path;
#: bigger (or f32-precise) tables use the banded row-block gather. Module
#: constant so tests can force the banded path at small scale.
_FULL_TABLE_MAX_BYTES = 12 * 2 ** 20

#: display-path in-plane occupancy crop (see inplane_crop / march_slabs
#: crop=): slice the Pallas payload to the occupied row/col ranges so
#: sparse-scene shade/warp compute and HBM streaming scale with the
#: occupied sub-box instead of G^2 — the slab-dataflow answer to the
#: reference's per-voxel empty-space skipping (rt_core.cuh:36-49). Exact
#: (cropped voxels are sub-threshold => masked to zero anyway). r5
#: production ON: on-chip A/B (docs/PERF_R16.json) — sparse 246.8 ->
#: 288.8 Mrays/s (301.7 with the r5 cascade) at an unchanged 49.83 dB
#: gate; the dense fog scene is uncroppable (crop=None) so it is
#: untouched. Callers must jax.clear_caches() after flipping.
_INPLANE_CROP = True
#: crop length granularity: rows = the int8 sublane tile, cols = the lane
#: tile (offsets are free — the sliced payload is a fresh dense array).
#: Module constants so interpret-mode tests can exercise the crop at
#: small G.
_CROP_MULT_Y = 32
_CROP_MULT_X = 128

#: pose-batch loop unroll for render_frames (1 = lax.map, the r4
#: behavior). Probe knob: scan-unrolling may shrink per-pose
#: control-flow/dispatch gaps; set via tools probe, adopt only with an
#: on-chip A/B.
_MAP_UNROLL = 1


def inplane_crop(grid: DenseGrid, perm: Tuple[int, int, int],
                 sigma_thresh: float) -> Optional[Tuple[int, int, int, int]]:
    """Static (y0, Gy, x0, Gx) in-plane crop for slab axis perm[0], from
    the bake's per-axis occupancy metadata. Lengths are rounded up to the
    payload tile granularity (rows: 32 — the int8 sublane tile; cols:
    128 — the lane tile; offsets are free: the sliced payload is a fresh
    dense array). None when disabled/unknown/uncroppable (dense scenes
    return the full extent, so the kernel specialization is unchanged)."""
    if not _INPLANE_CROP or grid.occ_max is None:
        return None
    G = grid.G

    def rng(axis: int, mult: int) -> Tuple[int, int]:
        occ = np.asarray(grid.occ_max[axis], np.float64)
        idx = np.nonzero(occ > sigma_thresh)[0]
        if idx.size == 0:
            return 0, min(mult, G)   # empty scene: march culls everything
        lo, hi = int(idx[0]), int(idx[-1]) + 1
        L = min(G, -(-(hi - lo) // mult) * mult)
        return max(0, min(lo, G - L)), L

    y0, Gy = rng(perm[1], _CROP_MULT_Y)
    x0, Gx = rng(perm[2], _CROP_MULT_X)
    if Gy == G and Gx == G:
        return None
    return (y0, Gy, x0, Gx)


def _cam_corners(width: int, height: int, fx: float, fy: float,
                 n_edge: int = 33) -> np.ndarray:
    """Camera-space dirs sampling the image boundary (slope extremes of a
    projective map live on the boundary)."""
    xs = np.linspace(0, width, n_edge, dtype=np.float64)
    ys = np.linspace(0, height, n_edge, dtype=np.float64)
    px = np.concatenate([xs, xs, np.full(n_edge, 0.0),
                         np.full(n_edge, float(width))])
    py = np.concatenate([np.full(n_edge, 0.0), np.full(n_edge, float(height)),
                         ys, ys])
    return np.stack([(px - 0.5 * width) / fx,
                     -(py - 0.5 * height) / fy,
                     -np.ones_like(px)], -1)


def _ndc_warp_dirs_np(ndc, dirs, origin):
    """Host-side NDC warp of world dirs sharing one origin (the world2ndc
    semantics of volrend.cu:34-54, np twin of render_jax.world2ndc).
    Returns UNnormalized NDC-space directions (slopes are scale-free)."""
    W, H, focal = (float(v) for v in ndc)
    o = np.asarray(origin, np.float64)
    d = np.asarray(dirs, np.float64)
    dz = d[:, 2]
    t = -(1.0 + o[2]) / dz
    cen = o[None, :] + t[:, None] * d
    sx = -(2.0 * focal) / W
    sy = -(2.0 * focal) / H
    return np.stack([
        sx * (d[:, 0] / dz - cen[:, 0] / cen[:, 2]),
        sy * (d[:, 1] / dz - cen[:, 1] / cen[:, 2]),
        -2.0 / cen[:, 2],
    ], -1)


def _ndc_center_np(ndc, origin):
    """NDC image of the camera origin under the projective NDC map
    pi(x,y,z) = (sx*x/z, sy*y/z, 1 + 2/z). The NDC warp is projective, so
    every warped ray passes through pi(origin): the warped ray family is
    still a pinhole family and the shear-warp factorization applies."""
    W, H, focal = (float(v) for v in ndc)
    ox, oy, oz = (float(v) for v in origin)
    sx = -(2.0 * focal) / W
    sy = -(2.0 * focal) / H
    return np.array([sx * ox / oz, sy * oy / oz, 1.0 + 2.0 / oz])


def choose_axis(grid: DenseGrid, transform: np.ndarray,
                fx: float, fy: float, width: int, height: int
                ) -> Tuple[Tuple[int, int, int], bool, float]:
    """Host-side: pick the slab axis for this pose.

    Returns (perm, flip, max_abs_slope). perm maps tree axes -> (slab, row,
    col); flip=True when rays march toward -slab. max_abs_slope gauges
    whether the pose is renderable (all boundary rays share the slab-axis
    sign); inf when not.

    NDC trees: pose geometry is warped into NDC space first (the tree's
    coordinate system). The slab axis must be the NDC z axis and the
    warped pinhole center must sit outside the volume's z range — other
    poses return inf and fall back to the exact T2 renderer.
    """
    tf = np.asarray(transform, np.float64).reshape(3, 4)
    R = tf[:, :3]
    scale = np.asarray(grid.scale, np.float64)
    d_cam = _cam_corners(width, height, fx, fy)
    d_world = d_cam @ R.T
    fwd_w = R @ np.array([0.0, 0.0, -1.0])
    c4 = np.array([[0.0, 0.0], [width, 0.0], [0.0, height],
                   [width, height]])
    d4_world = np.stack([(c4[:, 0] - 0.5 * width) / fx,
                         -(c4[:, 1] - 0.5 * height) / fy,
                         -np.ones(4)], -1) @ R.T
    if grid.ndc is not None:
        o = tf[:, 3]
        # degenerate for the projective warp: camera on the z=0 plane
        # (pi(o) at infinity) or any boundary ray not looking forward
        if abs(o[2]) < 1e-6 or np.any(d_world[:, 2] >= -1e-12):
            return (2, 0, 1), False, float("inf")
        # warped pinhole center inside the volume's z' range would put the
        # ray caustic inside the grid (per-voxel slopes are ill-defined on
        # the slab through the center) — scene-interior cameras fall back
        c_ndc = _ndc_center_np(grid.ndc, o)
        if -1.05 < c_ndc[2] < 1.05:
            return (2, 0, 1), False, float("inf")
        d_tree = _ndc_warp_dirs_np(grid.ndc, d_world, o) * scale
        fwd = _ndc_warp_dirs_np(grid.ndc, fwd_w[None], o)[0] * scale
        d4 = _ndc_warp_dirs_np(grid.ndc, d4_world, o) * scale
        m = int(np.argmax(np.abs(fwd)))
        if m != 2:
            # shading dirs are affine in the slope grid only when the slab
            # axis is the NDC z axis (see FrameGeom); else exact path
            return (m, (m + 1) % 3, (m + 2) % 3), bool(fwd[m] < 0), \
                float("inf")
    else:
        d_tree = d_world * scale
        d4 = d4_world * scale
        fwd = scale * fwd_w
        m = int(np.argmax(np.abs(fwd)))
    a, b = (m + 1) % 3, (m + 2) % 3

    # orient the cross axes to the screen: the intermediate image's row
    # coordinate (slope u along perm[1]) should track screen rows, so the
    # final warp's row-banded gather sees narrow bands. Compare how u
    # changes across the 4 image corners along screen x vs screen y.
    dm = d4[:, m]
    if not np.any(dm == 0):
        ua = d4[:, a] / dm
        dx = abs(ua[1] - ua[0]) + abs(ua[3] - ua[2])
        dy = abs(ua[2] - ua[0]) + abs(ua[3] - ua[1])
        if dy < dx:
            a, b = b, a
    perm = (m, a, b)

    dz = d_tree[:, m]
    flip = fwd[m] < 0
    if np.any(dz == 0) or (np.min(dz) < 0) != (np.max(dz) < 0):
        return perm, bool(flip), float("inf")
    u = d_tree[:, perm[1]] / dz
    v = d_tree[:, perm[2]] / dz
    return perm, bool(flip), float(max(np.abs(u).max(), np.abs(v).max()))


#: box-tap warp accuracy limit: per-slab spans stay near one voxel only
#: while boundary-ray slopes are below this (see _boxtap)
MAX_SLAB_SLOPE = 4.0


def compatible(grid: DenseGrid, transform, fx, fy, width, height,
               max_slope: float = MAX_SLAB_SLOPE) -> bool:
    _, _, s = choose_axis(grid, np.asarray(transform), fx, fy, width, height)
    return s < max_slope


def _boxtap(p0, p1, G: int):
    """Two-tap weights for box-integrating a piecewise-constant field over
    the span [p0, p1] (continuous cell coordinates).

    Returns (c0, c1, f): value = f * field[c0] + (1 - f) * field[c1].
    Exact when the span crosses at most one cell boundary (|p1 - p0| <= 1);
    the slab axis is chosen so per-slab spans stay near/below one voxel.
    Out-of-grid span mass clamps to the edge cells — the octree query
    clamps positions into [0, 1)^3 (n3tree_query.hpp:17-19), so the exact
    renderer reads edge voxels there too.
    """
    pmin = jnp.minimum(p0, p1)
    pmax = jnp.maximum(p0, p1)
    c0 = jnp.clip(jnp.floor(pmin).astype(jnp.int32), 0, G - 1)
    c1 = jnp.clip(c0 + 1, 0, G - 1)
    span = jnp.maximum(pmax - pmin, 1e-9)
    f = jnp.clip((c0.astype(pmin.dtype) + 1.0 - pmin) / span, 0.0, 1.0)
    return c0, c1, f


def _slopes_from_dirs(d_tree, perm):
    dz = d_tree[..., perm[0]]
    safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    return d_tree[..., perm[1]] / safe, d_tree[..., perm[2]] / safe


@partial(jax.jit, static_argnames=("perm", "flip", "width", "height",
                                   "gi", "opt", "out_dtype"))
def render_frame(grid: DenseGrid, transform, fx, fy,
                 perm: Tuple[int, int, int], flip: bool,
                 width: int, height: int, opt: RenderOptions,
                 gi: int = 512, payload=None,
                 mesh_dist=None, mesh_rgb=None, out_dtype=None):
    """Render one pinhole frame; returns (H, W, 4) RGBA (float32 by
    default; out_dtype=jnp.uint8 emits the reference's RGBA8 display
    write-out — volrend.cu:166-172 — straight from the combine kernel,
    quartering the emitted frame bytes).

    transform: (3,4) C2W [right|up|back|center]; fx/fy scalars (traced ok).
    perm/flip: from choose_axis (static -> 6 cached compilations max).
    payload: optional pre-permuted slab-major payload (prepare_payload
    called with the SAME perm) — skips the in-call permute for repeated
    renders (viewer frames).
    mesh_dist/mesh_rgb: optional (H, W) euclidean mesh distance + (H, W, 3)
    mesh color (ops/rasterize.py buffers) — mesh/volume compositing on the
    fast path (march clipped at the mesh surface, remaining transmittance
    composited over the mesh color; volrend.cu:143-163 contract). World
    trees only.
    """
    use_pallas = _pallas_ok(grid, opt)
    crop = (inplane_crop(grid, perm, float(opt.sigma_thresh))
            if use_pallas else None)
    gdata = ((payload, None) if payload is not None and use_pallas
             else _permuted_grid(grid, perm, use_pallas, crop=crop))
    mesh = (None if mesh_dist is None
            else (jnp.asarray(mesh_dist, _F32), jnp.asarray(mesh_rgb, _F32)))
    return _render_frame_impl(grid, gdata, transform, fx, fy, perm, flip,
                              width, height, opt, gi, use_pallas,
                              mesh=mesh, out_dtype=out_dtype, crop=crop)


def prepare_payload(grid: DenseGrid, perm: Tuple[int, int, int],
                    opt: RenderOptions):
    """Materialize the slab-major payload for one slab axis ONCE (scene
    prep, like the reference's one-time load_cuda upload) so repeated
    ``render_frames`` calls skip the per-call permute (~0.3 ms/frame
    amortized at bench scale). Only the Pallas fast path consumes it; pass
    the result as ``payload=``. Cache by the FULL ``perm`` (the in-plane
    axis order matters to the layout; only flip is free, handled by the
    march order), so at most 6 cached copies cover every pose."""
    if not _pallas_ok(grid, opt):
        return None
    crop = inplane_crop(grid, perm, float(opt.sigma_thresh))
    return _permuted_grid(grid, perm, True, crop=crop)[0]


@partial(jax.jit, static_argnames=("perm", "flip", "width", "height",
                                   "gi", "opt", "out_dtype"))
def render_frames(grid: DenseGrid, transforms, fx, fy,
                  perm: Tuple[int, int, int], flip: bool,
                  width: int, height: int, opt: RenderOptions,
                  gi: int = 512, payload=None, out_dtype=None):
    """Render a batch of poses sharing one (perm, flip) group; the permuted
    grid copy is materialized once for the whole batch (or passed in
    pre-permuted via ``payload`` — see prepare_payload). Returns
    (N, H, W, 4)."""
    use_pallas = _pallas_ok(grid, opt)
    crop = (inplane_crop(grid, perm, float(opt.sigma_thresh))
            if use_pallas else None)
    gdata = ((payload, None) if payload is not None and use_pallas
             else _permuted_grid(grid, perm, use_pallas, crop=crop))
    transforms = jnp.asarray(transforms, _F32)

    if not use_pallas:
        def one(tr):
            return _render_frame_impl(grid, gdata, tr, fx, fy, perm, flip,
                                      width, height, opt, gi, use_pallas,
                                      out_dtype=out_dtype)

        return lax.map(one, transforms)

    # Pallas path: vmap the per-pose geometry (FrameGeom is a few hundred
    # scalar-size ops; serialized inside lax.map they cost ~0.2 ms/frame of
    # op dispatch), then map the march+warp over the stacked fields.
    payload, _ = gdata

    def fields(tr):
        g = FrameGeom(grid, tr, fx, fy, perm, flip, width, height, opt, gi)
        params, zb = _pallas_frame_fields(grid, g, perm, flip, opt)
        return params, zb, g.R, g.u0, g.du, g.v0, g.dv, g.origin_w

    stacked = jax.vmap(fields)(transforms)

    def one(args):
        params, zb, R, u0, du, v0, dv, origin = args
        return _pallas_march_finalize(
            grid, payload, params, zb, R, u0, du, v0, dv, fx, fy, perm,
            flip, width, height, opt, gi, origin=origin,
            out_dtype=out_dtype, crop=crop)

    if _MAP_UNROLL > 1 and stacked[0].shape[0] % _MAP_UNROLL == 0:
        # scan with unroll: fewer control-flow boundaries per pose batch
        # (probe knob; lax.map has no unroll)
        def body(carry, args):
            return carry, one(args)

        _, frames = lax.scan(body, 0, stacked, unroll=_MAP_UNROLL)
        return frames
    return lax.map(one, stacked)


def _pallas_frame_fields(grid: DenseGrid, g: "FrameGeom", perm, flip: bool,
                         opt: RenderOptions):
    """Pack the march kernel's scalar params + per-pixel z interval from
    one frame's geometry (shared by the single-pose and batched paths)."""
    from volrend_tpu.ops import pallas_slab
    inv_scale_t = 1.0 / g.scale
    params = pallas_slab._pack_params(
        g.cz, g.cy, g.cx, g.u0, g.du, g.v0, g.dv,
        jnp.asarray(-1.0 if flip else 1.0),
        (inv_scale_t[perm[0]], inv_scale_t[perm[1]], inv_scale_t[perm[2]]),
        (inv_scale_t[0], inv_scale_t[1], inv_scale_t[2]),
        jnp.asarray(opt.sigma_thresh), jnp.asarray(opt.stop_thresh),
        g.lo[1], g.hi[1], g.lo[2], g.hi[2], g.dirM, g.z0_depth)
    zb = jnp.stack([g.z_lo_pix, g.z_hi_pix])
    return params, zb


def _pallas_march_finalize(grid: DenseGrid, payload, params, zb, R,
                           u0, du, v0, dv, fx, fy,
                           perm: Tuple[int, int, int], flip: bool,
                           width: int, height: int, opt: RenderOptions,
                           gi: int, origin=None, mesh=None, out_dtype=None,
                           crop=None):
    """March one pose through the fused kernel, then finalize + warp
    (shared by the single-pose and batched paths)."""
    from volrend_tpu.ops import pallas_slab
    slab_ids = grid.slab_ids(perm[0], flip, opt.sigma_thresh)
    blo, bhi = opt.basis_minmax
    rotm = _rodrigues(opt.rot_dirs)
    acc4 = pallas_slab.march_slabs(
        payload, params, grid.qscale, zb, grid.G, gi, grid.data_dim,
        grid.basis_dim, perm, slab_ids=slab_ids,
        basis_lo=int(blo), basis_hi=int(bhi), sig2=grid.quantized,
        extra=grid.extra, fmt=int(grid.fmt),
        depth=bool(opt.render_depth),
        rot=(None if rotm is None
             else tuple(float(v) for v in rotm.reshape(-1))),
        flip=flip,
        bbox_full=_bbox_full(opt),
        shade_bf16=pallas_slab._BF16_SHADE,
        dir_win=pallas_slab._DIR_WIN,
        k_per_step=pallas_slab._K_STEP,
        crop=crop)
    # finalize PLANAR (rt_core.cuh:176-194 semantics in the march's
    # native (4, gi, gi) emit layout): the superquad warp's table build
    # consumes planar directly, so the (gi, gi, 4) relayout the old path
    # paid (moveaxis here + transpose back in _build_table, ~0.1 ms/frame
    # of copies at 800^2) only happens on the per-pose reference-warp
    # fallback branch
    T = acc4[3]
    stopped = T < _F32(opt.stop_thresh)
    renorm = stopped & opt.renormalize
    if opt.render_depth:
        dep = jnp.minimum(acc4[0] * 0.3, 1.0)
        dep = jnp.where(renorm, dep / (1.0 - T), dep)
        inter_p = jnp.stack([dep, dep, dep, jnp.ones((gi, gi), _F32)])
    else:
        rgb = jnp.where(renorm[None], acc4[:3] / (1.0 - T)[None], acc4[:3])
        alpha = jnp.where(stopped, 1.0, 1.0 - T)
        inter_p = jnp.concatenate([rgb, alpha[None]], 0)
    bg_pix = None
    if mesh is not None:
        mesh_dist, mesh_rgb = mesh
        bg_pix = (mesh_rgb, jnp.isfinite(mesh_dist))
    return _warp_to_screen(inter_p, opt, R, fx, fy, width, height, gi,
                           perm, u0, du, v0, dv, grid.scale, ndc=grid.ndc,
                           origin=origin, bg_pix=bg_pix,
                           out_dtype=out_dtype, planar=True)


def _bbox_full(opt: RenderOptions) -> bool:
    """Static: is render_bbox the default full cube? When True the kernels
    drop the per-voxel in-plane bbox compares entirely (always-true)."""
    return tuple(float(v) for v in opt.render_bbox) == (
        0.0, 0.0, 0.0, 1.0, 1.0, 1.0)


def _pallas_ok(grid: DenseGrid, opt: RenderOptions) -> bool:
    """Static check: can the fused Pallas march replace the XLA loop?

    Covers SH (all degrees), SG, ASG, RGBA, depth mode, and rot_dirs —
    the full reference feature surface (rt_core.cuh:122-124 depth,
    volrend.cu:57-71 rodrigues, lumisphere.hpp SG/ASG)."""
    from volrend_tpu.ops import pallas_slab
    if not pallas_slab.available():
        return False
    bt = BasisType(grid.fmt)
    if bt == BasisType.SH:
        return (grid.basis_dim in (1, 4, 9, 16, 25)
                and grid.data_dim == 3 * grid.basis_dim + 1)
    if bt in (BasisType.SG, BasisType.ASG):
        return (grid.basis_dim > 0
                and grid.data_dim == 3 * grid.basis_dim + 1
                and grid.extra is not None
                and grid.extra.size
                == grid.basis_dim * (4 if bt == BasisType.SG else 11))
    if bt == BasisType.RGBA:
        return grid.basis_dim < 0 and grid.data_dim == 4
    return False


def _permuted_grid(grid: DenseGrid, perm, use_pallas: bool, crop=None):
    """Slab-major views: (payload, sigma_plane).

    XLA march: payload (z,y,x,D); sigma_plane (z,y,x) only when quantized.
    Pallas march: payload channel-planar (z,D,y,x) (bf16, or int8 codes
    dequantized in-kernel), in-plane-sliced to ``crop`` when given; sigma
    always a dedicated full-precision bf16 plane (transmittance is
    precision-critical)."""
    if use_pallas:
        planar = jnp.transpose(grid.data, (perm[0], 3, perm[1], perm[2]))
        if crop is not None:
            y0, Gy, x0, Gx = crop
            planar = planar[:, :, y0:y0 + Gy, x0:x0 + Gx]
        if not grid.quantized:
            # Mosaic has no f16; bf16 costs ~0.4% relative on SH coeffs
            planar = planar.astype(jnp.bfloat16)
        return planar, None
    gdata = jnp.transpose(grid.data, perm + (3,))
    sig = (jnp.transpose(grid.sigma_grid, perm) if grid.quantized else None)
    return gdata, sig


class FrameGeom:
    """Per-frame slab geometry (slope grid, z intervals, camera in tree
    coords). Shared by the XLA march, the Pallas march, and the
    differentiable training march (ops/slab_grad.py).

    mesh_dist: optional (H, W) f32 euclidean camera distance of the
    nearest rasterized mesh fragment (inf where none — ops/rasterize.py
    MeshBuffers.dist). When given (world trees only), each intermediate
    pixel's live z interval is clipped at the mesh surface, implementing
    the reference's mesh/volume compositing contract on the FAST path:
    the march stops at the mesh distance (volrend.cu:143-146) with
    sub-slab precision (the kernels' fractional boundary-slab overlap
    uses zbounds directly)."""

    def __init__(self, grid: DenseGrid, transform, fx, fy,
                 perm: Tuple[int, int, int], flip: bool,
                 width: int, height: int, opt: RenderOptions, gi: int,
                 mesh_dist=None, unit_slope_box: bool = False):
        G = grid.G
        transform = jnp.asarray(transform, _F32).reshape(3, 4)
        self.R = transform[:, :3]
        self.fx = fx = jnp.asarray(fx, _F32)
        self.fy = fy = jnp.asarray(fy, _F32)

        self.scale = scale = grid.scale
        self.origin_w = o_w = transform[:, 3]
        self.ndc = ndc = grid.ndc
        if ndc is not None:
            # tree coords ARE NDC coords; the pinhole center of the warped
            # ray family is pi(origin) (see _ndc_center_np)
            W_n, H_n, focal_n = (_F32(v) for v in ndc)
            n_sx = -(2.0 * focal_n) / W_n
            n_sy = -(2.0 * focal_n) / H_n
            c_ndc = jnp.stack([n_sx * o_w[0] / o_w[2],
                               n_sy * o_w[1] / o_w[2],
                               1.0 + 2.0 / o_w[2]])
            c_t = grid.offset + scale * c_ndc
        else:
            c_t = grid.offset + scale * o_w
        self.cz, self.cy, self.cx = (c_t[perm[0]], c_t[perm[1]],
                                     c_t[perm[2]])
        cz, cy, cx = self.cz, self.cy, self.cx

        # ---- intermediate slope grid (values dynamic, shapes static) ------
        corners_cam = jnp.asarray(
            _cam_corners(width, height, 1.0, 1.0), _F32)
        # rescale the unit-focal boundary by actual fx/fy
        corners_cam = corners_cam.at[:, 0].mul(1.0 / fx).at[:, 1].mul(
            1.0 / fy)
        d_world_c = corners_cam @ self.R.T
        if ndc is not None:
            from volrend_tpu.ops.render_jax import world2ndc
            ndir_c, _ = world2ndc(
                ndc, d_world_c, jnp.broadcast_to(o_w, d_world_c.shape))
            d_tree_c = ndir_c * scale
        else:
            d_tree_c = d_world_c * scale
        uc, vc = _slopes_from_dirs(d_tree_c, perm)
        if unit_slope_box:
            # split-frame pass (render_frame_split): this pass owns the
            # rays whose DOMINANT axis is the slab axis, so every slope
            # magnitude is <= 1 by construction — the box is fixed,
            # independent of the (possibly slab-incompatible) full-frame
            # slope range
            box = _F32(1.0 + 2.0 / gi)
            self.u0 = u0 = -box
            u1 = box
            self.v0 = v0 = -box
            v1 = box
        else:
            # half-texel guard band, PROPORTIONAL to each axis's slope
            # range: an absolute pad would swamp the tiny slope ranges of
            # near-parallel ray families (NDC cameras near the z=0 plane
            # warp to slopes ~2|oz|, and an absolute 0.5/gi pad left ~20%
            # of the intermediate grid covering the image)
            ur = jnp.maximum(jnp.max(uc) - jnp.min(uc), 1e-6)
            vr = jnp.maximum(jnp.max(vc) - jnp.min(vc), 1e-6)
            upad = 0.5 * ur / gi
            vpad = 0.5 * vr / gi
            self.u0 = u0 = jnp.min(uc) - upad
            u1 = jnp.max(uc) + upad
            self.v0 = v0 = jnp.min(vc) - vpad
            v1 = jnp.max(vc) + vpad
        self.du = du = (u1 - u0) / (gi - 1)
        self.dv = dv = (v1 - v0) / (gi - 1)
        # rows (axis perm[1]) / columns (axis perm[2])
        self.uy = uy = u0 + du * jnp.arange(gi, dtype=_F32)
        self.ux = ux = v0 + dv * jnp.arange(gi, dtype=_F32)

        self.sgn = _F32(-1.0 if flip else 1.0)

        # ---- shading-direction affine map ---------------------------------
        # the world view direction at a voxel is an affine function of the
        # voxel's slope-grid coordinates (u, v), normalized per voxel:
        #   dir_world[a] = dirM[a, 0] + dirM[a, 1]*u + dirM[a, 2]*v
        # world trees: dir ~ sgn * permuted(1, u, v) / scale (the ray
        # through the pinhole center). NDC trees: the world dir of the ray
        # whose NDC line has slopes (s_x', s_y') is
        #   dir ~ -(q_x/sx, q_y/sy, 1),  q_j = c'_j + (1 - c'_z) * s_j
        # (evaluate the NDC line at z'=1, where pi maps the world point at
        # infinity: x'(1) = sx * Dx / Dz) — still affine in (u, v).
        zero = _F32(0.0)
        slot = {perm[0]: 0, perm[1]: 1, perm[2]: 2}
        if ndc is not None:
            one_m_cz = 1.0 - c_ndc[2]
            rows = {2: jnp.stack([_F32(-1.0), zero, zero])}
            for axis, sdiv in ((0, n_sx), (1, n_sy)):
                c = [-c_ndc[axis] / sdiv, zero, zero]
                # NDC slope of axis j per slope-grid unit: scale[2]/scale[j]
                c[slot[axis]] = -one_m_cz * (scale[2] / scale[axis]) / sdiv
                rows[axis] = jnp.stack(c)
            self.dirM = jnp.stack([rows[0], rows[1], rows[2]])
            # depth-mode t origin: rays start on the near plane z' = -1
            # (world2ndc parameterizes from the near-plane point)
            self.z0_depth = grid.offset[2] - scale[2]
        else:
            inv_scale = 1.0 / scale
            rows = []
            for a in range(3):
                c = [zero, zero, zero]
                c[slot[a]] = self.sgn * inv_scale[a]
                rows.append(jnp.stack(c))
            self.dirM = jnp.stack(rows)
            self.z0_depth = cz

        bb = np.asarray(opt.render_bbox, np.float32)
        self.lo = lo = jnp.asarray(bb[:3])[jnp.asarray(perm)]
        self.hi = hi = jnp.asarray(bb[3:])[jnp.asarray(perm)]

        # ---- per-pixel live z-interval (volume entry/exit + t>0) ----------
        # y(z) = cy + (z-cz)*u in [lo1,hi1) inverts to a z-interval per
        # pixel; likewise x; intersect with the z bbox slab range and the
        # t>0 half-line.
        big = _F32(1e9)

        def _axis_interval(cc, slope, a, b):
            sl = jnp.where(jnp.abs(slope) < 1e-12,
                           jnp.where(slope < 0, -1e-12, 1e-12), slope)
            za = cz + (a - cc) / sl
            zb = cz + (b - cc) / sl
            zmin = jnp.minimum(za, zb)
            zmax = jnp.maximum(za, zb)
            degen = jnp.abs(slope) < 1e-12
            inside = (cc >= a) & (cc < b)
            zmin = jnp.where(degen, jnp.where(inside, -big, big), zmin)
            zmax = jnp.where(degen, jnp.where(inside, big, -big), zmax)
            return zmin, zmax

        ymin, ymax = _axis_interval(cy, uy, lo[1], hi[1])   # (gi,)
        xmin, xmax = _axis_interval(cx, ux, lo[2], hi[2])   # (gi,)
        z_lo_pix = jnp.maximum(ymin[:, None], xmin[None, :])
        z_hi_pix = jnp.minimum(ymax[:, None], xmax[None, :])
        z_lo_pix = jnp.maximum(z_lo_pix, lo[0])
        z_hi_pix = jnp.minimum(z_hi_pix, hi[0])
        if ndc is None:
            # t > 0: nothing behind the camera center. NDC rays start on
            # the near plane z' = -1 (the volume's z boundary), which the
            # bbox clamp above already enforces — and the warped center can
            # legitimately sit beyond the far plane (cameras at z > 0).
            if flip:
                z_hi_pix = jnp.minimum(z_hi_pix, cz)
            else:
                z_lo_pix = jnp.maximum(z_lo_pix, cz)

        if mesh_dist is not None:
            if ndc is not None:
                raise ValueError("mesh compositing on the slab path "
                                 "supports world trees only (NDC poses "
                                 "fall back to the exact renderer)")
            z_mesh = self._mesh_zgrid(mesh_dist, width, height, gi, perm)
            if flip:
                z_lo_pix = jnp.maximum(z_lo_pix, z_mesh)
            else:
                z_hi_pix = jnp.minimum(z_hi_pix, z_mesh)
        self.z_lo_pix, self.z_hi_pix = z_lo_pix, z_hi_pix

        self.mesh_clipped = mesh_dist is not None

        # static march-ordered slab list with empty slabs culled (occupancy
        # is bake-time metadata), then skip leading slabs with no pixel live
        ids_np = np.asarray(
            grid.slab_ids(perm[0], flip, float(opt.sigma_thresh)), np.int32)
        self.n_ids = int(ids_np.shape[0])
        self.ids_arr = ids_arr = jnp.asarray(ids_np)
        zs_arr = (ids_arr.astype(_F32) + 0.5) / G
        h = _F32(0.5 / G)       # slabs overlapping the interval fractionally
        if flip:
            z_start = jnp.max(
                jnp.where(z_lo_pix <= z_hi_pix, z_hi_pix, -big))
            self.k0 = jnp.sum((zs_arr > z_start + h).astype(jnp.int32))
        else:
            z_start = jnp.min(
                jnp.where(z_lo_pix <= z_hi_pix, z_lo_pix, big))
            self.k0 = jnp.sum((zs_arr < z_start - h).astype(jnp.int32))

    def _mesh_zgrid(self, mesh_dist, width: int, height: int, gi: int,
                    perm: Tuple[int, int, int]):
        """Inverse-warp the screen mesh-distance buffer into the slope
        grid and convert euclidean camera distance to slab-axis z
        (z = cz + sgn * d / |w(u,v)|, w = world dir per unit slab z).

        The mesh distance is nearest-sampled at each intermediate pixel's
        screen position (<= 1-screen-pixel silhouette quantization — the
        same order as the warp's own resampling). The (gi^2)-point lookup
        packs 8 distances per 32-byte row + a one-hot select: XLA gathers
        of 4-byte rows run ~5x slower than 32-byte rows (CLAUDE.md)."""
        uy, ux, sgn = self.uy, self.ux, self.sgn
        inv_scale = 1.0 / self.scale
        d_perm = [jnp.broadcast_to(sgn, (gi, gi)),
                  jnp.broadcast_to(sgn * uy[:, None], (gi, gi)),
                  jnp.broadcast_to(sgn * ux[None, :], (gi, gi))]
        d_tree = [None] * 3
        for i in range(3):
            d_tree[perm[i]] = d_perm[i]
        d_world = jnp.stack(
            [d_tree[a] * inv_scale[a] for a in range(3)], -1)
        d_cam = jnp.einsum("yxk,kc->yxc", d_world, self.R)  # R^T d
        front = d_cam[..., 2] < -1e-9
        dz = jnp.where(front, d_cam[..., 2], -1e-9)
        sx = (d_cam[..., 0] / -dz) * self.fx + 0.5 * width
        sy = -(d_cam[..., 1] / -dz) * self.fy + 0.5 * height
        jx = jnp.round(sx).astype(jnp.int32)
        jy = jnp.round(sy).astype(jnp.int32)
        valid = (front & (jx >= 0) & (jx < width)
                 & (jy >= 0) & (jy < height))
        flat = (jnp.clip(jy, 0, height - 1) * width
                + jnp.clip(jx, 0, width - 1))
        npx = height * width
        pad = (-npx) % 8
        table = jnp.concatenate(
            [jnp.asarray(mesh_dist, _F32).reshape(-1),
             jnp.full((pad,), jnp.inf, _F32)]).reshape(-1, 8)
        rows = table[flat // 8]                       # (gi, gi, 8)
        sel = jax.nn.one_hot(flat % 8, 8, dtype=_F32)
        dist = jnp.sum(rows * sel, -1)
        dist = jnp.where(valid, dist, jnp.inf)
        L = jnp.sqrt(inv_scale[perm[0]] ** 2
                     + (uy[:, None] * inv_scale[perm[1]]) ** 2
                     + (ux[None, :] * inv_scale[perm[2]]) ** 2)
        return self.cz + sgn * dist / L


def _render_frame_impl(grid: DenseGrid, gdata, transform, fx, fy,
                       perm: Tuple[int, int, int], flip: bool,
                       width: int, height: int, opt: RenderOptions,
                       gi: int, use_pallas: bool = False, mesh=None,
                       unit_slope_box: bool = False, out_dtype=None,
                       crop=None):
    G = grid.G
    D = grid.data_dim
    bd = grid.basis_dim

    g = FrameGeom(grid, transform, fx, fy, perm, flip, width, height, opt,
                  gi, mesh_dist=None if mesh is None else mesh[0],
                  unit_slope_box=unit_slope_box)
    R, fx, fy = g.R, g.fx, g.fy
    scale = g.scale
    cz, cy, cx = g.cz, g.cy, g.cx
    u0, du, v0, dv = g.u0, g.du, g.v0, g.dv
    uy, ux = g.uy, g.ux
    lo, hi = g.lo, g.hi
    dirM, z0_depth = g.dirM, g.z0_depth
    z_lo_pix, z_hi_pix = g.z_lo_pix, g.z_hi_pix
    n_ids, ids_arr, k0 = g.n_ids, g.ids_arr, g.k0

    # ---- march over slabs -------------------------------------------------
    if use_pallas:
        payload, _ = gdata
        params, zb = _pallas_frame_fields(grid, g, perm, flip, opt)
        return _pallas_march_finalize(
            grid, payload, params, zb, R, u0, du, v0, dv, fx, fy, perm,
            flip, width, height, opt, gi, origin=g.origin_w, mesh=mesh,
            out_dtype=out_dtype, crop=crop)

    # Key restructuring for TPU dataflow: shade (SH -> rgb) *per voxel in
    # slab layout* first, then resample only 4 channels [sigma, sigma*rgb]
    # to the intermediate grid. The resample is a **box-integration two-tap
    # warp**: each intermediate pixel's ray sweeps a span of voxels while
    # crossing the slab; integrating the piecewise-constant field over that
    # span (instead of point-sampling the slab-center voxel) reproduces the
    # reference's exact per-voxel DDA chords to second order — the
    # nearest-warp's O(1-voxel) aliasing at column crossings is what capped
    # slab-vs-exact PSNR at ~26 dB at bench scale. Emission is
    # sigma-weighted (warp sigma*rgb, divide by warped sigma) so color
    # blends match the attenuation-weighted chord average.
    sigma_thresh = _F32(opt.sigma_thresh)
    stop_thresh = _F32(opt.stop_thresh)
    vox = (jnp.arange(G, dtype=_F32) + 0.5) / G         # voxel centers
    # in-plane bbox mask: keep any voxel whose EXTENT intersects the bbox
    # (the reference clips the ray's t-range, never zeroing voxels —
    # rt_core.cuh:17-34; the per-pixel z-intervals below clip each ray
    # exactly, so boundary voxels must stay or half-voxel bands vanish,
    # which for near-parallel NDC rays wipes whole image rows)
    yok_vox = (vox + 0.5 / G > lo[1]) & (vox - 0.5 / G < hi[1])
    xok_vox = (vox + 0.5 / G > lo[2]) & (vox - 0.5 / G < hi[2])
    inv_scale = 1.0 / scale
    sp1, sp2, sp0 = (inv_scale[perm[1]], inv_scale[perm[2]],
                     inv_scale[perm[0]])
    # per-pixel world-space thickness of one slab along the pixel's ray
    dt_pix = (1.0 / G) * jnp.sqrt(
        (uy * sp1)[:, None] ** 2 + (ux * sp2)[None, :] ** 2 + sp0 ** 2)

    gpayload, gsigma = gdata if isinstance(gdata, tuple) else (gdata, None)

    def shade_slab(zi, s):
        """(G, G) voxel grid -> (sigma_masked (G,G), rgb (G,G,3)) for the
        rays crossing this slab."""
        slab = gpayload[zi]                             # (G, G, D or D+1)
        if grid.quantized:
            slab = slab.astype(_F32) * grid.qscale
            sigma = gsigma[zi].astype(_F32)
            slab = slab[..., :D]                        # colors only below
        else:
            sigma = slab[..., D - 1].astype(_F32)
        ok = (yok_vox[:, None] & xok_vox[None, :]
              & (sigma > sigma_thresh))
        sigma = jnp.where(ok, sigma, 0.0)
        if opt.render_depth or bd < 0:
            rgb = slab[..., :3].astype(_F32)
        else:
            uvox = (vox - cy) / s                       # (G,) slope of ray
            vvox = (vox - cx) / s                       #      through voxel
            # world view direction = per-frame affine map of the voxel's
            # slope coordinates (FrameGeom.dirM; covers world + NDC trees)
            dvox = (dirM[:, 0][None, None]
                    + uvox[:, None, None] * dirM[:, 1][None, None]
                    + vvox[None, :, None] * dirM[:, 2][None, None])
            dvox = dvox / jnp.linalg.norm(dvox, axis=-1, keepdims=True)
            rot = _rodrigues(opt.rot_dirs)
            if rot is not None:
                dvox = dvox @ jnp.asarray(rot).T
            bv = basis_mod.eval_basis(
                BasisType(grid.fmt), bd, dvox, grid.extra, xp=jnp)
            bv = basis_mod.apply_basis_window(
                bv.astype(_F32), opt.basis_minmax, xp=jnp)
            coeffs = slab[..., :3 * bd].astype(_F32).reshape(G, G, 3, bd)
            rgb = jax.nn.sigmoid(
                jnp.einsum("yxcb,yxb->yxc", coeffs, bv))
        return sigma, rgb

    K_CHUNK = 4  # slabs per while iteration: amortizes the loop-cond stall

    def substep(k, acc, T, stopped, done):
        in_range = k < n_ids
        zi = ids_arr[jnp.clip(k, 0, max(n_ids - 1, 0))]
        z = (zi.astype(_F32) + 0.5) / G
        s = z - cz
        s0 = z - 0.5 / G - cz                           # slab entry/exit
        s1 = z + 0.5 / G - cz

        sig_vox, rgb_vox = shade_slab(zi, s)
        X = jnp.concatenate(
            [sig_vox[..., None], sig_vox[..., None] * rgb_vox], -1)
        # separable box-integration warp (two taps per axis)
        c0, c1, fr = _boxtap((cy + s0 * uy) * G, (cy + s1 * uy) * G, G)
        Xr = (fr[:, None, None] * X[c0]
              + (1.0 - fr)[:, None, None] * X[c1])      # (gi, G, 4)
        d0, d1, fc = _boxtap((cx + s0 * ux) * G, (cx + s1 * ux) * G, G)
        Xw = (fc[None, :, None] * Xr[:, d0]
              + (1.0 - fc)[None, :, None] * Xr[:, d1])  # (gi, gi, 4)
        sig_w = Xw[..., 0]
        # boundary slabs contribute fractionally: scale tau by the overlap
        # of the slab's z extent with the pixel's exact [z_lo, z_hi]
        # interval (sub-slab entry/exit, matching the reference's t-range
        # clip instead of whole-slab quantization)
        hG = 0.5 / G
        frac = jnp.clip((jnp.minimum(z + hG, z_hi_pix)
                         - jnp.maximum(z - hG, z_lo_pix)) * G, 0.0, 1.0)
        tau_w = sig_w * dt_pix * frac
        att = jnp.exp(-tau_w)
        if opt.render_depth:
            tview = jnp.abs(z - z0_depth) * jnp.sqrt(
                1.0 + (uy ** 2)[:, None] + (ux ** 2)[None, :])
            rgb = jnp.stack([tview, jnp.zeros_like(sig_w),
                             jnp.zeros_like(sig_w)], -1)
        else:
            rgb = Xw[..., 1:] / jnp.maximum(sig_w, 1e-12)[..., None]

        m = (~done) & (tau_w > 0.0) & in_range
        w = jnp.where(m, T * (1.0 - att), 0.0)
        acc = acc + w[..., None] * rgb
        T = jnp.where(m, T * att, T)
        stopped = stopped | (m & (T < stop_thresh))
        # only fully-passed slabs (no fractional overlap left) finish a ray
        passed = ((z + hG < z_lo_pix) if flip
                  else (z - hG > z_hi_pix))
        done = done | stopped | (passed & in_range)
        return acc, T, stopped, done

    def body(carry):
        k, acc, T, stopped, done = carry
        for dk in range(K_CHUNK):
            acc, T, stopped, done = substep(k + dk, acc, T, stopped, done)
        return k + K_CHUNK, acc, T, stopped, done

    def cond(carry):
        k, _, T, stopped, done = carry
        return (k < n_ids) & jnp.any(~done)

    never = z_lo_pix > z_hi_pix
    init = (k0, jnp.zeros((gi, gi, 3), _F32),
            jnp.ones((gi, gi), _F32), jnp.zeros((gi, gi), bool), never)
    if n_ids:
        _, acc, T, stopped, _ = lax.while_loop(cond, body, init)
    else:
        _, acc, T, stopped, _ = init
    return _finalize_and_warp(grid, acc, T, stopped, opt, R, fx, fy,
                              width, height, gi, perm, u0, du, v0, dv, scale,
                              origin=g.origin_w, mesh=mesh,
                              out_dtype=out_dtype)


def _finalize_and_warp(grid, acc, T, stopped, opt: RenderOptions, R, fx, fy,
                       width: int, height: int, gi: int, perm,
                       u0, du, v0, dv, scale, origin=None, mesh=None,
                       out_dtype=None):
    # ---- finalize (rt_core.cuh:176-194 semantics) -------------------------
    renorm = stopped & opt.renormalize
    if opt.render_depth:
        dep = jnp.minimum(acc[..., 0] * 0.3, 1.0)
        dep = jnp.where(renorm, dep / (1.0 - T), dep)
        inter_rgb = jnp.stack([dep] * 3, -1)
        inter_alpha = jnp.ones((gi, gi), _F32)
    else:
        inter_rgb = jnp.where(renorm[..., None], acc / (1.0 - T[..., None]),
                              acc)
        inter_alpha = jnp.where(stopped, 1.0, 1.0 - T)
    inter = jnp.concatenate([inter_rgb, inter_alpha[..., None]], -1)
    bg_pix = None
    if mesh is not None:
        mesh_dist, mesh_rgb = mesh
        bg_pix = (mesh_rgb, jnp.isfinite(mesh_dist))
    return _warp_to_screen(inter, opt, R, fx, fy, width, height, gi, perm,
                           u0, du, v0, dv, scale, ndc=grid.ndc,
                           origin=origin, bg_pix=bg_pix,
                           out_dtype=out_dtype)


def _warp_to_screen(inter, opt: RenderOptions, R, fx, fy,
                    width: int, height: int, gi: int, perm,
                    u0, du, v0, dv, scale, precise: bool = False,
                    ndc=None, origin=None, bg_pix=None, out_dtype=None,
                    planar: bool = False):
    """Projective bilinear warp of the (gi, gi, 4) intermediate image to the
    (height, width, 4) screen, plus background compositing. Linear in
    ``inter`` (autodiff-friendly: gathers transpose to scatters).

    precise: keep the quad table in f32 (training path — the f16 display
    shortcut quantizes outputs below typical gradient-step sizes).
    bg_pix: optional (mesh_rgb (H, W, 3), hit (H, W) bool) per-pixel
    background — mesh compositing (remaining transmittance over the mesh
    color; alpha forced 1 on mesh pixels, volrend.cu:152-163).
    planar: ``inter`` is channel-planar (4, gi, gi) — the march kernel's
    native emit layout; relayout only happens on non-superquad paths."""
    from volrend_tpu.ops import display_warp
    if not precise:
        # display path on TPU: 2x2-screen-pixel superquad gather (4x fewer
        # gather rows) + Pallas tent-combine (ops/display_warp.py; parity
        # gated vs this reference path). Falls back to this reference
        # warp per-pose (lax.cond) when a wide-FOV/grazing pose stretches
        # a quad past the 4x4 cell window. A 4x4-block variant exists
        # (block=4: 16x fewer rows, fits near-axis poses only) but
        # measured a wash in situ — see the ledger in docs/ARCHITECTURE.md.
        if display_warp.usable(width, height, gi):
            return display_warp.warp_to_screen_sq(
                inter, opt, R, fx, fy, width, height, gi, perm,
                u0, du, v0, dv, scale, ndc=ndc, origin=origin,
                bg_pix=bg_pix, out_dtype=out_dtype, planar=planar)
    elif (bg_pix is None and display_warp._PRECISE_SQ
          and display_warp.usable_precise(width, height, gi)):
        # training path OPTION (default OFF — _PRECISE_SQ): the superquad
        # PRECISE warp (hand-written VJP, gradient-parity gated). Measured
        # a +24 ms/step device regression vs autodiff of the reference
        # warp at BOTH gi=512 (r3) and the production gi=256 (r4,
        # tools/perf_train4.py) — see the _PRECISE_SQ note. The routing is
        # kept (tested in the interpret suite) for future adjoint
        # redesigns. Per-pose lax.cond falls back to the reference warp
        # when a wide-FOV/grazing pose misfits the 4x4 window (same gate
        # as the display path).
        from volrend_tpu.ops.display_warp import to_display_dtype as to_dd
        itc = jnp.moveaxis(inter, 0, -1) if planar else inter
        _, _, _, _, _, fits = display_warp._sub_geometry(
            R, fx, fy, width, height, gi, perm, u0, du, v0, dv, scale,
            ndc=ndc, origin=origin)
        wsq = display_warp.make_warp_precise(
            float(opt.background_brightness), width, height, gi, perm, ndc)
        geomt = (R, fx, fy, u0, du, v0, dv, scale,
                 (jnp.zeros((3,), _F32) if origin is None else origin))
        return to_dd(lax.cond(
            fits,
            lambda it: wsq(it, geomt),
            lambda it: _warp_to_screen_ref(
                it, opt, R, fx, fy, width, height, gi, perm,
                u0, du, v0, dv, scale, precise=True, ndc=ndc,
                origin=origin),
            itc), out_dtype)
    from volrend_tpu.ops.display_warp import to_display_dtype
    if planar:
        inter = jnp.moveaxis(inter, 0, -1)
    return to_display_dtype(
        _warp_to_screen_ref(inter, opt, R, fx, fy, width, height, gi,
                            perm, u0, du, v0, dv, scale,
                            precise=precise, ndc=ndc, origin=origin,
                            bg_pix=bg_pix), out_dtype)


def _warp_to_screen_ref(inter, opt: RenderOptions, R, fx, fy,
                        width: int, height: int, gi: int, perm,
                        u0, du, v0, dv, scale, precise: bool = False,
                        ndc=None, origin=None, bg_pix=None):
    """Reference implementation: per-pixel quad-row gather (the exact
    display semantics; the superquad fast path is parity-gated vs this)."""
    # ---- projective warp to screen (bilinear) -----------------------------
    px = (jnp.arange(width, dtype=_F32) - 0.5 * width) / fx
    py = -(jnp.arange(height, dtype=_F32) - 0.5 * height) / fy
    d_cam = jnp.stack([
        jnp.broadcast_to(px[None, :], (height, width)),
        jnp.broadcast_to(py[:, None], (height, width)),
        -jnp.ones((height, width), _F32)], -1)
    d_world_s = jnp.einsum("hwc,kc->hwk", d_cam, R)
    if ndc is not None:
        # each screen pixel's ray maps into NDC slope space through the
        # projective warp (the screen->slope map is a homography; this
        # per-pixel resample absorbs it, same as the world-tree case)
        from volrend_tpu.ops.render_jax import world2ndc
        ndir_s, _ = world2ndc(
            ndc, d_world_s, jnp.broadcast_to(origin, d_world_s.shape))
        d_tree_s = ndir_s * scale
    else:
        d_tree_s = d_world_s * scale
    us, vs = _slopes_from_dirs(d_tree_s, perm)
    gy = (us - u0) / du
    gx = (vs - v0) / dv
    ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
    gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
    gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    fy_ = (gy - y0)[..., None]
    fx_ = (gx - x0)[..., None]
    # single-gather bilinear: TPU gathers are row-count-bound, so fetch all
    # four corners as one quad row [v00|v01|v10|v11] from a pre-packed table
    # (f16 halves table traffic; values are display-range rgba)
    inter16 = inter if precise else inter.astype(jnp.float16)
    quad = jnp.concatenate([
        inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
        inter16[1:, 1:],
    ], -1)                                              # (gi-1, gi-1, 16)
    y0c = jnp.minimum(y0, gi - 2)
    x0c = jnp.minimum(x0, gi - 2)

    SB, BAND = 50, 160  # screen rows per block / intermediate band rows
    # the whole quad table gathers at ~1 Grow/s when it fits the fast size
    # class (measured: full 0.62 ms vs banded 3.5 ms at gi=448/f16); only
    # fall back to the banded row-block gather for big/precise tables
    table_bytes = (gi - 1) * (gi - 1) * 16 * (4 if precise else 2)
    if table_bytes <= _FULL_TABLE_MAX_BYTES:
        use_banded = False
    elif height % SB == 0 and gi - 1 >= BAND:
        use_banded = True
    else:
        use_banded = False
    if use_banded:
        # banded gather: a screen row-block reads only a thin band of the
        # intermediate image; slicing that band keeps the gather table in
        # the fast (VMEM-resident) size class (~5x faster than whole-table).
        # Valid only when every block's row span fits the band — guaranteed
        # for screen-aligned cross axes (choose_axis orients them), guarded
        # dynamically for rolled/diagonal cameras.
        y0b = y0c.reshape(height // SB, SB, width)
        x0b = x0c.reshape(height // SB, SB, width)
        spans = jnp.max(y0b, axis=(1, 2)) - jnp.min(y0b, axis=(1, 2))
        bands_fit = jnp.max(spans) <= BAND - 1

        def banded(_):
            def wblock(args):
                y0_b, x0_b = args
                b0 = jnp.clip(jnp.min(y0_b), 0, (gi - 1) - BAND)
                sub = lax.dynamic_slice(quad, (b0, 0, 0),
                                        (BAND, gi - 1, 16))
                li = (jnp.clip(y0_b - b0, 0, BAND - 1) * (gi - 1) + x0_b)
                return sub.reshape(BAND * (gi - 1), 16)[li]

            return lax.map(wblock, (y0b, x0b)).reshape(
                height, width, 4, 4)

        def full(_):
            return quad.reshape((gi - 1) * (gi - 1), 16)[
                y0c * (gi - 1) + x0c].reshape(height, width, 4, 4)

        q = lax.cond(bands_fit, banded, full, None)
    else:
        q = quad.reshape((gi - 1) * (gi - 1), 16)[
            y0c * (gi - 1) + x0c].reshape(height, width, 4, 4)
    if not precise:
        # display path: combine in f16 (display-range rgba; saves ~0.4 ms
        # of f32 materialization at 800^2), cast once at the end
        fy_ = fy_.astype(jnp.float16)
        fx_ = fx_.astype(jnp.float16)
    else:
        q = q.astype(_F32)
    v00, v01, v10, v11 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
           + (v10 * (1 - fx_) + v11 * fx_) * fy_)
    out = jnp.where(ok[..., None], out, 0.0).astype(_F32)

    bg = _F32(opt.background_brightness)
    if bg_pix is None:
        rgb = out[..., :3] + bg * (1.0 - out[..., 3:4])
        alpha = out[..., 3:4]
    else:
        # mesh compositing: remaining transmittance over the mesh color,
        # alpha forced 1 on mesh pixels (volrend.cu:152-163 / the
        # render_jax tmax_bg+bg_rgb contract)
        mesh_rgb, hit = bg_pix
        bgp = jnp.where(hit[..., None], mesh_rgb, bg)
        rgb = out[..., :3] + bgp * (1.0 - out[..., 3:4])
        alpha = jnp.where(hit[..., None], 1.0, out[..., 3:4])
    return jnp.concatenate([rgb, alpha], -1)


def _rodrigues(rot_dirs) -> Optional[np.ndarray]:
    from volrend_tpu.ops.render_jax import _rodrigues_matrix
    return _rodrigues_matrix(rot_dirs)


@partial(jax.jit, static_argnames=("classes", "width", "height", "gi",
                                   "opt"))
def _render_split_jit(grid: DenseGrid, transform, fx, fy,
                      classes: Tuple[Tuple[int, bool], ...],
                      width: int, height: int, opt: RenderOptions,
                      gi: int, payloads=None, mesh=None):
    """All split-frame class passes + the argmax stitch in ONE jitted
    program (one dispatch — the tunnel costs ~26 ms per round trip).
    Each pass is a full slab render over the fixed unit slope box; pass
    (axis, flip) owns exactly the rays whose dominant tree axis is
    ``axis`` with march sign ``flip``."""
    use_pallas = _pallas_ok(grid, opt)
    outs = []
    for ci, (axis, flip) in enumerate(classes):
        perm = (axis, (axis + 1) % 3, (axis + 2) % 3)
        pay = payloads[ci] if payloads is not None else None
        crop = (inplane_crop(grid, perm, float(opt.sigma_thresh))
                if use_pallas else None)
        # per-frame payload permutes cost ~5 ms each at bench scale
        # (profiled); interactive callers pass pre-permuted payloads
        gdata = ((pay, None) if pay is not None and use_pallas
                 else _permuted_grid(grid, perm, use_pallas, crop=crop))
        outs.append(_render_frame_impl(
            grid, gdata, transform, fx, fy, perm, flip, width, height,
            opt, gi, use_pallas, unit_slope_box=True, mesh=mesh,
            crop=crop))

    transform = jnp.asarray(transform, _F32).reshape(3, 4)
    R = transform[:, :3]
    px = (jnp.arange(width, dtype=_F32) - 0.5 * width) / fx
    py = -(jnp.arange(height, dtype=_F32) - 0.5 * height) / fy
    d_cam = jnp.stack([
        jnp.broadcast_to(px[None, :], (height, width)),
        jnp.broadcast_to(py[:, None], (height, width)),
        -jnp.ones((height, width), _F32)], -1)
    d_tree = jnp.einsum("hwc,kc->hwk", d_cam, R) * grid.scale
    m = jnp.argmax(jnp.abs(d_tree), -1)
    neg = jnp.take_along_axis(d_tree, m[..., None], -1)[..., 0] < 0
    out = jnp.zeros((height, width, 4), _F32)
    for (axis, flip), img in zip(classes, outs):
        sel = (m == axis) & (neg == flip)
        out = jnp.where(sel[..., None], img, out)
    return out


def render_frame_split(grid: DenseGrid, transform, fx, fy,
                       width: int, height: int, opt: RenderOptions,
                       gi: int = 384, payload_cache: Optional[dict] = None,
                       mesh_dist=None, mesh_rgb=None):
    """Render ANY world-tree pinhole pose via split-frame slab passes.

    Steep/wide/interior poses break the single-axis shear-warp gate
    (rays straddle the slab axis, or boundary slopes exceed
    MAX_SLAB_SLOPE). But every ray has a dominant tree axis, and within
    the class of rays dominated by axis m with a fixed sign, every slope
    magnitude is <= 1 — comfortably slab-compatible. So: partition the
    image into <= 6 (axis, sign) classes, render each class as a full
    slab pass over the fixed unit slope box, and stitch per pixel by
    argmax. Replaces the catastrophic exact-path fallback (~0.044
    Mrays/s) for such poses (the reference renders any pose in one
    kernel, rt_core.cuh:66-196 — this is the shear-warp equivalent).

    Only classes observed on a probe pixel grid are rendered (argmax
    regions are cones; a 33x33 probe including the image boundary finds
    every nonempty class). Typical steep poses need 2-3 passes.
    Returns (H, W, 4) f32. World trees only (NDC steep poses keep the
    exact fallback: the NDC warp's slope caustic is not axis-separable).
    """
    if grid.ndc is not None:
        raise ValueError("render_frame_split supports world trees only")
    tf = np.asarray(transform, np.float64).reshape(3, 4)
    R = tf[:, :3]
    n = 33
    xs = np.linspace(0, width, n)
    ys = np.linspace(0, height, n)
    pxg, pyg = np.meshgrid(xs, ys)
    d_cam = np.stack([(pxg.reshape(-1) - 0.5 * width) / fx,
                      -(pyg.reshape(-1) - 0.5 * height) / fy,
                      -np.ones(n * n)], -1)
    d_tree = (d_cam @ R.T) * np.asarray(grid.scale, np.float64)
    m = np.argmax(np.abs(d_tree), -1)
    neg = d_tree[np.arange(n * n), m] < 0
    classes = tuple(sorted({(int(a), bool(f)) for a, f in zip(m, neg)}))

    tr = jnp.asarray(transform, _F32)
    mesh = (None if mesh_dist is None
            else (jnp.asarray(mesh_dist, _F32),
                  jnp.asarray(mesh_rgb, _F32)))
    payloads = None
    if payload_cache is not None:
        payloads = []
        for axis, flip in classes:
            perm = (axis, (axis + 1) % 3, (axis + 2) % 3)
            # key includes the in-plane crop: it depends on
            # opt.sigma_thresh, so a threshold change (viewer slider)
            # must miss the cache instead of reusing a stale slice
            key = (perm, inplane_crop(grid, perm,
                                      float(opt.sigma_thresh)))
            if key not in payload_cache:
                _evict_perm(payload_cache, perm)
                payload_cache[key] = prepare_payload(grid, perm, opt)
            payloads.append(payload_cache[key])
        payloads = tuple(payloads)
    return np.asarray(_render_split_jit(grid, tr, fx, fy, classes,
                                        width, height, opt, gi,
                                        payloads=payloads, mesh=mesh))


def _evict_perm(cache: dict, perm) -> None:
    """Drop a perm's stale payload entries before inserting a new crop
    variant: each payload is hundreds of MB of HBM at bench scale, and a
    viewer sigma_thresh slider session would otherwise accumulate one per
    distinct crop (unbounded; the pre-r5 cache was one entry per perm)."""
    for k in [k for k in cache
              if isinstance(k, tuple) and len(k) == 2 and k[0] == perm]:
        del cache[k]


def default_gi(grid: DenseGrid) -> int:
    """Intermediate-plane resolution matched to the volume: gi = G rounded
    up to the 128-lane tile. PSNR is flat in gi at/above G — the voxel
    grid, not the slope plane, limits detail (measured flat over
    [256, 448] at G=256, tools/perf_r7.py) — while march VPU time scales
    ~gi^2 (1.18 ms/frame at gi=256 vs 2.16 at gi=384 on v5e)."""
    return int(min(512, max(128, -(-grid.G // 128) * 128)))


def render_image(grid: DenseGrid, cam, opt: RenderOptions,
                 gi: Optional[int] = None,
                 payload_cache: Optional[dict] = None,
                 meshes: Optional[Sequence] = None,
                 host_tree=None, out_dtype=None) -> np.ndarray:
    """Camera-object convenience wrapper; returns (H, W, 4) on host.

    out_dtype=jnp.uint8 downloads RGBA8 display frames (4x smaller
    device->host transfer — the reference's framebuffer format; the
    split-frame fallback stitches in f32 and converts at the end).

    gi: intermediate resolution; None picks default_gi(grid).
    payload_cache: optional mutable dict keyed by the full perm tuple —
    pre-permuted payloads are built lazily and reused across calls, so an
    interactive caller (the viewer) doesn't re-permute the grid per frame.
    meshes: optional mesh overlays (models/mesh.py) composited on the fast
    path (world trees only; rasterized host-side like the reference's GL
    mesh pass, cuda_renderer.cpp:103-112). host_tree: the source N3Tree,
    for the opt.show_grid wireframe overlay.
    """
    if gi is None:
        gi = default_gi(grid)
    perm, flip, slope = choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    mesh_dist = mesh_rgb = None
    mesh_list = list(meshes) if meshes else []
    if not (np.isfinite(slope) and slope < MAX_SLAB_SLOPE):
        # steep/wide/interior pose: single-axis shear-warp can't take it,
        # but the split-frame multi-pass can (world trees; meshes ride
        # along — each class pass clips at the mesh and composites, and
        # the per-pixel stitch picks the right pass)
        if grid.ndc is None:
            md = mr = None
            if opt.show_grid and host_tree is not None:
                from volrend_tpu.ops.composite import wireframe_mesh
                mesh_list.append(
                    wireframe_mesh(host_tree, opt.grid_max_depth))
            if mesh_list:
                from volrend_tpu.ops.rasterize import rasterize_meshes
                buf = rasterize_meshes(mesh_list, cam)
                if np.isfinite(buf.dist).any():
                    md = buf.dist.astype(np.float16)
                    mr = buf.color.astype(np.float16)
            out = render_frame_split(grid, cam.transform, cam.fx,
                                     cam.fy, cam.width, cam.height, opt,
                                     gi=gi, payload_cache=payload_cache,
                                     mesh_dist=md, mesh_rgb=mr)
            from volrend_tpu.ops.display_warp import to_display_dtype
            return np.asarray(to_display_dtype(out, out_dtype))
        raise ValueError("pose not renderable by the slab path "
                         "(rays straddle the slab axis); use render_jax")
    if opt.show_grid and host_tree is not None:
        from volrend_tpu.ops.composite import wireframe_mesh
        mesh_list.append(wireframe_mesh(host_tree, opt.grid_max_depth))
    if mesh_list:
        if grid.ndc is not None:
            raise ValueError("mesh compositing on the slab path supports "
                             "world trees only; use the exact renderer")
        from volrend_tpu.ops.rasterize import rasterize_meshes
        buf = rasterize_meshes(mesh_list, cam)
        if np.isfinite(buf.dist).any():
            # f16 halves the host->device upload (the axon tunnel moves
            # ~6-20 MB/s; display-range color and ~1e-3-relative distance
            # lose nothing visible). render_frame casts back to f32.
            mesh_dist = buf.dist.astype(np.float16)
            mesh_rgb = buf.color.astype(np.float16)
    payload = None
    if payload_cache is not None:
        # crop in the key: see render_frame_split (sigma_thresh changes
        # must not reuse a stale cropped payload)
        key = (perm, inplane_crop(grid, perm, float(opt.sigma_thresh)))
        if key not in payload_cache:
            _evict_perm(payload_cache, perm)
            payload_cache[key] = prepare_payload(grid, perm, opt)
        payload = payload_cache[key]
    out = render_frame(grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
                       perm, flip, cam.width, cam.height, opt, gi,
                       payload=payload, mesh_dist=mesh_dist,
                       mesh_rgb=mesh_rgb, out_dtype=out_dtype)
    return np.asarray(out)
