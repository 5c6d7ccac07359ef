"""Fused Pallas TPU kernel for the shear-warp slab march.

The XLA slab march (``ops/slab_render.py``) round-trips the (gi, gi)
accumulator and per-slab intermediates through HBM every slab (~30 MB/slab).
This kernel fuses shade + warp + composite with the accumulator resident in
VMEM, so HBM traffic collapses to the volume read itself — and only the
*occupied* part of it: empty slabs (max sigma below the threshold) are
culled from the slab list before the kernel launches, and the march runs as
a chunked ``lax.while_loop`` that stops dispatching chunks once every
intermediate pixel has either saturated (T < stop_thresh) or passed its
z-exit — the TPU equivalent of the reference's per-ray early-out
(rt_core.cuh:176-185).

Per slab, entirely on-chip:
- shade: SH basis planes evaluated in-register from the per-voxel ray
  direction; rgb = sigmoid(sum coeffs*b); sigma masked by threshold + bbox
- warp: a separable **box-integration two-tap resample** executed on the
  MXU (each matrix row holds the two fractional-overlap weights of the
  pixel ray's within-slab span — integrating the piecewise-constant field
  exactly where the span crosses at most one cell boundary; matches the
  reference's per-voxel DDA chords to second order). Emission is
  sigma-weighted: the stacked channels are [sigma, sigma*r, sigma*g,
  sigma*b] — ONE (4G, G) @ (G, gi) column-warp followed by four
  (gi, G) @ (G, gi) row warps, in bfloat16 with f32 accumulation (<0.5%
  relative on the weights — far above the fp16 payload's own precision).
- composite: tau = warped sigma * per-pixel slab thickness; front-to-back
  with stop-threshold freeze (rt_core.cuh:176-185 semantics; a ray whose T
  drops below stop_thresh stops contributing)

Data layout: the grid is passed channel-planar (G_z, D, G_y, G_x) so every
plane the kernel touches is a (G, G) tile with the lane dimension = G_x.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrend_tpu.ops import basis as basis_mod

__all__ = ["march_slabs", "march_slabs_bwd", "available"]

_F32 = jnp.float32
_BF16 = jnp.bfloat16

#: test hook: force the kernel to run in Pallas interpret mode on CPU
#: (callers must jax.clear_caches() after flipping this — jit caches key on
#: static args only, not on this flag)
_FORCE_INTERPRET = False

#: slabs per while-loop chunk: small enough that early exit saves real work,
#: large enough that the per-chunk dispatch/cond overhead amortizes
#: (measured on v5e at G=256/gi=448: 32→3.65 ms, 64→3.40, 128→2.20, 256→2.15
#: per frame; r4 at the production gi=256: 128→279.3, 256→283.5 Mrays/s on
#: the dense bench — the whole G=256 volume in ONE dispatch wins, the
#: mid-march early-exit point was not earning its dispatch gap)
_CHUNK = 256

#: VMEM budget handed to Mosaic for the forward kernel; module constant so
#: perf probes can sweep it (more headroom can enable block double-buffering
#: = DMA/compute overlap; too much starves other buffers)
_VMEM_LIMIT = 100 * 1024 * 1024

#: test hook: force the scalar-prefetch (dynamic window list) dispatch even
#: for contiguous full-mask runs, so tests can pin static == dynamic
_FORCE_DYNAMIC = False

#: contiguous window runs can use the manually-pipelined kernel (two-slot
#: VMEM scratch + async HBM copies). MEASURED EQUAL to Mosaic's automatic
#: block pipeline (1.80-1.89 vs 1.77-1.82 ms/frame at bench scale): the
#: march is VPU-compute-bound (~1.8 ms of shading+warp-mats+composite) and
#: the 1.1 ms volume stream already hides under it either way. Kept as
#: infrastructure (and covered by tests); the automatic pipeline is the
#: simpler default.
_MANUAL_PIPE = False

#: display-path default for ``march_slabs(shade_bf16=...)``: run the SH
#: shading accumulation (basis planes + the 3*bd payload MACs — the
#: march's dominant VPU cost, ~0.7-0.95 ms of 1.8) in bfloat16. bf16
#: packs two values per 32-bit VPU lane, so elementwise throughput
#: doubles; the payload itself is already int8/bf16 so the inputs carry
#: no extra precision to lose, and the 3*bd-term accumulation at ~8
#: mantissa bits agrees with f32 shading to 63 dB (interpret-mode
#: measurement) — far above the bench's 40 dB gate. Training always
#: shades f32 (slab_grad passes shade_bf16=False; the backward kernel's
#: recompute is f32). Callers must jax.clear_caches() after flipping
#: (same caveat as _FORCE_INTERPRET).
_BF16_SHADE = False

#: display-path default for ``march_slabs(dir_win=...)``: evaluate the
#: shading view-dir + basis planes ONCE per K-slab window (at the
#: window-center camera distance) instead of per slab. The dir drift
#: across a K=4 window is |ycm|*(K/G)/s^2 <= ~0.15 deg at orbit
#: distances — far below the int8 grid's own quantization error — and
#: the hoist removes the dir affine + rsqrt + SH polynomial planes from
#: 3 of every 4 slab bodies (~1/4 of the march's VPU work at SH16).
#: Training/precise paths pass dir_win=False (the backward kernel's
#: forward-recompute shades per slab; fwd/bwd must match exactly).
_DIR_WIN = True

#: display-path slabs per window (``march_slabs(k_per_step=...)``): the
#: per-window work (liveness gate, warp/shade pre-planes, and with
#: dir_win the whole basis build) amortizes over K slabs. Training keeps
#: the march_slabs default (K=4).
_K_STEP = 4


def available() -> bool:
    if _FORCE_INTERPRET:
        return True
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _sh_planes(bd: int, x, y, z):
    """Yield (index, plane) for each SH basis function, lazily (keeps VMEM
    pressure at one plane at a time). Mirrors basis.eval_sh_basis."""
    C0, C1 = basis_mod._C0, basis_mod._C1
    C2, C3, C4 = basis_mod._C2, basis_mod._C3, basis_mod._C4
    yield 0, C0 * jnp.ones_like(x)
    if bd >= 4:
        yield 1, -C1 * y
        yield 2, C1 * z
        yield 3, -C1 * x
    if bd >= 9:
        xx, yy, zz = x * x, y * y, z * z
        yield 4, C2[0] * x * y
        yield 5, C2[1] * y * z
        yield 6, C2[2] * (2.0 * zz - xx - yy)
        yield 7, C2[3] * x * z
        yield 8, C2[4] * (xx - yy)
    if bd >= 16:
        yield 9, C3[0] * y * (3 * xx - yy)
        yield 10, C3[1] * x * y * z
        yield 11, C3[2] * y * (4 * zz - xx - yy)
        yield 12, C3[3] * z * (2 * zz - 3 * xx - 3 * yy)
        yield 13, C3[4] * x * (4 * zz - xx - yy)
        yield 14, C3[5] * z * (xx - yy)
        yield 15, C3[6] * x * (xx - 3 * yy)
    if bd >= 25:
        yield 16, C4[0] * x * y * (xx - yy)
        yield 17, C4[1] * y * z * (3 * xx - yy)
        yield 18, C4[2] * x * y * (7 * zz - 1.0)
        yield 19, C4[3] * y * z * (7 * zz - 3.0)
        yield 20, C4[4] * (zz * (35 * zz - 30) + 3)
        yield 21, C4[5] * x * z * (7 * zz - 3)
        yield 22, C4[6] * (xx - yy) * (7 * zz - 1.0)
        yield 23, C4[7] * x * z * (xx - 3 * yy)
        yield 24, C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))


# params vector layout (f32): see _pack_params (+1 slot appended by
# march_slabs: [30] = z_base, the global z of the payload's first slab —
# nonzero only for z-sharded partial payloads)
_NP = 31


def _warp_half(shape, cell_on_rows: bool, r0, dr, G: int, cell0: int = 0):
    """One axis of the warp scaffolding: cell-edge planes (edge cells
    extended to +-inf) and the per-ray slab-span coefficient plane.

    cell0: first GLOBAL cell index of the (possibly in-plane-cropped)
    payload along this axis. Cell indices stay global, so the +-inf
    edge extension fires only at TRUE volume edges — a crop-boundary
    cell keeps finite edges, and span mass falling outside the crop is
    dropped (exact: cropped cells are sub-threshold, so the uncropped
    kernel masks their sigma to zero anyway)."""
    big = _F32(1e9)
    cell = (lax.broadcasted_iota(
        jnp.int32, shape, 0 if cell_on_rows else 1) + cell0).astype(_F32)
    ray = lax.broadcasted_iota(
        jnp.int32, shape, 1 if cell_on_rows else 0).astype(_F32)
    hi = jnp.where(cell >= G - 1.0, big, cell + 1.0)
    lo = jnp.where(cell <= 0.0, -big, cell)
    return hi, lo, (r0 + dr * ray) * G


def _warp_pre(p, G: int, gi: int, transposed: bool = False,
              crop: Optional[Tuple[int, int, int, int]] = None):
    """Slab-INVARIANT scaffolding of the box-integration warp matrices,
    hoisted out of the per-slab bodies (every plane here is constant across
    a window's K slabs and across all slabs of the frame; building them per
    slab cost ~1.5M VPU ops/slab). Returns the tuple `_overlap_mats` eats.

    transposed=True builds the layout-swapped twin for the backward
    kernel's adjoint matmuls (cell index on rows of the first block,
    columns of the second) directly from iotas — no in-kernel transpose
    relayout.

    crop: (y0, Gy, x0, Gx) static in-plane occupancy crop of the payload
    (display path; see march_slabs). None = full (0, G, 0, G)."""
    y0, Gy, x0, Gx = crop if crop is not None else (0, G, 0, G)
    cy, cx = p[1], p[2]
    u0, du, v0, dv = p[3], p[4], p[5], p[6]
    if transposed:
        hi_r, lo_r, ujG = _warp_half((Gy, gi), True, u0, du, G, y0)
        hi_c, lo_c, vkG = _warp_half((gi, Gx), False, v0, dv, G, x0)
    else:
        hi_r, lo_r, ujG = _warp_half((gi, Gy), False, u0, du, G, y0)
        hi_c, lo_c, vkG = _warp_half((Gx, gi), True, v0, dv, G, x0)
    return (hi_r, lo_r, ujG, cy * G, hi_c, lo_c, vkG, cx * G)


def _overlap_mats(pre, s0, s1):
    """Box-integration warp matrices for one slab, from hoisted scaffolding.

    Each row holds the exact fractional overlap of the pixel ray's
    within-slab span with every grid cell — integrating the
    piecewise-constant field exactly. Edge cells extend to +-inf so
    out-of-grid span mass clamps to them: the octree query clamps
    positions into [0, 1)^3 (n3tree_query.hpp:17-19), so the exact
    renderer reads edge voxels there too. Typically two nonzeros per
    row — same matmul shapes as a one-hot gather; weights are
    exact-enough in bf16 (<0.5% relative).

    With `pre` from `_warp_pre`: returns (ohr (gi, G), ohct (G, gi)).
    With `pre` from `_warp_pre(transposed=True)`: returns their transposes
    (the slab span endpoints p = c*G + s*slopeG are layout-agnostic).
    """
    hi_r, lo_r, ujG, cyG, hi_c, lo_c, vkG, cxG = pre
    p0 = cyG + s0 * ujG
    p1 = cyG + s1 * ujG
    pmin = jnp.minimum(p0, p1)
    pmax = jnp.maximum(p0, p1)
    inv_r = 1.0 / jnp.maximum(pmax - pmin, 1e-9)
    m_r = (jnp.clip((jnp.minimum(hi_r, pmax)
                     - jnp.maximum(lo_r, pmin)) * inv_r, 0.0, 1.0)
           .astype(_BF16))

    q0 = cxG + s0 * vkG
    q1 = cxG + s1 * vkG
    qmin = jnp.minimum(q0, q1)
    qmax = jnp.maximum(q0, q1)
    inv_c = 1.0 / jnp.maximum(qmax - qmin, 1e-9)
    m_c = (jnp.clip((jnp.minimum(hi_c, qmax)
                     - jnp.maximum(lo_c, qmin)) * inv_c, 0.0, 1.0)
           .astype(_BF16))
    return m_r, m_c


def _window_live(T_plane, zb_ref, stop_thresh, wid, K: int, G: int,
                 z_off=0.0):
    """Per-window liveness: some ray still has transmittance AND its
    [zlo, zhi] interval intersects the window's z range. A dead verdict
    implies the per-slab composite mask is false for every pixel, so
    skipping the window's shade/warp/composite (or zero-filling its grad
    block) is exact. z_off: global z of the payload's first slab (nonzero
    for z-sharded partial payloads)."""
    # window extent includes the half-slab fractional-overlap margin
    zw0 = (wid * K).astype(_F32) / G + z_off
    zw1 = ((wid * K).astype(_F32) + K) / G + z_off
    return jnp.any((T_plane >= stop_thresh)
                   & (zb_ref[0] <= zw1) & (zb_ref[1] >= zw0))


def _shade_pre(p, G: int, bbox_full: bool,
               crop: Optional[Tuple[int, int, int, int]] = None):
    """Slab-invariant shade planes and the static-bbox voxel mask (None
    when the bbox is the full cube — the compares would always pass;
    `bbox_full` removes them from every slab body).

    The shade planes are the slab-INDEPENDENT part of the per-voxel view
    direction: normalize() kills scale, so instead of the per-slab
    ``dirM @ (1, ycm/s, xcm/s)`` (2 plane muls + 6 plane FMAs per slab)
    the kernel uses ``s * dw = dirM[:,0]*s + (dirM[:,1]*ycm +
    dirM[:,2]*xcm)`` — the parenthesized planes hoisted here, 1 plane FMA
    per axis per slab, with sign(s) folded into the rnorm scalar.

    crop: static in-plane payload crop (voxel coords stay GLOBAL)."""
    y0, Gy, x0, Gx = crop if crop is not None else (0, G, 0, G)
    cy, cx = p[1], p[2]
    yrow = (lax.broadcasted_iota(jnp.int32, (Gy, Gx), 0)
            + y0).astype(_F32)
    xcol = (lax.broadcasted_iota(jnp.int32, (Gy, Gx), 1)
            + x0).astype(_F32)
    yc = (yrow + 0.5) * (1.0 / G)
    xc = (xcol + 0.5) * (1.0 / G)
    if bbox_full:
        okb = None
    else:
        # voxel-EXTENT intersection with the bbox (matches slab_render's
        # XLA mask): the per-pixel z-intervals clip rays exactly, so
        # boundary voxels must stay in play
        lo1, hi1, lo2, hi2 = p[16], p[17], p[18], p[19]
        h = 0.5 / G
        okb = ((yc + h > lo1) & (yc - h < hi1)
               & (xc + h > lo2) & (xc - h < hi2))
    ycm, xcm = yc - cy, xc - cx
    dirp = [p[21 + 3 * a] * ycm + p[22 + 3 * a] * xcm for a in range(3)]
    return dirp, okb


def _pack_params(cz, cy, cx, u0, du, v0, dv, sgn, spp, inv_scale,
                 sigma_thresh, stop_thresh, lo1, hi1, lo2, hi2,
                 dirM, z0_depth):
    """params[20:29] = dirM row-major: the per-frame affine map from a
    voxel's slope-grid coordinates to its (unnormalized) world view
    direction, dir[a] = dirM[a,0] + dirM[a,1]*u + dirM[a,2]*v (covers
    world-space AND NDC trees — slab_render.FrameGeom builds it).
    params[29] = the depth-mode t origin along the slab axis (the camera
    center for world trees, the near plane for NDC trees)."""
    dirM = jnp.asarray(dirM, _F32).reshape(-1)
    return jnp.concatenate([
        jnp.stack([
            cz, cy, cx, u0, du, v0, dv, sgn, spp[0], spp[1], spp[2],
            inv_scale[0], inv_scale[1], inv_scale[2],
            sigma_thresh, stop_thresh, lo1, hi1, lo2, hi2,
        ]).astype(_F32),
        dirM,
        jnp.asarray(z0_depth, _F32).reshape(1),
    ])


def _zb_planes(params, zbounds, G: int, gi: int):
    """Extend the (2, gi, gi) zbounds block with the two per-frame-constant
    composite planes, built ONCE in XLA instead of per slab in the kernel
    (they cost ~10 VPU ops x gi^2 x n_slabs otherwise):
    plane 2 = dt_pix (per-pixel slab thickness along the ray, world units),
    plane 3 = the depth-mode tview base (|s| multiplier)."""
    u0, du, v0, dv = params[3], params[4], params[5], params[6]
    spp0, spp1, spp2 = params[8], params[9], params[10]
    ujq = lax.broadcasted_iota(jnp.int32, (gi, gi), 0).astype(_F32)
    vkq = lax.broadcasted_iota(jnp.int32, (gi, gi), 1).astype(_F32)
    up_r = u0 + du * ujq
    vp_r = v0 + dv * vkq
    up = up_r * spp1
    vp = vp_r * spp2
    dt_pix = (1.0 / G) * jnp.sqrt(up * up + vp * vp + spp0 * spp0)
    tview = jnp.sqrt(1.0 + up_r * up_r + vp_r * vp_r)
    return jnp.concatenate([zbounds, dt_pix[None], tview[None]])


def _make_kernel(G: int, gi: int, D: int, bd: int,
                 perm: Tuple[int, int, int], basis_lo: int, basis_hi: int,
                 sig2: bool, fmt: int, depth: bool,
                 rot: Optional[Tuple[float, ...]], K: int, flip: bool,
                 static_seq: Optional[Tuple[int, int]] = None,
                 gate_slabs: bool = True,
                 manual_pipe: Optional[Tuple[int, int, object]] = None,
                 bbox_full: bool = False, shade_bf16: bool = False,
                 dir_win: bool = False,
                 crop: Optional[Tuple[int, int, int, int]] = None):
    """static_seq=(base, step): the grid step i marches window base+step*i
    with occupancy masks from SMEM and a STATIC block index map — no
    scalar prefetch. None = dynamic windows via the ids array (sparse
    scenes with arbitrary culled slab lists).

    manual_pipe=(n_win, Dp, dtype) (requires static_seq): ONE grid step
    drives the whole window run with an explicit two-slot VMEM scratch and
    async HBM copies — DMA of window w+1 overlaps the shading of window w.
    Mosaic's automatic block pipeline measures DMA + compute ADDITIVE for
    this kernel (march ~= stream + shade), so the overlap is hand-rolled
    (the pallas guide's double-buffering pattern)."""
    from volrend_tpu.models.data_format import BasisType
    bt = BasisType(fmt)
    _, Gy, _, Gx = crop if crop is not None else (0, G, 0, G)
    # march order inside a K-aligned window
    dz_order = range(K - 1, -1, -1) if flip else range(K)

    def kernel(*refs):
        if static_seq is None:
            (ids_ref, params_ref, qs_ref, extra_ref, slab_ref, zb_ref,
             accin_ref, acc_ref) = refs
        else:
            (mask_ref, params_ref, qs_ref, extra_ref, slab_ref, zb_ref,
             accin_ref, acc_ref) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = accin_ref[...]

        if static_seq is None:
            wid = ids_ref[2 * i]        # window index (K slabs), or -1
            wmask = ids_ref[2 * i + 1]  # bit dz set = slab occupied
        else:
            wid = static_seq[0] + static_seq[1] * i
            wmask = mask_ref[i]

        def _mk_basis(dx, dy, dz):
            """(index, plane) basis generator from unit-dir planes —
            shared by the per-slab path and the dir_win per-window
            hoist."""
            if bt == BasisType.SH:
                if shade_bf16:
                    return _sh_planes(bd, dx.astype(_BF16),
                                      dy.astype(_BF16), dz.astype(_BF16))
                return _sh_planes(bd, dx, dy, dz)
            elif bt == BasisType.SG:
                # exp(lam (mu.d - 1)) / bd    (lumisphere.hpp:30-36)
                return ((k, jnp.exp(extra_ref[4 * k] * (
                    extra_ref[4 * k + 1] * dx + extra_ref[4 * k + 2] * dy
                    + extra_ref[4 * k + 3] * dz - 1.0)) / bd)
                    for k in range(bd))
            elif bt == BasisType.ASG:
                # S exp(-a dotx^2 - b doty^2) / bd (lumisphere.hpp:14-28)
                def _asg_planes():
                    for k in range(bd):
                        e = [extra_ref[11 * k + t] for t in range(11)]
                        dotx = e[2] * dx + e[3] * dy + e[4] * dz
                        doty = e[5] * dx + e[6] * dy + e[7] * dz
                        S = e[8] * dx + e[9] * dy + e[10] * dz
                        yield k, S * jnp.exp(
                            -e[0] * dotx * dotx
                            - e[1] * doty * doty) / bd
                return _asg_planes()
            raise NotImplementedError(f"basis {bt}")

        def _dirs_at(s, p, dirp):
            """Unit view-dir planes for the rays through the slab plane at
            camera distance ``s`` (scale-invariant affine map — see
            _shade_pre)."""
            dw = [dirp[a] + p[20 + 3 * a] * s for a in range(3)]
            rnorm = lax.rsqrt(dw[0] * dw[0] + dw[1] * dw[1]
                              + dw[2] * dw[2]) * jnp.sign(s)
            dx, dy, dz = dw[0] * rnorm, dw[1] * rnorm, dw[2] * rnorm
            if rot is not None:
                # static rodrigues viewdir rotation (volrend.cu:57-71)
                dx, dy, dz = (rot[0] * dx + rot[1] * dy + rot[2] * dz,
                              rot[3] * dx + rot[4] * dy + rot[5] * dz,
                              rot[6] * dx + rot[7] * dy + rot[8] * dz)
            return dx, dy, dz

        def _slab(slab_ref, wid, wmask, dzi, pre_w, dirp, okb,
                  bkq_pre=None):
            sid = wid * K + dzi
            occupied = (wmask >> dzi) & 1
            p = params_ref
            cz = p[0]
            # p[7:14] (sgn, spp, inv_scale) feed _zb_planes / FrameGeom
            # only — the kernel reads dirs from the affine map p[20:29]
            sigma_thresh, stop_thresh = p[14], p[15]

            z = (sid.astype(_F32) + 0.5) / G + p[30]
            s = z - cz
            s0 = z - 0.5 / G - cz                       # slab entry/exit
            s1 = z + 0.5 / G - cz

            if sig2:
                # 14-bit fixed-point sigma split across two int8 planes
                sigma = (slab_ref[dzi, D - 1].astype(_F32) * 128.0
                         + slab_ref[dzi, D].astype(_F32)) \
                    * qs_ref[D - 1]
            else:
                sigma = slab_ref[dzi, D - 1].astype(_F32) * qs_ref[D - 1]
            ok = (sigma > sigma_thresh) & (occupied > 0)
            if okb is not None:
                ok = ok & okb
            sigma = jnp.where(ok, sigma, 0.0)

            if depth:
                srgb = None
            elif bd < 0:
                # RGBA payload: raw colors, no basis
                srgb = [sigma * slab_ref[dzi, c].astype(_F32) * qs_ref[c]
                        for c in range(3)]
            else:
                # per-voxel world view direction -> basis shading (the
                # per-frame affine slope->dir map, params 20:29 — covers
                # world + NDC trees, see _pack_params / FrameGeom.dirM).
                # dir_win: the scaled basis planes were hoisted to the
                # window body (_dirs_at at the window-center s — the dir
                # drift across a K=4 window is <~0.15 deg at orbit
                # distances, far under the int8 grid's own error); per
                # slab only the payload MACs + sigmoid remain.
                sdt = _BF16 if (shade_bf16 and bt == BasisType.SH) else _F32
                if bkq_pre is None:
                    dx, dy, dz = _dirs_at(s, p, dirp)
                    # bake_dense shares each basis function's dequant
                    # scale across rgb (qs[c*bd+k] identical for all c),
                    # so the basis plane is scaled once per k instead of
                    # dequantizing three channel planes separately
                    bkqs = ((k, bk * qs_ref[k].astype(sdt))
                            for k, bk in _mk_basis(dx, dy, dz)
                            if basis_lo <= k <= basis_hi)
                else:
                    bkqs = bkq_pre
                raw = [jnp.zeros((Gy, Gx), sdt) for _ in range(3)]
                for k, bkq in bkqs:
                    for c in range(3):
                        raw[c] = raw[c] + (
                            slab_ref[dzi, c * bd + k].astype(sdt) * bkq)
                srgb = [sigma * jax.nn.sigmoid(r.astype(_F32)) for r in raw]

            # box-integration two-tap warp matrices (exact per-voxel DDA
            # chords to second order; see _overlap_mats)
            ohr, ohct = _overlap_mats(pre_w, s0, s1)

            # stage 1: stacked column warp — ONE (4G, G) @ (G, gi) matmul
            # (depth mode only needs the sigma channel)
            chans = [sigma] if depth else [sigma, srgb[0], srgb[1], srgb[2]]
            stack = jnp.concatenate(chans, axis=0).astype(_BF16)
            w1 = jnp.dot(stack, ohct, preferred_element_type=_F32)
            w1 = w1.astype(_BF16)
            # stage 2: row warp per channel — (gi, G) @ (G, gi)
            sig_w = jnp.dot(ohr, w1[:Gy], preferred_element_type=_F32)
            srgb_w = None if depth else [
                jnp.dot(ohr, w1[(c + 1) * Gy:(c + 2) * Gy],
                        preferred_element_type=_F32) for c in range(3)]

            # per-pixel slab thickness along the ray: per-frame constant,
            # prebuilt by _zb_planes (resident zbounds block, plane 2).
            # Boundary slabs contribute FRACTIONALLY (overlap of the
            # slab's z extent with the exact per-pixel interval — the
            # sub-slab analog of the reference's t-range clip)
            zlo = zb_ref[0]
            zhi = zb_ref[1]
            hG = 0.5 / G
            frac = jnp.clip((jnp.minimum(z + hG, zhi)
                             - jnp.maximum(z - hG, zlo)) * G, 0.0, 1.0)
            tau_w = sig_w * zb_ref[2] * frac
            att = jnp.exp(-tau_w)
            sig_inv = 1.0 / jnp.maximum(sig_w, 1e-12)

            T = acc_ref[3]
            m = (T >= stop_thresh) & (tau_w > 0.0)
            w = jnp.where(m, T * (1.0 - att), 0.0)
            if depth:
                tview = jnp.abs(z - p[29]) * zb_ref[3]
                acc_ref[0] = acc_ref[0] + w * tview
            else:
                wn = w * sig_inv
                for c in range(3):
                    acc_ref[c] = acc_ref[c] + wn * srgb_w[c]
            acc_ref[3] = jnp.where(m, T * att, T)

        def _masked_slabs(sref, wid, wmask):
            # skip the window's entire shade+warp+composite when no ray
            # can contribute (_window_live: saturation + z-interval test —
            # subsumes the whole-frame early exit and also skips windows
            # before every ray's entry / after every ray's exit; the march
            # is VPU-compute-bound so the block DMA streaming underneath
            # costs nothing extra). Fully-empty windows (zero-mask gap
            # padding in static sparse runs) skip the plane build too.
            live = _window_live(acc_ref[3], zb_ref, params_ref[15], wid,
                                K, G, z_off=params_ref[30]) & (wmask != 0)

            @pl.when(live)
            def _live_window():
                # slab-invariant planes, built once per live window instead
                # of per slab (inside the gate so dead windows cost only
                # the any-reduction; the pl.when occupancy gates below
                # would block CSE across slab bodies)
                pre_w = _warp_pre(params_ref, G, gi, crop=crop)
                dirp, okb = _shade_pre(params_ref, G, bbox_full,
                                       crop=crop)
                bkq_pre = None
                if dir_win and not depth and bd > 0:
                    # window-shared shading dirs: basis planes built ONCE
                    # at the window-center s and reused by all K slabs
                    # (saves the dir affine + rsqrt + basis polys per
                    # slab — ~1/4 of the march's VPU work at SH16/K=4)
                    p = params_ref
                    zc = ((wid * K).astype(_F32) + 0.5 * K) / G + p[30]
                    sc = zc - p[0]
                    dxc, dyc, dzc = _dirs_at(sc, p, dirp)
                    sdt = (_BF16 if (shade_bf16 and bt == BasisType.SH)
                           else _F32)
                    bkq_pre = [(k, bk * qs_ref[k].astype(sdt))
                               for k, bk in _mk_basis(dxc, dyc, dzc)
                               if basis_lo <= k <= basis_hi]
                # per-slab occupancy gate (only emitted when some window's
                # mask is partial — the scalar branches cost ~5% on dense
                # scenes): an empty slab inside a streamed window skips its
                # whole shade+warp+composite (correct because occupied=0
                # forces sigma=0 -> zero weight -> acc unchanged)
                for dzi in dz_order:
                    if gate_slabs:
                        @pl.when(((wmask >> dzi) & 1) > 0)
                        def _one(dzi=dzi):
                            _slab(sref, wid, wmask, dzi, pre_w, dirp, okb,
                                  bkq_pre)
                    else:
                        _slab(sref, wid, wmask, dzi, pre_w, dirp, okb,
                              bkq_pre)

        if manual_pipe is not None:
            # 'slab_ref' holds the WHOLE payload in HBM; two-slot scratch
            # + async copies overlap window w+1's fetch with w's shading
            n_win, Dp_, sdtype = manual_pipe
            base, step_ = static_seq

            def body(scratch, sem):
                def get_dma(sl, w):
                    blk = (base + step_ * w) * K
                    return pltpu.make_async_copy(
                        slab_ref.at[pl.ds(blk, K)], scratch.at[sl],
                        sem.at[sl])

                get_dma(0, 0).start()

                def loop_body(w, carry):
                    sl = lax.rem(w, 2)

                    @pl.when(w + 1 < n_win)
                    def _prefetch():
                        get_dma(lax.rem(w + 1, 2), w + 1).start()

                    get_dma(sl, w).wait()
                    _masked_slabs(scratch.at[sl], base + step_ * w,
                                  mask_ref[w])
                    return carry

                lax.fori_loop(0, n_win, loop_body, 0)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((2, K, Dp_, Gy, Gx), sdtype),
                sem=pltpu.SemaphoreType.DMA((2,)))
        elif static_seq is None:
            @pl.when(wid >= 0)
            def _body():
                _masked_slabs(slab_ref, wid, wmask)
        else:
            _masked_slabs(slab_ref, wid, wmask)

    return kernel


def _chunk_call(kernel, ids_chunk, params, qscale, extra, gplanar, zbounds,
                acc, G: int, gi: int, Dp: int, K: int):
    """One chunked kernel dispatch over a window chunk.

    ids_chunk: (2*W,) int32 interleaved (window_id, occupancy_mask) pairs;
    window_id < 0 = padding (skipped). Each grid step streams one K-slab
    block and marches its occupied slabs in order."""
    Gy, Gx = gplanar.shape[-2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ids_chunk.shape[0] // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, Dp, Gy, Gx),
                         lambda i, ids: (jnp.maximum(ids[2 * i], 0),
                                         0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i, ids: (0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i, ids: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((4, gi, gi), lambda i, ids: (0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, gi, gi), _F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_FORCE_INTERPRET,
    )(ids_chunk, params, qscale, extra, gplanar, zbounds, acc)


def _chunk_call_static(kernel, masks, params, qscale, extra, gplanar,
                       zbounds, acc, G: int, gi: int, Dp: int, K: int,
                       base: int, step: int):
    """One chunked dispatch over a STATIC contiguous window run.

    The block index map is pure program-id arithmetic (base + step * i
    with python-int base/step), which lets Mosaic double-buffer the block
    stream — the payload DMA overlaps the previous window's shading. The
    scalar-prefetch variant (_chunk_call) measures DMA + compute additive.
    Per-window occupancy bitmasks ride in SMEM (scalar reads in the kernel
    body don't constrain the pipeline the way prefetched index maps do)."""
    n_win = masks.shape[0]
    Gy, Gx = gplanar.shape[-2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_win,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, Dp, Gy, Gx),
                         lambda i: (base + step * i, 0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, gi, gi), _F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_FORCE_INTERPRET,
    )(masks, params, qscale, extra, gplanar, zbounds, acc)


def _chunk_call_pipelined(kernel, masks, params, qscale, extra, gplanar,
                          zbounds, acc, gi: int):
    """One manually-pipelined dispatch over a contiguous window run: a
    single grid step; the kernel itself loops the windows with a two-slot
    scratch and async copies (see _make_kernel's manual_pipe mode). The
    payload stays in HBM (memory_space ANY)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, gi, gi), _F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_FORCE_INTERPRET,
    )(masks, params, qscale, extra, gplanar, zbounds, acc)


@partial(jax.jit, static_argnames=("G", "gi", "D", "bd", "perm", "slab_ids",
                                   "basis_lo", "basis_hi", "sig2", "fmt",
                                   "depth", "rot", "flip", "k_per_step",
                                   "bbox_full", "shade_bf16", "dir_win",
                                   "crop"))
def march_slabs(gplanar, params, qscale, zbounds, G: int,
                gi: int, D: int, bd: int,
                perm: Tuple[int, int, int],
                slab_ids: Optional[Tuple[int, ...]] = None,
                basis_lo: int = 0, basis_hi: int = 24, sig2: bool = False,
                extra=None, fmt: int = 1, depth: bool = False,
                rot: Optional[Tuple[float, ...]] = None,
                flip: bool = False, k_per_step: int = 4,
                bbox_full: bool = False, shade_bf16: bool = False,
                dir_win: bool = False, z_base=None, acc_init=None,
                crop: Optional[Tuple[int, int, int, int]] = None):
    """Run the fused march; returns acc (4, gi, gi): [r, g, b, T].

    gplanar: (G, Dp, G, G) channel-planar permuted grid — bf16 payload
        (Dp = D, sigma in plane D-1), or int8 codes (Dp = D+1, colors +
        14-bit fixed-point sigma split over the last two planes; sig2=True)
        dequantized in-kernel by the per-channel ``qscale``.
    params: (30,) f32 (see _pack_params; [20:29] = dirM affine slope->dir
        map, [29] = depth-mode t origin). qscale: (Dp,) f32.
    zbounds: (2, gi, gi) f32 per-pixel live z interval.
    slab_ids: static tuple of slab z-indices in march order (front to back
        along the ray), pre-culled of empty slabs by the caller; None means
        all G slabs in ascending order.
    flip: True when the march runs toward -z (descending slab ids).
    k_per_step: slabs fetched + marched per grid step (K-aligned windows);
        amortizes per-step overhead and lets Mosaic keep the accumulator
        chain fused across K composite updates.
    z_base: traced scalar — global z of the payload's first slab (the
        payload may be a z-SHARD of the full grid: gplanar.shape[0] < G;
        slab_ids then index the local shard). None = 0 (whole grid).
    acc_init: optional (4, gi, gi) initial [rgb, T] accumulator (resume a
        march from an upstream segment's state).
    crop: optional static (y0, Gy, x0, Gx) in-plane occupancy crop: the
        payload holds only rows [y0, y0+Gy) x cols [x0, x0+Gx) of each
        slab (slab_render.inplane_crop computes it from the bake's
        occupancy metadata). All cropped-away voxels must be
        sub-sigma-thresh, which the occupancy bounds guarantee — then the
        cropped march is EXACT (those voxels' sigma is masked to zero in
        the uncropped kernel anyway), while shade/warp compute and HBM
        streaming scale with Gy*Gx instead of G^2 — the TPU answer to the
        reference's per-voxel empty-space skipping (rt_core.cuh:36-49)
        in the slab dataflow. None = uncropped.
    """
    Dp = gplanar.shape[1]
    Gz = gplanar.shape[0]           # local slab count (== G unless sharded)
    if crop is not None:
        assert tuple(gplanar.shape[-2:]) == (crop[1], crop[3]), (
            f"payload in-plane shape {gplanar.shape[-2:]} != crop "
            f"{crop}")
    if slab_ids is None:
        slab_ids = tuple(range(Gz))
    if extra is None or np.prod(np.shape(extra)) == 0:
        extra = jnp.zeros((1,), _F32)
    extra = jnp.asarray(extra, _F32).reshape(-1)
    K = max(1, min(k_per_step, Gz))
    while Gz % K:
        K -= 1
    if z_base is None:
        z_base = jnp.asarray(0.0, _F32)
    z_base = jnp.asarray(z_base, _F32)
    params = jnp.asarray(params, _F32)
    assert params.shape[0] >= 30, (
        f"params has {params.shape[0]} entries; the kernel needs the "
        "30-slot layout (see _pack_params — [20:29] dirM, [29] z0_depth)")
    params = jnp.concatenate([params[:30], z_base.reshape(1)])

    acc0 = (jnp.concatenate([
        jnp.zeros((3, gi, gi), _F32), jnp.ones((1, gi, gi), _F32)])
        if acc_init is None else jnp.asarray(acc_init, _F32))
    if not slab_ids:
        return acc0

    # group march-ordered slab ids into K-aligned windows (+ bit masks)
    win_order, win_mask = [], {}
    for sid in slab_ids:
        w = sid // K
        if w not in win_mask:
            win_mask[w] = 0
            win_order.append(w)
        win_mask[w] |= 1 << (sid % K)
    wins = np.asarray(win_order, np.int32)
    masks = np.asarray([win_mask[w] for w in win_order], np.int32)

    stop_thresh = params[15]
    z_lo, z_hi = zbounds[0], zbounds[1]
    valid_pix = z_lo <= z_hi
    zbounds = _zb_planes(params, zbounds, G, gi)

    def live(T, zmin, zmax):
        """Any pixel that can still accumulate within slab-z range
        [zmin, zmax]?"""
        return jnp.any(valid_pix & (T >= stop_thresh)
                       & (z_hi >= zmin) & (z_lo <= zmax))

    # STATIC path: a contiguous window run (the march's window list is a
    # single z-range — always true for dense scenes, and for any scene
    # whose occupied slabs span one interval) marches with static block
    # index maps — Mosaic double-buffers the stream, overlapping each
    # window's HBM fetch with compute; per-window occupancy masks ride in
    # SMEM and gate whole slabs. The prefetched-ids path below (arbitrary
    # window lists) measures DMA + compute additive.
    step = -1 if flip else 1
    use_static = not _FORCE_DYNAMIC and len(wins) > 0
    if use_static:
        # pad interior gaps (fully-empty windows between occupied ones)
        # with zero masks so the run stays contiguous; bail to the dynamic
        # path when the gaps would waste >25% of the stream
        wins_f = np.arange(wins[0], wins[-1] + step, step, np.int32)
        if len(wins_f) <= len(wins) + max(2, len(wins) // 4):
            mask_map = dict(zip(wins.tolist(), masks.tolist()))
            masks_f = np.asarray([mask_map.get(int(w), 0) for w in wins_f],
                                 np.int32)
        else:
            use_static = False
    if use_static:
        wpc = max(1, _CHUNK // K)
        acc = acc0
        for c0 in range(0, len(wins_f), wpc):
            run = wins_f[c0:c0 + wpc]
            mrun = masks_f[c0:c0 + wpc]
            # z coverage of the chunk's OCCUPIED slabs (matches the
            # dynamic path's per-chunk live() ranges)
            sids = np.asarray([w * K + dz for wi, w in enumerate(run)
                               for dz in range(K)
                               if (mrun[wi] >> dz) & 1])
            if sids.size == 0:
                continue
            base = int(run[0])
            full = (1 << K) - 1
            gate = bool(np.any(mrun != full))
            pipe = ((len(run), Dp, gplanar.dtype) if _MANUAL_PIPE
                    else None)
            kern = _make_kernel(G, gi, D, bd, perm, basis_lo, basis_hi,
                                sig2, fmt, depth, rot, K, flip,
                                static_seq=(base, step), gate_slabs=gate,
                                manual_pipe=pipe, bbox_full=bbox_full,
                                shade_bf16=shade_bf16, dir_win=dir_win,
                                crop=crop)
            zvals = (sids + 0.5) / G
            mdev = jnp.asarray(mrun)

            def call(a, kern=kern, mdev=mdev, base=base):
                if _MANUAL_PIPE:
                    return _chunk_call_pipelined(
                        kern, mdev, params, qscale, extra, gplanar,
                        zbounds, a, gi)
                return _chunk_call_static(
                    kern, mdev, params, qscale, extra, gplanar, zbounds,
                    a, G, gi, Dp, K, base, step)

            acc = lax.cond(
                live(acc[3], float(zvals.min()) - 0.5 / G + z_base,
                     float(zvals.max()) + 0.5 / G + z_base),
                call, lambda a: a, acc)
        return acc

    wpc = max(1, _CHUNK // K)                   # windows per chunk
    n_chunks = -(-len(wins) // wpc)
    pad = n_chunks * wpc
    wins_pad = np.full(pad, -1, np.int32)
    wins_pad[:len(wins)] = wins
    masks_pad = np.zeros(pad, np.int32)
    masks_pad[:len(wins)] = masks
    # interleave (wid, mask) pairs: (n_chunks, 2*wpc)
    ids_mat = np.stack([wins_pad, masks_pad], -1).reshape(n_chunks, 2 * wpc)

    # static per-chunk and remaining-suffix z coverage, for dynamic skipping
    wm = wins_pad.reshape(n_chunks, wpc).astype(np.float64)
    zlo_w = np.where(wm >= 0, (wm * K + 0.5) / G, np.nan)
    zhi_w = np.where(wm >= 0, (wm * K + K - 0.5) / G, np.nan)
    with np.errstate(invalid="ignore"):
        empty = np.all(np.isnan(zlo_w), 1)
        czmin = np.where(empty, np.inf, np.nanmin(zlo_w, 1))
        czmax = np.where(empty, -np.inf, np.nanmax(zhi_w, 1))
    rem_zmin = np.minimum.accumulate(czmin[::-1])[::-1]
    rem_zmax = np.maximum.accumulate(czmax[::-1])[::-1]
    czmin_d = jnp.asarray(czmin, _F32)
    czmax_d = jnp.asarray(czmax, _F32)
    rem_zmin_d = jnp.asarray(rem_zmin, _F32)
    rem_zmax_d = jnp.asarray(rem_zmax, _F32)
    ids_dev = jnp.asarray(ids_mat)
    kernel = _make_kernel(
        G, gi, D, bd, perm, basis_lo, basis_hi, sig2, fmt, depth, rot, K,
        flip, gate_slabs=bool(np.any(masks != (1 << K) - 1)),
        bbox_full=bbox_full, shade_bf16=shade_bf16, dir_win=dir_win,
        crop=crop)

    def cond(carry):
        c, acc = carry
        in_range = c < n_chunks
        zmin = rem_zmin_d[jnp.minimum(c, n_chunks - 1)] - 0.5 / G + z_base
        zmax = rem_zmax_d[jnp.minimum(c, n_chunks - 1)] + 0.5 / G + z_base
        return in_range & live(acc[3], zmin, zmax)

    def body(carry):
        c, acc = carry
        hit = live(acc[3], czmin_d[c] - 0.5 / G + z_base,
                   czmax_d[c] + 0.5 / G + z_base)
        acc = lax.cond(
            hit,
            lambda a: _chunk_call(kernel, ids_dev[c], params, qscale,
                                  extra, gplanar, zbounds, a, G, gi, Dp, K),
            lambda a: a,
            acc)
        return c + 1, acc

    _, acc = lax.while_loop(cond, body, (jnp.int32(0), acc0))
    return acc


# ---------------------------------------------------------------------------
# Backward march kernel (training fast path)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(G: int, gi: int, D: int, bd: int,
                     perm: Tuple[int, int, int], basis_lo: int,
                     basis_hi: int, fmt: int,
                     rot: Optional[Tuple[float, ...]], K: int, flip: bool,
                     bbox_full: bool = False, n_win: Optional[int] = None,
                     out_dtype=jnp.float32):
    """Gradient of the slab march w.r.t. the (unquantized, planar) payload.

    Re-marches the slabs in FORWARD order carrying (T, A) in VMEM scratch —
    the same suffix-reconstruction algebra as ops/grad.py and
    slab_grad._march_bwd:

        g_tau_i   = T_i att_i G_i - (Ctot - A_i) - T_end g_T
        g_srgb_i  = g_acc * w_i / sig_w

    then runs the *transposed* warp matmuls (built directly from iotas, no
    relayout) and the shade adjoint (sigmoid' + basis planes) into the
    window's grad block. Every window is visited exactly once, so each
    output block is written wholesale (no collisions, no pre-zeroing pass).
    """
    from volrend_tpu.models.data_format import BasisType
    bt = BasisType(fmt)
    dz_order = range(K - 1, -1, -1) if flip else range(K)

    def kernel(params_ref, qs_ref, extra_ref, slab_ref, zb_ref,
               gacc_ref, aux_ref, out_ref, state_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            # incoming (T, A) state: (1, 0) for a whole-grid march; a
            # z-sharded segment starts from the upstream segments' prefix
            # (aux planes 2/3) — the suffix algebra is otherwise unchanged
            state_ref[0] = aux_ref[2]                    # T
            state_ref[1] = aux_ref[3]                    # A

        # static window sequence (training never culls): static block index
        # maps let Mosaic double-buffer the in/out block streams
        nw = n_win if n_win is not None else G // K
        wid = (nw - 1 - i) if flip else i

        def _slab_bwd(dzi, pre_w, pre_wT, dirp, okb):
            sid = wid * K + dzi
            p = params_ref
            cz = p[0]
            # p[7:14] (sgn, spp, inv_scale) feed _zb_planes / FrameGeom
            # only — the kernel reads dirs from the affine map p[20:29]
            sigma_thresh, stop_thresh = p[14], p[15]

            z = (sid.astype(_F32) + 0.5) / G + p[30]
            s = z - cz
            s0 = z - 0.5 / G - cz
            s1 = z + 0.5 / G - cz

            # ---- forward recompute: shade ----------------------------------
            sigma = slab_ref[dzi, D - 1].astype(_F32) * qs_ref[D - 1]
            ok = sigma > sigma_thresh
            if okb is not None:
                ok = ok & okb
            sigma = jnp.where(ok, sigma, 0.0)

            def make_planes():
                # scale-invariant affine slope->world-dir map (dw = s *
                # true dir; hoisted dirp planes + sign(s) in rnorm — see
                # _shade_pre / the forward kernel)
                dw = [dirp[a] + p[20 + 3 * a] * s for a in range(3)]
                rnorm = lax.rsqrt(dw[0] * dw[0] + dw[1] * dw[1]
                                  + dw[2] * dw[2]) * jnp.sign(s)
                dx, dy, dz = dw[0] * rnorm, dw[1] * rnorm, dw[2] * rnorm
                if rot is not None:
                    dx, dy, dz = (rot[0] * dx + rot[1] * dy + rot[2] * dz,
                                  rot[3] * dx + rot[4] * dy + rot[5] * dz,
                                  rot[6] * dx + rot[7] * dy + rot[8] * dz)
                if bt == BasisType.SH:
                    return _sh_planes(bd, dx, dy, dz)
                if bt == BasisType.SG:
                    return ((k, jnp.exp(extra_ref[4 * k] * (
                        extra_ref[4 * k + 1] * dx
                        + extra_ref[4 * k + 2] * dy
                        + extra_ref[4 * k + 3] * dz - 1.0)) / bd)
                        for k in range(bd))
                if bt == BasisType.ASG:
                    def _asg():
                        for k in range(bd):
                            e = [extra_ref[11 * k + t] for t in range(11)]
                            dotx = e[2] * dx + e[3] * dy + e[4] * dz
                            doty = e[5] * dx + e[6] * dy + e[7] * dz
                            S = e[8] * dx + e[9] * dy + e[10] * dz
                            yield k, S * jnp.exp(
                                -e[0] * dotx * dotx
                                - e[1] * doty * doty) / bd
                    return _asg()
                raise NotImplementedError(f"basis {bt}")

            if bd < 0:
                # RGBA payload: raw colors, no basis
                rgb = [slab_ref[dzi, c].astype(_F32) * qs_ref[c]
                       for c in range(3)]
            else:
                raw = [jnp.zeros((G, G), _F32) for _ in range(3)]
                for k, bk in make_planes():
                    if k < basis_lo or k > basis_hi:
                        continue
                    for c in range(3):
                        raw[c] = raw[c] + (
                            slab_ref[dzi, c * bd + k].astype(_F32)
                            * qs_ref[c * bd + k]) * bk
                rgb = [jax.nn.sigmoid(r) for r in raw]
            srgb = [sigma * r for r in rgb]

            # ---- forward recompute: warp + composite inputs ----------------
            ohr, ohct = _overlap_mats(pre_w, s0, s1)
            stack = jnp.concatenate([sigma] + srgb, axis=0).astype(_BF16)
            w1 = jnp.dot(stack, ohct, preferred_element_type=_F32)
            w1 = w1.astype(_BF16)
            sig_w = jnp.dot(ohr, w1[:G], preferred_element_type=_F32)
            srgb_w = [jnp.dot(ohr, w1[(c + 1) * G:(c + 2) * G],
                              preferred_element_type=_F32)
                      for c in range(3)]

            zlo = zb_ref[0]
            zhi = zb_ref[1]
            hG = 0.5 / G
            frac = jnp.clip((jnp.minimum(z + hG, zhi)
                             - jnp.maximum(z - hG, zlo)) * G, 0.0, 1.0)
            dt_pix = zb_ref[2] * frac   # per-frame plane * boundary frac
            tau_w = sig_w * dt_pix
            att = jnp.exp(-tau_w)
            sig_inv = 1.0 / jnp.maximum(sig_w, 1e-12)

            T = state_ref[0]
            A = state_ref[1]
            m = (T >= stop_thresh) & (tau_w > 0.0)
            w = jnp.where(m, T * (1.0 - att), 0.0)

            # ---- pixel-space gradients (suffix algebra) --------------------
            rgb_w = [srgb_w[c] * sig_inv for c in range(3)]
            G_pix = (gacc_ref[0] * rgb_w[0] + gacc_ref[1] * rgb_w[1]
                     + gacc_ref[2] * rgb_w[2])
            A = A + w * G_pix
            ctot = aux_ref[0]
            gT_term = aux_ref[1]
            g_tau = jnp.where(m, T * att * G_pix - (ctot - A) - gT_term,
                              0.0)
            # rgb_w = srgb_w / max(sig_w, eps): quotient-rule split
            g_srgb_w = [gacc_ref[c] * w * sig_inv for c in range(3)]
            sum_term = (gacc_ref[0] * w * srgb_w[0]
                        + gacc_ref[1] * w * srgb_w[1]
                        + gacc_ref[2] * w * srgb_w[2])
            g_sig_w = g_tau * dt_pix - jnp.where(
                sig_w >= 1e-12, sum_term * sig_inv * sig_inv, 0.0)

            state_ref[0] = jnp.where(m, T * att, T)
            state_ref[1] = A

            # ---- adjoint warp (transposed matmuls) -------------------------
            ohrT, ohctT = _overlap_mats(pre_wT, s0, s1)
            gch = [g_sig_w] + g_srgb_w
            g_w1 = jnp.concatenate(
                [jnp.dot(ohrT, gc.astype(_BF16),
                         preferred_element_type=_F32).astype(_BF16)
                 for gc in gch], axis=0)                 # (4G, gi)
            g_stack = jnp.dot(g_w1, ohctT,
                              preferred_element_type=_F32)  # (4G, G)

            # ---- shade adjoint --------------------------------------------
            g_sigma = g_stack[:G]
            g_srgb_vox = [g_stack[(c + 1) * G:(c + 2) * G]
                          for c in range(3)]
            for c in range(3):
                g_sigma = g_sigma + g_srgb_vox[c] * rgb[c]
            g_sigma = jnp.where(ok, g_sigma, 0.0)
            out_ref[dzi, D - 1] = (g_sigma * qs_ref[D - 1]
                                   ).astype(out_dtype)

            if bd < 0:
                for c in range(3):
                    out_ref[dzi, c] = (g_srgb_vox[c] * sigma * qs_ref[c]
                                       ).astype(out_dtype)
            else:
                g_raw = [g_srgb_vox[c] * sigma * rgb[c] * (1.0 - rgb[c])
                         for c in range(3)]
                zero = jnp.zeros((G, G), out_dtype)
                for k, bk in make_planes():
                    for c in range(3):
                        if k < basis_lo or k > basis_hi:
                            out_ref[dzi, c * bd + k] = zero
                        else:
                            out_ref[dzi, c * bd + k] = (
                                g_raw[c] * bk * qs_ref[c * bd + k]
                            ).astype(out_dtype)
                # any trailing payload planes beyond 3*bd+1 stay untouched
                # only when D == Dp; the wrapper asserts D == block Dp

        # per-window liveness (mirrors _make_kernel): where every ray has
        # saturated or the window's z range misses every ray's [zlo, zhi]
        # interval, every gradient term is masked to zero (w = 0,
        # m = False) — zero-fill the window's grad block and skip its
        # ~(4 + 3bd)-plane adjoint
        live = _window_live(state_ref[0], zb_ref, params_ref[15], wid, K, G,
                            z_off=params_ref[30])

        @pl.when(live)
        def _live_window():
            # slab-invariant planes (see _make_kernel): warp scaffolding
            # for both the forward-recompute and the adjoint (transposed)
            # matmuls, plus the shade offsets/bbox mask — built once per
            # live window, skipped entirely for dead ones
            pre_w = _warp_pre(params_ref, G, gi)
            pre_wT = _warp_pre(params_ref, G, gi, transposed=True)
            dirp, okb = _shade_pre(params_ref, G, bbox_full)
            for dzi in dz_order:
                _slab_bwd(dzi, pre_w, pre_wT, dirp, okb)

        @pl.when(jnp.logical_not(live))
        def _dead_window():
            out_ref[...] = jnp.zeros_like(out_ref)

    return kernel


@partial(jax.jit, static_argnames=("G", "gi", "D", "bd", "perm",
                                   "basis_lo", "basis_hi", "fmt", "rot",
                                   "flip", "k_per_step", "bbox_full",
                                   "out_dtype"))
def march_slabs_bwd(gplanar, params, qscale, zbounds, gacc4, acc4,
                    G: int, gi: int, D: int, bd: int,
                    perm: Tuple[int, int, int],
                    basis_lo: int = 0, basis_hi: int = 24,
                    extra=None, fmt: int = 1,
                    rot: Optional[Tuple[float, ...]] = None,
                    flip: bool = False,
                    k_per_step: Optional[int] = None,
                    bbox_full: bool = False,
                    z_base=None, state_init=None, out_dtype=jnp.float32):
    """Payload-cotangent of ``march_slabs`` (training fast path).

    gplanar: (Gz, D, G, G) channel-planar bf16 payload — the same array the
        forward marched (unquantized; training bakes from trainable leaves;
        Gz < G for a z-SHARDED segment).
    gacc4: (4, gi, gi) upstream cotangent [g_r, g_g, g_b, g_T].
    acc4: (4, gi, gi) the GLOBAL forward output (residual — for a sharded
        march, the combined frame, not the local segment).
    z_base: traced scalar — global z of the payload's first slab.
    state_init: optional (2, gi, gi) incoming (T, A) suffix state — the
        upstream segments' transmittance prefix and accumulated
        sum_{j<seg} w_j*G_j (see slab_grad for how both derive from the
        forward partials). None = (1, 0) (whole-grid march).
    Returns (Gz, D, G, G) float32 payload gradient. Marches ALL slabs in
    forward order (training mode never culls — a culled slab could never
    regrow density), writing each K-window's grad block exactly once.
    """
    Dp = gplanar.shape[1]
    Gz = gplanar.shape[0]
    assert Dp == D, "backward kernel requires an unquantized payload"
    if extra is None or np.prod(np.shape(extra)) == 0:
        extra = jnp.zeros((1,), _F32)
    extra = jnp.asarray(extra, _F32).reshape(-1)
    if z_base is None:
        z_base = jnp.asarray(0.0, _F32)
    params = jnp.concatenate([jnp.asarray(params, _F32)[:30],
                              jnp.asarray(z_base, _F32).reshape(1)])

    if k_per_step is None:
        # in-block (bf16) + out-block (f32) double-buffered must fit VMEM
        per_slab = Dp * G * G * (2 + 4) * 2
        k_per_step = 1
        for k in (8, 4, 2):
            if Gz % k == 0 and k * per_slab <= 80 * 2 ** 20:
                k_per_step = k
                break
    K = max(1, min(k_per_step, Gz))
    while Gz % K:
        K -= 1

    ctot = jnp.sum(gacc4[:3] * acc4[:3], axis=0)
    gT_term = gacc4[3] * acc4[3]
    if state_init is None:
        state_init = jnp.concatenate([jnp.ones((1, gi, gi), _F32),
                                      jnp.zeros((1, gi, gi), _F32)])
    aux = jnp.concatenate([ctot[None], gT_term[None],
                           jnp.asarray(state_init, _F32)])
    zbounds = _zb_planes(params, zbounds, G, gi)

    nwin = Gz // K
    widx = ((lambda i: (nwin - 1 - i, 0, 0, 0)) if flip
            else (lambda i: (i, 0, 0, 0)))

    kernel = _make_bwd_kernel(G, gi, D, bd, perm, basis_lo, basis_hi,
                              fmt, rot, K, flip, bbox_full=bbox_full,
                              n_win=nwin, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nwin,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, Dp, G, G), widx),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, Dp, G, G), widx),
        scratch_shapes=[pltpu.VMEM((2, gi, gi), _F32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gz, Dp, G, G), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_FORCE_INTERPRET,
    )(params, qscale, extra, gplanar, zbounds,
      gacc4.astype(_F32), aux)
