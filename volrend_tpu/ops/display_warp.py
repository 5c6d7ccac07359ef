"""Superquad display warp: the fast projective screen resample.

The display path's final step warps the (gi, gi, 4) intermediate slope-grid
image to the (H, W, 4) screen with a projective bilinear resample
(slab_render._warp_to_screen). Profiling the reference path in situ
(24-pose lax.map, jax.profiler) shows ~1.8 ms/frame at 800^2/gi=448 on
v5e: a 640k-row quad gather (~1.2 ms — XLA gathers are row-rate bound at
~450-530 Mrow/s regardless of row width, tools/perf_rows.py) plus layout
copies. This module rebuilds the warp around three measured facts:

1. **Up to 16x fewer gather rows**: gather one row per (By, Bx) SCREEN
   pixel block — the row packs a (Wy, Wx) intermediate-cell window
   covering every subpixel's bilinear footprint (4*Wy*Wx channels).
   Block and window are PARAMETRIC; the r5 production cascade is the
   (4,4) block with a 5x5 window (100-byte int8 rows, 40k rows at
   800^2 — the r4 "4-px x-footprint ceiling" was a window-width limit,
   and one extra window column/row makes ALL bench poses fit; see
   _CASCADE + docs/ARCHITECTURE.md ledger). Per-pose misfit gates
   cascade to smaller blocks and finally the reference warp.
2. **The row table must be built without XLA minor-dim concats** (those
   cost ~1.5 ms/frame of 20x-roofline copies; a one-hot conv lowers to a
   kLoop fusion at ~1.3 ms — both measured, tools/perf_sq4.py). Instead a
   Pallas kernel emits the 64 shifted planes in PLANAR layout (one
   dynamic row-block load per color, static subslices — Mosaic crashes
   on >1 distinct dynamic offset per ref and on lane-dim stacks), and the
   planar->row-major transpose FOLDS INTO THE GATHER for free (measured:
   transpose+gather == gather alone). Build+transpose+gather: 0.39
   ms/frame.
3. **The final (H, W, 4) interleave must not round-trip XLA transposes**
   (0.9 ms/frame of layout copies measured). The tent-combine Pallas
   kernel emits the interleaved screen rows directly: lane placement of
   (x-subpixel, channel) via one-hot bf16 matmuls on the MXU (lane-dim
   broadcast+reshape crashes Mosaic; one-hot dot compiles), row
   placement via sublane broadcast+reshape + parity select.

Numerics: the table and the emit matmuls are bfloat16 (Mosaic has no
f16), a display ulp coarser than the f16 quad table (2^-8 vs 2^-11 on
[0,1] display-range values, under the 1/255 display quantum). Tent
weights reproduce 2-D bilinear EXACTLY while both taps land inside the
4x4 window. Projective stretch pushes a handful of image-edge quads past
the window at realistic poses (~3e-5 of an 800^2 bench frame); those
clamp to the window edge (invisible). A pose that misfits in bulk
(> 0.1% of quads: wide-FOV/grazing geometry) takes a per-pose lax.cond
to the reference quad-gather warp instead.

The exact-semantics reference stays slab_render._warp_to_screen_ref (the
training path and CPU fall back to it); parity is gated in
tests/test_slab_render.py::test_superquad_warp_matches_reference.

Reference function replaced: the display half of the CUDA composite
write-out (volrend.cu:152-172) — the reference renders directly in screen
space so it has no warp; this is the shear-warp factorization's final
resample.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from volrend_tpu.utils.options import RenderOptions

_F32 = jnp.float32

#: intermediate-row block per build-kernel grid step
_BH_BUILD = 16
#: half-res screen-row block per combine-kernel grid step (M dim of the
#: emit matmuls). 200 measured equal within run noise at bench scale but
#: OOMs Mosaic's 100 MB scoped VMEM in some pose-group compiles; 100
#: (M pads 80->128) is safe
_BH_COMBINE = 100
#: f32-exact emit via bf16 hi/lo double-dot. The DISPLAY default is False
#: (single hi dot): one extra bf16 ulp costs 1.0 dB at bench settings
#: (55.35 -> 54.32 dB vs exact, still grid-dominated) and buys 6.7%
#: frame rate (2.22 -> 2.08 ms/frame at 800^2/gi=256, tools/perf_r10.py).
#: The precise/training path always forces exact=True.
_EXACT_EMIT = False
#: display-path window-table dtype: int8, AFFINE fixed point over the full
#: [-128,127] range (q = round(v*255) - 128; dequant v = q/255 + 128/255 —
#: the tent weights sum to exactly 1 over the 4x4 window, so the zero
#: point is a constant post-accumulation add). Max error 0.5/255 = half a
#: display quantum (~58.9 dB quantization floor — the r3 table only used
#: [0,127], wasting the sign bit and capping PSNR near 53 dB, measured
#: 51.67 on the r4 bench). Halves the gathered-table bytes and the one
#: XLA relayout the path still pays (the gather-output planarize feeding
#: the combine kernel: 20 MB bf16 = 0.096 ms/frame of copy.76 at 800^2,
#: profiled tools/perf_r8/r11). The precise/training path always builds
#: f32 tables (make_warp_precise) and is unaffected.
_TABLE_INT8 = True


def _block2d(block) -> Tuple[int, int]:
    """Normalize a block spec to (By, Bx): ints are square blocks."""
    if isinstance(block, tuple):
        return int(block[0]), int(block[1])
    return int(block), int(block)


def usable(width: int, height: int, gi: int, block=2, win=(4, 4)) -> bool:
    """Static gate: the superquad path needs block-divisible screen dims, a
    window margin in the intermediate grid, and sub-cell-per-pixel motion
    (see module docstring). ``block`` is an int (square) or (By, Bx);
    ``win`` the (Wy, Wx) gather window."""
    from volrend_tpu.ops import pallas_slab
    by, bx = _block2d(block)
    wy, wx = _win2d(win)
    return (width % bx == 0 and height % by == 0 and gi >= 8
            and gi >= 2 * max(wy, wx)
            and gi <= min(width, height) and pallas_slab.available())


def _chan(cy: int, cx: int, c: int, win: Tuple[int, int] = (4, 4)) -> int:
    """Packed-table channel of window cell (cy, cx) in [0,Wy)x[0,Wx),
    color c. Row-major over (cy, cx) with the 4 colors minor."""
    return (cy * win[1] + cx) * 4 + c


def _win2d(win) -> Tuple[int, int]:
    """Normalize a window spec to (Wy, Wx)."""
    if isinstance(win, tuple):
        return int(win[0]), int(win[1])
    return int(win), int(win)


def _interpret() -> bool:
    from volrend_tpu.ops import pallas_slab
    return pallas_slab._FORCE_INTERPRET


# ---------------------------------------------------------------------------
# table build: planar shifted planes (Pallas) + transpose folded into gather
# ---------------------------------------------------------------------------

def _make_build(gi: int, dtype=jnp.bfloat16, win: Tuple[int, int] = (4, 4)):
    """Kernel emitting all 4*Wy*Wx window-table channels in planar
    (C, rows, gi-Wx+1) layout in ONE call. One dynamic row-block load per
    color plane, static shifted subslices after (Mosaic compiles exactly
    this shape of the problem — see module docstring). The r3 version
    split the channels over 4 calls; the merge removes 3 dispatches and
    the XLA concat materialization between them."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    Wy, Wx = _win2d(win)
    C = 4 * Wy * Wx
    H3, W3 = gi - Wy + 1, gi - Wx + 1
    # int8 VMEM tiling is (32, 128): the dynamic sublane offset i*BH and
    # the output block's second-minor dim must stay tile-aligned
    BH = 32 if dtype == jnp.int8 else _BH_BUILD
    nb = -(-H3 // BH)

    def kernel(it_ref, out_ref):
        i = pl.program_id(0)
        blk = [it_ref[c, pl.ds(i * BH, BH + Wy - 1), :] for c in range(4)]
        for k in range(C):
            cy, cx, c = k // (4 * Wx), (k // 4) % Wx, k % 4
            out_ref[k] = blk[c][cy:cy + BH, cx:cx + W3]

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((4, nb * BH + Wy - 1, gi),
                               lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((C, BH, W3), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((C, nb * BH, W3), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    ), nb * BH


def _build_table(inter, gi: int, dtype=jnp.bfloat16, planar: bool = False,
                 win: Tuple[int, int] = (4, 4)):
    """(gi, gi, 4) f32 -> ((gi-Wy+1)*(gi-Wx+1), 4*Wy*Wx) window-row table
    (as the free transpose of the planar Pallas build). int8 (affine
    fixed point, see _TABLE_INT8) on the display path, f32 on the precise
    (training) path. planar=True: ``inter`` is already channel-planar
    (4, gi, gi) — the march kernel's native emit layout — skipping the
    XLA relayout."""
    Wy, Wx = _win2d(win)
    C = 4 * Wy * Wx
    H3, W3 = gi - Wy + 1, gi - Wx + 1
    itp = inter if planar else jnp.transpose(inter, (2, 0, 1))
    if dtype == jnp.int8:
        # affine fixed point: q = round(v*255) - 128 (see _TABLE_INT8)
        itp = (jnp.round(jnp.clip(itp, 0.0, 1.0) * 255.0) - 128.0
               ).astype(jnp.int8)
    else:
        itp = itp.astype(dtype)
    call, Hp = _make_build(gi, dtype, win=(Wy, Wx))
    itp = jnp.pad(itp, ((0, 0), (0, Hp + Wy - 1 - gi), (0, 0)))
    # PARKED (r5, measured): keeping the build kernel's pad rows IN the
    # table makes this reshape a free bitcast (the [:, :H3] slice shows
    # as a 6.35 MB reshape+copy pair in the HLO, ~0.08 ms/frame), but
    # the on-chip bench measured a WASH (347.8 vs 350.9 Mrays/s — XLA
    # re-materializes the transposed gather layout over the larger table
    # either way). Keep the sliced exact-size table.
    tblp = call(itp)[:, :H3].reshape(C, H3 * W3)
    return jnp.transpose(tblp, (1, 0))


# ---------------------------------------------------------------------------
# tent combine + interleaved screen emit (Pallas)
# ---------------------------------------------------------------------------

_EMIT_CACHE: dict = {}


def _emit_mats(Wh: int, B: int = 2) -> np.ndarray:
    """(4*B, Wh, 4*B*Wh) one-hot lane-placement matrices: E[q*4+c, w, L] = 1
    iff L = (B*w+q)*4 + c — the dot plane_qc @ E[q*4+c] scatters subpixel
    q's channel c into its interleaved screen lanes."""
    key = (B, Wh)
    if key not in _EMIT_CACHE:
        E = np.zeros((4 * B, Wh, 4 * B * Wh), np.float32)
        w = np.arange(Wh)
        for q in range(B):
            for c in range(4):
                E[q * 4 + c, w, (B * w + q) * 4 + c] = 1.0
        _EMIT_CACHE[key] = E
    return _EMIT_CACHE[key]


def _make_combine_kernel(BH: int, Wh: int, bg: float,
                         has_mesh: bool = False, B=2,
                         exact: bool = True, qscale: float = 1.0,
                         qshift: float = 0.0, out_dtype=jnp.float32,
                         win: Tuple[int, int] = (4, 4)):
    By, Bx = _block2d(B)
    Wy, Wx = _win2d(win)
    C = 4 * Wy * Wx
    W4 = 4 * Bx * Wh

    def kernel(qg_ref, ry_ref, rx_ref, ok_ref, e_ref, *rest):
        if has_mesh:
            mp_ref, out_ref = rest
        else:
            out_ref, = rest
        ri = jax.lax.broadcasted_iota(jnp.int32, (By * BH, W4), 0)
        out = jnp.zeros((By * BH, W4), jnp.float32)
        # dequant each window channel ONCE per grid step (every plane is
        # read by all By*Bx subpixels; converting inside the subpixel loop
        # cost By*Bx x C converts instead of C — ~0.03 ms/frame of VPU)
        qgf = [qg_ref[ch].astype(jnp.float32) for ch in range(C)]
        for p in range(By):
            half = jnp.zeros((BH, W4), jnp.float32)
            for q in range(Bx):
                s = p * Bx + q
                # clamp to the window: identity for in-window taps; a
                # rare misfit quad (projective stretch past the window,
                # image edges) snaps to the window-edge cell, not losing
                # mass
                ryv = jnp.clip(ry_ref[s], 0.0, Wy - 1.0)
                rxv = jnp.clip(rx_ref[s], 0.0, Wx - 1.0)
                wy = [jnp.maximum(0.0, 1.0 - jnp.abs(ryv - cy))
                      for cy in range(Wy)]
                wx = [jnp.maximum(0.0, 1.0 - jnp.abs(rxv - cx))
                      for cx in range(Wx)]
                # tent-product planes shared by the 4 channels (hoisting
                # saves 3x Wy*Wx plane muls per subpixel; same algebra)
                wyx = [wy[cy] * wx[cx] for cy in range(Wy)
                       for cx in range(Wx)]
                ok = ok_ref[s]
                rgba = []
                for c in range(4):
                    acc = jnp.zeros((BH, Wh), jnp.float32)
                    for cy in range(Wy):
                        for cx in range(Wx):
                            acc = acc + wyx[cy * Wx + cx] * qgf[
                                _chan(cy, cx, c, (Wy, Wx))]
                    # affine int8 table dequant: the tent weights sum to
                    # exactly 1 over the window, so the zero point is a
                    # constant post-accumulation add (see _TABLE_INT8)
                    if qscale != 1.0 or qshift != 0.0:
                        acc = acc * qscale + qshift
                    rgba.append(acc)
                alpha = rgba[3]
                if has_mesh:
                    # per-pixel background = mesh color where the mesh
                    # pass hit; alpha forced 1 on mesh pixels
                    # (volrend.cu:152-163 / render_jax tmax_bg contract)
                    hit = mp_ref[s * 4 + 3]
                for c in range(4):
                    if c == 3:
                        plane = jnp.where(ok > 0.5, alpha, 0.0)
                        if has_mesh:
                            plane = jnp.where(hit > 0.5, 1.0, plane)
                    else:
                        if has_mesh:
                            bgc = jnp.where(hit > 0.5, mp_ref[s * 4 + c],
                                            bg)
                        else:
                            bgc = bg
                        plane = jnp.where(
                            ok > 0.5, rgba[c] + bgc * (1.0 - alpha), bgc)
                    # one-hot placement dot (the MXU is bf16). exact:
                    # bf16 hi/lo split — two passes reconstruct the f32
                    # plane, leaving only the bf16 table's rounding (one
                    # display ulp; the precise/training path requires
                    # this). Display default: hi only — one more bf16
                    # ulp, half the emit MXU work (see _EXACT_EMIT).
                    hi = plane.astype(jnp.bfloat16)
                    parts = (hi,)
                    if exact:
                        parts = (hi, (plane - hi.astype(jnp.float32))
                                 .astype(jnp.bfloat16))
                    for part in parts:
                        half = half + jax.lax.dot_general(
                            part, e_ref[q * 4 + c],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            # row interleave: sublane expand xBy + parity select
            repB = jnp.broadcast_to(
                half[:, None, :], (BH, By, W4)).reshape(By * BH, W4)
            out = jnp.where((ri % By) == p, repB, out)
        if out_dtype == jnp.uint8:
            # RGBA8 display write-out (the reference's surf2Dwrite RGBA8,
            # volrend.cu:166-172; rounds+clamps and keeps computed alpha
            # where the reference truncates and forces alpha=255 — see
            # to_display_dtype for the deliberate fidelity difference).
            # Mosaic cannot lower a f32->uint8 cast in-kernel (r3 bench
            # crash, BENCH_r03.json): emit the rounded display values as
            # f32 and convert to uint8 in XLA right after the pallas_call
            # (_combine_emit).
            out_ref[...] = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0)
        else:
            out_ref[...] = out.astype(out_dtype)

    return kernel


def _combine_emit(qgp, ry, rx, okm, Hh: int, Wh: int, bg: float,
                  mesh_planes=None, B=2,
                  exact: Optional[bool] = None, qscale: float = 1.0,
                  qshift: float = 0.0, out_dtype=jnp.float32,
                  win: Tuple[int, int] = (4, 4)):
    """(4*Wy*Wx, Hh, Wh) gathered window planes + per-subpixel positions
    -> (By*Hh, 4*Bx*Wh) f32 interleaved screen rows (reshape to
    (H, W, 4)). mesh_planes: optional (4*By*Bx, Hh, Wh) subpixel-split
    mesh buffers [s*4 + (r, g, b, hit)] for per-pixel background
    compositing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    By, Bx = _block2d(B)
    Wy, Wx = _win2d(win)
    C = 4 * Wy * Wx
    # Mosaic block rule: second-minor block dim must be a multiple of 8
    # or the full dimension; keep M near 128 for the emit matmuls
    cands = [b for b in range(8, min(_BH_COMBINE, Hh) + 1, 8)
             if Hh % b == 0]
    BH = max(cands) if cands else Hh
    W4 = 4 * Bx * Wh
    if exact is None:
        exact = _EXACT_EMIT
    E = jnp.asarray(_emit_mats(Wh, Bx), jnp.bfloat16)
    kern = _make_combine_kernel(BH, Wh, bg,
                                has_mesh=mesh_planes is not None, B=(By, Bx),
                                exact=exact, qscale=qscale, qshift=qshift,
                                out_dtype=out_dtype, win=(Wy, Wx))
    # Mosaic cannot cast f32->uint8 in-kernel: the kernel emits rounded
    # f32 display values; the uint8 convert happens here in XLA.
    kdtype = jnp.float32 if out_dtype == jnp.uint8 else out_dtype
    blk = lambda n: pl.BlockSpec((n, BH, Wh), lambda i: (0, i, 0))
    in_specs = [blk(C), blk(By * Bx), blk(By * Bx), blk(By * Bx),
                pl.BlockSpec((4 * Bx, Wh, W4), lambda i: (0, 0, 0))]
    args = [qgp, ry, rx, okm, E]
    if mesh_planes is not None:
        in_specs.append(blk(4 * By * Bx))
        args.append(mesh_planes)
    out = pl.pallas_call(
        kern,
        grid=(Hh // BH,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((By * BH, W4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((By * Hh, W4), kdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    if out_dtype == jnp.uint8:
        out = out.astype(jnp.uint8)
    return out


def _pixel_slopes(R, fx, fy, width: int, height: int, gi: int,
                  perm: Tuple[int, int, int], u0, du, v0, dv, scale,
                  ndc=None, origin=None):
    """Full-resolution (H, W) slope-grid coordinates of every screen
    pixel — computed ONCE per frame; every superquad block size's
    subpixel geometry and fit predicate are strided views/reductions of
    these two planes (the r4 code recomputed them per cascade level,
    eagerly, ~0.05 ms/frame/level of wasted XLA work at 800^2)."""
    from volrend_tpu.ops.slab_render import _slopes_from_dirs
    if ndc is None:
        # world-space pinhole: the pixel->slope map is a homography, so
        # the three permuted tree-dir components are LINEAR forms of the
        # pixel coordinates — evaluate them as fused broadcasts (one XLA
        # fusion, no (...,3) stacks / einsum materializations: those cost
        # ~0.1 ms/frame of copies at 800^2, profiled tools/perf_r8 r4)
        sc = jnp.broadcast_to(jnp.asarray(scale, _F32), (3,))
        xs = ((jnp.arange(width, dtype=_F32) - 0.5 * width)
              / fx)[None, :]                        # (1, W)
        ys = (-(jnp.arange(height, dtype=_F32) - 0.5 * height)
              / fy)[:, None]                        # (H, 1)

        def lin(k):
            # d_tree[perm[k]] = scale_k * (xs*R[k,0] + ys*R[k,1] - R[k,2])
            a = R[perm[k]] * sc[perm[k]]
            return xs * a[0] + ys * a[1] - a[2]

        den, nu, nv = lin(0), lin(1), lin(2)
        # same safe-divide guard as _slopes_from_dirs
        inv = 1.0 / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        gy = (nu * inv - u0) / du                   # (H, W)
        gx = (nv * inv - v0) / dv
    else:
        # NDC warp of dirs is origin-dependent — keep the general path
        xs = (jnp.arange(width, dtype=_F32) - 0.5 * width) / fx
        ys = -(jnp.arange(height, dtype=_F32) - 0.5 * height) / fy
        d_cam = jnp.stack([
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            -jnp.ones((height, width), _F32)], -1)
        d_world = jnp.einsum("hwc,kc->hwk", d_cam, R)
        from volrend_tpu.ops.render_jax import world2ndc
        ndir, _ = world2ndc(
            ndc, d_world, jnp.broadcast_to(origin, d_world.shape))
        d_tree = ndir * scale
        us, vs = _slopes_from_dirs(d_tree, perm)
        gy = (us - u0) / du
        gx = (vs - v0) / dv
    return gy, gx


def _block_extents(gyf, gxf, gi: int, B):
    """Per-block masked tap extents from the full-res slope planes.

    Returns (ymin, ymax, xmin, xmax, any_in): (Hh, Wh) reductions over
    each block's IN-GRID subpixels (at the image border a clipped
    off-grid subpixel must not drag the shared window away from its
    in-grid block-mates)."""
    By, Bx = _block2d(B)
    H, W = gyf.shape
    Hh, Wh = H // By, W // Bx
    gyb = gyf.reshape(Hh, By, Wh, Bx)
    gxb = gxf.reshape(Hh, By, Wh, Bx)
    ok = ((gyb >= 0) & (gyb <= gi - 1) & (gxb >= 0) & (gxb <= gi - 1))
    gybc = jnp.clip(gyb, 0.0, gi - 1 - 1e-6)
    gxbc = jnp.clip(gxb, 0.0, gi - 1 - 1e-6)
    big = _F32(1e9)
    any_in = jnp.any(ok, (1, 3))
    ymin = jnp.where(any_in,
                     jnp.min(jnp.where(ok, gybc, big), (1, 3)), 0.0)
    ymax = jnp.where(any_in,
                     jnp.max(jnp.where(ok, gybc, -big), (1, 3)), 0.0)
    xmin = jnp.where(any_in,
                     jnp.min(jnp.where(ok, gxbc, big), (1, 3)), 0.0)
    xmax = jnp.where(any_in,
                     jnp.max(jnp.where(ok, gxbc, -big), (1, 3)), 0.0)
    return ymin, ymax, xmin, xmax, any_in


def _level_fits(gyf, gxf, gi: int, B, win=(4, 4)):
    """Whole-frame bulk-misfit predicate for one (block, window) level
    (cheap eager reductions; the big per-subpixel arrays are only built
    inside the taken cond branch — _level_geometry)."""
    Wy, Wx = _win2d(win)
    ymin, ymax, xmin, xmax, _ = _block_extents(gyf, gxf, gi, B)
    misfit = ((ymax >= jnp.floor(ymin) + (Wy - 1.0))
              | (xmax >= jnp.floor(xmin) + (Wx - 1.0)))
    return jnp.mean(misfit.astype(_F32)) < 1e-3


def _sub_slopes(R, fx, fy, width: int, height: int, gi: int,
                perm: Tuple[int, int, int], u0, du, v0, dv, scale,
                ndc=None, origin=None, B=2):
    """Per-subpixel slope-grid coordinates in (By*Bx, Hh, Wh) layout,
    computed DIRECTLY as fused broadcasts (the r4 formulation). Strided
    views of the full-res planes cost XLA transpose copies (~0.4-0.7
    ms/frame at 800^2, the r5 bench regression); these broadcasts fuse
    into one elementwise kernel with no relayout."""
    from volrend_tpu.ops.slab_render import _slopes_from_dirs
    By, Bx = _block2d(B)
    Hh, Wh = height // By, width // Bx

    if ndc is None:
        sc = jnp.broadcast_to(jnp.asarray(scale, _F32), (3,))
        po, qo = np.mgrid[0:By, 0:Bx].reshape(2, -1).astype(np.float32)
        xs = ((jnp.arange(Wh, dtype=_F32)[None, :] * Bx
               + jnp.asarray(qo)[:, None] - 0.5 * width)
              / fx)[:, None, :]                     # (By*Bx, 1, Wh)
        ys = (-(jnp.arange(Hh, dtype=_F32)[None, :] * By
                + jnp.asarray(po)[:, None] - 0.5 * height)
              / fy)[:, :, None]                     # (By*Bx, Hh, 1)

        def lin(k):
            a = R[perm[k]] * sc[perm[k]]
            return xs * a[0] + ys * a[1] - a[2]

        den, nu, nv = lin(0), lin(1), lin(2)
        inv = 1.0 / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        gy = (nu * inv - u0) / du                   # (By*Bx, Hh, Wh)
        gx = (nv * inv - v0) / dv
    else:
        # NDC warp of dirs is origin-dependent — general per-subpixel path
        def sub(p: int, q: int):
            xs = (jnp.arange(Wh, dtype=_F32) * Bx + q - 0.5 * width) / fx
            ys = -(jnp.arange(Hh, dtype=_F32) * By + p - 0.5 * height) / fy
            d_cam = jnp.stack([
                jnp.broadcast_to(xs[None, :], (Hh, Wh)),
                jnp.broadcast_to(ys[:, None], (Hh, Wh)),
                -jnp.ones((Hh, Wh), _F32)], -1)
            d_world = jnp.einsum("hwc,kc->hwk", d_cam, R)
            from volrend_tpu.ops.render_jax import world2ndc
            ndir, _ = world2ndc(
                ndc, d_world, jnp.broadcast_to(origin, d_world.shape))
            d_tree = ndir * scale
            us, vs = _slopes_from_dirs(d_tree, perm)
            return (us - u0) / du, (vs - v0) / dv

        subs = [sub(p, q) for p in range(By) for q in range(Bx)]
        gy = jnp.stack([s[0] for s in subs])
        gx = jnp.stack([s[1] for s in subs])
    return gy, gx


def _level_geometry(geom_args, gi: int, B, win=(4, 4)):
    """Per-subpixel positions/masks + shared window corners for one
    (block, window) level, computed from scalars inside the taken cond
    branch (geom_args = the _sub_slopes arguments).

    Returns (gys, gxs, okm, Y0, X0): (By*Bx, Hh, Wh) clipped subpixel
    positions / ok masks and (Hh, Wh) int32 window corners."""
    Wy, Wx = _win2d(win)
    gy, gx = _sub_slopes(*geom_args, B=B)
    ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
    gys = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
    gxs = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
    okm = ok.astype(_F32)
    # window corner from the OK subpixels only: at the image border a
    # clipped off-grid subpixel would otherwise drag the shared window
    # away from its in-grid block-mates
    big = _F32(1e9)
    inb = okm > 0.5
    any_in = jnp.any(inb, 0)
    ymin = jnp.where(any_in, jnp.min(jnp.where(inb, gys, big), 0), 0.0)
    xmin = jnp.where(any_in, jnp.min(jnp.where(inb, gxs, big), 0), 0.0)
    Y0 = jnp.clip(jnp.floor(ymin).astype(jnp.int32), 0, gi - Wy)
    X0 = jnp.clip(jnp.floor(xmin).astype(jnp.int32), 0, gi - Wx)
    return gys, gxs, okm, Y0, X0


def _sub_geometry(R, fx, fy, width: int, height: int, gi: int,
                  perm: Tuple[int, int, int], u0, du, v0, dv, scale,
                  ndc=None, origin=None, B=2, win=(4, 4)):
    """Per-subpixel slope-grid coordinates + the shared WyxWx window
    corner for ByxBx-screen-pixel superquad blocks (one-shot wrapper over
    _pixel_slopes/_level_geometry/_level_fits — the display cascade calls
    the pieces so the geometry is lazy per cond branch).

    Returns (gys, gxs, okm, Y0, X0, fits): (By*Bx, Hh, Wh) clipped
    subpixel positions / ok masks, (Hh, Wh) int32 window corners, and the
    whole-frame bulk-misfit predicate (see warp_to_screen_sq)."""
    geom_args = (R, fx, fy, width, height, gi, perm, u0, du, v0, dv,
                 scale, ndc, origin)
    gys, gxs, okm, Y0, X0 = _level_geometry(geom_args, gi, B, win)
    gyf, gxf = _pixel_slopes(R, fx, fy, width, height, gi, perm,
                             u0, du, v0, dv, scale, ndc=ndc, origin=origin)
    fits = _level_fits(gyf, gxf, gi, B, win)
    return gys, gxs, okm, Y0, X0, fits


def to_display_dtype(x, out_dtype):
    """Convert a float rgba frame to the requested display dtype (uint8 =
    the reference's RGBA8 write-out protocol; None = keep).

    Deliberate fidelity difference from the cited write-out
    (volrend.cu:166-172): the reference truncates ``uint8_t(v * 255)``
    without clamping and forces alpha = 255, while this path rounds with a
    [0, 1] clamp and keeps the computed alpha — slightly HIGHER fidelity
    than the protocol it mirrors (half-ulp max error instead of a full
    truncation ulp), never lower. Bit-level protocol parity is not
    claimed anywhere; quality gates compare against the exact renderer."""
    if out_dtype is None or x.dtype == out_dtype:
        return x
    if out_dtype == jnp.uint8:
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return x.astype(out_dtype)


#: production cascade: ((By, Bx), (Wy, Wx)) levels, tried biggest block
#: first with per-pose misfit gates falling through to the next level and
#: finally the reference warp. r5 production: the (4, 4) block with a
#: 5x5 window — 1/4 the gather rows of the r4 (2, 4) config; the extra
#: window ROW buys the y margin the parked square-window 4x4 lacked and
#: the extra window COLUMN dissolves the r4 "4-px x-footprint ceiling"
#: (which was a window-width limit, not a block limit): ALL 200 bench
#: orbit poses fit, where (5, 4) fits only 160 and the misfit fallbacks
#: made it a net LOSS (on-chip A/B, docs/PERF_R16.json: 215.3 vs 205.6
#: vs 191.0 Mrays/s at the 48-pose probe scale; psnr_orbit 55.90 dB
#: unchanged). Module constant so bench/preflight can pin levels;
#: changing it is a kernel-knob change (preflight on chip first).
_CASCADE: Tuple = (((2, 2), (4, 4)), ((4, 4), (5, 5)))


def _is_level(x) -> bool:
    """Is ``x`` one ((By,Bx),(Wy,Wx)) cascade level?"""
    return (isinstance(x, tuple) and len(x) == 2
            and all(isinstance(e, tuple) and len(e) == 2
                    and all(isinstance(i, int) for i in e) for e in x))


def _norm_cascade(block) -> Tuple:
    """Normalize a ``block`` argument to ((By,Bx),(Wy,Wx)) level tuples.
    None = the production _CASCADE; a bare int/(By,Bx) = that block with
    the classic 4x4 window (plus the (2,2)x(4,4) safety level); a single
    ((By,Bx),(Wy,Wx)) level gets the same safety level added."""
    if block is None:
        return _CASCADE
    if _is_level(block):
        levels = (((2, 2), (4, 4)), block)
    elif (isinstance(block, tuple) and block
          and all(_is_level(lv) for lv in block)):
        levels = block                  # already ((B),(W)) levels
    else:
        levels = (((2, 2), (4, 4)), (_block2d(block), (4, 4)))
    # dedupe (an explicit block=2 would otherwise build two identical
    # (2,2)x(4,4) levels: double compile + double fit reductions)
    seen, out = set(), []
    for lv in levels:
        key = (_block2d(lv[0]), _win2d(lv[1]))
        if key not in seen:
            seen.add(key)
            out.append(key)
    return tuple(out)


def warp_to_screen_sq(inter, opt: RenderOptions, R, fx, fy,
                      width: int, height: int, gi: int,
                      perm: Tuple[int, int, int],
                      u0, du, v0, dv, scale,
                      ndc: Optional[tuple] = None, origin=None,
                      bg_pix=None, block=None, out_dtype=None,
                      planar: bool = False):
    """Drop-in twin of slab_render._warp_to_screen (display path): warp the
    (gi, gi, 4) intermediate image to (H, W, 4) + background composite.

    block: cascade spec (see _norm_cascade; None = the production
    _CASCADE). Each ((By, Bx), (Wy, Wx)) level has a per-pose misfit gate
    (the block's bilinear footprint must fit its gather window); poses
    fall through bigger blocks -> smaller -> the reference warp via
    nested lax.cond. Only the whole-frame fit predicates are computed
    eagerly (cheap reductions of ONE full-res slope pass); each level's
    per-subpixel geometry is built inside its own cond branch, so the
    untaken levels cost nothing at runtime.

    planar=True: ``inter`` is channel-planar (4, gi, gi) — the march
    kernel's native emit layout. The fast path feeds it straight to the
    planar table build (no XLA relayout); the per-pose reference-warp
    fallback pays a moveaxis inside its own cond branch only."""
    mrgba = None
    if bg_pix is not None:
        mesh_rgb, hit = bg_pix
        mrgba = jnp.concatenate(
            [jnp.asarray(mesh_rgb, _F32),
             hit.astype(_F32)[..., None]], -1)       # (H, W, 4)

    geom_args = (R, fx, fy, width, height, gi, perm, u0, du, v0, dv,
                 scale, ndc, origin)

    def make_fast(B, win):
        By, Bx = _block2d(B)
        Wy, Wx = _win2d(win)
        Hh, Wh = height // By, width // Bx
        W3 = gi - Wx + 1

        def fast(it_in):
            # mesh split built INSIDE the taken branch (like the
            # geometry): closed-over cond operands are computed
            # regardless of the branch taken, and the strided-slice
            # stack is exactly the relayout-copy class the r5 ledger
            # flags — untaken levels must not pay it
            mesh_planes = None
            if mrgba is not None:
                mesh_planes = jnp.stack(
                    [mrgba[p::By, q::Bx, c]
                     for p in range(By) for q in range(Bx)
                     for c in range(4)], 0)
            # per-subpixel geometry built HERE, inside the taken branch,
            # as fused broadcasts from scalars (strided views of the
            # full-res planes cost XLA transpose copies — the r5 bench
            # regression, 344.7 -> 250.3 Mrays/s)
            gys, gxs, okm, Y0, X0 = _level_geometry(
                geom_args, gi, B, (Wy, Wx))
            tdt = jnp.int8 if _TABLE_INT8 else jnp.bfloat16
            tbl = _build_table(it_in, gi, dtype=tdt, planar=planar,
                               win=(Wy, Wx))
            qg = tbl[Y0 * W3 + X0]                  # (Hh, Wh, C)
            qgp = jnp.transpose(qg, (2, 0, 1))      # planar for the kernel
            ry = gys - Y0.astype(_F32)[None]
            rx = gxs - X0.astype(_F32)[None]
            out = _combine_emit(qgp, ry, rx, okm, Hh, Wh,
                                float(opt.background_brightness),
                                mesh_planes=mesh_planes, B=B,
                                qscale=(1.0 / 255.0 if tdt == jnp.int8
                                        else 1.0),
                                qshift=(128.0 / 255.0 if tdt == jnp.int8
                                        else 0.0),
                                out_dtype=(out_dtype or jnp.float32),
                                win=(Wy, Wx))
            return out.reshape(height, width, 4)

        return fast

    def slow(it_in):
        from volrend_tpu.ops.slab_render import _warp_to_screen_ref
        if planar:
            it_in = jnp.moveaxis(it_in, 0, -1)
        return to_display_dtype(_warp_to_screen_ref(
            it_in, opt, R, fx, fy, width, height,
            gi, perm, u0, du, v0, dv, scale,
            precise=False, ndc=ndc, origin=origin,
            bg_pix=bg_pix), out_dtype)

    levels = [(B, W) for (B, W) in _norm_cascade(block)
              if usable(width, height, gi, block=B, win=W)]
    levels.sort(key=lambda bw: bw[0][0] * bw[0][1])
    if not levels:
        return slow(inter)
    gyf, gxf = _pixel_slopes(R, fx, fy, width, height, gi, perm,
                             u0, du, v0, dv, scale, ndc=ndc, origin=origin)
    fn = slow
    for B, win in levels:
        fits = _level_fits(gyf, gxf, gi, B, win)
        fn = partial(jax.lax.cond, fits, make_fast(B, win), fn)
    return fn(inter)


# ---------------------------------------------------------------------------
# precise (training) superquad warp with a hand-written VJP
# ---------------------------------------------------------------------------
#
# The training path warps with f32 tables and differentiates the warp
# w.r.t. the intermediate image. Autodiff of the reference quad-gather
# warp transposes a 640k-row gather into a 640k-row scatter (~6 ms/frame
# at 800^2/gi=512, profiled — the single largest term of the warp's
# fwd+VJP ~8.6 ms). The superquad structure cuts the scatter to 160k
# rows and keeps every relayout inside Pallas:
#
#   fwd: f32 window table (Pallas planar build + transpose-folded
#        gather) -> f32 tent combine + interleaved emit (hi/lo bf16
#        one-hot dots: exact placement to ~2^-17 relative)
#   bwd: subpixel split of the cotangent -> composite adjoint -> tent
#        adjoint (Pallas, transpose twin of the combine) -> 160k-row
#        scatter-add into the window table -> build adjoint (Pallas:
#        16 shifted-plane sums)
#
# Geometry cotangents are ZERO by contract (training differentiates leaf
# payloads only — the same implicit contract the autodiff path has, since
# callers never request camera gradients). Gated in
# tests/test_slab_grad.py::test_precise_sq_warp_vjp_matches_autodiff.


def _combine_adjoint_kernel(BH: int, Wh: int, bg: float):
    def kernel(gpl_ref, ry_ref, rx_ref, ok_ref, out_ref):
        acc = [jnp.zeros((BH, Wh), jnp.float32) for _ in range(64)]
        for s in range(4):
            ryv = jnp.clip(ry_ref[s], 0.0, 3.0)
            rxv = jnp.clip(rx_ref[s], 0.0, 3.0)
            wy = [jnp.maximum(0.0, 1.0 - jnp.abs(ryv - cy))
                  for cy in range(4)]
            wx = [jnp.maximum(0.0, 1.0 - jnp.abs(rxv - cx))
                  for cx in range(4)]
            ok = ok_ref[s] > 0.5
            g = [gpl_ref[s * 4 + c] for c in range(4)]
            # composite adjoint: out_c = rgba_c + bg*(1-alpha) (c<3),
            # out_3 = alpha, all masked by ok
            dr = [jnp.where(ok, g[c], 0.0) for c in range(3)]
            dalpha = jnp.where(ok, g[3] - bg * (g[0] + g[1] + g[2]), 0.0)
            drgba = dr + [dalpha]
            for cy in range(4):
                for cx in range(4):
                    wyx = wy[cy] * wx[cx]
                    for c in range(4):
                        ch = _chan(cy, cx, c)
                        acc[ch] = acc[ch] + wyx * drgba[c]
        for ch in range(64):
            out_ref[ch] = acc[ch]

    return kernel


def _combine_adjoint(gplanes, ry, rx, okm, Hh: int, Wh: int, bg: float):
    """(16, Hh, Wh) subpixel cotangent planes -> (64, Hh, Wh) window-cell
    cotangents (transpose twin of the tent combine)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    cands = [b for b in range(8, min(64, Hh) + 1, 8) if Hh % b == 0]
    BH = max(cands) if cands else Hh
    kern = _combine_adjoint_kernel(BH, Wh, bg)
    blk = lambda n: pl.BlockSpec((n, BH, Wh), lambda i: (0, i, 0))
    return pl.pallas_call(
        kern,
        grid=(Hh // BH,),
        in_specs=[blk(16), blk(4), blk(4), blk(4)],
        out_specs=blk(64),
        out_shape=jax.ShapeDtypeStruct((64, Hh, Wh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(gplanes, ry, rx, okm)


def _build_adjoint(dtblp, gi: int):
    """(64, gi-3, gi-3) window-table cotangents -> (gi, gi, 4) d_inter:
    each inter cell appears in 16 shifted window positions."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    W3 = gi - 3
    BH = _BH_BUILD
    nb = -(-gi // BH)
    Hp = nb * BH
    # zero-pad 3 on every side: d_inter[c][y, x] =
    #   sum_{cy,cx} dp[chan][y + 3 - cy, x + 3 - cx]
    dp = jnp.pad(dtblp, ((0, 0), (3, Hp + 3 - gi), (3, 3)))
    rows = int(dp.shape[1])

    def kernel(dp_ref, out_ref):
        i = pl.program_id(0)
        blk = [dp_ref[ch, pl.ds(i * BH, BH + 3), :] for ch in range(64)]
        for c in range(4):
            acc = jnp.zeros((BH, gi), jnp.float32)
            for cy in range(4):
                for cx in range(4):
                    ch = _chan(cy, cx, c)
                    acc = acc + blk[ch][3 - cy:3 - cy + BH,
                                        3 - cx:3 - cx + gi]
            out_ref[c] = acc

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((64, rows, W3 + 6), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((4, BH, gi), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, Hp, gi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(dp)
    return jnp.transpose(out[:, :gi], (1, 2, 0))


def _precise_fwd(inter, geom, statics):
    (R, fx, fy, u0, du, v0, dv, scale, origin) = geom
    (opt_bg, width, height, gi, perm, ndc) = statics
    Hh, Wh = height // 2, width // 2
    gys, gxs, okm, Y0, X0, _ = _sub_geometry(
        R, fx, fy, width, height, gi, perm, u0, du, v0, dv, scale,
        ndc=ndc, origin=origin)
    tbl = _build_table(inter, gi, dtype=jnp.float32)
    flat = Y0 * (gi - 3) + X0
    qg = tbl[flat]                                  # (Hh, Wh, 64) f32
    qgp = jnp.transpose(qg, (2, 0, 1))
    ry = gys - Y0.astype(_F32)[None]
    rx = gxs - X0.astype(_F32)[None]
    out = _combine_emit(qgp, ry, rx, okm, Hh, Wh, opt_bg, exact=True)
    return out.reshape(height, width, 4), (ry, rx, okm, flat)


def _precise_bwd(geom_res, statics, res, g):
    (opt_bg, width, height, gi, perm, ndc) = statics
    Hh, Wh = height // 2, width // 2
    ry, rx, okm, flat = res
    gplanes = jnp.stack(
        [g[p::2, q::2, c]
         for p in range(2) for q in range(2) for c in range(4)], 0)
    dqg = _combine_adjoint(gplanes, ry, rx, okm, Hh, Wh, opt_bg)
    rows = jnp.transpose(dqg, (1, 2, 0)).reshape(Hh * Wh, 64)
    W3 = gi - 3
    dtbl = jnp.zeros((W3 * W3, 64), jnp.float32).at[
        flat.reshape(-1)].add(rows)
    dtblp = jnp.transpose(dtbl, (1, 0)).reshape(64, W3, W3)
    return _build_adjoint(dtblp, gi)


def make_warp_precise(opt_bg: float, width: int, height: int, gi: int,
                      perm: Tuple[int, int, int], ndc):
    """Build the custom-VJP precise warp for fixed static config."""
    statics = (opt_bg, width, height, gi, perm, ndc)

    @jax.custom_vjp
    def warp(inter, geom):
        return _precise_fwd(inter, geom, statics)[0]

    def fwd(inter, geom):
        out, res = _precise_fwd(inter, geom, statics)
        return out, (res, geom)

    def bwd(saved, g):
        res, geom = saved
        d_inter = _precise_bwd(None, statics, res, g)
        zeros = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), geom)
        return d_inter, zeros

    warp.defvjp(fwd, bwd)
    return warp


#: training-path option: warp with the precise superquad (custom VJP)
#: instead of autodiff of the reference quad-gather warp. PARKED OFF with
#: fresh numbers: measured at the production gi=256/G=128/800^2 train
#: step (tools/perf_train4.py, 2026-08-20) it is a +24 ms/step device
#: REGRESSION (67.7 vs 43.7 ms) — the f32 window-table build + 160k-row
#: scatter + adjoint kernels cost far more than the reference warp's
#: whole VJP complex (640k-row scatter-add + sort + gather ~= 11 ms).
#: This confirms the r3 gi=512 parking at the smaller gi too; don't
#: re-try without a structurally different adjoint. Callers must
#: jax.clear_caches() after flipping (read at trace time).
_PRECISE_SQ = False


def usable_precise(width: int, height: int, gi: int) -> bool:
    """Static gate for the training-path superquad warp."""
    return usable(width, height, gi)
