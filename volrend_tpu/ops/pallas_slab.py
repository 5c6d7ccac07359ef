"""Fused Pallas TPU kernel for the shear-warp slab march.

The XLA slab march (``ops/slab_render.py``) round-trips the (gi, gi)
accumulator and per-slab intermediates through HBM every slab (~30 MB/slab).
This kernel fuses shade + warp + composite for ALL slabs with the
accumulator resident in VMEM, so HBM traffic collapses to the volume read
itself — the grid streams through the kernel's automatic slab pipeline
(grid dimension = slab index; Pallas double-buffers the incoming block).

Per slab, entirely on-chip:
- shade: sigma plane -> tau = sigma*dt(u,v); SH basis planes evaluated
  in-register from the per-voxel ray direction; rgb = sigmoid(sum coeffs*b)
- warp: the separable scale+translate resample is executed on the MXU as
  two one-hot matmuls per channel (one-hot rows select exactly one voxel,
  so f32 matmul == exact nearest gather — no per-lane gather needed, which
  Mosaic does not support)
- composite: front-to-back with stop-threshold freeze (rt_core.cuh:176-185
  semantics; a ray whose T drops below stop_thresh stops contributing)

Data layout: the grid is passed channel-planar (G_z, D, G_y, G_x) so every
plane the kernel touches is a (G, G) tile with the lane dimension = G_x.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrend_tpu.ops import basis as basis_mod

__all__ = ["march_slabs", "available"]

_F32 = jnp.float32


def available() -> bool:
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


# params vector layout (f32): see _pack_params
_NP = 20


def _pack_params(cz, cy, cx, u0, du, v0, dv, sgn, spp, inv_scale,
                 sigma_thresh, stop_thresh, lo1, hi1, lo2, hi2):
    return jnp.stack([
        cz, cy, cx, u0, du, v0, dv, sgn, spp[0], spp[1], spp[2],
        inv_scale[0], inv_scale[1], inv_scale[2],
        sigma_thresh, stop_thresh, lo1, hi1, lo2, hi2,
    ]).astype(_F32)


def _make_kernel(G: int, gi: int, D: int, bd: int, flip: bool,
                 perm: Tuple[int, int, int], basis_lo: int, basis_hi: int,
                 sig2: bool):
    slot = {perm[0]: 0, perm[1]: 1, perm[2]: 2}  # tree axis -> permuted slot

    def kernel(params_ref, qs_ref, slab_ref, zb_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[0] = jnp.zeros((gi, gi), _F32)
            acc_ref[1] = jnp.zeros((gi, gi), _F32)
            acc_ref[2] = jnp.zeros((gi, gi), _F32)
            acc_ref[3] = jnp.ones((gi, gi), _F32)

        p = params_ref
        cz, cy, cx = p[0], p[1], p[2]
        u0, du, v0, dv = p[3], p[4], p[5], p[6]
        sgn = p[7]
        spp0, spp1, spp2 = p[8], p[9], p[10]
        inv_s = (p[11], p[12], p[13])
        sigma_thresh, stop_thresh = p[14], p[15]
        lo1, hi1, lo2, hi2 = p[16], p[17], p[18], p[19]

        zi = (G - 1 - i) if flip else i
        z = (zi.astype(_F32) + 0.5) / G
        s = z - cz
        s_inv = 1.0 / s

        # per-voxel ray slopes (planes over the slab)
        yrow = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0).astype(_F32)
        xcol = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1).astype(_F32)
        yc = (yrow + 0.5) / G
        xc = (xcol + 0.5) / G
        uyv = (yc - cy) * s_inv
        uxv = (xc - cx) * s_inv

        if sig2:
            # 14-bit fixed-point sigma split across two int8 planes
            sigma = (slab_ref[0, 3 * bd].astype(_F32) * 128.0
                     + slab_ref[0, 3 * bd + 1].astype(_F32)) \
                * qs_ref[3 * bd]
        else:
            sigma = slab_ref[0, D - 1].astype(_F32) * qs_ref[D - 1]
        dtv = (1.0 / G) * jnp.sqrt(
            (uyv * spp1) ** 2 + (uxv * spp2) ** 2 + spp0 * spp0)
        ok = ((sigma > sigma_thresh)
              & (yc >= lo1) & (yc < hi1) & (xc >= lo2) & (xc < hi2))
        tau = jnp.where(ok, dtv * sigma, 0.0)

        # per-voxel world view direction -> SH shading
        d_perm = (jnp.full((G, G), sgn, _F32), sgn * uyv, sgn * uxv)
        dw = [d_perm[slot[a]] * inv_s[a] for a in range(3)]
        rnorm = jax.lax.rsqrt(dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2])
        dx, dy, dz = dw[0] * rnorm, dw[1] * rnorm, dw[2] * rnorm

        raw = [jnp.zeros((G, G), _F32) for _ in range(3)]
        for k, bk in _sh_planes(bd, dx, dy, dz):
            if k < basis_lo or k > basis_hi:
                continue
            for c in range(3):
                raw[c] = raw[c] + (slab_ref[0, c * bd + k].astype(_F32)
                                   * qs_ref[c * bd + k]) * bk
        rgb = [jax.nn.sigmoid(r) for r in raw]

        # one-hot warp matrices (f32 matmul of a one-hot == exact gather)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (gi, G), 0).astype(_F32)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (gi, G), 1)
        iyv = jnp.floor((cy + s * (u0 + du * jrow)) * G).astype(jnp.int32)
        ohr = (gcol == jnp.clip(iyv, 0, G - 1)).astype(_F32)   # (gi, G)
        grow = jax.lax.broadcasted_iota(jnp.int32, (G, gi), 0)
        icol = jax.lax.broadcasted_iota(jnp.int32, (G, gi), 1).astype(_F32)
        ixv = jnp.floor((cx + s * (v0 + dv * icol)) * G).astype(jnp.int32)
        ohct = (grow == jnp.clip(ixv, 0, G - 1)).astype(_F32)  # (G, gi)

        def warp(plane):
            w1 = jnp.dot(ohr, plane, preferred_element_type=_F32)
            return jnp.dot(w1, ohct, preferred_element_type=_F32)

        tau_w = warp(tau)
        att = jnp.exp(-tau_w)
        rgb_w = [warp(r) for r in rgb]

        zlo = zb_ref[0]
        zhi = zb_ref[1]
        T = acc_ref[3]
        m = ((z >= zlo) & (z <= zhi) & (T >= stop_thresh) & (tau_w > 0.0))
        w = jnp.where(m, T * (1.0 - att), 0.0)
        for c in range(3):
            acc_ref[c] = acc_ref[c] + w * rgb_w[c]
        acc_ref[3] = jnp.where(m, T * att, T)

    return kernel


@partial(jax.jit, static_argnames=("G", "gi", "D", "bd", "flip", "perm",
                                   "basis_lo", "basis_hi", "sig2"))
def march_slabs(gplanar, params, qscale, zbounds, G: int,
                gi: int, D: int, bd: int, flip: bool,
                perm: Tuple[int, int, int],
                basis_lo: int = 0, basis_hi: int = 24, sig2: bool = False):
    """Run the fused march; returns acc (4, gi, gi): [r, g, b, T].

    gplanar: (G, Dp, G, G) channel-planar permuted grid — bf16 payload
        (Dp = D, sigma in plane D-1), or int8 codes (Dp = D+1, colors +
        14-bit fixed-point sigma split over the last two planes; sig2=True)
        dequantized in-kernel by the per-channel ``qscale``.
    params: (20,) f32 (see _pack_params). qscale: (Dp,) f32.
    zbounds: (2, gi, gi) f32.
    """
    Dp = gplanar.shape[1]
    kernel = _make_kernel(G, gi, D, bd, flip, perm, basis_lo, basis_hi,
                          sig2)
    zi_map = ((lambda i: (G - 1 - i, 0, 0, 0)) if flip
              else (lambda i: (i, 0, 0, 0)))
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Dp, G, G), zi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gi, gi), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, gi, gi), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, gi, gi), _F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, qscale.astype(_F32), gplanar, zbounds)
