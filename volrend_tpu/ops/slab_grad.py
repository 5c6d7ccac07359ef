"""Differentiable fast path: training through the dense-grid slab renderer.

Round-1 training ran on the per-sample octree-gather path (``ops/grad.py``)
— numerically exact, but built on per-row HBM gathers that measure ~80
Mrows/s on v5e (three orders of magnitude short of the slab path). This
module makes the *fast* renderer differentiable end to end:

    leaf data (K, D) --bake--> dense grid --permute--> slab march
        --finalize+warp--> (H, W, 4) --loss

Two pieces carry hand-written structure; everything else is plain autodiff:

1. **Differentiable bake** (`bake_from_data`): the octree->grid bake is a
   pure broadcast of leaf rows into their axis-aligned voxel blocks. It is
   built as a coarse-to-fine pyramid — scatter each depth's leaves into an
   (N^j)^3 grid, upsample by N, repeat — so the *transpose* (what autodiff
   derives) is a fine-to-coarse sum-pool pyramid plus one compact scatter
   per depth: O(G^3) dense traffic, no G^3-row scatters. The voxel->leaf
   block map (`BakeMap`) is static per scene.

2. **Custom-VJP slab march** (`_march_diff`): forward is the slab
   compositing loop (shade -> box-tap warp -> front-to-back composite,
   exactly ``slab_render._render_frame_impl``'s math in training
   semantics); backward **re-marches** the slabs with O(1) memory per
   pixel, using the same suffix-reconstruction algebra as the per-sample
   VJP (``ops/grad.py``):

       dL/dtau_i   = T_i att_i G_i - (Ctot - A_i) - T_end * g_T
       dL/drgb_i,c = g_c * w_i

   with G_i = sum_c g_c rgb_i,c, A_i the running prefix of w_j G_j, and
   Ctot = sum_c g_c acc_c. The per-slab (pixel grads -> voxel-plane grads)
   chain — warp adjoint, sigma-weighted emission quotient, sigmoid, basis
   outer product — is delegated to ``jax.vjp`` of the shared per-slab
   function, so it can never drift from the forward; each slab's (G, G, D)
   grad plane is written once into the grid cotangent (no collisions by
   construction).

Training semantics match ``ops/grad.py``: no early-stop renormalization
(display-only rescale, rt_core.cuh:181-183), smooth alpha = 1 - T_end;
early termination at stop_thresh is kept as an epsilon-sized truncation.

The forward math being differentiated is the march of rt_core.cuh:105-195
re-factored into slab order; gradient correctness is pinned by autodiff
parity + finite differences in tests/test_slab_grad.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from volrend_tpu.models.data_format import BasisType
from volrend_tpu.ops import basis as basis_mod
from volrend_tpu.ops import render_jax, slab_render
from volrend_tpu.ops.dense_grid import DenseGrid
from volrend_tpu.utils.options import RenderOptions

_F32 = jnp.float32

__all__ = ["BakeMap", "build_bake_map", "bake_from_data",
           "data_to_pyramid", "pyramid_to_data", "bake_from_pyramid",
           "render_frame_train", "loss_and_grad_frame",
           "render_frame_train_zsharded"]


# ---------------------------------------------------------------------------
# Differentiable bake
# ---------------------------------------------------------------------------

def _register_bake_map(cls):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=["rows", "coords", "masks"],
        meta_fields=["G", "N", "D", "sizes"],
    )(cls)


@_register_bake_map
@dataclasses.dataclass
class BakeMap:
    """Static octree->grid block map, one level per depth.

    rows[j]  : int32 (K_j,) leaf row indices (into flattened tree data)
               whose leaves have side 1/N^(j+1) (block count B = N^(j+1))
    coords[j]: int32 (K_j,) flat block index (z*B + y)*B + x at that level
    masks[j] : bool (B, B, B, 1) — True at this level's leaf blocks (the
               dense complement of coords; lets the grid-space training
               parameterization bake with pure selects, no scatters)
    """
    rows: Tuple[object, ...]
    coords: Tuple[object, ...]
    masks: Tuple[object, ...] = ()
    G: int = 1
    N: int = 2
    D: int = 4
    sizes: Tuple[int, ...] = ()


def build_bake_map(dev, G: Optional[int] = None,
                   chunk: int = 2 ** 20) -> BakeMap:
    """Enumerate each leaf's (row, block) at its own depth level.

    dev: TreeArrays. G: grid resolution (default: the tree's full
    resolution; must be N**k with every leaf at least one voxel in size).
    """
    from volrend_tpu.ops.dense_grid import full_resolution
    if G is None:
        G = full_resolution(dev)
    N = dev.N
    meta = render_jax.tree_meta(dev)

    levels = []
    j = 0
    covered = 0
    while N ** (j + 1) <= G:
        B = N ** (j + 1)
        n = B * B * B
        csize = min(chunk, n)
        while n % csize:
            csize //= 2

        @jax.jit
        def level_query(child, lut):
            def q(rows):
                z = rows // (B * B)
                y = (rows // B) % B
                x = rows % B
                pos = (jnp.stack([z, y, x], -1).astype(_F32) + 0.5) / B
                leaf_idx, cube_sz, _ = render_jax._query(child, lut, pos,
                                                         meta)
                return leaf_idx, cube_sz.astype(jnp.int32)

            ids = jnp.arange(n, dtype=jnp.int32).reshape(-1, csize)
            li, cs = jax.lax.map(q, ids)
            return li.reshape(-1), cs.reshape(-1)

        li, cs = level_query(dev.child, dev.lut)
        li = np.asarray(li)
        mask = np.asarray(cs) == B
        rows = li[mask].astype(np.int32)
        coords = np.nonzero(mask)[0].astype(np.int32)
        levels.append((rows, coords))
        covered += rows.size * (G // B) ** 3
        j += 1

    if covered != G * G * G:
        raise ValueError(
            f"bake map covers {covered} of {G ** 3} voxels: G={G} is finer "
            f"than the tree supports or not a power of N")
    masks = []
    for j, (rows, coords) in enumerate(levels):
        B = N ** (j + 1)
        m = np.zeros(B * B * B, bool)
        m[coords] = True
        masks.append(m.reshape(B, B, B, 1))
    return BakeMap(
        rows=tuple(jnp.asarray(r) for r, _ in levels),
        coords=tuple(jnp.asarray(c) for _, c in levels),
        masks=tuple(jnp.asarray(m) for m in masks),
        G=G, N=N, D=dev.data_dim,
        sizes=tuple(int(r.size) for r, _ in levels),
    )


def bake_from_data(data, bmap: BakeMap):
    """Bake leaf payload rows into the dense (G, G, G, D) grid.

    Differentiable w.r.t. ``data`` (K, >=D); autodiff's transpose is a
    sum-pool pyramid + per-level compact gathers (no G^3-row scatters).
    """
    N, G, D = bmap.N, bmap.G, bmap.D
    data = data[:, :D]
    g = None
    B = 1
    for rows, coords in zip(bmap.rows, bmap.coords):
        Bn = B * N
        if g is None:
            g = jnp.zeros((Bn, Bn, Bn, D), data.dtype)
        else:
            # upsample by N (broadcast each block into its N^3 children)
            g = jnp.broadcast_to(
                g[:, None, :, None, :, None, :],
                (B, N, B, N, B, N, D)).reshape(Bn, Bn, Bn, D)
        if rows.shape[0]:
            g = g.reshape(-1, D).at[coords].set(
                data[rows]).reshape(Bn, Bn, Bn, D)
        B = Bn
    if B != G:
        raise ValueError(f"bake map resolution {B} != G {G}")
    return g


# ---------------------------------------------------------------------------
# Grid-space (pyramid) parameterization
#
# Scatter-free training parameters: instead of (K, D) leaf rows scattered
# into the grid every step (XLA scatter measures ~5 Mrows/s on v5e — the
# bake was 391 ms fwd / 818 ms VJP at G=128, dwarfing the 4 ms march), the
# trainable state is a dense per-level pyramid p[j] of shape (B_j,B_j,B_j,D)
# holding each leaf's payload at its own block position. The bake is then
# upsample + masked select (pure dense traffic) and its autodiff transpose
# is sum-pool + mask — no gathers or scatters anywhere in the step. Leaf
# rows are recovered exactly (compact gathers) at checkpoint/export time.
# Entries of p[j] outside masks[j] receive zero gradient and stay at their
# zero init, so pyramid -> leaf -> pyramid round-trips are bit-exact.
# ---------------------------------------------------------------------------

def data_to_pyramid(data, bmap: BakeMap):
    """(K, >=D) leaf rows -> per-level dense pyramid (setup/restore time)."""
    D = bmap.D
    data = jnp.asarray(data)[:, :D]
    pyr = []
    for rows, coords, mask in zip(bmap.rows, bmap.coords, bmap.masks):
        B = mask.shape[0]
        p = jnp.zeros((B * B * B, D), data.dtype)
        if rows.shape[0]:
            p = p.at[coords].set(data[rows])
        pyr.append(p.reshape(B, B, B, D))
    return tuple(pyr)


def pyramid_to_data(pyr, bmap: BakeMap, K: int, data_dim: Optional[int] = None):
    """Pyramid -> (K, data_dim) leaf rows (checkpoint/export time).

    Rows not covered by any pyramid level (non-leaf rows) come out zero.
    """
    D = bmap.D
    data = jnp.zeros((K, data_dim or D), pyr[0].dtype)
    for p, rows, coords in zip(pyr, bmap.rows, bmap.coords):
        if rows.shape[0]:
            vals = p.reshape(-1, D)[coords]
            data = data.at[rows, :D].set(vals)
    return data


def bake_from_pyramid(pyr, bmap: BakeMap):
    """Bake the pyramid into the dense (G, G, G, D) grid — no scatters.

    Differentiable w.r.t. every level; the transpose is masked sum-pools.
    """
    N, G, D = bmap.N, bmap.G, bmap.D
    g = None
    B = 1
    for p, mask in zip(pyr, bmap.masks):
        Bn = B * N
        if g is None:
            g = jnp.where(mask, p, jnp.zeros((), p.dtype))
        else:
            g = jnp.broadcast_to(
                g[:, None, :, None, :, None, :],
                (B, N, B, N, B, N, D)).reshape(Bn, Bn, Bn, D)
            g = jnp.where(mask, p, g)
        B = Bn
    if B != G:
        raise ValueError(f"bake map resolution {B} != G {G}")
    return g


# ---------------------------------------------------------------------------
# Custom-VJP slab march
# ---------------------------------------------------------------------------

class SlabCfg(NamedTuple):
    """Hashable static march configuration."""
    G: int
    gi: int
    D: int
    bd: int
    fmt: int
    perm: Tuple[int, int, int]
    flip: bool
    ids: Tuple[int, ...]
    opt: RenderOptions


def _slab_pixels(cfg: SlabCfg, slab, extra, gm, zi):
    """One slab -> per-intermediate-pixel (tau_w, rgb_w).

    Same math as slab_render's substep: voxel-space shade (SH -> sigmoid
    rgb, sigma mask), box-integration two-tap warp of [sigma, sigma*rgb],
    sigma-weighted emission. Differentiable w.r.t. ``slab`` (G, G, D); the
    backward pass takes its jax.vjp per slab.
    """
    G, gi, D, bd = cfg.G, cfg.gi, cfg.D, cfg.bd
    opt = cfg.opt
    perm = cfg.perm
    cy, cx, cz = gm["cy"], gm["cx"], gm["cz"]
    uy, ux = gm["uy"], gm["ux"]
    scale = gm["scale"]
    z = (zi.astype(_F32) + 0.5) / G
    s = z - cz
    s0 = z - 0.5 / G - cz
    s1 = z + 0.5 / G - cz

    sigma = slab[..., D - 1]
    vox = (jnp.arange(G, dtype=_F32) + 0.5) / G
    lo, hi = gm["lo"], gm["hi"]
    # voxel-extent bbox intersection (see slab_render: the per-pixel
    # z-intervals clip rays exactly; boundary voxels must stay)
    h = _F32(0.5 / G)
    ok = ((vox[:, None] + h > lo[1]) & (vox[:, None] - h < hi[1])
          & (vox[None, :] + h > lo[2]) & (vox[None, :] - h < hi[2])
          & (sigma > _F32(opt.sigma_thresh)))
    sigma = jnp.where(ok, sigma, 0.0)

    if bd < 0:
        rgb = slab[..., :3]
    else:
        # per-frame affine slope->world-dir map (FrameGeom.dirM; covers
        # world-space and NDC trees)
        dirM = gm["dirM"]
        uvox = (vox - cy) / s
        vvox = (vox - cx) / s
        dvox = (dirM[:, 0][None, None]
                + uvox[:, None, None] * dirM[:, 1][None, None]
                + vvox[None, :, None] * dirM[:, 2][None, None])
        dvox = dvox / jnp.linalg.norm(dvox, axis=-1, keepdims=True)
        rot = render_jax._rodrigues_matrix(opt.rot_dirs)
        if rot is not None:
            dvox = dvox @ jnp.asarray(rot).T
        bv = basis_mod.eval_basis(BasisType(cfg.fmt), bd, dvox, extra,
                                  xp=jnp)
        bv = basis_mod.apply_basis_window(
            bv.astype(_F32), opt.basis_minmax, xp=jnp)
        coeffs = slab[..., :3 * bd].reshape(G, G, 3, bd)
        rgb = jax.nn.sigmoid(jnp.einsum("yxcb,yxb->yxc", coeffs, bv))

    X = jnp.concatenate([sigma[..., None], sigma[..., None] * rgb], -1)
    c0, c1, fr = slab_render._boxtap((cy + s0 * uy) * G,
                                     (cy + s1 * uy) * G, G)
    Xr = (fr[:, None, None] * X[c0]
          + (1.0 - fr)[:, None, None] * X[c1])
    d0, d1, fc = slab_render._boxtap((cx + s0 * ux) * G,
                                     (cx + s1 * ux) * G, G)
    Xw = (fc[None, :, None] * Xr[:, d0]
          + (1.0 - fc)[None, :, None] * Xr[:, d1])
    sig_w = Xw[..., 0]
    inv_scale = 1.0 / scale
    sp0, sp1, sp2 = (inv_scale[perm[0]], inv_scale[perm[1]],
                     inv_scale[perm[2]])
    dt_pix = (1.0 / G) * jnp.sqrt(
        (uy * sp1)[:, None] ** 2 + (ux * sp2)[None, :] ** 2 + sp0 ** 2)
    tau_w = sig_w * dt_pix
    rgb_w = Xw[..., 1:] / jnp.maximum(sig_w, 1e-12)[..., None]
    return tau_w, rgb_w


def _composite_update(cfg: SlabCfg, zi, tau_w, rgb_w, gm, acc, T, done):
    """Shared forward compositing update for one slab.

    Boundary slabs contribute FRACTIONALLY: tau scales by the overlap of
    the slab's z extent with the pixel's exact [z_lo, z_hi] interval —
    the sub-slab analog of the reference clipping each ray's t-range
    (rt_core.cuh:17-34) instead of quantizing entry/exit to whole steps."""
    G = cfg.G
    z = (zi.astype(_F32) + 0.5) / G
    z_lo, z_hi = gm["z_lo"], gm["z_hi"]
    h = _F32(0.5 / G)
    frac = jnp.clip((jnp.minimum(z + h, z_hi)
                     - jnp.maximum(z - h, z_lo)) * _F32(G), 0.0, 1.0)
    tau_f = tau_w * frac
    att = jnp.exp(-tau_f)
    m = (~done) & (tau_f > 0.0)
    w = jnp.where(m, T * (1.0 - att), 0.0)
    acc = acc + w[..., None] * rgb_w
    T_new = jnp.where(m, T * att, T)
    stopped = m & (T_new < _F32(cfg.opt.stop_thresh))
    passed = (z - h > z_hi) if not cfg.flip else (z + h < z_lo)
    done = done | stopped | passed
    return acc, T_new, done, m, w, att, frac


def _march_fwd_impl(cfg: SlabCfg, payload, extra, gm):
    """Training-semantics slab march; scan over the culled static slab list.

    Returns (acc (gi,gi,3), T (gi,gi)). Reverse-differentiable on its own
    (lax.scan + smooth ops), which the tests exploit; the custom VJP exists
    to avoid materializing per-slab residuals.
    """
    gi = cfg.gi
    z_lo, z_hi = gm["z_lo"], gm["z_hi"]

    def step(carry, zi):
        acc, T, done = carry
        slab = lax.dynamic_index_in_dim(payload, zi, 0, keepdims=False)
        tau_w, rgb_w = _slab_pixels(cfg, slab, extra, gm, zi)
        acc, T, done, _, _, _, _ = _composite_update(
            cfg, zi, tau_w, rgb_w, gm, acc, T, done)
        return (acc, T, done), None

    never = z_lo > z_hi
    init = (jnp.zeros((gi, gi, 3), _F32), jnp.ones((gi, gi), _F32), never)
    if not cfg.ids:
        return init[0], init[1]
    ids = jnp.asarray(np.asarray(cfg.ids, np.int32))
    (acc, T, _), _ = lax.scan(step, init, ids)
    return acc, T


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _march_diff(cfg: SlabCfg, payload, extra, gm):
    return _march_fwd_impl(cfg, payload, extra, gm)


def _march_fwd(cfg, payload, extra, gm):
    acc, T = _march_fwd_impl(cfg, payload, extra, gm)
    return (acc, T), (payload, extra, gm, acc, T)


def _march_bwd(cfg: SlabCfg, res, gbar):
    payload, extra, gm, acc, T_end = res
    g_acc, g_T = gbar
    g_acc = g_acc.astype(_F32)
    g_T = g_T.astype(_F32)
    G, gi, D = cfg.G, cfg.gi, cfg.D
    z_lo, z_hi = gm["z_lo"], gm["z_hi"]

    ctot = jnp.einsum("yxc,yxc->yx", g_acc, acc)
    gT_term = T_end * g_T

    def step(carry, zi):
        T, A, done, grad = carry
        slab = lax.dynamic_index_in_dim(payload, zi, 0, keepdims=False)
        (tau_w, rgb_w), pix_vjp = jax.vjp(
            lambda sl: _slab_pixels(cfg, sl, extra, gm, zi), slab)
        acc_dummy = jnp.zeros((gi, gi, 3), _F32)
        _, T_new, done_new, m, w, att, frac = _composite_update(
            cfg, zi, tau_w, rgb_w, gm, acc_dummy, T, done)

        # suffix-reconstruction pixel gradients (grad.py algebra); the
        # boundary-slab fraction chains into the pre-frac tau cotangent
        G_pix = jnp.einsum("yxc,yxc->yx", g_acc, rgb_w)
        A = A + w * G_pix
        g_tau_f = jnp.where(m, T * att * G_pix - (ctot - A) - gT_term, 0.0)
        g_tau_w = g_tau_f * frac
        g_rgb_w = g_acc * w[..., None]

        (g_slab,) = pix_vjp((g_tau_w, g_rgb_w))
        grad = lax.dynamic_update_slice(
            grad, g_slab[None].astype(grad.dtype), (zi, 0, 0, 0))
        return (T_new, A, done_new, grad), None

    never = z_lo > z_hi
    grad0 = jnp.zeros((G, G, G, D), _F32)
    init = (jnp.ones((gi, gi), _F32), jnp.zeros((gi, gi), _F32), never,
            grad0)
    if cfg.ids:
        ids = jnp.asarray(np.asarray(cfg.ids, np.int32))
        (_, _, _, grad), _ = lax.scan(step, init, ids)
    else:
        grad = grad0
    return (grad.astype(payload.dtype), jnp.zeros_like(extra),
            jax.tree_util.tree_map(jnp.zeros_like, gm))


_march_diff.defvjp(_march_fwd, _march_bwd)


# ---------------------------------------------------------------------------
# Pallas fast path: fused forward kernel + fused backward kernel
# ---------------------------------------------------------------------------

def _pallas_train_ok(cfg: SlabCfg) -> bool:
    """Static check: can the fused Pallas kernels carry training?

    Mirrors slab_render._pallas_ok minus quantized/depth (training bakes an
    unquantized payload from the trainable leaves; depth isn't a training
    target)."""
    from volrend_tpu.ops import pallas_slab
    if not pallas_slab.available() or cfg.opt.render_depth:
        return False
    bt = BasisType(cfg.fmt)
    if bt == BasisType.SH:
        return cfg.bd in (1, 4, 9, 16, 25) and cfg.D == 3 * cfg.bd + 1
    if bt in (BasisType.SG, BasisType.ASG):
        return cfg.bd > 0 and cfg.D == 3 * cfg.bd + 1
    if bt == BasisType.RGBA:
        return cfg.bd < 0 and cfg.D == 4
    return False


def _pallas_statics(cfg: SlabCfg):
    from volrend_tpu.ops.slab_render import _bbox_full
    blo, bhi = cfg.opt.basis_minmax
    rotm = render_jax._rodrigues_matrix(cfg.opt.rot_dirs)
    rot = (None if rotm is None
           else tuple(float(v) for v in np.asarray(rotm).reshape(-1)))
    return int(blo), int(bhi), rot, _bbox_full(cfg.opt)


def _pack_geom_params(geom, cfg: SlabCfg, inv_scale):
    from volrend_tpu.ops import pallas_slab
    perm = cfg.perm
    return pallas_slab._pack_params(
        geom.cz, geom.cy, geom.cx, geom.u0, geom.du, geom.v0, geom.dv,
        jnp.asarray(-1.0 if cfg.flip else 1.0),
        (inv_scale[perm[0]], inv_scale[perm[1]], inv_scale[perm[2]]),
        (inv_scale[0], inv_scale[1], inv_scale[2]),
        jnp.asarray(cfg.opt.sigma_thresh),
        jnp.asarray(cfg.opt.stop_thresh),
        geom.lo[1], geom.hi[1], geom.lo[2], geom.hi[2],
        geom.dirM, geom.z0_depth)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _march_diff_pallas(cfg: SlabCfg, planar, params, zb, extra):
    """Slab march on the fused TPU kernels; same (acc, T) contract and the
    same hand-derived backward algebra as _march_diff, but both passes run
    as Pallas kernels (per-slab XLA gathers made the scan path ~4000x
    slower than forward rendering at 800^2).

    planar: (G, D, G, G) float32 channel-planar permuted payload (cast to
    bf16 at the kernel boundary so the cotangent keeps f32 precision).
    """
    acc4 = _pallas_fwd_call(cfg, planar, params, zb, extra)
    return jnp.moveaxis(acc4[:3], 0, -1), acc4[3]


def _pallas_fwd_call(cfg: SlabCfg, planar, params, zb, extra):
    from volrend_tpu.ops import pallas_slab
    blo, bhi, rot, bfull = _pallas_statics(cfg)
    return pallas_slab.march_slabs(
        planar.astype(jnp.bfloat16), params,
        jnp.ones((cfg.D,), _F32), zb, cfg.G, cfg.gi, cfg.D, cfg.bd,
        cfg.perm, slab_ids=cfg.ids, basis_lo=blo, basis_hi=bhi,
        sig2=False, extra=extra, fmt=cfg.fmt, depth=False, rot=rot,
        flip=cfg.flip, bbox_full=bfull)


def _march_pallas_fwd(cfg, planar, params, zb, extra):
    acc4 = _pallas_fwd_call(cfg, planar, params, zb, extra)
    # save the payload residual in bf16: the backward kernel consumes
    # planar.astype(bf16) anyway, so the recomputed bf16 values are
    # IDENTICAL — this halves the largest training residual (the f32
    # payload is 3.3 GB at G=256/SH16) at zero semantic cost
    return ((jnp.moveaxis(acc4[:3], 0, -1), acc4[3]),
            (planar.astype(jnp.bfloat16), params, zb, extra, acc4))


def _march_pallas_bwd(cfg: SlabCfg, res, gbar):
    from volrend_tpu.ops import pallas_slab
    planar16, params, zb, extra, acc4 = res
    g_acc, g_T = gbar
    gacc4 = jnp.concatenate([
        jnp.moveaxis(g_acc.astype(_F32), -1, 0),
        g_T.astype(_F32)[None]])
    blo, bhi, rot, bfull = _pallas_statics(cfg)
    grad_planar = pallas_slab.march_slabs_bwd(
        planar16, params, jnp.ones((cfg.D,), _F32),
        zb, gacc4, acc4, cfg.G, cfg.gi, cfg.D, cfg.bd, cfg.perm,
        basis_lo=blo, basis_hi=bhi, extra=extra, fmt=cfg.fmt, rot=rot,
        flip=cfg.flip, bbox_full=bfull,
        out_dtype=jnp.bfloat16 if _GRAD_BF16 else _F32)
    # the cotangent dtype must match the primal: f32 normally, bf16 in
    # lean mode (render_frame_train feeds a bf16 planar then — both
    # sides key off the same _GRAD_BF16 trace-time knob)
    return (grad_planar.astype(jnp.bfloat16 if _GRAD_BF16 else _F32),
            jnp.zeros_like(params),
            jnp.zeros_like(zb), jnp.zeros_like(extra))


_march_diff_pallas.defvjp(_march_pallas_fwd, _march_pallas_bwd)

#: lean-training knob: emit the backward kernel's payload cotangent in
#: bf16 (halves the second-largest training tensor; ~8-bit-mantissa
#: gradient rounding BEFORE the f32 pyramid reduction). Default off —
#: gradient-parity tests pin the f32 path; FrameTrainer(lean=True) flips
#: it (callers must jax.clear_caches() after flipping by hand).
_GRAD_BF16 = False


# ---------------------------------------------------------------------------
# Frame-level API
# ---------------------------------------------------------------------------

def render_frame_train(data, bmap: BakeMap, grid: DenseGrid, transform,
                       fx, fy, perm: Tuple[int, int, int], flip: bool,
                       width: int, height: int, opt: RenderOptions,
                       gi: int = 512, use_custom_vjp: bool = True,
                       cull: bool = False, backend: str = "auto"):
    """Differentiable (H, W, 4) render of one pose from leaf ``data``.

    data: (K, >=D) float32 trainable leaf payloads (flattened tree rows),
        OR a pyramid tuple from ``data_to_pyramid`` — the scatter-free
        grid-space parameterization (the production training state; the
        (K, D) form costs an XLA scatter per step in the bake).
    grid: DenseGrid for static metadata (scale/offset/extra/occupancy) —
        its baked payload is NOT used; voxels come from ``data`` via
        ``bmap`` so gradients flow to the leaves.
    use_custom_vjp: False switches to plain autodiff through the scan
        (O(n_slabs) residual memory; for tests).
    cull: skip slabs empty at *bake* time. Default False for training —
        occupancy changes as ``data`` trains, and a culled slab can never
        receive gradient, so density could not grow back into it.
    backend: "auto" (Pallas kernels when available, else XLA scan),
        "pallas", or "scan". The Pallas path runs both the march and its
        hand-derived backward as fused TPU kernels — the XLA scan's
        per-slab gathers measure ~4000x slower than forward rendering at
        800^2 on v5e.
    """
    opt = opt.replace(renormalize=False, render_depth=False)
    if isinstance(data, (tuple, list)):
        payload = bake_from_pyramid(
            tuple(p.astype(_F32) for p in data), bmap)
    else:
        payload = bake_from_data(data.astype(_F32), bmap)
    geom = slab_render.FrameGeom(grid, transform, fx, fy, perm, flip,
                                 width, height, opt, gi)
    if cull:
        ids = grid.slab_ids(perm[0], flip, float(opt.sigma_thresh))
    else:
        order = range(grid.G - 1, -1, -1) if flip else range(grid.G)
        ids = tuple(order)
    cfg = SlabCfg(G=grid.G, gi=gi, D=grid.data_dim, bd=grid.basis_dim,
                  fmt=int(grid.fmt), perm=perm, flip=flip, ids=ids, opt=opt)
    if backend == "auto":
        backend = ("pallas" if use_custom_vjp and _pallas_train_ok(cfg)
                   else "scan")
    if backend == "pallas":
        # lean mode: cast BEFORE the transpose — the planar copy and every
        # adjoint buffer at this boundary then materialize in bf16 (half
        # the G=256 step's largest transients; the kernel consumed bf16
        # either way, so forward values are identical)
        pdt = jnp.bfloat16 if _GRAD_BF16 else _F32
        planar = jnp.transpose(payload.astype(pdt),
                               (perm[0], 3, perm[1], perm[2]))
        inv_scale = 1.0 / geom.scale
        params = lax.stop_gradient(_pack_geom_params(geom, cfg, inv_scale))
        zb = lax.stop_gradient(jnp.stack([geom.z_lo_pix, geom.z_hi_pix]))
        acc, T = _march_diff_pallas(cfg, planar, params, zb,
                                    lax.stop_gradient(grid.extra))
    else:
        pperm = jnp.transpose(payload, perm + (3,))
        gm = dict(cz=geom.cz, cy=geom.cy, cx=geom.cx,
                  uy=geom.uy, ux=geom.ux,
                  z_lo=geom.z_lo_pix, z_hi=geom.z_hi_pix,
                  scale=geom.scale, lo=geom.lo, hi=geom.hi,
                  dirM=geom.dirM)
        gm = {k: lax.stop_gradient(v) for k, v in gm.items()}
        march = _march_diff if use_custom_vjp else _march_fwd_impl
        acc, T = march(cfg, pperm, lax.stop_gradient(grid.extra), gm)
    # training finalize: smooth alpha = 1 - T (no renorm, no hard switch)
    inter = jnp.concatenate([acc, (1.0 - T)[..., None]], -1)
    return slab_render._warp_to_screen(
        inter, opt, geom.R, geom.fx, geom.fy, width, height, gi, perm,
        geom.u0, geom.du, geom.v0, geom.dv, geom.scale, precise=True,
        ndc=grid.ndc, origin=lax.stop_gradient(geom.origin_w))


def loss_and_grad_frame(data, bmap: BakeMap, grid: DenseGrid, transform,
                        fx, fy, perm, flip, width: int, height: int,
                        target, opt: RenderOptions, gi: int = 512,
                        cull: bool = False):
    """Mean-squared RGB pixel loss for one pose + its per-leaf gradients."""

    def loss_fn(d):
        out = render_frame_train(d, bmap, grid, transform, fx, fy, perm,
                                 flip, width, height, opt, gi, cull=cull)
        diff = out[..., :3] - target[..., :3]
        return jnp.mean(diff * diff)

    return jax.value_and_grad(loss_fn)(data)


def loss_and_grad_frames_sharded(data, bmap: BakeMap, grid: DenseGrid,
                                 transforms, fx, fy, perm, flip,
                                 width: int, height: int, targets,
                                 opt: RenderOptions, mesh,
                                 gi: int = 512, axis_name: str = "frames"):
    """DP over poses: each device scans its local frame shard through the
    slab VJP accumulating leaf grads, then ONE psum all-reduces (loss, grad)
    over ICI — the frame-level analog of dist.loss_and_grad_sharded.

    transforms: (F, 3, 4), targets: (F, H, W, 4), F divisible by the mesh
    size; all poses must share (perm, flip) (group them like bench.py does).
    Returns (loss, grad) replicated.
    """
    from jax.sharding import PartitionSpec as P
    n_total = transforms.shape[0]

    def local(data_l, trs_l, tgts_l):
        def body(g_sum, tr_tgt):
            tr, tgt = tr_tgt

            def loss_fn(d):
                out = render_frame_train(d, bmap, grid, tr, fx, fy, perm,
                                         flip, width, height, opt, gi)
                diff = out[..., :3] - tgt[..., :3]
                return jnp.sum(diff * diff) / (
                    3.0 * width * height * n_total)

            loss, g = jax.value_and_grad(loss_fn)(data_l)
            return jax.tree_util.tree_map(jnp.add, g_sum, g), loss

        g0 = jax.tree_util.tree_map(jnp.zeros_like, data_l)
        g, losses = lax.scan(body, g0, (trs_l, tgts_l))
        loss = lax.psum(jnp.sum(losses), axis_name)
        g = jax.tree_util.tree_map(lambda x: lax.psum(x, axis_name), g)
        return loss, g

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()), check_vma=False)
    return fn(data, jnp.asarray(transforms, _F32),
              jnp.asarray(targets, _F32))


# ---------------------------------------------------------------------------
# Z-sharded training march (CP/TP for the fast training path)
# ---------------------------------------------------------------------------

def _make_zsharded_march(cfg: SlabCfg, mesh, axis_name: str):
    """Custom-VJP slab march whose payload is z-SHARDED across ``mesh``:
    each device marches (and back-marches) its own z-segment of the volume
    through the fused kernels. The forward combines segments with the
    associative (C, T) rule; the backward needs NO serialization — every
    suffix-algebra prefix a segment requires derives from the forward
    partials:

        T_in_d = prod_{d' upstream} T_d'            (transmittance prefix)
        A_in_d = sum_{d' upstream} T_in_d' * B_d',
        B_d'   = sum_c gacc_c * C_local_d'_c        (since per-segment
                 sum_j w_loc G_pix = sum_c gacc_c * C_local_c)

    so the per-segment backward kernel just starts from state (T_in, A_in)
    (``march_slabs_bwd(state_init=...)``) — the same equations as the
    whole-grid march with a different initial state.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from volrend_tpu.ops import pallas_slab

    n = mesh.shape[axis_name]
    G = cfg.G
    assert G % n == 0, f"G={G} not divisible by mesh axis {n}"
    Gl = G // n
    gi = cfg.gi
    blo, bhi, rot, bfull = _pallas_statics(cfg)
    ids = (tuple(range(Gl - 1, -1, -1)) if cfg.flip else tuple(range(Gl)))
    march_order = (range(n - 1, -1, -1) if cfg.flip else range(n))

    def _fwd_parts(planar, params, zb, extra):
        def local(pay_l, params_l, zb_l, extra_l):
            i = jax.lax.axis_index(axis_name).astype(_F32)
            acc4 = pallas_slab.march_slabs(
                pay_l.astype(jnp.bfloat16), params_l,
                jnp.ones((cfg.D,), _F32), zb_l, G, gi, cfg.D, cfg.bd,
                cfg.perm, slab_ids=ids, basis_lo=blo, basis_hi=bhi,
                sig2=False, extra=extra_l, fmt=cfg.fmt, depth=False,
                rot=rot, flip=cfg.flip, bbox_full=bfull,
                z_base=i * (Gl / G))
            return jax.lax.all_gather(acc4, axis_name)  # (n, 4, gi, gi)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P()),
            out_specs=P(), check_rep=False,
        )(planar, params, zb, extra)

    def _combine(parts):
        C = jnp.zeros((3, gi, gi), _F32)
        T = jnp.ones((gi, gi), _F32)
        for j in march_order:
            C = C + T[None] * parts[j, :3]
            T = T * parts[j, 3]
        return jnp.concatenate([C, T[None]])

    @jax.custom_vjp
    def march(planar, params, zb, extra):
        acc4 = _combine(_fwd_parts(planar, params, zb, extra))
        return jnp.moveaxis(acc4[:3], 0, -1), acc4[3]

    def fwd(planar, params, zb, extra):
        parts = _fwd_parts(planar, params, zb, extra)
        acc4 = _combine(parts)
        return ((jnp.moveaxis(acc4[:3], 0, -1), acc4[3]),
                (planar, params, zb, extra, parts, acc4))

    def bwd(res, gbar):
        planar, params, zb, extra, parts, acc4 = res
        g_acc, g_T = gbar
        gacc4 = jnp.concatenate([
            jnp.moveaxis(g_acc.astype(_F32), -1, 0),
            g_T.astype(_F32)[None]])
        # per-device incoming (T, A) from the forward partials
        T_in = [None] * n
        A_in = [None] * n
        Tc = jnp.ones((gi, gi), _F32)
        Ac = jnp.zeros((gi, gi), _F32)
        for d in march_order:
            T_in[d], A_in[d] = Tc, Ac
            B_d = jnp.sum(gacc4[:3] * parts[d, :3], axis=0)
            Ac = Ac + Tc * B_d
            Tc = Tc * parts[d, 3]
        state = jnp.stack([jnp.stack([T_in[d], A_in[d]])
                           for d in range(n)])          # (n, 2, gi, gi)

        def local(pay_l, state_l, params_l, zb_l, extra_l, gacc_l, acc_l):
            i = jax.lax.axis_index(axis_name).astype(_F32)
            return pallas_slab.march_slabs_bwd(
                pay_l.astype(jnp.bfloat16), params_l,
                jnp.ones((cfg.D,), _F32), zb_l, gacc_l, acc_l,
                G, gi, cfg.D, cfg.bd, cfg.perm, basis_lo=blo,
                basis_hi=bhi, extra=extra_l, fmt=cfg.fmt, rot=rot,
                flip=cfg.flip, bbox_full=bfull,
                z_base=i * (Gl / G), state_init=state_l[0])

        grad = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P()),
            out_specs=P(axis_name), check_rep=False,
        )(planar, state, params, zb, extra, gacc4, acc4)
        return (grad.astype(planar.dtype), jnp.zeros_like(params),
                jnp.zeros_like(zb), jnp.zeros_like(extra))

    march.defvjp(fwd, bwd)
    return march


def render_frame_train_zsharded(data, bmap: BakeMap, grid: DenseGrid,
                                transform, fx, fy,
                                perm: Tuple[int, int, int], flip: bool,
                                width: int, height: int, opt: RenderOptions,
                                mesh, gi: int = 512,
                                axis_name: str = "z"):
    """``render_frame_train`` with the march (fwd AND bwd kernels)
    z-sharded across ``mesh`` — the memory-scaling mode for whole-frame
    training of grids beyond one chip's HBM (at bench scale the f32
    payload + cotangents alone exceed a 16 GB chip). Segment semantics
    apply (stop_thresh=0; training renders already run renormalize=False).
    """
    opt = opt.replace(renormalize=False, render_depth=False,
                      stop_thresh=0.0)
    if isinstance(data, (tuple, list)):
        payload = bake_from_pyramid(
            tuple(p.astype(_F32) for p in data), bmap)
    else:
        payload = bake_from_data(data.astype(_F32), bmap)
    geom = slab_render.FrameGeom(grid, transform, fx, fy, perm, flip,
                                 width, height, opt, gi)
    order = range(grid.G - 1, -1, -1) if flip else range(grid.G)
    cfg = SlabCfg(G=grid.G, gi=gi, D=grid.data_dim, bd=grid.basis_dim,
                  fmt=int(grid.fmt), perm=perm, flip=flip,
                  ids=tuple(order), opt=opt)
    if not _pallas_train_ok(cfg):
        raise ValueError("grid/options not supported by the fused kernels")
    planar = jnp.transpose(payload, (perm[0], 3, perm[1], perm[2]))
    inv_scale = 1.0 / geom.scale
    params = lax.stop_gradient(_pack_geom_params(geom, cfg, inv_scale))
    zb = lax.stop_gradient(jnp.stack([geom.z_lo_pix, geom.z_hi_pix]))
    march = _make_zsharded_march(cfg, mesh, axis_name)
    acc, T = march(planar, params, zb, lax.stop_gradient(grid.extra))
    inter = jnp.concatenate([acc, (1.0 - T)[..., None]], -1)
    return slab_render._warp_to_screen(
        inter, opt, geom.R, geom.fx, geom.fy, width, height, gi, perm,
        geom.u0, geom.du, geom.v0, geom.dv, geom.scale, precise=True,
        ndc=grid.ndc, origin=lax.stop_gradient(geom.origin_w))
