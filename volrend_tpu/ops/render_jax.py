"""T2: the pure-JAX batched renderer (differentiable, runs on CPU/TPU).

One semantics — the oracle's (``ops/oracle.py``, transcribed from
``rt_core.cuh:66-196``) — executed the TPU way:

- rays are a flat batch; every step processes all active rays (the vector
  analog of the reference's one-thread-per-pixel CUDA grid, volrend.cu:86);
- the octree query is either a *batched level-synchronous descent* (one
  ``child`` gather per level for the whole batch) or, TPU-first, a single
  gather into a dense leaf-pointer LUT (``models/n3tree.py:build_lut``);
- the march is a masked ``lax.while_loop`` (inference) or fixed-length
  ``lax.scan`` (training; reverse-differentiable, gather VJP = scatter-add
  into per-leaf gradients).

All math float32; leaf data stays fp16 in HBM and is widened per-sample, as
the CUDA path does (rt_core.cuh:118-119).

Internals are written against ``(data, child, lut, meta)`` rather than the
TreeArrays pytree so the hand-written fused VJP (``ops/grad.py``) can share
the exact same march core.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from volrend_tpu.models.data_format import BasisType
from volrend_tpu.models.n3tree import TreeArrays
from volrend_tpu.ops import basis as basis_mod
from volrend_tpu.utils.options import RenderOptions

__all__ = [
    "TreeMeta", "tree_meta", "query_batched", "render_rays", "render_image",
    "world2ndc", "prepare_rays", "make_render_fn",
]

_F32 = jnp.float32


class TreeMeta(NamedTuple):
    """Hashable static description of a TreeArrays (jit-static)."""
    N: int
    data_dim: int
    basis_dim: int
    fmt: int
    max_depth: int
    lut_depth: int
    ndc: Optional[Tuple[float, float, float]]


def tree_meta(tree: TreeArrays) -> TreeMeta:
    return TreeMeta(tree.N, tree.data_dim, tree.basis_dim, int(tree.fmt),
                    tree.max_depth, tree.lut_depth, tree.ndc)


# ---------------------------------------------------------------------------
# Octree query
# ---------------------------------------------------------------------------

def _descend(child_flat, xyz, ptr, cube_sz, leaf_idx, done, N: int,
             n_levels: int):
    """Level-synchronous root->leaf descent for a ray batch.

    Each level is ONE batched gather from ``child`` — all lanes advance
    together, already-finished lanes are masked (the reference's serial
    pointer chase, n3tree_query.hpp:22-47, vectorized)."""
    fN = _F32(N)
    N3 = N ** 3
    for _ in range(n_levels):
        xyz_s = xyz * fN
        idx = jnp.floor(xyz_s)
        ii = idx.astype(jnp.int32)
        index = (ii[..., 0] * N + ii[..., 1]) * N + ii[..., 2]
        xyz_new = xyz_s - idx
        sub_ptr = ptr + index
        skip = child_flat[jnp.clip(sub_ptr, 0, child_flat.shape[0] - 1)]
        is_leaf = (skip == 0) & ~done
        leaf_idx = jnp.where(is_leaf, sub_ptr, leaf_idx)
        cont = ~done & (skip != 0)
        xyz = jnp.where(done[..., None], xyz, xyz_new)
        ptr = jnp.where(cont, ptr + skip * N3, ptr)
        cube_sz = jnp.where(cont, cube_sz * fN, cube_sz)
        done = done | (skip == 0)
    return leaf_idx, cube_sz, xyz


def _query(child, lut, pos, meta: TreeMeta):
    """Batched point query. pos (..., 3) in tree coords.

    Returns (leaf_idx (...,) int32 — flat cell index into data,
             cube_sz (...,) f32 — N**depth of the leaf,
             rel (..., 3) f32 — leaf-local coords in [0,1))."""
    N = meta.N
    xyz = jnp.clip(pos.astype(_F32), 0.0, 1.0 - 1e-6)
    shape = xyz.shape[:-1]
    zeros_i = jnp.zeros(shape, jnp.int32)

    if meta.lut_depth > 0:
        # TPU-native path: one gather resolves (leaf, depth) exactly.
        Rl = N ** meta.lut_depth
        cell = jnp.clip(jnp.floor(xyz * Rl).astype(jnp.int32), 0, Rl - 1)
        flat = (cell[..., 0] * Rl + cell[..., 1]) * Rl + cell[..., 2]
        e = lut.reshape(-1)[flat]
        is_leaf = e >= 0
        leaf_idx = jnp.where(is_leaf, e >> 4, zeros_i)
        depth = jnp.where(is_leaf, e & 15, meta.lut_depth)
        cube_table = jnp.asarray(
            np.float32(N) ** np.arange(16, dtype=np.float32))
        cube_sz = cube_table[depth]
        scaled = xyz * cube_sz[..., None]
        rel = scaled - jnp.floor(scaled)
        n_resid = meta.max_depth + 1 - meta.lut_depth
        if n_resid <= 0:
            return leaf_idx, cube_sz, rel
        # resume descent from the stored interior node at depth lut_depth
        node = jnp.where(is_leaf, zeros_i, -(e + 1))
        ptr = node * (N ** 3)
        cube_sz = jnp.where(is_leaf, cube_sz, _F32(N ** (meta.lut_depth + 1)))
        return _descend(child, rel, ptr, cube_sz, leaf_idx, is_leaf,
                        N, n_resid)

    cube_sz = jnp.full(shape, N, _F32)
    done = jnp.zeros(shape, bool)
    return _descend(child, xyz, zeros_i, cube_sz, zeros_i, done,
                    N, meta.max_depth + 1)


def query_batched(tree: TreeArrays, pos):
    return _query(tree.child, tree.lut, pos, tree_meta(tree))


# ---------------------------------------------------------------------------
# Ray setup
# ---------------------------------------------------------------------------

def world2ndc(ndc: Tuple[float, float, float], dirs, origins):
    """Batched LLFF NDC warp (volrend.cu:34-54)."""
    width, height, focal = (_F32(v) for v in ndc)
    t = -(1.0 + origins[..., 2]) / dirs[..., 2]
    cen = origins + t[..., None] * dirs
    sx = -(2.0 * focal) / width
    sy = -(2.0 * focal) / height
    ndir = jnp.stack([
        sx * (dirs[..., 0] / dirs[..., 2] - cen[..., 0] / cen[..., 2]),
        sy * (dirs[..., 1] / dirs[..., 2] - cen[..., 1] / cen[..., 2]),
        -2.0 / cen[..., 2],
    ], -1)
    ncen = jnp.stack([
        sx * (cen[..., 0] / cen[..., 2]),
        sy * (cen[..., 1] / cen[..., 2]),
        1.0 + 2.0 / cen[..., 2],
    ], -1)
    ndir = ndir / jnp.linalg.norm(ndir, axis=-1, keepdims=True)
    return ndir, ncen


def _rodrigues_matrix(rot_dirs) -> Optional[np.ndarray]:
    """Static axis-angle -> rotation matrix (volrend.cu:57-71); None if ~0."""
    aa = np.asarray(rot_dirs, np.float64)
    angle = np.linalg.norm(aa)
    if angle < 1e-6:
        return None
    k = aa / angle
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) * np.cos(angle) + np.sin(angle) * K
         + (1 - np.cos(angle)) * np.outer(k, k))
    return R.astype(np.float32)


def prepare_rays(tree: TreeArrays, origins, dirs, opt: RenderOptions):
    """World rays -> (cen_tree, dir_unit, vdir, invdir, delta_scale).

    Applies NDC warp, world->tree transform, viewdir rotation, and the
    direction rescale of ``_get_delta_scale`` (rt_core.cuh:51-63)."""
    dirs = dirs.astype(_F32)
    origins = origins.astype(_F32)
    vdir = dirs
    if tree.ndc is not None:
        dirs, origins = world2ndc(tree.ndc, dirs, origins)
    cen = tree.offset + tree.scale * origins
    R = _rodrigues_matrix(opt.rot_dirs)
    if R is not None:
        vdir = vdir @ jnp.asarray(R).T
    d = dirs * tree.scale
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    d = d * delta_scale[..., None]
    invdir = 1.0 / (d + 1e-9)
    return cen, d, vdir, invdir, delta_scale


def _dda_world(cen, invdir, render_bbox):
    """Batched ray/bbox clip (rt_core.cuh:17-34)."""
    bb = np.asarray(render_bbox, np.float32)
    lo = jnp.asarray(bb[:3] + 1e-6)
    hi = jnp.asarray(bb[3:] - 1e-6)
    t1 = (lo - cen) * invdir
    t2 = (hi - cen) * invdir
    tmin = jnp.maximum(0.0, jnp.max(jnp.minimum(t1, t2), -1))
    tmax = jnp.minimum(1e4, jnp.min(jnp.maximum(t1, t2), -1))
    return tmin, tmax


def _dda_unit(rel, invdir):
    """Distance to unit-cube exit (rt_core.cuh:36-49)."""
    t1 = -rel * invdir
    t2 = t1 + invdir
    return jnp.minimum(1e4, jnp.min(jnp.maximum(t1, t2), -1))


def _precalc_basis(tree: TreeArrays, vdir, opt: RenderOptions):
    if tree.basis_dim < 0:
        return jnp.zeros(vdir.shape[:-1] + (0,), _F32)
    vals = basis_mod.eval_basis(
        BasisType(tree.fmt), tree.basis_dim, vdir, tree.extra, xp=jnp)
    return basis_mod.apply_basis_window(
        vals.astype(_F32), opt.basis_minmax, xp=jnp)


# ---------------------------------------------------------------------------
# The march
# ---------------------------------------------------------------------------

def _fetch_rows(data, leaf_idx):
    """Leaf payload gather; dense array or QuantLeaves (on-device dequant)."""
    if hasattr(data, "fetch_rows"):
        return data.fetch_rows(leaf_idx)
    return data[leaf_idx]


def _sample_step(data, child, lut, meta: TreeMeta, opt: RenderOptions,
                 cen, d, invdir, basis_vals, t):
    """One march step's sample quantities for all rays (shared by forward,
    scan-forward and the analytic backward re-march)."""
    Rn = cen.shape[0]
    pos = cen + t[:, None] * d
    leaf_idx, cube_sz, rel = _query(child, lut, pos, meta)
    vals = _fetch_rows(data, leaf_idx).astype(_F32)  # (R, >=D) gather
    sigma = vals[:, meta.data_dim - 1]
    t_sub = _dda_unit(rel, invdir) / cube_sz
    delta_t = t_sub + _F32(opt.step_size)
    if opt.render_depth or meta.basis_dim < 0:
        rgb = vals[:, :3]
        raw = rgb
    else:
        bd = meta.basis_dim
        coeffs = vals[:, :3 * bd].reshape(Rn, 3, bd)
        raw = jnp.einsum("rcb,rb->rc", coeffs, basis_vals)
        rgb = jax.nn.sigmoid(raw)
    return leaf_idx, sigma, delta_t, rgb, raw


def _march(data, child, lut, meta: TreeMeta, opt: RenderOptions,
           cen, d, invdir, delta_scale, basis_vals, tmin, tmax,
           differentiable: bool, n_steps: Optional[int] = None,
           train: Optional[bool] = None, dt_clamp=None,
           sync_axis: Optional[str] = None):
    """Core march loop over a ray batch.

    differentiable=False: masked lax.while_loop until every ray terminates
    (matches the reference's unbounded ``while t < tmax``).
    differentiable=True: fixed-length lax.scan (n_steps iterations) so
    reverse-mode autodiff works.
    train: use training termination semantics (no early-stop renormalization,
    smooth alpha = 1 - light; see SURVEY.md §2.4); defaults to
    ``differentiable``. The fused custom-VJP forward uses while_loop + train
    semantics."""
    Rn = cen.shape[0]
    if train is None:
        train = differentiable

    hit = (tmax >= 0) & (tmin <= tmax)
    state = dict(
        t=jnp.where(hit, tmin, tmax),
        light=jnp.ones(Rn, _F32),
        acc=jnp.zeros((Rn, 3), _F32),
        active=hit & (tmin < tmax),
        stopped=jnp.zeros(Rn, bool),
    )

    def body(s):
        leaf_idx, sigma, delta_t, rgb, _ = _sample_step(
            data, child, lut, meta, opt, cen, d, invdir, basis_vals, s["t"])
        valid = s["active"] & (sigma > opt.sigma_thresh)
        dt_eff = delta_t
        if dt_clamp is not None:
            # context-parallel mode: a segment must not integrate past its
            # boundary (the next device owns [hi, ...)); the ray still
            # ADVANCES by the full voxel skip so termination matches
            dt_eff = jnp.clip(dt_clamp - s["t"], 0.0, delta_t)
        att = jnp.exp(-dt_eff * delta_scale * sigma)
        weight = s["light"] * (1.0 - att)
        if opt.render_depth:
            contrib = jnp.stack(
                [weight * s["t"], jnp.zeros_like(weight),
                 jnp.zeros_like(weight)], -1)
        else:
            contrib = weight[:, None] * rgb
        acc = s["acc"] + jnp.where(valid[:, None], contrib, 0.0)
        light = jnp.where(valid, s["light"] * att, s["light"])
        stopped_now = valid & (light < opt.stop_thresh)
        active = s["active"] & ~stopped_now
        t = jnp.where(active, s["t"] + delta_t, s["t"])
        active = active & (t < tmax)
        return dict(t=t, light=light, acc=acc, active=active,
                    stopped=s["stopped"] | stopped_now)

    if differentiable:
        def scan_body(s, _):
            return body(s), None
        state, _ = lax.scan(scan_body, state, None,
                            length=n_steps or opt.max_steps)
    else:
        def cond(carry):
            s, i = carry
            alive = jnp.any(s["active"])
            if sync_axis is not None:
                # leaf-sharded mode: loop bodies contain collectives, so
                # every device must run the same iteration count
                alive = lax.psum(alive.astype(jnp.int32), sync_axis) > 0
            return alive & (i < opt.max_steps)

        def wbody(carry):
            s, i = carry
            return body(s), i + 1

        (state, _) = lax.while_loop(cond, wbody, (state, jnp.int32(0)))

    return _finalize(state, hit, opt, train)


def _finalize(state, hit, opt: RenderOptions, train: bool):
    """Per-ray termination semantics (rt_core.cuh:176-194)."""
    light, acc, stopped = state["light"], state["acc"], state["stopped"]
    Rn = light.shape[0]
    renorm = stopped & (not train) & opt.renormalize
    if opt.render_depth:
        dep = jnp.minimum(acc[:, 0] * 0.3, 1.0)
        dep = jnp.where(renorm, dep / (1.0 - light), dep)
        rgb = jnp.stack([dep, dep, dep], -1)
        alpha = jnp.ones(Rn, _F32)
    else:
        rgb = jnp.where(renorm[:, None], acc / (1.0 - light[:, None]), acc)
        # early-stopped rays report alpha=1 (rt_core.cuh:183) even when the
        # color renormalization is disabled; training mode keeps the smooth
        # 1-light so gradients stay well-defined
        alpha = jnp.where(stopped & (not train), 1.0, 1.0 - light)
        alpha = jnp.where(hit, alpha, 0.0)
    return rgb, alpha


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def render_rays(tree: TreeArrays, origins, dirs, opt: RenderOptions,
                tmax_bg=None, bg_rgb=None, differentiable: bool = False,
                n_steps: Optional[int] = None,
                sync_axis: Optional[str] = None):
    """Render world-space rays; returns (R, 4) RGBA with background composited
    (render_kernel offscreen semantics, volrend.cu:135-163).

    tmax_bg: optional (R,) world-space distance cap for mesh compositing.
    bg_rgb: optional (R, 3) per-ray background (mesh color); rays where
        tmax_bg is finite composite over it instead of the flat background
        (volrend.cu:152-158 mesh branch)."""
    cen, d, vdir, invdir, delta_scale = prepare_rays(tree, origins, dirs, opt)
    basis_vals = _precalc_basis(tree, vdir, opt)
    tmin, tmax = _dda_world(cen, invdir, opt.render_bbox)
    if tmax_bg is not None:
        tmax = jnp.minimum(tmax, tmax_bg / delta_scale)
    rgb, alpha = _march(tree.data, tree.child, tree.lut, tree_meta(tree), opt,
                        cen, d, invdir, delta_scale, basis_vals, tmin, tmax,
                        differentiable, n_steps, sync_axis=sync_axis)
    remaining = (1.0 - alpha)[:, None]
    bg = _F32(opt.background_brightness)
    if bg_rgb is not None and tmax_bg is not None:
        mesh_hit = jnp.isfinite(tmax_bg)[:, None]
        rgb = rgb + remaining * jnp.where(mesh_hit, bg_rgb, bg)
        alpha = jnp.where(mesh_hit[:, 0], 1.0, alpha)
    else:
        rgb = rgb + bg * remaining
    return jnp.concatenate([rgb, alpha[:, None]], -1)


@partial(jax.jit, static_argnames=("opt", "height", "width", "tile"))
def _render_image_jit(tree, origins, dirs, opt, height, width, tile):
    if tile and origins.shape[0] % tile == 0 and origins.shape[0] > tile:
        # tiled march: each tile's while_loop exits when ITS rays finish,
        # so short rays stop paying for the longest ray in the whole frame
        out = lax.map(
            lambda od: render_rays(tree, od[0], od[1], opt),
            (origins.reshape(-1, tile, 3), dirs.reshape(-1, tile, 3)))
        return out.reshape(height, width, 4)
    out = render_rays(tree, origins, dirs, opt)
    return out.reshape(height, width, 4)


def render_image(tree: TreeArrays, cam, opt: RenderOptions,
                 tile: int = 0) -> jnp.ndarray:
    """Render a full frame; returns (H, W, 4) float32 device array.

    tile: optional ray-tile size (e.g. 1 << 16) — identical output, less
    wasted lane work on frames with divergent march lengths."""
    origins, dirs = cam.pixel_rays(xp=np)
    return _render_image_jit(tree, jnp.asarray(origins), jnp.asarray(dirs),
                             opt, cam.height, cam.width, tile)


def make_render_fn(opt: RenderOptions, height: int, width: int):
    """A jittable (tree, origins, dirs) -> image closure for benchmarking."""
    def fn(tree, origins, dirs):
        return render_rays(tree, origins, dirs, opt).reshape(
            height, width, 4)
    return jax.jit(fn)
