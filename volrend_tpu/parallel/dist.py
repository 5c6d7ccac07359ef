"""Distributed rendering & training: rays sharded over a device mesh.

The reference is strictly single-device — its only parallelism is the
per-pixel CUDA grid (``src/cuda/volrend.cu:86,228-233``). The TPU-native
scaling model (SURVEY.md §2.3, §5.8) keeps that structure but lifts it onto a
``jax.sharding.Mesh``:

- **DP over rays** (the primary axis): the flat ray batch is sharded along a
  1-D ``rays`` mesh axis with ``shard_map``; the octree (child/data/lut) is
  replicated. Rays are independent, so forward rendering needs **zero**
  collectives.
- **Gradients**: each shard scatter-adds into its local per-leaf gradient
  buffer; one ``psum`` over the mesh all-reduces them across ICI. That is the
  only communication in a training step.
- **Multi-host**: the same code runs under ``jax.distributed.initialize``;
  pose batches are sharded per process, images gathered only if requested.

All functions take the mesh explicitly so tests can run on a virtual 8-device
CPU mesh (``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volrend_tpu.models.n3tree import TreeArrays
from volrend_tpu.ops import grad as grad_mod
from volrend_tpu.ops import render_jax
from volrend_tpu.utils.options import RenderOptions

__all__ = [
    "make_mesh", "replicate_tree", "shard_rays", "render_rays_sharded",
    "render_image_sharded", "loss_and_grad_sharded", "pad_to_multiple",
    "render_rays_cp", "render_frame_slab_zsharded",
]


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    """A flat 1-D mesh over all (or the given) devices.

    A single ``rays`` axis is the right topology for a renderer: rays are
    independent, so any physical arrangement (ring, torus slice, multi-host)
    flattens to one logical data axis; the only collective (grad psum) is a
    full all-reduce that XLA maps onto ICI rings itself.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_tree(tree: TreeArrays, mesh: Mesh) -> TreeArrays:
    """Place every tree array fully-replicated on the mesh (one HBM copy per
    chip, like the reference's per-GPU cudaMalloc upload, src/cuda/n3tree.cu)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), tree)


def pad_to_multiple(arr: np.ndarray, m: int, axis: int = 0):
    """Pad axis 0 up to a multiple of m; returns (padded, original_len)."""
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths), n


def shard_rays(origins, dirs, mesh: Mesh, axis_name: str = "rays"):
    """Pad + device_put rays sharded along the mesh axis.

    Returns (origins, dirs, n_valid)."""
    n_dev = mesh.shape[axis_name]
    origins, n = pad_to_multiple(np.asarray(origins), n_dev)
    dirs, _ = pad_to_multiple(np.asarray(dirs), n_dev)
    sh = NamedSharding(mesh, P(axis_name))
    return (jax.device_put(jnp.asarray(origins), sh),
            jax.device_put(jnp.asarray(dirs), sh), n)


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


@partial(jax.jit, static_argnames=("opt", "mesh", "axis_name"))
def render_rays_sharded(tree: TreeArrays, origins, dirs, opt: RenderOptions,
                        mesh: Mesh, axis_name: str = "rays"):
    """Forward render with rays sharded across the mesh; returns (R, 4) RGBA
    sharded the same way. Zero collectives — pure DP."""
    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)

    def local(tree_l, o_l, d_l):
        return render_jax.render_rays(tree_l, o_l, d_l, opt)

    fn = _shmap(local, mesh,
                in_specs=(tree_spec, P(axis_name), P(axis_name)),
                out_specs=P(axis_name))
    return fn(tree, origins, dirs)


def render_image_sharded(tree: TreeArrays, cam, opt: RenderOptions,
                         mesh: Mesh, axis_name: str = "rays") -> np.ndarray:
    """Full-frame render sharded over the mesh; returns (H, W, 4) on host."""
    origins, dirs = cam.pixel_rays(xp=np)
    o, d, n = shard_rays(origins, dirs, mesh, axis_name)
    out = render_rays_sharded(tree, o, d, opt, mesh, axis_name)
    return np.asarray(out)[:n].reshape(cam.height, cam.width, 4)


@partial(jax.jit, static_argnames=("opt", "mesh", "axis_name"))
def render_rays_cp(tree: TreeArrays, origins, dirs, opt: RenderOptions,
                   mesh: Mesh, axis_name: str = "rays"):
    """Context-parallel compositing (SURVEY.md §5.7): the march's t-range is
    split into one segment per device — the renderer's analog of
    ring/blockwise attention. Rays are REPLICATED; each device integrates
    its own t-segment, and segments combine with the associative
    front-to-back rule (C, T) o (C', T') = (C + T C', T T').

    Per-segment early termination is disabled (a segment cannot know its
    incoming transmittance), so this uses training semantics
    (stop_thresh=0, no renorm). Returns (R, 4) RGBA, replicated.

    Use when per-ray state is huge or the march is extremely long; the
    default DP-over-rays mode is faster for ordinary scenes.
    """
    from volrend_tpu.ops.render_jax import (_dda_world, _march,
                                            _precalc_basis, prepare_rays,
                                            tree_meta)
    seg_opt = opt.replace(stop_thresh=0.0, renormalize=False)
    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    n_dev = mesh.shape[axis_name]
    meta = tree_meta(tree)

    def local(tree_l, o, d):
        cen, dd, vdir, invdir, delta_scale = prepare_rays(
            tree_l, o, d, seg_opt)
        basis_vals = _precalc_basis(tree_l, vdir, seg_opt)
        tmin, tmax = _dda_world(cen, invdir, seg_opt.render_bbox)
        i = jax.lax.axis_index(axis_name).astype(jnp.float32)
        span = (tmax - tmin) / n_dev
        lo = tmin + i * span
        hi = jnp.where(i == n_dev - 1, tmax, tmin + (i + 1) * span)
        # interior boundaries clamp dt so optical depth isn't double
        # counted; the last segment overshoots like the reference tail
        dt_clamp = jnp.where(i == n_dev - 1, jnp.inf, hi)
        rgb, alpha = _march(tree_l.data, tree_l.child, tree_l.lut, meta,
                            seg_opt, cen, dd, invdir, delta_scale,
                            basis_vals, lo, hi, differentiable=False,
                            train=True, dt_clamp=dt_clamp)
        seg = jnp.concatenate([rgb, (1.0 - alpha)[:, None]], -1)
        # gather all segments (ordered by device) and fold front-to-back
        segs = jax.lax.all_gather(seg, axis_name)       # (n_dev, R, 4)

        def combine(carry, s):
            c, t = carry
            return (c + t[:, None] * s[:, :3], t * s[:, 3]), None

        (c, t), _ = jax.lax.scan(
            combine, (jnp.zeros_like(seg[:, :3]), jnp.ones(seg.shape[0])),
            segs)
        rgb_out = c + _F32(seg_opt.background_brightness) * t[:, None]
        return jnp.concatenate([rgb_out, (1.0 - t)[:, None]], -1)

    fn = _shmap(local, mesh, in_specs=(tree_spec, P(), P()),
                out_specs=P())
    return fn(tree, origins, dirs)


_F32 = jnp.float32


def render_frame_slab_zsharded(grid, transform, fx, fy,
                               width: int, height: int, opt: RenderOptions,
                               mesh: Mesh, gi: int = 512,
                               axis_name: str = "z"):
    """Context/tensor-parallel FAST path: the slab-major payload is
    z-SHARDED across devices (each chip holds 1/n of the dense volume —
    the TP answer for grids larger than one chip's HBM), every device
    marches its own z-segment through the fused Pallas kernel
    (``march_slabs(z_base=...)``), and segments merge with the associative
    front-to-back rule (C, T) o (C', T') = (C + T C', T T') — the same
    decomposition as ``render_rays_cp``, applied to the T3 slab march.

    Per-segment early termination cannot see upstream transmittance, so
    segment semantics apply (stop_thresh=0, no renorm; the per-pixel
    z-interval liveness gates still skip non-contributing windows).
    Returns the (H, W, 4) frame, replicated.
    """
    from jax.experimental.shard_map import shard_map
    from volrend_tpu.ops import pallas_slab, slab_render

    transform = np.asarray(transform, np.float32).reshape(3, 4)
    perm, flip, slope = slab_render.choose_axis(
        grid, transform, fx, fy, width, height)
    if not (np.isfinite(slope) and slope < slab_render.MAX_SLAB_SLOPE):
        raise ValueError("pose not renderable by the slab path")
    seg_opt = opt.replace(stop_thresh=0.0, renormalize=False)
    if not slab_render._pallas_ok(grid, seg_opt):
        raise ValueError("grid/options not supported by the fused kernel")

    n = mesh.shape[axis_name]
    G = grid.G
    if G % n:
        raise ValueError(f"G={G} not divisible by mesh axis {n}")
    Gl = G // n

    g = slab_render.FrameGeom(grid, jnp.asarray(transform), fx, fy, perm,
                              flip, width, height, seg_opt, gi)
    params, zb = slab_render._pallas_frame_fields(grid, g, perm, flip,
                                                  seg_opt)
    payload = slab_render._permuted_grid(grid, perm, True)[0]

    blo, bhi = seg_opt.basis_minmax
    rotm = slab_render._rodrigues(seg_opt.rot_dirs)
    rot = (None if rotm is None
           else tuple(float(v) for v in rotm.reshape(-1)))
    ids = (tuple(range(Gl - 1, -1, -1)) if flip else tuple(range(Gl)))
    march_order = (range(n - 1, -1, -1) if flip else range(n))

    def local(pay_l, params_l, zb_l, qs_l, extra_l):
        i = jax.lax.axis_index(axis_name).astype(_F32)
        z_base = i * (Gl / G)
        acc4 = pallas_slab.march_slabs(
            pay_l, params_l, qs_l, zb_l, G, gi, grid.data_dim,
            grid.basis_dim, perm, slab_ids=ids, basis_lo=int(blo),
            basis_hi=int(bhi), sig2=grid.quantized, extra=extra_l,
            fmt=int(grid.fmt), depth=bool(seg_opt.render_depth), rot=rot,
            flip=flip, bbox_full=slab_render._bbox_full(seg_opt),
            # display path: same window-shared shading dirs as the
            # single-chip renderer (window centers are global via z_base,
            # so K-aligned shards reproduce the single-chip planes
            # exactly and z-sharded-vs-single parity holds bit-tight)
            dir_win=pallas_slab._DIR_WIN,
            z_base=z_base)
        parts = jax.lax.all_gather(acc4, axis_name)     # (n, 4, gi, gi)
        C = jnp.zeros((3, gi, gi), _F32)
        T = jnp.ones((gi, gi), _F32)
        for j in march_order:
            C = C + T[None] * parts[j, :3]
            T = T * parts[j, 3]
        return jnp.concatenate([C, T[None]])

    extra = grid.extra
    if extra is None or np.prod(np.shape(extra)) == 0:
        extra = jnp.zeros((1,), _F32)
    acc = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P()),
        out_specs=P(), check_rep=False,
    )(payload, params, jnp.stack([g.z_lo_pix, g.z_hi_pix]),
      jnp.asarray(grid.qscale, _F32), jnp.asarray(extra, _F32).reshape(-1))

    rgb = jnp.moveaxis(acc[:3], 0, -1)
    T = acc[3]
    stopped = jnp.zeros_like(T, bool)
    return slab_render._finalize_and_warp(
        grid, rgb, T, stopped, seg_opt, g.R, g.fx, g.fy, width, height,
        gi, perm, g.u0, g.du, g.v0, g.dv, g.scale, origin=g.origin_w)


def render_frames_slab_zsharded(grid, transforms, fx, fy,
                                width: int, height: int, opt: RenderOptions,
                                mesh: Mesh, gi: int = 512,
                                axis_name: str = "z"):
    """Batched ``render_frame_slab_zsharded``: all poses must share one
    (perm, flip) group (split by ``slab_render.choose_axis`` first, like
    bench.py's pose grouping); the sharded payload is materialized once
    and every pose marches in one ``lax.map`` dispatch. Returns
    (N, H, W, 4), replicated."""
    from jax.experimental.shard_map import shard_map
    from volrend_tpu.ops import pallas_slab, slab_render

    transforms = np.asarray(transforms, np.float32).reshape(-1, 3, 4)
    keys = {slab_render.choose_axis(grid, t, fx, fy, width, height)[:2]
            for t in transforms}
    if len(keys) != 1:
        raise ValueError(f"poses span {len(keys)} (perm, flip) groups; "
                         "split them first")
    (perm, flip), = keys
    seg_opt = opt.replace(stop_thresh=0.0, renormalize=False)
    if not slab_render._pallas_ok(grid, seg_opt):
        raise ValueError("grid/options not supported by the fused kernel")
    n = mesh.shape[axis_name]
    G = grid.G
    if G % n:
        raise ValueError(f"G={G} not divisible by mesh axis {n}")
    Gl = G // n

    def fields(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip,
                                  width, height, seg_opt, gi)
        params, zb = slab_render._pallas_frame_fields(grid, g, perm, flip,
                                                      seg_opt)
        return (params, zb, g.R, g.u0, g.du, g.v0, g.dv, g.origin_w)

    stacked = jax.vmap(fields)(jnp.asarray(transforms))
    payload = slab_render._permuted_grid(grid, perm, True)[0]

    blo, bhi = seg_opt.basis_minmax
    rotm = slab_render._rodrigues(seg_opt.rot_dirs)
    rot = (None if rotm is None
           else tuple(float(v) for v in rotm.reshape(-1)))
    ids = (tuple(range(Gl - 1, -1, -1)) if flip else tuple(range(Gl)))
    march_order = (range(n - 1, -1, -1) if flip else range(n))
    extra = grid.extra
    if extra is None or np.prod(np.shape(extra)) == 0:
        extra = jnp.zeros((1,), _F32)

    def local(pay_l, stacked_l, qs_l, extra_l):
        i = jax.lax.axis_index(axis_name).astype(_F32)
        z_base = i * (Gl / G)

        def one(args):
            params_l, zb_l = args
            acc4 = pallas_slab.march_slabs(
                pay_l, params_l, qs_l, zb_l, G, gi, grid.data_dim,
                grid.basis_dim, perm, slab_ids=ids, basis_lo=int(blo),
                basis_hi=int(bhi), sig2=grid.quantized, extra=extra_l,
                fmt=int(grid.fmt), depth=bool(seg_opt.render_depth),
                rot=rot, flip=flip,
                bbox_full=slab_render._bbox_full(seg_opt),
                # same window-shared shading dirs as the single-pose /
                # single-chip display paths (see render_frame_slab_zsharded)
                dir_win=pallas_slab._DIR_WIN, z_base=z_base)
            parts = jax.lax.all_gather(acc4, axis_name)
            C = jnp.zeros((3, gi, gi), _F32)
            T = jnp.ones((gi, gi), _F32)
            for j in march_order:
                C = C + T[None] * parts[j, :3]
                T = T * parts[j, 3]
            return jnp.concatenate([C, T[None]])

        return jax.lax.map(one, (stacked_l[0], stacked_l[1]))

    accs = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), (P(), P()), P(), P()),
        out_specs=P(), check_rep=False,
    )(payload, (stacked[0], stacked[1]),
      jnp.asarray(grid.qscale, _F32), jnp.asarray(extra, _F32).reshape(-1))

    def finalize(args):
        acc, R, u0, du, v0, dv, origin = args
        rgb = jnp.moveaxis(acc[:3], 0, -1)
        T = acc[3]
        return slab_render._finalize_and_warp(
            grid, rgb, T, jnp.zeros_like(T, bool), seg_opt, R,
            jnp.asarray(fx, _F32), jnp.asarray(fy, _F32), width, height,
            gi, perm, u0, du, v0, dv, grid.scale, origin=origin)

    return jax.lax.map(finalize, (accs, stacked[2], stacked[3], stacked[4],
                                  stacked[5], stacked[6], stacked[7]))


def stack_trees(trees) -> TreeArrays:
    """Stack multiple scenes into one leading-axis pytree for multi-scene
    sharding (the EP analog: scenes as experts on device subsets;
    BASELINE.json configs[4]). Trees must share meta (N, data_dim, format,
    depths); capacities are padded to the largest."""
    import dataclasses
    metas = {(t.N, t.data_dim, t.basis_dim, int(t.fmt), t.max_depth,
              t.lut_depth) for t in trees}
    assert len(metas) == 1, "scenes must share tree meta to stack"
    kmax = max(t.child.shape[0] for t in trees)

    def padded(t):
        pad = kmax - t.child.shape[0]
        return (jnp.pad(t.child, (0, pad)),
                jnp.pad(t.data, ((0, pad), (0, 0))))

    childs, datas = zip(*(padded(t) for t in trees))
    t0 = trees[0]
    return dataclasses.replace(
        t0,
        child=jnp.stack(childs),
        data=jnp.stack(datas),
        offset=jnp.stack([t.offset for t in trees]),
        scale=jnp.stack([t.scale for t in trees]),
        extra=jnp.stack([t.extra for t in trees]),
        lut=jnp.stack([t.lut for t in trees]),
    )


@partial(jax.jit, static_argnames=("opt", "mesh"))
def render_scenes_sharded(stacked: TreeArrays, origins, dirs,
                          opt: RenderOptions, mesh: Mesh):
    """Render S scenes' ray batches on a 2-D ('scene', 'rays') mesh: each
    scene group holds S / mesh['scene'] octrees (scene-sharded HBM) and
    splits their rays over the 'rays' axis. origins/dirs: (S, R, 3);
    S must be a multiple of the 'scene' axis size and R of the 'rays'
    size. Returns (S, R, 4)."""
    S = origins.shape[0]
    n_scene = mesh.shape["scene"]
    n_rays = mesh.shape["rays"]
    if S % n_scene:
        raise ValueError(
            f"{S} scenes do not tile the 'scene' axis ({n_scene} groups); "
            f"pad the batch or reshape the mesh")
    if origins.shape[1] % n_rays:
        raise ValueError(
            f"ray count {origins.shape[1]} not divisible by the 'rays' "
            f"axis ({n_rays}); pad with dist.pad_to_multiple")
    if stacked.child.shape[0] != S:
        raise ValueError(
            f"stacked tree holds {stacked.child.shape[0]} scenes but "
            f"{S} ray batches were given")
    tree_spec = jax.tree_util.tree_map(lambda _: P("scene"), stacked)

    def local(tree_l, o, d):
        # scan over this group's local scenes (S / n_scene of them)
        def one(_, args):
            tree1, o1, d1 = args
            return None, render_jax.render_rays(tree1, o1, d1, opt)

        _, out = jax.lax.scan(one, None, (tree_l, o, d))
        return out

    fn = _shmap(local, mesh,
                in_specs=(tree_spec, P("scene", "rays"), P("scene", "rays")),
                out_specs=P("scene", "rays"))
    return fn(stacked, origins, dirs)


@partial(jax.jit, static_argnames=("opt", "mesh", "axis_name"))
def loss_and_grad_sharded(tree: TreeArrays, data, origins, dirs, target,
                          opt: RenderOptions, mesh: Mesh,
                          axis_name: str = "rays"):
    """Sharded training step core: mean-squared pixel loss + per-leaf grads.

    data: (K, data_dim) master copy (float32 recommended) — replicated.
    origins/dirs/target: sharded along ``axis_name``.
    Returns (loss scalar, grad (K, data_dim)) — both fully replicated after
    the ``psum`` over ICI (the step's only collective)."""
    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    n_total = origins.shape[0]

    def local(tree_l, data_l, o_l, d_l, tgt_l):
        def loss_fn(dat):
            out = grad_mod.render_rays_train(tree_l, o_l, d_l, opt, data=dat)
            diff = out[:, :3] - tgt_l[:, :3]
            # sum here; normalize by the global count so the psum'd value is
            # the true global mean
            return jnp.sum(diff * diff) / (3.0 * n_total)

        loss, g = jax.value_and_grad(loss_fn)(data_l)
        loss = jax.lax.psum(loss, axis_name)
        g = jax.lax.psum(g.astype(jnp.float32), axis_name)
        return loss, g

    fn = _shmap(local, mesh,
                in_specs=(tree_spec, P(), P(axis_name), P(axis_name),
                          P(axis_name)),
                out_specs=(P(), P()))
    return fn(tree, data, origins, dirs, target)
