"""Leaf-sharded octree: tensor parallelism for trees exceeding per-chip HBM.

The default mode replicates the tree per chip (like the reference's per-GPU
``cudaMalloc``). For trees larger than one chip's HBM, this module shards
the leaf payload array ``data[K, D]`` row-wise across the mesh and resolves
leaf fetches collectively (SURVEY.md §2.3 TP row):

    every march step:
      1. all_gather the step's leaf indices over the axis      (R_total i32)
      2. each device gathers the rows it owns, zeros the rest  (local HBM)
      3. psum_scatter returns each device its answered rows    (R_local x D)

The fetch object plugs into the renderer through the same ``fetch_rows``
interface as QuantLeaves, so `render_rays` works unchanged inside
``shard_map``. Communication is ~R_total*(4 + 4D) bytes per step over ICI —
this mode trades bandwidth for capacity; use it only when the tree cannot
replicate.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volrend_tpu.models.n3tree import TreeArrays
from volrend_tpu.ops import render_jax
from volrend_tpu.utils.options import RenderOptions

__all__ = ["ShardedLeaves", "shard_tree_leaves", "render_rays_leaf_sharded",
           "loss_and_grad_leaf_sharded"]


def _register(cls):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=["rows"],
        meta_fields=["axis_name", "rows_per_shard", "n_total", "data_dim"],
    )(cls)


@_register
@dataclasses.dataclass
class ShardedLeaves:
    """Row-sharded leaf payloads; resolves fetches with collectives.

    rows: (rows_per_shard, D) — THIS device's slice (inside shard_map).
    """
    rows: object
    axis_name: str = "rays"
    rows_per_shard: int = 0
    n_total: int = 0
    data_dim: int = 4

    @property
    def shape(self):
        return (self.n_total, self.data_dim)

    @property
    def dtype(self):
        return self.rows.dtype

    def fetch_rows(self, leaf_idx):
        ax = self.axis_name
        i = jax.lax.axis_index(ax)
        # 1) everyone sees every request
        all_idx = jax.lax.all_gather(leaf_idx, ax)       # (n_dev, R)
        flat = all_idx.reshape(-1)
        # 2) answer the rows this shard owns
        local = flat - i * self.rows_per_shard
        mine = (local >= 0) & (local < self.rows_per_shard)
        got = self.rows[jnp.clip(local, 0, self.rows_per_shard - 1)]
        got = jnp.where(mine[:, None], got.astype(jnp.float32), 0.0)
        # 3) route each device its own answered slice
        n_dev = all_idx.shape[0]
        got = got.reshape(n_dev, -1, self.data_dim)
        ans = jax.lax.psum_scatter(got, ax, scatter_dimension=0,
                                   tiled=False)
        return ans.reshape(leaf_idx.shape + (self.data_dim,))


def shard_tree_leaves(tree: TreeArrays, mesh: Mesh,
                      axis_name: str = "rays"):
    """Place ``data`` row-sharded on the mesh (everything else replicated).

    Returns (tree_with_padded_data, rows_per_shard). Use with
    ``render_rays_leaf_sharded``."""
    n_dev = mesh.shape[axis_name]
    data = tree.data
    k = data.shape[0]
    pad = (-k) % n_dev
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    data = jax.device_put(data, NamedSharding(mesh, P(axis_name)))
    repl = NamedSharding(mesh, P())
    rest = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        dataclasses.replace(tree, data=jnp.zeros((0, tree.data.shape[1]),
                                                 tree.data.dtype)))
    return dataclasses.replace(rest, data=data), (k + pad) // n_dev


@partial(jax.jit, static_argnames=("opt", "mesh", "axis_name",
                                   "rows_per_shard"))
def render_rays_leaf_sharded(tree: TreeArrays, origins, dirs,
                             opt: RenderOptions, mesh: Mesh,
                             rows_per_shard: int,
                             axis_name: str = "rays"):
    """Forward render with the octree payload sharded across devices and
    rays sharded the same way; child/LUT stay replicated (they are ~10x
    smaller than data for SH16 trees)."""
    spec = jax.tree_util.tree_map(lambda _: P(), tree)
    spec = dataclasses.replace(spec, data=P(axis_name))

    def local(tree_l, o, d):
        leaves = ShardedLeaves(
            rows=tree_l.data, axis_name=axis_name,
            rows_per_shard=rows_per_shard,
            n_total=rows_per_shard * mesh.shape[axis_name],
            data_dim=tree_l.data.shape[1])
        tree_s = dataclasses.replace(tree_l, data=leaves)
        return render_jax.render_rays(tree_s, o, d, opt,
                                      sync_axis=axis_name)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec, P(axis_name), P(axis_name)),
                       out_specs=P(axis_name), check_vma=False)
    return fn(tree, origins, dirs)


@partial(jax.jit, static_argnames=("opt", "mesh", "axis_name"))
def loss_and_grad_leaf_sharded(tree: TreeArrays, rows, origins, dirs,
                               target, opt: RenderOptions, mesh: Mesh,
                               axis_name: str = "rays"):
    """TP training step core: leaf payloads sharded at rest, gathered for
    compute, gradients scattered back — the ZeRO-3/FSDP pattern on the
    renderer's leaf table.

    The per-step fetch collectives of the serving path (``fetch_rows``)
    would make the backward a collective per march step; for training the
    right TPU shape is one ``all_gather`` of the rows up front (XLA
    overlaps it with ray setup), the fused re-march VJP on the gathered
    table, then one ``psum_scatter`` returning each device the gradient
    rows it owns. Parameters, optimizer state, and gradients stay sharded
    at rest — only the transient f32 gather is full-size, and it frees at
    step end (the regime CLAUDE.md calls leaf-sharded multi-chip training).

    rows: (rows_per_shard*n_dev, D) f32 master copy, sharded along dim 0.
    origins/dirs/target: sharded along ``axis_name``.
    Returns (replicated loss scalar, grad sharded like ``rows``).
    """
    from volrend_tpu.ops import grad as grad_mod
    # the tree rides in with its (possibly sharded) payload dropped: voxel
    # values come from the gathered ``rows`` (pad rows past the true leaf
    # count are never indexed by child/LUT, so they are harmless to keep)
    tree = dataclasses.replace(
        tree, data=jnp.zeros((0, rows.shape[1]), rows.dtype))
    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    n_total = origins.shape[0]

    def local(tree_l, rows_l, o_l, d_l, tgt_l):
        data_full = jax.lax.all_gather(rows_l, axis_name, tiled=True)

        def loss_fn(dat):
            out = grad_mod.render_rays_train(tree_l, o_l, d_l, opt,
                                             data=dat)
            diff = out[:, :3] - tgt_l[:, :3]
            return jnp.sum(diff * diff) / (3.0 * n_total)

        loss, g = jax.value_and_grad(loss_fn)(data_full)
        loss = jax.lax.psum(loss, axis_name)
        g = jax.lax.psum_scatter(g.astype(jnp.float32), axis_name,
                                 scatter_dimension=0, tiled=True)
        return loss, g

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(tree_spec, P(axis_name), P(axis_name),
                                 P(axis_name), P(axis_name)),
                       out_specs=(P(), P(axis_name)), check_vma=False)
    return fn(tree, rows, origins, dirs, target)
