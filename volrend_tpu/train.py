"""Training: optimize per-leaf SH/sigma from pixel supervision.

The reference is forward-only; this is the differentiable extension the
TPU build mandates (BASELINE.json): pixel L2 loss -> hand-written fused VJP
(``ops/grad.py``) -> per-leaf gradients -> optax update on a float32 master
copy of the leaf payloads. Multi-device: rays shard over the mesh, leaf
grads all-reduce with one psum (``parallel/dist.py``).

Checkpoints are plain npz of (step, data, opt_state leaves) — the octree
itself re-exports through ``N3Tree.save_npz`` as a reference-compatible
scene file (§5.4: the npz IS the checkpoint format).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from volrend_tpu.models.n3tree import N3Tree, TreeArrays
from volrend_tpu.ops import grad as grad_mod
from volrend_tpu.utils.options import RenderOptions

__all__ = ["Trainer", "FrameTrainer", "psnr", "lean_adam"]


def lean_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, state_dtype=jnp.bfloat16):
    """Adam with BOTH moments stored in ``state_dtype`` (bf16 default) —
    halves the optimizer-state HBM that blocks bench-scale (G=256)
    single-chip training (f32 m+v alone are ~8.4 GB there; VERDICT r4
    item 4). The update math runs in f32; only the carried state rounds.
    bf16's 8 mantissa bits cost ~0.4% relative on sqrt(v) — noise-level
    next to the gradient stochasticity of frame-subset training.

    optax.adam(mu_dtype=...) covers m only; v has no dtype knob, hence
    this transform.
    """
    def init(params):
        z = lambda p: jnp.zeros(jnp.shape(p), state_dtype)
        return (jax.tree_util.tree_map(z, params),
                jax.tree_util.tree_map(z, params),
                jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        del params
        m, v, t = state
        t = t + 1
        mf = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32), m, grads)
        vf = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)), v, grads)
        c1 = 1.0 - b1 ** t.astype(jnp.float32)
        c2 = 1.0 - b2 ** t.astype(jnp.float32)
        upd = jax.tree_util.tree_map(
            lambda mh, vh: (-lr * (mh / c1)
                            / (jnp.sqrt(vh / c2) + eps)).astype(jnp.float32),
            mf, vf)
        cast = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(state_dtype), tree)
        return upd, (cast(mf), cast(vf), t)

    return optax.GradientTransformation(init, update)


def psnr(a, b) -> float:
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return float("inf") if mse == 0 else -10.0 * np.log10(mse)


@partial(jax.jit, static_argnames=("opt", "optimizer"))
def _train_step(tree: TreeArrays, data, opt_state, origins, dirs, target,
                opt: RenderOptions, optimizer):
    def loss_fn(dat):
        out = grad_mod.render_rays_train(tree, origins, dirs, opt, data=dat)
        diff = out[:, :3] - target[:, :3]
        return jnp.mean(diff * diff)

    loss, g = jax.value_and_grad(loss_fn)(data)
    updates, opt_state = optimizer.update(g, opt_state, data)
    data = optax.apply_updates(data, updates)
    return data, opt_state, loss


class Trainer:
    """Optimizes a tree's leaf payloads against (rays, rgb) batches."""

    def __init__(self, tree: TreeArrays, opt: Optional[RenderOptions] = None,
                 optimizer=None, lr: float = 1e-2):
        self.tree = tree
        self.opt = (opt or RenderOptions()).replace(renormalize=False)
        self.optimizer = optimizer or optax.adam(lr)
        self.data = jnp.asarray(tree.data, jnp.float32)
        self.opt_state = self.optimizer.init(self.data)
        self.step_count = 0

    def step(self, origins, dirs, target) -> float:
        """One SGD step on a ray batch; returns the loss."""
        self.data, self.opt_state, loss = _train_step(
            self.tree, self.data, self.opt_state,
            jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(target),
            self.opt, self.optimizer)
        self.step_count += 1
        return float(loss)

    def shard_batch(self, mesh, origins, dirs, target):
        """Pre-shard a ray batch onto the mesh (one host->device transfer);
        pass the result to step_sharded to avoid a per-step round trip."""
        from volrend_tpu.parallel import dist
        o, d, _ = dist.shard_rays(np.asarray(origins), np.asarray(dirs),
                                  mesh)
        t, _, _ = dist.shard_rays(np.asarray(target),
                                  np.zeros_like(np.asarray(origins)), mesh)
        return o, d, t

    def step_sharded(self, mesh, origins, dirs, target) -> float:
        """Multi-device step: rays sharded, grads psum-reduced over ICI.

        Accepts host arrays (sharded here) or device arrays already placed
        by ``shard_batch`` (no per-step host round trip)."""
        from volrend_tpu.parallel import dist
        if isinstance(origins, jax.Array) and isinstance(target, jax.Array):
            o, d, t = origins, dirs, target
        else:
            o, d, t = self.shard_batch(mesh, origins, dirs, target)
        loss, g = dist.loss_and_grad_sharded(
            self.tree, self.data, o, d, t, self.opt, mesh)
        updates, self.opt_state = self.optimizer.update(
            g, self.opt_state, self.data)
        self.data = optax.apply_updates(self.data, updates)
        self.step_count += 1
        return float(loss)

    # -- state export -------------------------------------------------------

    def current_tree(self) -> TreeArrays:
        """TreeArrays with the optimized payloads (f16, render-ready)."""
        return dataclasses.replace(
            self.tree, data=self.data.astype(jnp.float16))

    def export_npz(self, host_tree: N3Tree, path: str) -> None:
        """Write the optimized scene as a reference-compatible npz."""
        ht = host_tree
        shape = (ht.capacity, ht.N, ht.N, ht.N, ht.data_dim)
        rows = np.asarray(self.data, np.float16)[:, :ht.data_dim]
        ht.data = rows.reshape(shape)
        ht.save_npz(path)

    # -- checkpoint / resume (§5.4) -----------------------------------------

    def save_checkpoint(self, path: str) -> None:
        leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        np.savez(
            path,
            step=np.int64(self.step_count),
            data=np.asarray(self.data, np.float32),
            n_opt_leaves=np.int64(len(leaves)),
            **{f"opt_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )

    def restore_checkpoint(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            self.step_count = int(z["step"])
            self.data = jnp.asarray(z["data"])
            n = int(z["n_opt_leaves"])
            leaves = [jnp.asarray(z[f"opt_{i}"]) for i in range(n)]
        treedef = jax.tree_util.tree_structure(
            self.optimizer.init(self.data))
        self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)


# donate the pyramid + optimizer state: the step returns their updated
# twins, and without donation XLA inserts defensive whole-array copies of
# the ~400 MB level arrays (profiled ~1.2 ms each at G=128)
@partial(jax.jit, static_argnames=("fx", "fy", "perm", "flip", "width",
                                   "height", "opt", "gi", "optimizer"),
         donate_argnums=(0, 1))
def _frame_step(data, opt_state, bmap, grid, transform, target,
                fx, fy, perm, flip, width, height, opt, gi, optimizer):
    from volrend_tpu.ops import slab_grad
    loss, g = slab_grad.loss_and_grad_frame(
        data, bmap, grid, transform, fx, fy, perm, flip, width, height,
        target, opt, gi=gi)
    updates, opt_state = optimizer.update(g, opt_state, data)
    return optax.apply_updates(data, updates), opt_state, loss


@partial(jax.jit, static_argnames=("fx", "fy", "perm", "flip", "width",
                                   "height", "opt", "gi", "optimizer",
                                   "mesh"),
         donate_argnums=(0, 1))
def _frame_step_sharded(data, opt_state, bmap, grid, transforms, targets,
                        fx, fy, perm, flip, width, height, opt, gi,
                        optimizer, mesh):
    from volrend_tpu.ops import slab_grad
    loss, g = slab_grad.loss_and_grad_frames_sharded(
        data, bmap, grid, transforms, fx, fy, perm, flip, width, height,
        targets, opt, mesh, gi=gi)
    updates, opt_state = optimizer.update(g, opt_state, data)
    return optax.apply_updates(data, updates), opt_state, loss


class FrameTrainer(Trainer):
    """Trains leaf payloads through the FAST slab path (``ops/slab_grad``):
    whole-frame supervision, gradients flowing leaf -> baked grid -> slab
    march -> pixels. This is training at rendering speed — the per-sample
    octree-gather path the base Trainer uses measures ~80 Mrows/s of
    gathers on v5e, while the slab VJP re-streams the dense grid.

    The trainable state lives in GRID space (the per-level pyramid of
    ``slab_grad.data_to_pyramid``): the per-step bake is then pure dense
    upsample+select with a sum-pool transpose — the (K, D) leaf
    parameterization costs an XLA scatter per step (~5 Mrows/s on v5e,
    2 orders above the march). ``data`` stays a (K, D) *view* derived on
    read and converted on write, so checkpoints, export, and the npz
    formats are unchanged (conversions are exact: masked-off pyramid
    entries get zero gradient and never move).
    """

    def __init__(self, tree: TreeArrays, opt: Optional[RenderOptions] = None,
                 optimizer=None, lr: float = 1e-2, G: Optional[int] = None,
                 gi: int = 512, lean: bool = False):
        """lean=True: the bench-scale memory mode (VERDICT r4 item 4) —
        bf16 Adam moments (lean_adam) + bf16 backward-kernel payload
        cotangent (slab_grad._GRAD_BF16). Cuts the G=256 step's HBM
        footprint by ~5.9 GB (4.2 moments + 1.65 cotangent) at ~8-bit
        gradient/state rounding; gradient-parity tests pin the default
        f32 path.

        The gradient-precision knob is PROCESS-GLOBAL and read at trace
        time: constructing a FrameTrainer sets it to THIS trainer's mode
        (latest wins, jit caches cleared), which also retraces any OTHER
        live trainer's next step in the new mode. Mixing lean and
        default trainers in one process is unsupported — use separate
        processes for mixed-precision runs."""
        from volrend_tpu.ops import dense_grid, slab_grad
        # the knob is process-global and read at trace time: set it to
        # THIS trainer's mode either way (latest constructed wins), so a
        # lean run can never silently leak bf16 gradients into a later
        # default-precision trainer in the same process
        if slab_grad._GRAD_BF16 != lean:
            slab_grad._GRAD_BF16 = lean
            jax.clear_caches()
        if lean and optimizer is None:
            optimizer = lean_adam(lr)
        self.gi = gi
        self.grid = dense_grid.bake_dense(tree, G=G)
        if lean:
            # training never reads the display bake's payload (voxels come
            # from the trainable pyramid via bmap; the grid supplies only
            # metadata + occupancy) — dropping it frees ~1.4 GB at G=256
            # (f16 payload + bf16 sigma plane). render_current-style
            # callers re-bake from the pyramid anyway.
            self.grid = dataclasses.replace(
                self.grid,
                data=jnp.zeros((0,), jnp.float16),
                sigma_grid=jnp.zeros((0,), jnp.bfloat16))
        self.bmap = slab_grad.build_bake_map(tree, G=G)
        self._K = int(np.asarray(tree.data).shape[0])
        self._dim = int(np.asarray(tree.data).shape[-1])
        super().__init__(tree, opt, optimizer, lr)
        # re-init optimizer state over the pyramid (base init saw the view)
        self.opt_state = self.optimizer.init(self.pyramid)

    # ``data`` is a derived view over the pyramid ---------------------------

    @property
    def data(self):
        from volrend_tpu.ops import slab_grad
        return slab_grad.pyramid_to_data(self.pyramid, self.bmap, self._K,
                                         data_dim=self._dim)

    @data.setter
    def data(self, value):
        from volrend_tpu.ops import slab_grad
        self.pyramid = slab_grad.data_to_pyramid(
            jnp.asarray(value, jnp.float32), self.bmap)

    def step(self, *args, **kw) -> float:
        raise TypeError(
            "FrameTrainer optimizes grid-space (pyramid) parameters and "
            "takes whole-frame supervision (step_frame / "
            "step_frames_sharded); use Trainer for ray-batch training")

    step_sharded = step

    def restore_checkpoint(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            self.step_count = int(z["step"])
            self.data = jnp.asarray(z["data"])
            n = int(z["n_opt_leaves"])
            leaves = [jnp.asarray(z[f"opt_{i}"]) for i in range(n)]
        treedef = jax.tree_util.tree_structure(
            self.optimizer.init(self.pyramid))
        self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)

    def _group(self, cam):
        from volrend_tpu.ops import slab_render
        perm, flip, slope = slab_render.choose_axis(
            self.grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
        if not np.isfinite(slope):
            raise ValueError("pose not slab-renderable; use Trainer.step")
        return perm, flip

    def step_frame(self, cam, target, sync: bool = True):
        """One SGD step on a full frame; returns the loss.

        sync=False returns the loss as a DEVICE array without blocking:
        steps then enqueue back-to-back and the dispatch round trip
        (~26 ms through the axon tunnel) overlaps device compute — the
        steady-state regime of a real training loop. Fetch any returned
        loss (float()) to synchronize."""
        perm, flip = self._group(cam)
        self.pyramid, self.opt_state, loss = _frame_step(
            self.pyramid, self.opt_state, self.bmap, self.grid,
            jnp.asarray(cam.transform), jnp.asarray(target),
            float(cam.fx), float(cam.fy), perm, flip,
            cam.width, cam.height, self.opt, self.gi, self.optimizer)
        self.step_count += 1
        return float(loss) if sync else loss

    def step_frame_zsharded(self, mesh, cam, target,
                            axis_name: str = "z") -> float:
        """One SGD step with the march's fwd+bwd kernels z-SHARDED over
        ``mesh`` (slab_grad.render_frame_train_zsharded) — the
        memory-scaling mode for grids whose f32 payload + cotangents
        exceed one chip's HBM. Segment semantics (stop_thresh=0)."""
        from volrend_tpu.ops import slab_grad

        perm, flip = self._group(cam)
        tr = jnp.asarray(cam.transform)
        tgt = jnp.asarray(target, jnp.float32)

        @partial(jax.jit, static_argnames=())
        def step(data, opt_state):
            def loss_fn(d):
                out = slab_grad.render_frame_train_zsharded(
                    d, self.bmap, self.grid, tr, float(cam.fx),
                    float(cam.fy), perm, flip, cam.width, cam.height,
                    self.opt, mesh, gi=self.gi, axis_name=axis_name)
                diff = out[..., :3] - tgt[..., :3]
                return jnp.mean(diff * diff)

            loss, g = jax.value_and_grad(loss_fn)(data)
            updates, opt_state = self.optimizer.update(g, opt_state, data)
            return optax.apply_updates(data, updates), opt_state, loss

        self.pyramid, self.opt_state, loss = step(self.pyramid,
                                                  self.opt_state)
        self.step_count += 1
        return float(loss)

    def place_frames(self, cams, targets):
        """Pre-place a pose batch's targets on device ONCE; pass the result
        as ``targets`` to step_frames_sharded on every epoch. Without this
        each step re-uploads the whole target batch from host (~80 MB at
        8x800^2 — seconds through the axon tunnel, dwarfing the ~30 ms
        step)."""
        return jnp.asarray(np.stack([np.asarray(t) for t in targets]),
                           jnp.float32)

    def step_frames_sharded(self, mesh, cams, targets) -> float:
        """Multi-device step: poses sharded over the mesh, leaf grads
        psum-reduced (one collective). All cams must share (perm, flip) and
        (fx, fy, W, H); len(cams) divisible by the mesh size. ``targets``
        may be a host list (uploaded here, every call) or the device array
        from ``place_frames`` (no per-step transfer)."""
        groups = {self._group(c) for c in cams}
        if len(groups) != 1:
            raise ValueError(f"poses span {len(groups)} (perm, flip) "
                             "groups; shard each group separately")
        (perm, flip), = groups
        cam = cams[0]
        trs = np.stack([c.transform for c in cams])
        if not isinstance(targets, jax.Array):
            targets = self.place_frames(cams, targets)
        self.pyramid, self.opt_state, loss = _frame_step_sharded(
            self.pyramid, self.opt_state, self.bmap, self.grid,
            jnp.asarray(trs), targets,
            float(cam.fx), float(cam.fy), perm, flip,
            cam.width, cam.height, self.opt, self.gi, self.optimizer, mesh)
        self.step_count += 1
        return float(loss)
