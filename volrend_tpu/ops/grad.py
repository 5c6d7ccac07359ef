"""Hand-written backward pass: pixel gradients -> per-leaf SH/sigma gradients.

The reference renderer is forward-only; this is the differentiable extension
mandated by BASELINE.json. Two paths:

1. ``render_rays(..., differentiable=True)`` (ops/render_jax.py): plain
   ``jax.grad`` through a fixed-length scan — simple, memory O(steps), used
   as the ground truth for the fused path.

2. ``render_rays_train`` here: a ``jax.custom_vjp`` whose forward is the fast
   masked while-loop march and whose backward *re-marches* the rays with O(1)
   memory per ray, exploiting that front-to-back compositing lets suffix
   sums be reconstructed from the forward totals:

       out_c    = sum_i w_i s_ci + bg * T_end,   w_i = T_i (1 - att_i)
       dL/ds_i  = g_c w_i                         (-> SH coeffs via sigmoid')
       dL/dsig_i = dt_i * delta * [ T_i att_i G_i - (Ctot - A_i)
                                    - T_end (bg * sum_c g_c - g_alpha) ]
       with G_i = sum_c g_c s_ci, A_i = prefix sum of w_j G_j (j <= i),
       Ctot = sum_c g_c acc_c — all recomputable in one forward re-march.

   Leaf gradients are scatter-added into a dense [K, data_dim] f32 buffer
   (segment reduction; the Pallas bwd kernel can replace this later without
   changing the API).

Training semantics: no early-stop renormalization (rt_core.cuh:181-183 is a
display-only rescale), smooth alpha = 1 - T_end. Early termination at
stop_thresh is kept as an epsilon-sized truncation of the integral.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from volrend_tpu.models.n3tree import TreeArrays
from volrend_tpu.ops.render_jax import (TreeMeta, _dda_world, _march,
                                        _precalc_basis, _sample_step,
                                        prepare_rays, tree_meta)
from volrend_tpu.utils.options import RenderOptions

_F32 = jnp.float32

__all__ = ["render_rays_train", "render_train_vjp", "l2_loss_and_grad"]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_render(opt: RenderOptions, meta: TreeMeta, data, child, lut,
                  basis_vals, cen, d, invdir, delta_scale, tmin, tmax):
    """Primal: while-loop march with training semantics; returns (R,4) RGBA
    with background composited."""
    rgb, alpha = _march(data, child, lut, meta, opt, cen, d, invdir,
                        delta_scale, basis_vals, tmin, tmax,
                        differentiable=False, train=True)
    rgb = rgb + (_F32(opt.background_brightness) * (1.0 - alpha))[:, None]
    return jnp.concatenate([rgb, alpha[:, None]], -1)


def _fused_fwd(opt, meta, data, child, lut, basis_vals, cen, d, invdir,
               delta_scale, tmin, tmax):
    out = _fused_render(opt, meta, data, child, lut, basis_vals, cen, d,
                        invdir, delta_scale, tmin, tmax)
    # acc and T_end are recoverable from the output — nothing else to save.
    res = (data, child, lut, basis_vals, cen, d, invdir, delta_scale,
           tmin, tmax, out)
    return out, res


def _fused_bwd(opt: RenderOptions, meta: TreeMeta, res, g):
    (data, child, lut, basis_vals, cen, d, invdir, delta_scale,
     tmin, tmax, out) = res
    Rn = cen.shape[0]
    bg = _F32(opt.background_brightness)
    g_rgb = g[:, :3].astype(_F32)
    g_alpha = g[:, 3].astype(_F32)

    light_end = 1.0 - out[:, 3]
    acc = out[:, :3] - bg * light_end[:, None]
    ctot = jnp.einsum("rc,rc->r", g_rgb, acc)
    gsum = jnp.sum(g_rgb, -1)
    # dL/dT_end: background enters each channel, alpha = 1 - T_end
    dl_dlight = bg * gsum - g_alpha

    hit = (tmax >= 0) & (tmin <= tmax)
    bd = meta.basis_dim

    state = dict(
        t=jnp.where(hit, tmin, tmax),
        light=jnp.ones(Rn, _F32),
        prefix=jnp.zeros(Rn, _F32),
        active=hit & (tmin < tmax),
        grad=jnp.zeros(data.shape, _F32),
    )

    def body(carry):
        s, i = carry
        leaf_idx, sigma, delta_t, rgb_s, _ = _sample_step(
            data, child, lut, meta, opt, cen, d, invdir, basis_vals, s["t"])
        valid = s["active"] & (sigma > opt.sigma_thresh)
        dt_ds = delta_t * delta_scale
        att = jnp.exp(-dt_ds * sigma)
        weight = s["light"] * (1.0 - att)
        G = jnp.einsum("rc,rc->r", g_rgb, rgb_s)
        prefix = s["prefix"] + jnp.where(valid, weight * G, 0.0)

        dsigma = dt_ds * (s["light"] * att * G - (ctot - prefix)
                          - light_end * dl_dlight)
        if bd >= 0:
            # d raw_ck = g_c * w_i * s_ci (1 - s_ci); d coeff = d raw * basis_k
            graw = (g_rgb * weight[:, None]) * rgb_s * (1.0 - rgb_s)  # (R,3)
            gcoef = (graw[:, :, None] * basis_vals[:, None, :]).reshape(
                Rn, 3 * bd)
        else:
            gcoef = g_rgb * weight[:, None]
        row = jnp.concatenate([gcoef, dsigma[:, None]], -1)      # (R, D)
        pad = data.shape[1] - row.shape[1]
        if pad:
            row = jnp.pad(row, ((0, 0), (0, pad)))
        row = jnp.where(valid[:, None], row, 0.0)
        grad = s["grad"].at[leaf_idx].add(row)

        light = jnp.where(valid, s["light"] * att, s["light"])
        stopped_now = valid & (light < opt.stop_thresh)
        active = s["active"] & ~stopped_now
        t = jnp.where(active, s["t"] + delta_t, s["t"])
        active = active & (t < tmax)
        return (dict(t=t, light=light, prefix=prefix, active=active,
                     grad=grad), i + 1)

    def cond(carry):
        s, i = carry
        return jnp.any(s["active"]) & (i < opt.max_steps)

    (state, _) = lax.while_loop(cond, body, (state, jnp.int32(0)))
    grad_data = state["grad"].astype(data.dtype)

    def zf(x):
        return jnp.zeros_like(x)

    def zi(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (grad_data, zi(child), zi(lut), zf(basis_vals), zf(cen), zf(d),
            zf(invdir), zf(delta_scale), zf(tmin), zf(tmax))


_fused_render.defvjp(_fused_fwd, _fused_bwd)


def render_rays_train(tree: TreeArrays, origins, dirs, opt: RenderOptions,
                      data=None):
    """Differentiable render with the fused hand-written VJP.

    Gradients flow to ``data`` (per-leaf SH coefficients + sigma) only —
    camera/ray gradients are not propagated (BASELINE.json requires leaf
    gradients). Pass ``data`` explicitly (float32 recommended) to
    differentiate w.r.t. a master copy; defaults to ``tree.data``.
    """
    if opt.render_depth:
        raise NotImplementedError("training through depth mode")
    if data is None:
        data = tree.data
    cen, d, vdir, invdir, delta_scale = prepare_rays(tree, origins, dirs, opt)
    basis_vals = _precalc_basis(tree, vdir, opt)
    tmin, tmax = _dda_world(cen, invdir, opt.render_bbox)
    return _fused_render(opt, tree_meta(tree), data, tree.child, tree.lut,
                         lax.stop_gradient(basis_vals),
                         lax.stop_gradient(cen), lax.stop_gradient(d),
                         lax.stop_gradient(invdir),
                         lax.stop_gradient(delta_scale),
                         lax.stop_gradient(tmin), lax.stop_gradient(tmax))


def render_train_vjp(tree: TreeArrays, origins, dirs, opt: RenderOptions,
                     g, data=None):
    """Convenience: apply the fused VJP to an upstream RGBA cotangent ``g``.

    Returns (rgba, grad_data)."""
    if data is None:
        data = tree.data

    def f(dat):
        return render_rays_train(tree, origins, dirs, opt, data=dat)

    out, vjp = jax.vjp(f, data)
    return out, vjp(g)[0]


def l2_loss_and_grad(tree: TreeArrays, origins, dirs, target,
                     opt: RenderOptions, data=None):
    """Mean-squared pixel loss on RGB + its per-leaf gradients."""
    if data is None:
        data = tree.data

    def loss_fn(dat):
        out = render_rays_train(tree, origins, dirs, opt, data=dat)
        diff = out[:, :3] - target[:, :3]
        return jnp.mean(diff * diff)

    return jax.value_and_grad(loss_fn)(data)
