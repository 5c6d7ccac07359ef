"""Decompose the pyramid training step (G=128, 800^2, gi=448).

Stages timed separately (each jitted, synced via host transfer):
  bake        : bake_from_pyramid -> (G,G,G,D) f32
  bake+planar : + transpose to channel-planar bf16 (kernel input)
  march fwd   : Pallas forward kernel from a fixed planar payload
  march bwd   : Pallas backward kernel
  warp fwd    : _warp_to_screen precise=True from fixed intermediate
  warp f16    : same with precise=False (full-table class)
  fwd total   : render_frame_train(pyramid)
  step total  : loss_and_grad_frame(pyramid)
  bake VJP    : vjp of bake_from_pyramid alone
  warp VJP    : vjp of the precise warp alone
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops import dense_grid, slab_grad, slab_render, pallas_slab
from volrend_tpu.utils.options import RenderOptions
import bench as bench_mod

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def main():
    log(f"backend={jax.default_backend()} pallas={pallas_slab.available()}")
    W = H = 800
    gi = 448
    tree = N3Tree("/tmp/_d6tree.npz")
    dev = tree.to_device(lut_depth=None)
    fgrid = dense_grid.bake_dense(dev, dtype="f16")
    bmap = slab_grad.build_bake_map(dev)
    opt = RenderOptions(max_steps=1024).replace(renormalize=False,
                                               render_depth=False)
    cam = bench_mod.orbit_poses(8)[0]
    perm, flip, _ = slab_render.choose_axis(
        fgrid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform, jnp.float32)
    data = jnp.asarray(dev.data, jnp.float32)
    pyr = jax.jit(lambda d: slab_grad.data_to_pyramid(d, bmap))(data)
    jax.block_until_ready(pyr)
    G, D = fgrid.G, fgrid.data_dim
    log(f"G={G} D={D} gi={gi}")

    # bake
    bake = jax.jit(lambda p: slab_grad.bake_from_pyramid(p, bmap))
    t = sync_time(bake, pyr)
    log(f"bake fwd          : {t*1e3:8.2f} ms")

    bakep = jax.jit(lambda p: jnp.transpose(
        slab_grad.bake_from_pyramid(p, bmap),
        (perm[0], 3, perm[1], perm[2])).astype(jnp.bfloat16))
    t = sync_time(bakep, pyr)
    log(f"bake+planar bf16  : {t*1e3:8.2f} ms")

    # bake VJP
    ctg = jnp.ones((G, G, G, D), jnp.float32)
    bakev = jax.jit(lambda p, c: jax.vjp(
        lambda pp: slab_grad.bake_from_pyramid(pp, bmap), p)[1](c))
    t = sync_time(bakev, pyr, ctg)
    log(f"bake VJP          : {t*1e3:8.2f} ms")

    # march kernels from fixed planar payload
    planar = bakep(pyr)
    jax.block_until_ready(planar)
    cfg = slab_grad.SlabCfg(G=G, gi=gi, D=D, bd=fgrid.basis_dim,
                            fmt=int(fgrid.fmt), perm=perm, flip=flip,
                            ids=tuple(range(G - 1, -1, -1) if flip
                                      else range(G)), opt=opt)
    geom = slab_render.FrameGeom(fgrid, tr, cam.fx, cam.fy, perm, flip,
                                 W, H, opt, gi)
    params = slab_grad._pack_geom_params(geom, cfg, 1.0 / geom.scale)
    zb = jnp.stack([geom.z_lo_pix, geom.z_hi_pix])
    jax.block_until_ready((params, zb))

    mf = jax.jit(lambda pl_, pa_, zb_: slab_grad._pallas_fwd_call(
        cfg, pl_, pa_, zb_, fgrid.extra))
    t = sync_time(mf, planar, params, zb)
    log(f"march fwd kernel  : {t*1e3:8.2f} ms")
    acc4 = mf(planar, params, zb)
    jax.block_until_ready(acc4)

    gacc4 = jnp.ones((4, gi, gi), jnp.float32)
    mb = jax.jit(lambda pl_, pa_, zb_, g_, a_: pallas_slab.march_slabs_bwd(
        pl_.astype(jnp.bfloat16), pa_, jnp.ones((D,), jnp.float32), zb_,
        g_, a_, G, gi, D, fgrid.basis_dim, perm, extra=fgrid.extra,
        fmt=int(fgrid.fmt), flip=flip))
    t = sync_time(mb, planar, params, zb, gacc4, acc4)
    log(f"march bwd kernel  : {t*1e3:8.2f} ms")

    # warp alone
    inter = jnp.ones((gi, gi, 4), jnp.float32) * 0.5
    for precise in (True, False):
        wf = jax.jit(lambda it: slab_render._warp_to_screen(
            it, opt, geom.R, geom.fx, geom.fy, W, H, gi, perm,
            geom.u0, geom.du, geom.v0, geom.dv, geom.scale,
            precise=precise))
        t = sync_time(wf, inter)
        log(f"warp fwd prec={int(precise)}   : {t*1e3:8.2f} ms")
    wv = jax.jit(lambda it, c: jax.vjp(
        lambda x: slab_render._warp_to_screen(
            x, opt, geom.R, geom.fx, geom.fy, W, H, gi, perm,
            geom.u0, geom.du, geom.v0, geom.dv, geom.scale,
            precise=True), it)[1](c))
    cot = jnp.ones((H, W, 4), jnp.float32)
    t = sync_time(wv, inter, cot)
    log(f"warp VJP prec=1   : {t*1e3:8.2f} ms")

    # full forward + step
    tf = jax.jit(lambda p, t_: slab_grad.render_frame_train(
        p, bmap, fgrid, t_, cam.fx, cam.fy, perm, flip, W, H, opt, gi))
    t = sync_time(tf, pyr, tr)
    log(f"fwd total         : {t*1e3:8.2f} ms")
    target = tf(pyr, tr)
    target.block_until_ready()

    lg = jax.jit(lambda p, t_, tg: slab_grad.loss_and_grad_frame(
        p, bmap, fgrid, t_, cam.fx, cam.fy, perm, flip, W, H, tg, opt, gi))
    t = sync_time(lg, pyr, tr, target)
    log(f"step total        : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
