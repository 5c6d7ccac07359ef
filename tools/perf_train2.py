"""Decompose the training step: which stage eats the 393/1233 ms?"""

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
    log(f"default_backend={jax.default_backend()} "
        f"pallas_available={pallas_slab.available()}")
    W = H = 800
    gi = 448
    tree = N3Tree("/tmp/_d6tree.npz")
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="f16")
    bmap = slab_grad.build_bake_map(dev)
    data = jnp.asarray(dev.data, jnp.float32)
    cam = bench_mod.orbit_poses(8)[0]
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    opt = RenderOptions(max_steps=1024).replace(renormalize=False,
                                                render_depth=False)
    tr = jnp.asarray(cam.transform, jnp.float32)
    G, D, bd = grid.G, grid.data_dim, grid.basis_dim
    log(f"setup G={G} D={D}")

    # 1. bake forward
    bake = jax.jit(lambda d: slab_grad.bake_from_data(d, bmap))
    t = sync_time(bake, data)
    log(f"bake fwd            : {t*1e3:8.2f} ms")

    # 2. bake fwd+vjp
    R = jnp.zeros((G, G, G, D), jnp.float32)
    bakeg = jax.jit(lambda d: jax.grad(
        lambda dd: jnp.sum(slab_grad.bake_from_data(dd, bmap)))(d))
    t = sync_time(bakeg, data)
    log(f"bake grad           : {t*1e3:8.2f} ms")

    # 3. march fwd (pallas) from a fixed planar payload
    geom = slab_render.FrameGeom(grid, tr, cam.fx, cam.fy, perm, flip,
                                 W, H, opt, gi)
    ids = tuple(range(G - 1, -1, -1) if flip else range(G))
    cfg = slab_grad.SlabCfg(G=G, gi=gi, D=D, bd=bd, fmt=int(grid.fmt),
                            perm=perm, flip=flip, ids=ids, opt=opt)
    payload = bake(data)
    planar = jnp.transpose(payload, (perm[0], 3, perm[1], perm[2]))
    planar = jax.jit(lambda x: x)(planar)
    params = slab_grad._pack_geom_params(geom, cfg, 1.0 / geom.scale)
    zb = jnp.stack([geom.z_lo_pix, geom.z_hi_pix])
    mf = jax.jit(lambda p: slab_grad._pallas_fwd_call(cfg, p, params, zb,
                                                      grid.extra))
    t = sync_time(mf, planar)
    log(f"march fwd kernel    : {t*1e3:8.2f} ms")
    acc4 = mf(planar)

    # 4. march bwd kernel
    gacc4 = jnp.ones((4, gi, gi), jnp.float32)
    mb = jax.jit(lambda p, a: pallas_slab.march_slabs_bwd(
        p.astype(jnp.bfloat16), params, jnp.ones((D,), jnp.float32), zb,
        gacc4, a, G, gi, D, bd, perm, extra=grid.extra, fmt=int(grid.fmt),
        flip=flip))
    t = sync_time(mb, planar, acc4)
    log(f"march bwd kernel    : {t*1e3:8.2f} ms")

    # 5. payload transpose fwd
    tp = jax.jit(lambda p: jnp.transpose(p, (perm[0], 3, perm[1],
                                             perm[2])))
    t = sync_time(tp, payload)
    log(f"planar transpose    : {t*1e3:8.2f} ms")

    # 6. precise screen warp fwd + vjp
    inter = jnp.ones((gi, gi, 4), jnp.float32) * 0.5
    wf = jax.jit(lambda it: slab_render._warp_to_screen(
        it, opt, geom.R, geom.fx, geom.fy, W, H, gi, perm,
        geom.u0, geom.du, geom.v0, geom.dv, geom.scale, precise=True))
    t = sync_time(wf, inter)
    log(f"warp precise fwd    : {t*1e3:8.2f} ms")
    wg = jax.jit(lambda it: jax.grad(
        lambda x: jnp.sum(slab_render._warp_to_screen(
            x, opt, geom.R, geom.fx, geom.fy, W, H, gi, perm,
            geom.u0, geom.du, geom.v0, geom.dv, geom.scale,
            precise=True)))(it))
    t = sync_time(wg, inter)
    log(f"warp precise fwd+vjp: {t*1e3:8.2f} ms")

    # 7. whole render_frame_train fwd (pallas backend)
    tf = jax.jit(lambda d_: slab_grad.render_frame_train(
        d_, bmap, grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt, gi,
        backend="pallas"))
    t = sync_time(tf, data)
    log(f"train fwd (pallas)  : {t*1e3:8.2f} ms")

    # 8. whole loss+grad (pallas backend)
    tgt = tf(data)
    tgt = jax.jit(lambda x: x)(tgt)

    def loss_fn(dd):
        o = slab_grad.render_frame_train(
            dd, bmap, grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt,
            gi, backend="pallas")
        dd2 = o[..., :3] - tgt[..., :3]
        return jnp.mean(dd2 * dd2)

    lg = jax.jit(lambda d_: jax.value_and_grad(loss_fn)(d_))
    t = sync_time(lg, data)
    log(f"loss+grad (pallas)  : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
