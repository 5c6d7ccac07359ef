"""Why does the production quad gather run 1.5 ms when the standalone
probe measured 0.62 (1 Grow/s)?

  a  synthetic scanline indices (perf_warp2's idx_s)     — the 0.62 claim
  b  REAL pose indices, precomputed on host, passed in   — locality test
  c  real indices computed in-jit from geometry          — fusion test
  d  c + combine+bg (production consumer)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


_F32 = jnp.float32


def main():
    W = H = 800
    gi = 448
    N = 24
    tree = bench_mod.get_tree()
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    log("setup")
    opt = RenderOptions(max_steps=1024)
    cams = bench_mod.orbit_poses(96)
    groups = {}
    for c in cams:
        perm, flip, _ = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        groups.setdefault((perm, flip), []).append(c.transform)
    (perm, flip), trs_all = max(groups.items(), key=lambda kv: len(kv[1]))
    fx, fy = cams[0].fx, cams[0].fy
    trs = jnp.asarray(np.stack(trs_all[:N]), jnp.float32)

    rng = np.random.RandomState(0)
    inter16 = jnp.asarray(rng.rand(gi, gi, 4), jnp.float16)
    quad = jnp.concatenate([
        inter16[:-1, :-1], inter16[:-1, 1:], inter16[1:, :-1],
        inter16[1:, 1:]], -1)
    flatq = quad.reshape((gi - 1) * (gi - 1), 16)

    def planes(tr):
        g = slab_render.FrameGeom(grid, tr, fx, fy, perm, flip, W, H, opt,
                                  gi)
        px = (jnp.arange(W, dtype=_F32) - 0.5 * W) / fx
        py = -(jnp.arange(H, dtype=_F32) - 0.5 * H) / fy
        d_cam = jnp.stack([
            jnp.broadcast_to(px[None, :], (H, W)),
            jnp.broadcast_to(py[:, None], (H, W)),
            -jnp.ones((H, W), _F32)], -1)
        d_world_s = jnp.einsum("hwc,kc->hwk", d_cam, g.R)
        d_tree_s = d_world_s * grid.scale
        us, vs = slab_render._slopes_from_dirs(d_tree_s, perm)
        gy = (us - g.u0) / g.du
        gx = (vs - g.v0) / g.dv
        ok = (gy >= 0) & (gy <= gi - 1) & (gx >= 0) & (gx <= gi - 1)
        gy = jnp.clip(gy, 0.0, gi - 1 - 1e-6)
        gx = jnp.clip(gx, 0.0, gi - 1 - 1e-6)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0c = jnp.minimum(y0, gi - 2)
        x0c = jnp.minimum(x0, gi - 2)
        return ok, gy, gx, y0, x0, y0c * (gi - 1) + x0c

    # real per-pose flat indices, precomputed
    idx_real = jax.jit(jax.vmap(lambda tr: planes(tr)[5]))(trs)
    idx_real.block_until_ready()
    yy = np.clip((np.arange(H) * (gi - 2) / H).astype(np.int32), 0, gi - 2)
    xx = np.clip((np.arange(W) * (gi - 2) / W).astype(np.int32), 0, gi - 2)
    idx_s = jnp.asarray(yy[:, None] * (gi - 1) + xx[None, :], jnp.int32)
    salts = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def a(fq, i2, s):
        return lax.map(lambda salt: jnp.sum(
            fq[jnp.minimum(i2 + salt, fq.shape[0] - 1)].astype(_F32)), s)

    r = sync_time(a, flatq, idx_s, salts)
    log(f"a synthetic scanline idx : {1e3 * r / N:6.2f} ms/frame")

    @jax.jit
    def b(fq, idxs):
        return lax.map(lambda i2: jnp.sum(fq[i2].astype(_F32)), idxs)

    r = sync_time(b, flatq, idx_real)
    log(f"b real idx precomputed   : {1e3 * r / N:6.2f} ms/frame")

    @jax.jit
    def c(fq, ts):
        def one(tr):
            i2 = planes(tr)[5]
            return jnp.sum(fq[i2].astype(_F32))
        return lax.map(one, ts)

    r = sync_time(c, flatq, trs)
    log(f"c real idx in-jit        : {1e3 * r / N:6.2f} ms/frame")

    @jax.jit
    def d(fq, ts):
        def one(tr):
            ok, gy, gx, y0, x0, i2 = planes(tr)
            q = fq[i2].reshape(H, W, 4, 4)
            fy_ = (gy - y0)[..., None].astype(jnp.float16)
            fx_ = (gx - x0)[..., None].astype(jnp.float16)
            v00, v01, v10, v11 = (q[..., 0, :], q[..., 1, :],
                                  q[..., 2, :], q[..., 3, :])
            out = ((v00 * (1 - fx_) + v01 * fx_) * (1 - fy_)
                   + (v10 * (1 - fx_) + v11 * fx_) * fy_)
            out = jnp.where(ok[..., None], out, 0.0).astype(_F32)
            rgb = out[..., :3] + 1.0 - out[..., 3:4]
            return jnp.sum(jnp.concatenate([rgb, out[..., 3:4]], -1))
        return lax.map(one, ts)

    r = sync_time(d, flatq, trs)
    log(f"d + combine+bg           : {1e3 * r / N:6.2f} ms/frame")


if __name__ == "__main__":
    main()
