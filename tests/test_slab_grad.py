"""Differentiable slab path: bake pyramid + custom-VJP march.

Gradient ground truths, in order of authority:
1. plain autodiff through the same forward scan (must match ~exactly);
2. central finite differences through the whole chain;
3. training must actually reduce pixel loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import dense_grid, render_jax, slab_grad, slab_render
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions


@pytest.fixture(scope="module")
def scene():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    bmap = slab_grad.build_bake_map(dev)
    data32 = jnp.asarray(dev.data, jnp.float32)
    return dev, grid, bmap, data32


def make_cam(back, width=24, height=24):
    back = np.asarray(back, np.float64)
    back /= np.linalg.norm(back)
    up = (0.0, 0.0, 1.0) if abs(back[2]) < 0.9 else (0.0, 1.0, 0.0)
    return Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                               v_world_up=up, width=width, height=height,
                               fx=30.0)


def frame_setup(scene, back=(1, 0.2, 0.3), width=24, height=24):
    dev, grid, bmap, data32 = scene
    cam = make_cam(back, width, height)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    assert np.isfinite(slope)
    return (dev, grid, bmap, data32, cam, perm, flip)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def test_bake_matches_dense_grid(scene):
    dev, grid, bmap, data32 = scene
    baked = slab_grad.bake_from_data(data32, bmap)
    np.testing.assert_allclose(
        np.asarray(baked), np.asarray(grid.data, np.float32), atol=2e-3)


def test_bake_grad_is_blockwise_sum(scene):
    """Autodiff through the bake pyramid == per-leaf sums of the cotangent
    over that leaf's voxel block (checked against a direct scatter)."""
    dev, grid, bmap, data32 = scene
    G = grid.G
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.normal(size=(G, G, G, grid.data_dim)).astype(
        np.float32))

    g = jax.grad(
        lambda d: jnp.sum(slab_grad.bake_from_data(d, bmap) * R))(data32)

    # reference: voxel->leaf map via query of every voxel center
    idx = np.arange(G ** 3)
    pos = (np.stack([idx // (G * G), (idx // G) % G, idx % G], -1)
           .astype(np.float32) + 0.5) / G
    leaf_idx, _, _ = render_jax.query_batched(dev, jnp.asarray(pos))
    ref = np.zeros(np.asarray(data32).shape, np.float32)
    np.add.at(ref[:, :grid.data_dim], np.asarray(leaf_idx),
              np.asarray(R).reshape(-1, grid.data_dim))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-5, atol=1e-5)


def test_train_render_matches_eval_slab(scene):
    """The training forward (scan, smooth alpha) must agree with the eval
    slab renderer away from early-stop hard switches."""
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(
        scene, width=48, height=48)
    opt = RenderOptions(max_steps=512, renormalize=False)
    ref = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        48, 48, opt, gi=96))
    out = np.asarray(slab_grad.render_frame_train(
        data32, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
        perm, flip, 48, 48, opt, gi=96))
    assert psnr(out[..., :3], ref[..., :3]) > 40.0


@pytest.mark.slow
def test_custom_vjp_matches_autodiff(scene):
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512)
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.normal(size=(24, 24, 4)).astype(np.float32))

    def loss(d, custom):
        out = slab_grad.render_frame_train(
            d, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
            perm, flip, 24, 24, opt, gi=48, use_custom_vjp=custom)
        return jnp.sum(out * W)

    l1, g1 = jax.value_and_grad(lambda d: loss(d, True))(data32)
    l2, g2 = jax.value_and_grad(lambda d: loss(d, False))(data32)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    g1, g2 = np.asarray(g1), np.asarray(g2)
    scale = np.abs(g2).max()
    assert scale > 0
    np.testing.assert_allclose(g1, g2, atol=2e-5 * scale, rtol=2e-4)


@pytest.mark.slow
def test_grad_finite_differences(scene):
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512)
    target = jnp.zeros((24, 24, 3), jnp.float32)

    def loss(d):
        out = slab_grad.render_frame_train(
            d, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
            perm, flip, 24, 24, opt, gi=48)
        return jnp.mean((out[..., :3] - target) ** 2)

    g = np.asarray(jax.grad(loss)(data32))
    flat = np.abs(g).ravel()
    picks = np.argsort(flat)[-10:]
    base = np.asarray(data32)
    rel = []
    for p in picks:
        i, j = np.unravel_index(p, g.shape)
        eps = 1e-3
        dp = base.copy()
        dp[i, j] += eps
        dm = base.copy()
        dm[i, j] -= eps
        fd = (float(loss(jnp.asarray(dp))) - float(loss(jnp.asarray(dm)))) \
            / (2 * eps)
        rel.append(abs(fd - g[i, j]) / max(abs(fd), abs(g[i, j]), 1e-9))
    rel = np.sort(rel)
    # the march has genuine kinks (sigma_thresh, stop_thresh freeze, tau>0
    # masks), so a minority of probes may straddle one; the authoritative
    # exactness check is vjp-vs-autodiff above. Require the bulk to agree.
    assert rel[len(rel) // 2] < 0.05, f"median FD rel err {rel}"
    assert (rel < 0.15).sum() >= 8, f"FD rel errs {rel}"


def test_training_reduces_loss(scene):
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512)
    target = jnp.asarray(slab_grad.render_frame_train(
        data32, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
        perm, flip, 24, 24, opt, gi=48))[..., :3]

    import optax

    rng = np.random.default_rng(3)
    data = data32 + jnp.asarray(
        rng.normal(scale=1.0, size=data32.shape).astype(np.float32))
    optimizer = optax.adam(5e-2)
    opt_state = optimizer.init(data)

    @jax.jit
    def step(d, st):
        loss, g = slab_grad.loss_and_grad_frame(
            d, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
            perm, flip, 24, 24, target, opt, gi=48)
        upd, st = optimizer.update(g, st, d)
        return optax.apply_updates(d, upd), st, loss

    losses = []
    for _ in range(40):
        data, opt_state, loss = step(data, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_slab_grads_match_fused_ray_vjp(scene):
    """Cross-path gradient agreement: the slab-path VJP vs the per-sample
    octree-march fused VJP (ops/grad.py) on the same frame loss. The two
    forwards differ by the slab discretization (box-tap warp vs per-ray
    DDA), so agreement is gated on direction + relative L2 of the full
    gradient vector, not elementwise. Measured floor (gi->inf): cos 0.9975,
    rel 0.070 — the slab discretization itself, not VJP error (the VJP is
    exact for its own forward to ~1e-7: test_custom_vjp_matches_autodiff)."""
    from volrend_tpu.ops import grad as grad_mod
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(
        scene, width=32, height=32)
    opt = RenderOptions(max_steps=512, renormalize=False)
    target = jnp.asarray(np.asarray(render_jax.render_image(
        dev, cam, opt)) * 0.85)

    _, g_slab = slab_grad.loss_and_grad_frame(
        data32, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
        perm, flip, 32, 32, target, opt, gi=256)

    origins, dirs = cam.pixel_rays(xp=np)

    def ray_loss(d):
        out = grad_mod.render_rays_train(
            dev, jnp.asarray(origins), jnp.asarray(dirs), opt, data=d)
        diff = out[:, :3] - target.reshape(-1, 4)[:, :3]
        return jnp.mean(diff * diff)

    g_ray = jax.grad(ray_loss)(data32)

    gs = np.asarray(g_slab, np.float64).ravel()
    gr = np.asarray(g_ray, np.float64).ravel()
    cos = float(gs @ gr / (np.linalg.norm(gs) * np.linalg.norm(gr)))
    rel = float(np.linalg.norm(gs - gr) / np.linalg.norm(gr))
    assert cos > 0.995, f"cosine {cos}"
    assert rel < 0.1, f"rel L2 {rel}"


def test_frame_trainer_descends(scene):
    from volrend_tpu.train import FrameTrainer
    import dataclasses
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512, renormalize=False)
    target = np.asarray(render_jax.render_image(dev, cam, opt))

    rng = np.random.default_rng(1)
    noisy = dataclasses.replace(
        dev, data=jnp.asarray(np.asarray(dev.data, np.float32)
                              + rng.normal(0, 0.3, dev.data.shape)
                              .astype(np.float32), jnp.float16))
    tr = FrameTrainer(noisy, opt, lr=5e-2, gi=96)
    losses = [tr.step_frame(cam, target) for _ in range(20)]
    assert losses[-1] < 0.5 * losses[0], losses


@pytest.mark.slow
def test_frame_trainer_sharded_matches_single(scene):
    """8 poses sharded over the 8-device mesh: loss equals the sequential
    per-frame mean, grads agree (same psum'd update)."""
    import dataclasses
    import jax
    from volrend_tpu.parallel import dist
    from volrend_tpu.train import FrameTrainer
    dev, grid, bmap, data32, cam0, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512, renormalize=False)

    # 8 nearby poses in the same (perm, flip) group
    cams, targets = [], []
    for i in range(8):
        back = np.array([1.0, 0.15 + 0.02 * i, 0.25 + 0.015 * i])
        cam = make_cam(back)
        p, f, s = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
        assert (p, f) == (perm, flip) and np.isfinite(s)
        cams.append(cam)
        targets.append(np.asarray(render_jax.render_image(dev, cam, opt)))

    rng = np.random.default_rng(2)
    noisy_rows = (np.asarray(dev.data, np.float32)
                  + rng.normal(0, 0.3, dev.data.shape).astype(np.float32))
    noisy = dataclasses.replace(dev,
                                data=jnp.asarray(noisy_rows, jnp.float16))

    mesh = dist.make_mesh(jax.devices()[:8], axis_name="frames")
    tr_sh = FrameTrainer(noisy, opt, lr=5e-2, gi=96)
    loss_sh = tr_sh.step_frames_sharded(mesh, cams, targets)

    # single-device reference: mean of per-frame losses, mean of grads
    tr1 = FrameTrainer(noisy, opt, lr=5e-2, gi=96)
    d0 = tr1.data
    losses, grads = [], []
    for cam, tgt in zip(cams, targets):
        l, g = slab_grad.loss_and_grad_frame(
            d0, tr1.bmap, tr1.grid, jnp.asarray(cam.transform),
            cam.fx, cam.fy, perm, flip, cam.width, cam.height,
            jnp.asarray(tgt), tr1.opt, gi=96)
        losses.append(float(l))
        grads.append(np.asarray(g))
    np.testing.assert_allclose(loss_sh, np.mean(losses), rtol=1e-5)

    # one more sharded step should keep descending
    loss2 = tr_sh.step_frames_sharded(mesh, cams, targets)
    assert loss2 < loss_sh


# ---------------------------------------------------------------------------
# Grid-space (pyramid) parameterization — the scatter-free training state
# ---------------------------------------------------------------------------

def test_pyramid_bake_and_roundtrip_exact(scene):
    """bake_from_pyramid == bake_from_data bit-exactly, and the
    leaf <-> pyramid conversions round-trip without loss (the property
    FrameTrainer's checkpoint bit-stability rests on)."""
    dev, grid, bmap, data32 = scene
    pyr = slab_grad.data_to_pyramid(data32, bmap)
    g_leaf = slab_grad.bake_from_data(data32, bmap)
    g_pyr = slab_grad.bake_from_pyramid(pyr, bmap)
    np.testing.assert_array_equal(np.asarray(g_leaf), np.asarray(g_pyr))

    back = slab_grad.pyramid_to_data(pyr, bmap, data32.shape[0],
                                     data32.shape[1])
    rows = np.concatenate([np.asarray(r) for r in bmap.rows])
    np.testing.assert_array_equal(
        np.asarray(data32)[rows, :bmap.D], np.asarray(back)[rows, :bmap.D])
    pyr2 = slab_grad.data_to_pyramid(back, bmap)
    for a, b in zip(pyr, pyr2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pyramid_loss_and_grads_match_leaf(scene):
    """loss_and_grad_frame on pyramid params: identical loss, and the
    pyramid gradient at each leaf's block equals the leaf-row gradient
    (same function, reparameterized — must agree exactly)."""
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512)
    tr = jnp.asarray(cam.transform)
    tgt = jnp.zeros((24, 24, 4), jnp.float32)
    pyr = slab_grad.data_to_pyramid(data32, bmap)

    l_leaf, g_leaf = slab_grad.loss_and_grad_frame(
        data32, bmap, grid, tr, cam.fx, cam.fy, perm, flip, 24, 24, tgt,
        opt, gi=48)
    l_pyr, g_pyr = slab_grad.loss_and_grad_frame(
        pyr, bmap, grid, tr, cam.fx, cam.fy, perm, flip, 24, 24, tgt,
        opt, gi=48)
    assert float(l_leaf) == float(l_pyr)
    gl = np.asarray(g_leaf)
    for p, r, c in zip(g_pyr, bmap.rows, bmap.coords):
        if not np.asarray(r).size:
            continue
        pv = np.asarray(p).reshape(-1, bmap.D)[np.asarray(c)]
        np.testing.assert_allclose(pv, gl[np.asarray(r)][:, :bmap.D],
                                   rtol=1e-6, atol=1e-7)
        # masked-off entries must get exactly zero gradient (they must
        # never drift from zero, or leaf round-trips would lose state)
        m = np.zeros(p.shape[0] ** 3, bool)
        m[np.asarray(c)] = True
        dead = np.asarray(p).reshape(-1, bmap.D)[~m]
        assert not dead.any()


# ---------------------------------------------------------------------------
# Pallas training fast path (fused forward + backward kernels)
# ---------------------------------------------------------------------------

def _pallas_frame_parts(scene, gi=32):
    """Shared setup: planar payload, packed params, zbounds, cfg."""
    from volrend_tpu.ops import pallas_slab
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512).replace(renormalize=False,
                                               render_depth=False)
    geom = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                                 cam.fy, perm, flip, cam.width, cam.height,
                                 opt, gi)
    ids = tuple(range(grid.G - 1, -1, -1) if flip else range(grid.G))
    cfg = slab_grad.SlabCfg(G=grid.G, gi=gi, D=grid.data_dim,
                            bd=grid.basis_dim, fmt=int(grid.fmt),
                            perm=perm, flip=flip, ids=ids, opt=opt)
    payload = jnp.asarray(grid.data, jnp.float32)
    planar = jnp.transpose(payload, (perm[0], 3, perm[1], perm[2]))
    pperm = jnp.transpose(planar.astype(jnp.bfloat16).astype(jnp.float32),
                          (0, 2, 3, 1))   # bf16-rounded, scan layout
    params = slab_grad._pack_geom_params(geom, cfg, 1.0 / geom.scale)
    zb = jnp.stack([geom.z_lo_pix, geom.z_hi_pix])
    gm = dict(cz=geom.cz, cy=geom.cy, cx=geom.cx, uy=geom.uy, ux=geom.ux,
              z_lo=geom.z_lo_pix, z_hi=geom.z_hi_pix, scale=geom.scale,
              lo=geom.lo, hi=geom.hi, dirM=geom.dirM)
    return grid, cfg, gm, planar, pperm, params, zb


@pytest.mark.slow
def test_pallas_bwd_kernel_matches_autodiff(scene, monkeypatch):
    """march_slabs_bwd (interpret) == jax.grad of the scan march on the
    same bf16-rounded payload, up to the kernel's bf16 warp matmuls."""
    import jax
    from volrend_tpu.ops import pallas_slab
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        grid, cfg, gm, planar, pperm, params, zb = _pallas_frame_parts(
            scene)
        gi = cfg.gi
        acc4 = slab_grad._pallas_fwd_call(cfg, planar, params, zb,
                                          grid.extra)
        rng = np.random.default_rng(0)
        g_acc = jnp.asarray(rng.normal(size=(gi, gi, 3)).astype(np.float32))
        g_T = jnp.asarray(rng.normal(size=(gi, gi)).astype(np.float32))
        gacc4 = jnp.concatenate([jnp.moveaxis(g_acc, -1, 0), g_T[None]])
        grad_planar = pallas_slab.march_slabs_bwd(
            planar.astype(jnp.bfloat16), params,
            jnp.ones((cfg.D,), jnp.float32), zb, gacc4, acc4,
            cfg.G, gi, cfg.D, cfg.bd, cfg.perm, extra=grid.extra,
            fmt=cfg.fmt, flip=cfg.flip)
        grad_k = np.asarray(jnp.transpose(grad_planar, (0, 2, 3, 1)),
                            np.float64)

        def f(pp):
            a, t = slab_grad._march_fwd_impl(cfg, pp, grid.extra, gm)
            return jnp.sum(a * g_acc) + jnp.sum(t * g_T)

        grad_s = np.asarray(jax.grad(f)(pperm), np.float64)
        rel = (np.linalg.norm(grad_k - grad_s)
               / (np.linalg.norm(grad_s) + 1e-30))
        cos = float((grad_k * grad_s).sum()
                    / (np.linalg.norm(grad_k) * np.linalg.norm(grad_s)
                       + 1e-30))
        assert rel < 2e-2 and cos > 0.999, (rel, cos)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_pallas_bwd_early_exit_opaque(monkeypatch):
    """Near-opaque scene: most windows behind the first surface hit the
    backward kernel's whole-frame early exit and zero-fill their grad
    block — which must agree with autodiff (whose grads there are exactly
    zero because w = 0 for fully-saturated rays)."""
    from volrend_tpu.ops import pallas_slab
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                              sigma_scale=5000.0)
        dev = tree.to_device(lut_depth=None)
        grid = dense_grid.bake_dense(dev)
        bmap = slab_grad.build_bake_map(dev)
        data32 = jnp.asarray(dev.data, jnp.float32)
        opaque = (dev, grid, bmap, data32)
        grid, cfg, gm, planar, pperm, params, zb = _pallas_frame_parts(
            opaque)
        gi = cfg.gi
        acc4 = slab_grad._pallas_fwd_call(cfg, planar, params, zb,
                                          grid.extra)
        rng = np.random.default_rng(1)
        g_acc = jnp.asarray(rng.normal(size=(gi, gi, 3)).astype(np.float32))
        g_T = jnp.asarray(rng.normal(size=(gi, gi)).astype(np.float32))
        gacc4 = jnp.concatenate([jnp.moveaxis(g_acc, -1, 0), g_T[None]])
        grad_planar = pallas_slab.march_slabs_bwd(
            planar.astype(jnp.bfloat16), params,
            jnp.ones((cfg.D,), jnp.float32), zb, gacc4, acc4,
            cfg.G, gi, cfg.D, cfg.bd, cfg.perm, extra=grid.extra,
            fmt=cfg.fmt, flip=cfg.flip)
        grad_k = np.asarray(jnp.transpose(grad_planar, (0, 2, 3, 1)),
                            np.float64)

        def f(pp):
            a, t = slab_grad._march_fwd_impl(cfg, pp, grid.extra, gm)
            return jnp.sum(a * g_acc) + jnp.sum(t * g_T)

        grad_s = np.asarray(jax.grad(f)(pperm), np.float64)
        rel = (np.linalg.norm(grad_k - grad_s)
               / (np.linalg.norm(grad_s) + 1e-30))
        cos = float((grad_k * grad_s).sum()
                    / (np.linalg.norm(grad_k) * np.linalg.norm(grad_s)
                       + 1e-30))
        assert rel < 2e-2 and cos > 0.999, (rel, cos)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_pallas_train_backend_end_to_end(scene, monkeypatch):
    """render_frame_train(backend='pallas') forward and loss gradients
    match the scan backend through bake -> march -> warp -> loss."""
    import jax
    from volrend_tpu.ops import pallas_slab
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
        opt = RenderOptions(max_steps=512)
        tr = jnp.asarray(cam.transform, jnp.float32)
        gi = 32

        outs = {}
        for bk in ("scan", "pallas"):
            outs[bk] = np.asarray(slab_grad.render_frame_train(
                data32, bmap, grid, tr, cam.fx, cam.fy, perm, flip,
                cam.width, cam.height, opt, gi=gi, backend=bk))
        assert np.abs(outs["scan"] - outs["pallas"]).max() < 2e-2

        tgt = jnp.asarray(outs["scan"] * 0.9 + 0.02)

        def lg(bk):
            def loss_fn(dd):
                o = slab_grad.render_frame_train(
                    dd, bmap, grid, tr, cam.fx, cam.fy, perm, flip,
                    cam.width, cam.height, opt, gi=gi, backend=bk)
                diff = o[..., :3] - tgt[..., :3]
                return jnp.mean(diff * diff)
            return jax.value_and_grad(loss_fn)(data32)

        l_s, g_s = lg("scan")
        l_p, g_p = lg("pallas")
        assert abs(float(l_s) - float(l_p)) < 1e-4 * max(1.0, float(l_s))
        gs = np.asarray(g_s, np.float64)
        gp = np.asarray(g_p, np.float64)
        rel = np.linalg.norm(gp - gs) / (np.linalg.norm(gs) + 1e-30)
        cos = float((gs * gp).sum()
                    / (np.linalg.norm(gs) * np.linalg.norm(gp) + 1e-30))
        assert rel < 8e-2 and cos > 0.995, (rel, cos)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


# ---------------------------------------------------------------------------
# NDC trees through the training path
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ndc_train_scene():
    from volrend_tpu.models.n3tree import NdcConfig
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=4, sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=800.0, height=800.0, focal=1111.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    bmap = slab_grad.build_bake_map(dev)
    data32 = jnp.asarray(dev.data, jnp.float32)
    cam = Camera.from_vectors(center=(0.0, 0.0, 0.2),
                              v_back=(0.05, 0.02, 1.0),
                              v_world_up=(0.0, 1.0, 0.0),
                              width=24, height=24, fx=26.0)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    assert np.isfinite(slope) and perm[0] == 2
    return dev, grid, bmap, data32, cam, perm, flip


def test_ndc_train_render_matches_eval_slab(ndc_train_scene):
    """Training forward on an NDC tree == the eval slab renderer (NDC
    geometry + dirM shading + NDC screen warp all flow through)."""
    dev, grid, bmap, data32, cam, perm, flip = ndc_train_scene
    opt = RenderOptions(max_steps=512, renormalize=False)
    ref = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        24, 24, opt, gi=96))
    out = np.asarray(slab_grad.render_frame_train(
        data32, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
        perm, flip, 24, 24, opt, gi=96))
    assert psnr(out[..., :3], ref[..., :3]) > 40.0


def test_ndc_custom_vjp_matches_autodiff(ndc_train_scene):
    dev, grid, bmap, data32, cam, perm, flip = ndc_train_scene
    opt = RenderOptions(max_steps=512)
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.normal(size=(24, 24, 4)).astype(np.float32))

    def loss(d, custom):
        out = slab_grad.render_frame_train(
            d, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
            perm, flip, 24, 24, opt, gi=48, use_custom_vjp=custom)
        return jnp.sum(out * W)

    l1, g1 = jax.value_and_grad(lambda d: loss(d, True))(data32)
    l2, g2 = jax.value_and_grad(lambda d: loss(d, False))(data32)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    g1, g2 = np.asarray(g1), np.asarray(g2)
    scale = np.abs(g2).max()
    assert scale > 0
    np.testing.assert_allclose(g1, g2, atol=2e-5 * scale, rtol=2e-4)


@pytest.mark.slow
def test_ndc_pallas_train_backend(ndc_train_scene, monkeypatch):
    """The fused Pallas training kernels (fwd+bwd) must match the scan
    backend on an NDC tree (interpret mode)."""
    from volrend_tpu.ops import pallas_slab
    dev, grid, bmap, data32, cam, perm, flip = ndc_train_scene
    opt = RenderOptions(max_steps=512)
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.normal(size=(24, 24, 4)).astype(np.float32))

    def loss(d, backend):
        out = slab_grad.render_frame_train(
            d, bmap, grid, jnp.asarray(cam.transform), cam.fx, cam.fy,
            perm, flip, 24, 24, opt, gi=48, backend=backend)
        return jnp.sum(out * W)

    l2, g2 = jax.value_and_grad(lambda d: loss(d, "scan"))(data32)
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        l1, g1 = jax.value_and_grad(lambda d: loss(d, "pallas"))(data32)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    # kernel warps in bf16 (same as the world-space backend test): compare
    # by relative norm + direction, not elementwise
    assert np.isclose(float(l1), float(l2), rtol=1e-3)
    gs = np.asarray(g2, np.float64)
    gp = np.asarray(g1, np.float64)
    rel = np.linalg.norm(gp - gs) / (np.linalg.norm(gs) + 1e-30)
    cos = float((gs * gp).sum()
                / (np.linalg.norm(gs) * np.linalg.norm(gp) + 1e-30))
    assert rel < 8e-2 and cos > 0.995, (rel, cos)


def test_ndc_frame_trainer_descends(ndc_train_scene):
    """End-to-end FrameTrainer on an NDC scene (the full chain: NDC-aware
    choose_axis gate, pyramid bake, dirM shading, NDC screen warp)."""
    import dataclasses
    from volrend_tpu.train import FrameTrainer
    dev, grid, bmap, data32, cam, perm, flip = ndc_train_scene
    opt = RenderOptions(max_steps=512, renormalize=False)
    target = np.asarray(render_jax.render_image(dev, cam, opt))

    rng = np.random.default_rng(1)
    noisy = dataclasses.replace(
        dev, data=jnp.asarray(np.asarray(dev.data, np.float32)
                              + rng.normal(0, 0.3, dev.data.shape)
                              .astype(np.float32), jnp.float16))
    tr = FrameTrainer(noisy, opt, lr=5e-2, gi=96)
    assert tr.grid.ndc == grid.ndc
    losses = [tr.step_frame(cam, target) for _ in range(20)]
    assert losses[-1] < 0.5 * losses[0], losses


@pytest.mark.slow
def test_zsharded_train_march_matches_single(monkeypatch):
    """Z-sharded training march (fwd AND bwd kernels sharded; suffix
    prefixes (T_in, A_in) derived from the forward partials): loss and
    payload gradients must match the single-device Pallas backend."""
    from volrend_tpu.ops import pallas_slab
    from volrend_tpu.parallel import dist

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    bmap = slab_grad.build_bake_map(dev)
    data32 = jnp.asarray(dev.data, jnp.float32)
    cam = Camera.from_vectors(center=(2.4, 0.5, 0.7),
                              v_back=(0.92, 0.2, 0.27),
                              width=24, height=24, fx=30.0)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, 24, 24)
    assert np.isfinite(slope)
    # segment semantics in BOTH paths for an apples-to-apples gradient
    opt = RenderOptions(max_steps=512, stop_thresh=0.0)
    rng = np.random.default_rng(4)
    W = jnp.asarray(rng.normal(size=(24, 24, 4)).astype(np.float32))
    tr = jnp.asarray(cam.transform)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        def loss_single(d):
            out = slab_grad.render_frame_train(
                d, bmap, grid, tr, cam.fx, cam.fy, perm, flip, 24, 24,
                opt, gi=48, backend="pallas")
            return jnp.sum(out * W)

        l_ref, g_ref = jax.value_and_grad(loss_single)(data32)

        for n_dev in (2, 4):
            mesh = dist.make_mesh(jax.devices()[:n_dev], axis_name="z")

            def loss_sharded(d):
                out = slab_grad.render_frame_train_zsharded(
                    d, bmap, grid, tr, cam.fx, cam.fy, perm, flip,
                    24, 24, opt, mesh, gi=48)
                return jnp.sum(out * W)

            l_s, g_s = jax.value_and_grad(loss_sharded)(data32)
            assert np.isclose(float(l_s), float(l_ref), rtol=1e-4), n_dev
            gs = np.asarray(g_s, np.float64)
            gr = np.asarray(g_ref, np.float64)
            rel = np.linalg.norm(gs - gr) / (np.linalg.norm(gr) + 1e-30)
            cos = float((gs * gr).sum()
                        / (np.linalg.norm(gs) * np.linalg.norm(gr) + 1e-30))
            assert rel < 3e-2 and cos > 0.999, (n_dev, rel, cos)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_frame_trainer_zsharded_descends(monkeypatch):
    """FrameTrainer.step_frame_zsharded: training loss descends with the
    march z-sharded over a 4-device mesh."""
    import dataclasses
    from volrend_tpu.ops import pallas_slab
    from volrend_tpu.parallel import dist
    from volrend_tpu.train import FrameTrainer

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    cam = Camera.from_vectors(center=(2.4, 0.5, 0.7),
                              v_back=(0.92, 0.2, 0.27),
                              width=24, height=24, fx=30.0)
    opt = RenderOptions(max_steps=512, renormalize=False, stop_thresh=0.0)
    target = np.asarray(render_jax.render_image(dev, cam, opt))

    rng = np.random.default_rng(1)
    noisy = dataclasses.replace(
        dev, data=jnp.asarray(np.asarray(dev.data, np.float32)
                              + rng.normal(0, 0.3, dev.data.shape)
                              .astype(np.float32), jnp.float16))

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        mesh = dist.make_mesh(jax.devices()[:4], axis_name="z")
        tr = FrameTrainer(noisy, opt, lr=5e-2, gi=48)
        losses = [tr.step_frame_zsharded(mesh, cam, target)
                  for _ in range(15)]
        assert losses[-1] < 0.6 * losses[0], losses
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_zsharded_bwd_prefix_matches_unsharded_kernel(monkeypatch):
    """DIRECT numeric gate on the z-sharded backward-prefix derivation:
    per-segment ``march_slabs_bwd`` seeded with (T_in, A_in) reconstructed
    from the forward partials (T_in = prod upstream T; A_in = sum upstream
    T_in * B, B = sum_c gacc_c * C_local_c) must equal the unsharded
    ``march_slabs_bwd`` on the SAME payload — n in {2, 4, 8} splits, both
    march directions, tol 1e-5. Pins the suffix algebra itself, not just
    the end-to-end loss (slab_grad._make_zsharded_march.bwd)."""
    from volrend_tpu.ops import pallas_slab

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    G, D, bd, fmt = grid.G, grid.data_dim, grid.basis_dim, int(grid.fmt)
    gi = 48
    opt = RenderOptions(max_steps=512, stop_thresh=0.0, renormalize=False)
    rng = np.random.default_rng(11)
    gacc4 = jnp.asarray(rng.normal(size=(4, gi, gi)).astype(np.float32))

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        flips_seen = set()
        for sign in (-1.0, 1.0):
            cam = make_cam((sign * 0.92, 0.2, 0.27))
            perm, flip, slope = slab_render.choose_axis(
                grid, cam.transform, cam.fx, cam.fy, 24, 24)
            assert np.isfinite(slope)
            flips_seen.add(flip)
            geom = slab_render.FrameGeom(grid, cam.transform, cam.fx,
                                         cam.fy, perm, flip, 24, 24, opt, gi)
            cfg = slab_grad.SlabCfg(G=G, gi=gi, D=D, bd=bd, fmt=fmt,
                                    perm=perm, flip=flip,
                                    ids=tuple(range(G)), opt=opt)
            params = slab_grad._pack_geom_params(geom, cfg, 1.0 / geom.scale)
            zb = jnp.stack([geom.z_lo_pix, geom.z_hi_pix])
            planar = jnp.transpose(
                jnp.asarray(grid.data, jnp.float32),
                (perm[0], 3, perm[1], perm[2])).astype(jnp.bfloat16)
            blo, bhi, rot, bfull = slab_grad._pallas_statics(cfg)
            qs = jnp.ones((D,), jnp.float32)
            ids_full = (tuple(range(G - 1, -1, -1)) if flip
                        else tuple(range(G)))

            acc4 = pallas_slab.march_slabs(
                planar, params, qs, zb, G, gi, D, bd, perm,
                slab_ids=ids_full, basis_lo=blo, basis_hi=bhi,
                extra=grid.extra, fmt=fmt, flip=flip, bbox_full=bfull)
            g_ref = np.asarray(pallas_slab.march_slabs_bwd(
                planar, params, qs, zb, gacc4, acc4, G, gi, D, bd, perm,
                basis_lo=blo, basis_hi=bhi, extra=grid.extra, fmt=fmt,
                flip=flip, bbox_full=bfull), np.float64)

            for n in (2, 4, 8):
                Gl = G // n
                ids_l = (tuple(range(Gl - 1, -1, -1)) if flip
                         else tuple(range(Gl)))
                order = list(range(n - 1, -1, -1) if flip else range(n))
                parts = {}
                for d in range(n):
                    parts[d] = pallas_slab.march_slabs(
                        planar[d * Gl:(d + 1) * Gl], params, qs, zb, G, gi,
                        D, bd, perm, slab_ids=ids_l, basis_lo=blo,
                        basis_hi=bhi, extra=grid.extra, fmt=fmt, flip=flip,
                        bbox_full=bfull, z_base=jnp.float32(d * Gl / G))
                # combined forward must match the unsharded march
                C = jnp.zeros((3, gi, gi), jnp.float32)
                T = jnp.ones((gi, gi), jnp.float32)
                for d in order:
                    C = C + T[None] * parts[d][:3]
                    T = T * parts[d][3]
                np.testing.assert_allclose(
                    np.asarray(jnp.concatenate([C, T[None]])),
                    np.asarray(acc4), atol=1e-5, rtol=1e-5)
                # per-segment backward from reconstructed (T_in, A_in)
                T_in = jnp.ones((gi, gi), jnp.float32)
                A_in = jnp.zeros((gi, gi), jnp.float32)
                g_segs = [None] * n
                for d in order:
                    state = jnp.stack([T_in, A_in])
                    g_segs[d] = np.asarray(pallas_slab.march_slabs_bwd(
                        planar[d * Gl:(d + 1) * Gl], params, qs, zb,
                        gacc4, acc4, G, gi, D, bd, perm, basis_lo=blo,
                        basis_hi=bhi, extra=grid.extra, fmt=fmt, flip=flip,
                        bbox_full=bfull, z_base=jnp.float32(d * Gl / G),
                        state_init=state), np.float64)
                    B_d = jnp.sum(gacc4[:3] * parts[d][:3], axis=0)
                    A_in = A_in + T_in * B_d
                    T_in = T_in * parts[d][3]
                g_cat = np.concatenate(g_segs, axis=0)
                scale = max(np.abs(g_ref).max(), 1e-12)
                # norm-relative <= 1e-5 is the headline gate; the
                # elementwise bound allows the rare f32-cancellation
                # element (g_tau is a difference of large terms; 1-ulp
                # regrouping of the T product moves tiny outputs)
                rel = (np.linalg.norm(g_cat - g_ref)
                       / max(np.linalg.norm(g_ref), 1e-30))
                assert rel <= 1e-5, (n, flip, rel)
                np.testing.assert_allclose(
                    g_cat, g_ref, atol=1e-4 * scale, rtol=1e-4,
                    err_msg=f"n={n} flip={flip}")
        assert flips_seen == {False, True}
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_precise_sq_warp_vjp_matches_autodiff(monkeypatch):
    """The training-path superquad warp (f32 tables, hand-written VJP:
    tent adjoint + 160k-row scatter + shifted-plane build adjoint) must
    match the reference precise warp AND its autodiff VJP (interpret
    mode; ops/display_warp.py precise section)."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import dense_grid as dg
    from volrend_tpu.ops.camera import Camera

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    grid = dg.bake_dense(tree.to_device(lut_depth=None))
    W = H = 200
    gi = 96
    back = np.asarray((1.0, 0.25, 0.35))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=W,
                              height=H, fx=280.0)
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    rng = np.random.default_rng(17)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(H, W, 4)), jnp.float32)

    def ref_warp(it):
        return slab_render._warp_to_screen_ref(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du,
            g.v0, g.dv, g.scale, precise=True)

    ref_out, ref_vjp = jax.vjp(ref_warp, inter)
    ref_grad = ref_vjp(ct)[0]

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        warp = display_warp.make_warp_precise(
            float(opt.background_brightness), W, H, gi, perm, None)
        geom = (g.R, g.fx, g.fy, g.u0, g.du, g.v0, g.dv, g.scale,
                jnp.zeros(3, jnp.float32))

        def sq_warp(it):
            return warp(it, geom)

        out, f_vjp = jax.vjp(sq_warp, inter)
        grad = f_vjp(ct)[0]
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()

    # forward: f32 tables; only the hi/lo bf16 emit placement rounds
    # (~2^-17 relative)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=5e-5)
    # VJP: same linear operator's transpose
    scale = max(float(np.abs(np.asarray(ref_grad)).max()), 1e-12)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               atol=5e-5 * scale, rtol=5e-4)


def test_precise_sq_routing_in_warp_to_screen(monkeypatch):
    """The parked _PRECISE_SQ knob routes _warp_to_screen(precise=True)
    through the superquad custom-VJP warp behind a per-pose fits cond;
    with the knob on, forward and VJP must match the reference precise
    warp (the knob default is OFF — perf-parked, display_warp._PRECISE_SQ
    note — but the routing must keep working for future re-tries)."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import dense_grid as dg
    from volrend_tpu.ops.camera import Camera

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    grid = dg.bake_dense(tree.to_device(lut_depth=None))
    W = H = 200
    gi = 96
    back = np.asarray((1.0, 0.25, 0.35))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=W,
                              height=H, fx=280.0)
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    rng = np.random.default_rng(23)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(H, W, 4)), jnp.float32)

    def warp(it):
        return slab_render._warp_to_screen(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du,
            g.v0, g.dv, g.scale, precise=True)

    ref_out, ref_vjp = jax.vjp(warp, inter)   # knob off: reference warp
    ref_grad = ref_vjp(ct)[0]

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(display_warp, "_PRECISE_SQ", True)
    jax.clear_caches()
    try:
        out, f_vjp = jax.vjp(warp, inter)     # knob on: superquad route
        grad = f_vjp(ct)[0]
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=5e-5)
    scale = max(float(np.abs(np.asarray(ref_grad)).max()), 1e-12)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               atol=5e-5 * scale, rtol=5e-4)


def test_frame_trainer_lean_mode_descends(scene):
    """FrameTrainer(lean=True) — bf16 Adam moments + bf16 backward payload
    cotangent (the G=256 single-chip memory mode, VERDICT r4 item 4) —
    must descend like the f32 trainer and track its loss trajectory
    closely (the rounding is state/gradient noise, not a different
    optimizer)."""
    import dataclasses
    from volrend_tpu.ops import slab_grad
    from volrend_tpu.train import FrameTrainer
    dev, grid, bmap, data32, cam, perm, flip = frame_setup(scene)
    opt = RenderOptions(max_steps=512, renormalize=False)
    target = np.asarray(render_jax.render_image(dev, cam, opt))

    rng = np.random.default_rng(1)
    noisy = dataclasses.replace(
        dev, data=jnp.asarray(np.asarray(dev.data, np.float32)
                              + rng.normal(0, 0.3, dev.data.shape)
                              .astype(np.float32), jnp.float16))
    prev = slab_grad._GRAD_BF16
    try:
        tr_f32 = FrameTrainer(noisy, opt, lr=5e-2, gi=96)
        ref_losses = [tr_f32.step_frame(cam, target) for _ in range(12)]

        tr = FrameTrainer(noisy, opt, lr=5e-2, gi=96, lean=True)
        assert slab_grad._GRAD_BF16
        # moments really are bf16
        m, v, t = tr.opt_state
        assert all(x.dtype == jnp.bfloat16
                   for x in jax.tree_util.tree_leaves(m))
        assert all(x.dtype == jnp.bfloat16
                   for x in jax.tree_util.tree_leaves(v))
        losses = [tr.step_frame(cam, target) for _ in range(12)]
    finally:
        slab_grad._GRAD_BF16 = prev
        jax.clear_caches()
    assert losses[-1] < 0.5 * losses[0], losses
    # same trajectory up to bf16 state/gradient rounding
    np.testing.assert_allclose(losses, ref_losses, rtol=0.2)
