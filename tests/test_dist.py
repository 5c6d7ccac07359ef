"""Distributed tests on a virtual 8-device CPU mesh (SURVEY.md §4 item 4).

The sharded renderer must produce the same image as single-device, and the
psum-reduced leaf gradients must match the single-device fused VJP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import grad as grad_mod
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.camera import Camera
from volrend_tpu.parallel import dist
from volrend_tpu.utils.options import RenderOptions


@pytest.fixture(scope="module")
def setup():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=2)
    dev = tree.to_device(lut_depth=None)
    cam = Camera.from_vectors(width=24, height=24, fx=30.0)
    origins, dirs = cam.pixel_rays(xp=np)
    opt = RenderOptions(max_steps=128)
    return dev, origins, dirs, opt


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_render_matches_single(setup, n_dev):
    dev, origins, dirs, opt = setup
    single = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins), jnp.asarray(dirs), opt))

    mesh = dist.make_mesh(jax.devices()[:n_dev])
    tree = dist.replicate_tree(dev, mesh)
    o, d, n = dist.shard_rays(origins, dirs, mesh)
    out = np.asarray(dist.render_rays_sharded(tree, o, d, opt, mesh))[:n]
    # not bit-identical to the unsharded jit program (XLA reassociation
    # differs under shard_map), but must agree to float32 ulp level
    np.testing.assert_allclose(out, single, atol=2e-5, rtol=1e-5)


def test_sharded_grads_match_single(setup):
    dev, origins, dirs, opt = setup
    data32 = jnp.asarray(dev.data, jnp.float32)
    target = np.full((origins.shape[0], 4), 0.4, np.float32)

    # single-device reference (same loss normalization: mean over 3*R)
    def loss_fn(dat):
        out = grad_mod.render_rays_train(
            dev, jnp.asarray(origins), jnp.asarray(dirs), opt, data=dat)
        diff = out[:, :3] - jnp.asarray(target)[:, :3]
        return jnp.sum(diff * diff) / (3.0 * origins.shape[0])

    loss_ref, grad_ref = jax.value_and_grad(loss_fn)(data32)

    mesh = dist.make_mesh(jax.devices()[:8])
    tree = dist.replicate_tree(dev, mesh)
    o, d, _ = dist.shard_rays(origins, dirs, mesh)
    tgt, _, _ = dist.shard_rays(target, np.zeros_like(origins), mesh)
    loss, grad = dist.loss_and_grad_sharded(tree, data32, o, d, tgt, opt, mesh)

    assert np.isclose(float(loss), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_context_parallel_segments_match(setup):
    """CP mode (t-range split across devices, associative combine) must
    match a single-device render with the same train semantics."""
    dev, origins, dirs, opt = setup
    opt_t = opt.replace(stop_thresh=0.0, renormalize=False)
    single = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins), jnp.asarray(dirs), opt_t))

    mesh = dist.make_mesh(jax.devices()[:4], axis_name="cp")
    tree = dist.replicate_tree(dev, mesh)
    out = np.asarray(dist.render_rays_cp(
        tree, jnp.asarray(origins), jnp.asarray(dirs), opt, mesh,
        axis_name="cp"))
    # segment boundaries split leaf chords; telescoping keeps compositing
    # equal up to the per-segment step epsilon
    np.testing.assert_allclose(out, single, atol=5e-3)
    assert np.mean(np.abs(out - single)) < 2e-4


def test_multi_scene_sharded(setup):
    from volrend_tpu.models.synthetic import make_test_tree
    trees = [make_test_tree(max_depth=3, basis_dim=4, seed=s,
                            sigma_scale=50.0).to_device(lut_depth=None)
             for s in (2, 7)]
    opt = RenderOptions(max_steps=128)
    cam = Camera.from_vectors(width=16, height=16, fx=20.0)
    o, d = cam.pixel_rays(xp=np)

    stacked = dist.stack_trees(trees)
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("scene", "rays"))
    oo = jnp.asarray(np.stack([o, o]))
    dd = jnp.asarray(np.stack([d, d]))
    out = np.asarray(dist.render_scenes_sharded(stacked, oo, dd, opt, mesh))
    for s in range(2):
        ref = np.asarray(render_jax.render_rays(
            trees[s], jnp.asarray(o), jnp.asarray(d), opt))
        np.testing.assert_allclose(out[s], ref, atol=2e-5, rtol=1e-5)


def test_leaf_sharded_tree_matches(setup):
    """TP mode: octree payload row-sharded across devices, fetches resolved
    with all_gather + psum_scatter; must match the replicated render."""
    from volrend_tpu.parallel import leaf_shard
    dev, origins, dirs, opt = setup
    single = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins), jnp.asarray(dirs), opt))

    mesh = dist.make_mesh(jax.devices()[:4])
    tree_s, rps = leaf_shard.shard_tree_leaves(dev, mesh)
    o, d, n = dist.shard_rays(origins, dirs, mesh)
    out = np.asarray(leaf_shard.render_rays_leaf_sharded(
        tree_s, o, d, opt, mesh, rps))[:n]
    np.testing.assert_allclose(out, single, atol=2e-5, rtol=1e-5)


def test_leaf_sharded_train_grads_match_single(setup):
    """TP training: rows sharded at rest, gathered for compute, grads
    psum_scatter'd back (ZeRO-3 pattern) — loss and the owned gradient
    rows must match the single-device fused VJP."""
    from volrend_tpu.parallel import leaf_shard
    dev, origins, dirs, opt = setup
    target = np.full((origins.shape[0], 4), 0.4, np.float32)

    def loss_fn(dat):
        out = grad_mod.render_rays_train(
            dev, jnp.asarray(origins), jnp.asarray(dirs), opt, data=dat)
        diff = out[:, :3] - jnp.asarray(target)[:, :3]
        return jnp.sum(diff * diff) / (3.0 * origins.shape[0])

    data32 = jnp.asarray(dev.data, jnp.float32)
    ref_loss, ref_g = jax.value_and_grad(loss_fn)(data32)

    mesh = dist.make_mesh(jax.devices()[:4])
    tree_s, rps = leaf_shard.shard_tree_leaves(dev, mesh)
    o, d, n = dist.shard_rays(origins, dirs, mesh)
    tgt = dist.shard_rays(target, np.zeros_like(target[:, :3]), mesh)[0]
    rows = tree_s.data.astype(jnp.float32)
    loss, g = leaf_shard.loss_and_grad_leaf_sharded(
        tree_s, rows, o, d, tgt, opt, mesh)
    assert g.shape == rows.shape
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g)[:ref_g.shape[0]],
                               np.asarray(ref_g), atol=2e-5, rtol=1e-4)


def test_multi_scene_sharded_multiple_per_group(setup):
    """S > mesh['scene']: each scene group scans over its local scenes
    (4 scenes on a 2-group axis), and bad shapes fail with clear errors."""
    from volrend_tpu.models.synthetic import make_test_tree
    trees = [make_test_tree(max_depth=3, basis_dim=4, seed=s,
                            sigma_scale=50.0).to_device(lut_depth=None)
             for s in (2, 7, 12, 3)]
    opt = RenderOptions(max_steps=128)
    cam = Camera.from_vectors(width=16, height=16, fx=20.0)
    o, d = cam.pixel_rays(xp=np)

    stacked = dist.stack_trees(trees)
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("scene", "rays"))
    oo = jnp.asarray(np.stack([o] * 4))
    dd = jnp.asarray(np.stack([d] * 4))
    out = np.asarray(dist.render_scenes_sharded(stacked, oo, dd, opt, mesh))
    for s in range(4):
        ref = np.asarray(render_jax.render_rays(
            trees[s], jnp.asarray(o), jnp.asarray(d), opt))
        np.testing.assert_allclose(out[s], ref, atol=2e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="scenes do not tile"):
        dist.render_scenes_sharded(stacked, oo[:3], dd[:3], opt, mesh)
    with pytest.raises(ValueError, match="ray batches"):
        dist.render_scenes_sharded(
            dist.stack_trees(trees[:2]), oo, dd, opt, mesh)


@pytest.mark.slow
def test_slab_zsharded_matches_single(monkeypatch):
    """T3 CP/TP mode: the z-sharded slab march (payload split across the
    mesh, per-device fused-kernel segments, associative (C,T) combine)
    must reproduce the single-device slab render under the same segment
    semantics (stop_thresh=0, no renorm)."""
    from volrend_tpu.ops import dense_grid, pallas_slab, slab_render

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = Camera.from_vectors(center=(2.4, 0.5, 0.7),
                              v_back=(0.92, 0.2, 0.27),
                              width=32, height=32, fx=40.0)
    opt = RenderOptions(max_steps=512)
    seg_opt = opt.replace(stop_thresh=0.0, renormalize=False)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        perm, flip, _ = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, 32, 32)
        single = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            32, 32, seg_opt, gi=96))
        for n_dev in (2, 8):
            mesh = dist.make_mesh(jax.devices()[:n_dev], axis_name="z")
            out = np.asarray(dist.render_frame_slab_zsharded(
                grid, cam.transform, cam.fx, cam.fy, 32, 32, opt, mesh,
                gi=96))
            np.testing.assert_allclose(out, single, atol=3e-3), n_dev
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_slab_zsharded_forward_direction(monkeypatch):
    """Non-flip march (toward +axis): device segments combine in ascending
    order (the first test's pose marches toward -axis = flip, so the two
    cover both combine orders)."""
    from volrend_tpu.ops import dense_grid, pallas_slab, slab_render

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = Camera.from_vectors(center=(-2.4, 0.4, 0.6),
                              v_back=(-0.93, 0.15, 0.25),
                              width=32, height=32, fx=40.0)
    opt = RenderOptions(max_steps=512)
    seg_opt = opt.replace(stop_thresh=0.0, renormalize=False)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        perm, flip, _ = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, 32, 32)
        assert not flip
        single = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            32, 32, seg_opt, gi=96))
        mesh = dist.make_mesh(jax.devices()[:4], axis_name="z")
        out = np.asarray(dist.render_frame_slab_zsharded(
            grid, cam.transform, cam.fx, cam.fy, 32, 32, opt, mesh,
            gi=96))
        np.testing.assert_allclose(out, single, atol=3e-3)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


@pytest.mark.slow
def test_slab_zsharded_batched_matches_per_pose(monkeypatch):
    """Batched z-sharded frames (one lax.map dispatch over a pose group)
    == the per-pose call."""
    from volrend_tpu.ops import dense_grid, pallas_slab, slab_render

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cams = []
    for i in range(3):
        back = np.array([0.92, 0.2 + 0.08 * i, 0.27])
        back /= np.linalg.norm(back)
        cams.append(Camera.from_vectors(center=tuple(2.5 * back),
                                        v_back=tuple(back),
                                        width=32, height=32, fx=40.0))
    opt = RenderOptions(max_steps=512)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        mesh = dist.make_mesh(jax.devices()[:4], axis_name="z")
        trs = np.stack([c.transform for c in cams])
        batch = np.asarray(dist.render_frames_slab_zsharded(
            grid, trs, cams[0].fx, cams[0].fy, 32, 32, opt, mesh, gi=96))
        for i, c in enumerate(cams):
            single = np.asarray(dist.render_frame_slab_zsharded(
                grid, c.transform, c.fx, c.fy, 32, 32, opt, mesh, gi=96))
            np.testing.assert_allclose(batch[i], single, atol=2e-3)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
