"""Gradient correctness (BASELINE config[2]):

- fused custom-VJP forward == scan forward == while forward (train mode)
- fused hand-written backward == jax.grad through the scan renderer
- both validated against central finite differences on leaf SH/sigma coords
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volrend_tpu.models.data_format import BasisType, DataFormat
from volrend_tpu.models.synthetic import build_tree, make_blob_scene, make_test_tree
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.grad import l2_loss_and_grad, render_rays_train
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions

SIZE = 8
N_STEPS = 150


@pytest.fixture(scope="module")
def setup():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=0, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=0)
    data32 = jnp.asarray(dev.data, jnp.float32)
    cam = Camera.from_vectors(width=SIZE, height=SIZE, fx=SIZE * 1.2)
    origins, dirs = cam.pixel_rays()
    origins, dirs = jnp.asarray(origins), jnp.asarray(dirs)
    opt = RenderOptions(background_brightness=0.3, renormalize=False)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (SIZE * SIZE, 4)), jnp.float32)
    return dev, data32, origins, dirs, opt, target


def scan_loss(dev, data, origins, dirs, opt, target):
    t = dataclasses.replace(dev, data=data)
    out = render_jax.render_rays(t, origins, dirs, opt,
                                 differentiable=True, n_steps=N_STEPS)
    diff = out[:, :3] - target[:, :3]
    return jnp.mean(diff * diff)


def test_fused_forward_matches_scan(setup):
    dev, data32, origins, dirs, opt, _ = setup
    t = dataclasses.replace(dev, data=data32)
    a = render_rays_train(t, origins, dirs, opt)
    b = render_jax.render_rays(t, origins, dirs, opt,
                               differentiable=True, n_steps=N_STEPS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_grad_matches_autodiff(setup):
    dev, data32, origins, dirs, opt, target = setup
    loss_f, grad_fused = l2_loss_and_grad(
        dev, origins, dirs, target, opt, data=data32)
    loss_s, grad_auto = jax.value_and_grad(
        lambda d: scan_loss(dev, d, origins, dirs, opt, target))(data32)
    np.testing.assert_allclose(float(loss_f), float(loss_s), rtol=1e-5)
    ga, gf = np.asarray(grad_auto), np.asarray(grad_fused)
    assert np.abs(gf).max() > 0
    scale = np.abs(ga).max()
    np.testing.assert_allclose(gf, ga, atol=3e-3 * scale, rtol=2e-3)
    # both sigma and coefficient gradients must be alive
    assert np.abs(gf[:, dev.data_dim - 1]).max() > 0
    assert np.abs(gf[:, :-1]).max() > 0


def test_grad_finite_differences(setup):
    dev, data32, origins, dirs, opt, target = setup
    _, grad = l2_loss_and_grad(dev, origins, dirs, target, opt, data=data32)
    grad = np.asarray(grad)

    def loss_np(data):
        return float(scan_loss(dev, data, origins, dirs, opt, target))

    # check the largest-|grad| sigma coord and coefficient coords
    # (columns beyond data_dim are lane-alignment padding with zero grads)
    flat = np.abs(grad).copy()
    coords = []
    sig_col = dev.data_dim - 1
    coords.append((int(np.abs(grad[:, sig_col]).argmax()), sig_col))
    for _ in range(4):
        ij = np.unravel_index(flat[:, :sig_col].argmax(), flat[:, :sig_col].shape)
        coords.append((int(ij[0]), int(ij[1])))
        flat[ij[0], ij[1]] = 0
    for (i, j) in coords:
        h = 2e-2
        dp = data32.at[i, j].add(h)
        dm = data32.at[i, j].add(-h)
        fd = (loss_np(dp) - loss_np(dm)) / (2 * h)
        assert abs(fd - grad[i, j]) < 5e-2 * max(abs(fd), abs(grad[i, j])), (
            i, j, fd, grad[i, j])


def test_untouched_leaves_zero_grad(setup):
    dev, data32, origins, dirs, opt, target = setup
    # a single (scene-hitting, central) ray can only touch a few leaves
    mid = (SIZE // 2) * SIZE + SIZE // 2
    _, grad = l2_loss_and_grad(dev, origins[mid:mid + 1], dirs[mid:mid + 1],
                               target[mid:mid + 1], opt, data=data32)
    grad = np.asarray(grad)
    touched = (np.abs(grad).sum(-1) > 0).sum()
    assert 0 < touched < grad.shape[0] // 4


def test_rgba_format_grads(setup):
    _, _, origins, dirs, opt, target = setup
    density, refine, _ = make_blob_scene(n_blobs=3, seed=5, sigma_scale=50.0)

    def leaf(pts, cs):
        out = np.zeros((pts.shape[0], 4), np.float32)
        out[:, :3] = 0.5 + 0.5 * np.sin(pts * 9.0)
        out[:, 3] = density(pts)
        return out

    t = build_tree(refine, leaf, max_depth=3, data_dim=4,
                   data_format=DataFormat(BasisType.RGBA, -1))
    dev = t.to_device(lut_depth=0)
    data32 = jnp.asarray(dev.data, jnp.float32)
    loss_f, grad_fused = l2_loss_and_grad(
        dev, origins, dirs, target, opt, data=data32)
    loss_s, grad_auto = jax.value_and_grad(
        lambda d: scan_loss(dev, d, origins, dirs, opt, target))(data32)
    np.testing.assert_allclose(float(loss_f), float(loss_s), rtol=1e-5)
    scale = np.abs(np.asarray(grad_auto)).max()
    np.testing.assert_allclose(np.asarray(grad_fused), np.asarray(grad_auto),
                               atol=3e-3 * scale, rtol=2e-3)


def test_lut_mode_grads_match(setup):
    dev, data32, origins, dirs, opt, target = setup
    from volrend_tpu.models.synthetic import make_test_tree
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=0, sigma_scale=60.0)
    dev_lut = tree.to_device(lut_depth=None)
    _, g0 = l2_loss_and_grad(dev, origins, dirs, target, opt, data=data32)
    _, g1 = l2_loss_and_grad(dev_lut, origins, dirs, target, opt, data=data32)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
