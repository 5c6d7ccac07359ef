"""Training loop: loss decreases, recovers perturbed leaves, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.camera import Camera
from volrend_tpu.train import Trainer, psnr
from volrend_tpu.utils.options import RenderOptions


@pytest.fixture(scope="module")
def problem():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=11,
                          sigma_scale=50.0)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=256, renormalize=False)

    cams = []
    for th in (0.3, 1.5, 2.8, 4.2):
        back = np.array([np.cos(th), np.sin(th), 0.4])
        back /= np.linalg.norm(back)
        cams.append(Camera.from_vectors(
            center=tuple(2.5 * back), v_back=tuple(back),
            width=40, height=40, fx=48.0))
    rays = [c.pixel_rays(xp=np) for c in cams]
    targets = [np.asarray(render_jax.render_rays(
        dev, jnp.asarray(o), jnp.asarray(d), opt)) for o, d in rays]
    return tree, dev, opt, rays, targets


def _perturbed(dev, scale=0.35, seed=3):
    import dataclasses
    rng = np.random.default_rng(seed)
    noisy = np.asarray(dev.data, np.float32)
    noisy = noisy + rng.normal(0, scale, noisy.shape).astype(np.float32)
    return dataclasses.replace(dev, data=jnp.asarray(noisy, jnp.float16))


def test_training_recovers(problem):
    tree, dev, opt, rays, targets = problem
    noisy = _perturbed(dev)
    tr = Trainer(noisy, opt, lr=5e-2)

    def total_loss():
        return sum(
            float(np.mean((np.asarray(render_jax.render_rays(
                tr.current_tree(), jnp.asarray(o), jnp.asarray(d), opt))
                [:, :3] - t[:, :3]) ** 2))
            for (o, d), t in zip(rays, targets))

    loss0 = total_loss()
    rng = np.random.default_rng(0)
    for it in range(60):
        k = it % len(rays)
        (o, d), t = rays[k], targets[k]
        sel = rng.integers(0, o.shape[0], 512)
        tr.step(o[sel], d[sel], t[sel])
    loss1 = total_loss()
    assert loss1 < loss0 * 0.35, (loss0, loss1)


def test_checkpoint_roundtrip(problem, tmp_path):
    tree, dev, opt, rays, targets = problem
    tr = Trainer(_perturbed(dev), opt, lr=1e-2)
    (o, d), t = rays[0], targets[0]
    for _ in range(3):
        tr.step(o[:256], d[:256], t[:256])
    p = str(tmp_path / "ckpt.npz")
    tr.save_checkpoint(p)

    tr2 = Trainer(_perturbed(dev), opt, lr=1e-2)
    tr2.restore_checkpoint(p)
    assert tr2.step_count == tr.step_count
    np.testing.assert_array_equal(np.asarray(tr2.data), np.asarray(tr.data))
    # identical next step
    l1 = tr.step(o[:256], d[:256], t[:256])
    l2 = tr2.step(o[:256], d[:256], t[:256])
    assert l1 == l2


def test_export_npz(problem, tmp_path):
    tree, dev, opt, rays, targets = problem
    tr = Trainer(dev, opt)
    p = str(tmp_path / "export.npz")
    tr.export_npz(tree, p)
    back = N3Tree(p)
    np.testing.assert_array_equal(
        back.data.reshape(-1, back.data_dim),
        np.asarray(tr.data, np.float16)[:, :back.data_dim])


def test_sharded_training_step(problem):
    tree, dev, opt, rays, targets = problem
    from volrend_tpu.parallel import dist
    mesh = dist.make_mesh(jax.devices()[:8])
    noisy = _perturbed(dev)
    tr_a = Trainer(noisy, opt, lr=1e-2)
    tr_b = Trainer(noisy, opt, lr=1e-2)
    (o, d), t = rays[1], targets[1]
    la = tr_a.step(o[:512], d[:512], t[:512])
    lb = tr_b.step_sharded(mesh, o[:512], d[:512], t[:512])
    assert abs(la - lb) < 1e-5
    np.testing.assert_allclose(np.asarray(tr_a.data), np.asarray(tr_b.data),
                               atol=1e-6)
