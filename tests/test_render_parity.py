"""Golden parity: the JAX renderer must match the scalar NumPy oracle
(the executable spec of rt_core.cuh:66-196 + volrend.cu:78-173) across the
full feature surface: SH/RGBA/SG formats, depth mode, render bbox, basis
windowing, viewdir rotation, early-stop renormalization, NDC warp, LUT vs
descent queries."""

import numpy as np
import pytest

from volrend_tpu.models.data_format import BasisType, DataFormat
from volrend_tpu.models.n3tree import NdcConfig
from volrend_tpu.models.synthetic import build_tree, make_blob_scene, make_test_tree
from volrend_tpu.ops import oracle
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions

SIZE = 16


@pytest.fixture(scope="module")
def tree():
    return make_test_tree(max_depth=3, basis_dim=4, seed=0, sigma_scale=60.0)


@pytest.fixture(scope="module")
def cam():
    return Camera.from_vectors(width=SIZE, height=SIZE, fx=SIZE * 1.2)


def render_both(tree, cam, opt, lut_depth=0):
    from volrend_tpu.ops import render_jax
    want = oracle.render_image(tree, cam, opt)
    dev = tree.to_device(lut_depth=lut_depth)
    got = np.asarray(render_jax.render_image(dev, cam, opt))
    return want, got


def assert_images_close(want, got, atol=2e-4):
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)


@pytest.mark.parametrize("lut_depth", [0, None])
def test_basic_sh(tree, cam, lut_depth):
    want, got = render_both(tree, cam, RenderOptions(), lut_depth)
    # scene must actually cover pixels (not all background)
    assert (want[..., 3] > 0.5).mean() > 0.2
    assert_images_close(want, got)


def test_early_stop_triggers(tree, cam):
    """The renormalization branch (rt_core.cuh:176-185) must be exercised."""
    opt = RenderOptions()
    want, got = render_both(tree, cam, opt)
    assert (want[..., 3] == 1.0).any(), "no early-stopped rays in test scene"
    assert_images_close(want, got)


def test_no_renormalize(tree, cam):
    opt = RenderOptions(renormalize=False)
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got)


def test_depth_mode(tree, cam):
    opt = RenderOptions(render_depth=True)
    want, got = render_both(tree, cam, opt)
    assert want[..., 0].max() > 0
    assert_images_close(want, got)


def test_render_bbox(tree, cam):
    opt = RenderOptions(render_bbox=(0.2, 0.1, 0.3, 0.8, 0.9, 0.7))
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got)


def test_basis_window(tree, cam):
    opt = RenderOptions(basis_minmax=(1, 3))
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got)


def test_rot_dirs(tree, cam):
    opt = RenderOptions(rot_dirs=(0.3, -0.2, 0.5))
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got, atol=5e-4)


def test_background(tree, cam):
    opt = RenderOptions(background_brightness=0.25)
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got)


def test_thresholds(tree, cam):
    opt = RenderOptions(sigma_thresh=5.0, stop_thresh=1e-4, step_size=1e-3)
    want, got = render_both(tree, cam, opt)
    assert_images_close(want, got)


def _rgba_tree():
    _, refine, _ = make_blob_scene(n_blobs=3, seed=5, sigma_scale=50.0)
    density, _, _ = make_blob_scene(n_blobs=3, seed=5, sigma_scale=50.0)

    def leaf(pts, cs):
        out = np.zeros((pts.shape[0], 4), np.float32)
        out[:, :3] = 0.5 + 0.5 * np.sin(pts * 9.0)
        out[:, 3] = density(pts)
        return out

    return build_tree(refine, leaf, max_depth=3, data_dim=4,
                      data_format=DataFormat(BasisType.RGBA, -1))


def test_rgba_format(cam):
    t = _rgba_tree()
    want, got = render_both(t, cam, RenderOptions())
    assert (want[..., 3] > 0.5).mean() > 0.1
    assert_images_close(want, got)


def _sg_tree():
    rng = np.random.default_rng(7)
    bd = 4
    _, refine, leaf_factory = make_blob_scene(n_blobs=3, seed=2,
                                              sigma_scale=50.0)
    t = build_tree(refine, leaf_factory(bd, coeff_seed=3), max_depth=3,
                   data_dim=3 * bd + 1,
                   data_format=DataFormat(BasisType.SG, bd))
    mu = rng.normal(size=(bd, 3))
    mu /= np.linalg.norm(mu, axis=-1, keepdims=True)
    lam = rng.uniform(1.0, 6.0, (bd, 1))
    t.extra = np.concatenate([lam, mu], -1).astype(np.float32)
    return t


def test_sg_format(cam):
    t = _sg_tree()
    want, got = render_both(t, cam, RenderOptions())
    assert_images_close(want, got)


def _asg_tree():
    rng = np.random.default_rng(11)
    bd = 4
    _, refine, leaf_factory = make_blob_scene(n_blobs=3, seed=2,
                                              sigma_scale=50.0)
    t = build_tree(refine, leaf_factory(bd, coeff_seed=5), max_depth=3,
                   data_dim=3 * bd + 1,
                   data_format=DataFormat(BasisType.ASG, bd))
    # per lobe: random orthonormal frame (mu_x, mu_y, mu_z) + positive a, b
    extra = np.zeros((bd, 11), np.float32)
    for i in range(bd):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        extra[i, 0] = rng.uniform(0.5, 4.0)
        extra[i, 1] = rng.uniform(0.5, 4.0)
        extra[i, 2:] = q.T.reshape(-1)
    t.extra = extra
    return t


def test_asg_format(cam):
    """ASG render parity oracle-vs-T2 (the reference ships ASG untested —
    lumisphere.hpp:14 'UNTESTED ASG'; we pin it numerically AND end-to-end)."""
    t = _asg_tree()
    want, got = render_both(t, cam, RenderOptions())
    assert (want[..., 3] > 0.5).mean() > 0.1
    assert_images_close(want, got)


def test_ndc(cam):
    t = make_test_tree(max_depth=3, basis_dim=4, seed=4, sigma_scale=60.0)
    t.use_ndc = True
    t.ndc = NdcConfig(width=800.0, height=800.0, focal=1111.0)
    c = Camera.from_vectors(center=(0.0, 0.0, 0.2),
                            v_back=(0.05, 0.02, 1.0),
                            width=SIZE, height=SIZE, fx=SIZE * 1.1)
    want, got = render_both(t, c, RenderOptions())
    assert (want[..., 3] > 0.01).any()
    assert_images_close(want, got, atol=5e-4)


def test_scan_mode_matches_while(tree, cam):
    """Fixed-length scan march (training path) == while march when
    renormalize=False and enough steps."""
    import jax.numpy as jnp
    from volrend_tpu.ops import render_jax

    opt = RenderOptions(renormalize=False, stop_thresh=0.0, max_steps=200)
    dev = tree.to_device(lut_depth=0)
    origins, dirs = cam.pixel_rays()
    a = render_jax.render_rays(dev, jnp.asarray(origins), jnp.asarray(dirs),
                               opt)
    b = render_jax.render_rays(dev, jnp.asarray(origins), jnp.asarray(dirs),
                               opt, differentiable=True, n_steps=200)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tiled_render_matches(tree, cam):
    from volrend_tpu.ops import render_jax
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=256)
    a = np.asarray(render_jax.render_image(dev, cam, opt))
    b = np.asarray(render_jax.render_image(dev, cam, opt,
                                           tile=cam.width * 4))
    np.testing.assert_allclose(a, b, atol=1e-6)
