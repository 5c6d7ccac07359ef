"""TPU-only Mosaic lowering smoke tests (ADVICE r3 item 3).

Interpret-mode tests cannot catch Mosaic lowering failures (the r3 uint8
emit crash shipped with a green CPU suite). These compile + run the
display-warp kernel variants the product surfaces actually use, on the
real chip, at small scale. They self-skip without a TPU (repo
convention); the full variant matrix lives in tools/preflight.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions


def _available():
    from volrend_tpu.ops import pallas_slab
    return pallas_slab.available()


pytestmark = pytest.mark.skipif(
    not _available(), reason="needs a real TPU (Mosaic lowering)")


@pytest.fixture(scope="module")
def scene():
    tree = make_test_tree(max_depth=4, basis_dim=16, seed=3, n_blobs=4,
                          sigma_scale=50.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    cam = Camera.from_vectors(center=(2.0, 1.2, 1.4),
                              v_back=(0.74, 0.45, 0.5),
                              width=128, height=128)
    opt = RenderOptions(max_steps=256)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, 128, 128)
    return grid, cam, opt, perm, flip


@pytest.mark.parametrize("out_dtype", [None, jnp.uint8])
def test_display_warp_lowers_and_runs(scene, out_dtype):
    """The combine kernel (incl. the RGBA8 display write-out route) must
    LOWER on the real Mosaic, not just pass interpret-mode parity."""
    grid, cam, opt, perm, flip = scene
    out = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        128, 128, opt, gi=128, out_dtype=out_dtype))
    assert out.shape == (128, 128, 4)
    if out_dtype == jnp.uint8:
        assert out.dtype == np.uint8
    assert np.all(np.isfinite(out.astype(np.float32)))
    assert out.astype(np.float32).max() > 0
