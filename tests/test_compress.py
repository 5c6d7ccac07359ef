"""Compression: median cut, npz schema, host decode vs on-device dequant."""

import numpy as np
import pytest

import jax.numpy as jnp

from volrend_tpu.compress import compress_tree, quantize_median_cut
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.models.quantized import load_quantized, to_device_quantized
from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import render_jax
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions


def test_median_cut_small():
    rng = np.random.default_rng(0)
    # 4 well-separated clusters, 6 bits -> exact cluster separation
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       np.float32)
    pts = np.repeat(centers, 50, 0) + rng.normal(0, 0.01, (200, 3)).astype(
        np.float32)
    cb, ids = quantize_median_cut(pts, bits=6)
    err = np.linalg.norm(cb[ids] - pts, axis=-1)
    assert err.max() < 0.1
    assert ids.max() < 64


def test_median_cut_quality():
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 1, (20000, 3)).astype(np.float32)
    cb, ids = quantize_median_cut(pts, bits=10)
    rms = float(np.sqrt(np.mean((cb[ids] - pts) ** 2)))
    assert rms < 0.15  # 1024 codes over a 3-D unit gaussian


@pytest.fixture(scope="module")
def quantized_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmp")
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=9, sigma_scale=60.0)
    dense_path = str(d / "tree.npz")
    tree.save_npz(dense_path)
    with np.load(dense_path) as f:
        z = dict(f.items())
    zq = compress_tree(z, bits=10, sigma_thresh=2.0, retain=1)
    qpath = str(d / "tree_q.npz")
    np.savez_compressed(qpath, **zq)
    return tree, qpath


def test_compress_schema_and_decode(quantized_pair):
    tree, qpath = quantized_pair
    with np.load(qpath) as f:
        keys = set(f.files)
    assert {"quant_colors", "quant_map", "sigma",
            "data_retained"} <= keys
    # host decode path (reference loader semantics)
    dec = N3Tree(qpath)
    assert dec.data.shape == tree.data.shape
    # sigma survives exactly where above threshold
    s_orig = tree.data[..., -1].astype(np.float32)
    s_dec = dec.data[..., -1].astype(np.float32)
    np.testing.assert_allclose(s_dec[s_orig > 2.0], s_orig[s_orig > 2.0])
    assert np.all(s_dec[s_orig <= 2.0] == 0)
    # retained coeffs of live voxels identical
    bd = tree.data_format.basis_dim
    live = s_orig > 2.0
    for c in range(3):
        np.testing.assert_allclose(
            dec.data[..., c * bd][live].astype(np.float32),
            tree.data[..., c * bd][live].astype(np.float32))


def test_on_device_dequant_matches_host_decode(quantized_pair):
    tree, qpath = quantized_pair
    host = N3Tree(qpath)                     # eager decode
    raw = load_quantized(qpath)              # raw quantized
    dev_q = to_device_quantized(raw, lut_depth=None)

    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, host.n_cells, 500))
    dense_rows = jnp.asarray(
        host.data.reshape(-1, host.data_dim))[idx]
    q_rows = dev_q.data.fetch_rows(idx)
    np.testing.assert_array_equal(np.asarray(q_rows),
                                  np.asarray(dense_rows))


def test_quantized_render_parity(quantized_pair):
    tree, qpath = quantized_pair
    host = N3Tree(qpath)
    dev_dense = host.to_device(lut_depth=None)
    dev_q = to_device_quantized(load_quantized(qpath), lut_depth=None)

    back = np.array([1.0, 0.3, 0.4])
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              width=32, height=32, fx=40.0)
    opt = RenderOptions(max_steps=256)
    a = np.asarray(render_jax.render_image(dev_dense, cam, opt))
    b = np.asarray(render_jax.render_image(dev_q, cam, opt))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_compress_cli(tmp_path, quantized_pair):
    from volrend_tpu.cli import compress as cli
    tree, _ = quantized_pair
    src = str(tmp_path / "t.npz")
    tree.save_npz(src)
    out = str(tmp_path / "out")
    rc = cli.main([src, "--out_dir", out, "--bits", "8", "--retain", "1"])
    assert rc == 0
    dec = N3Tree(str(tmp_path / "out" / "t.npz"))
    assert dec.data is not None
