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


def _render(dev, cam, opt):
    return np.asarray(render_jax.render_image(dev, cam, opt))


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def test_codebook_quality_ab(tmp_path):
    """Compress->render A/B at a fixed scene (VERDICT r2 item 7): PSNR vs
    the dense render as a function of codebook bits and retained coeffs,
    and a decomposition pinning WHY the default-config parity figure
    (parity.json config3: 24.7 dB) is low: it is the reference's own
    deliberate sigma<thresh voxel kill (compress_octree.py:32), not the
    codebook — the 16-bit codebook alone sits far above the dense render's
    display quantum (reference decode: n3tree.cpp:279-340)."""
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=9, sigma_scale=60.0)
    dense_path = str(tmp_path / "t.npz")
    tree.save_npz(dense_path)
    with np.load(dense_path) as f:
        z = dict(f.items())
    back = np.asarray((1.0, 0.3, 0.4))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=60.0)
    opt = RenderOptions(max_steps=512)
    dense = _render(tree.to_device(lut_depth=None), cam, opt)

    def quant_psnr(bits, retain, sigma_thresh=0.0):
        zq = compress_tree(dict(z), bits=bits, retain=retain,
                           sigma_thresh=sigma_thresh)
        p = str(tmp_path / f"q{bits}_{retain}_{sigma_thresh}.npz")
        np.savez(p, **zq)
        img = _render(N3Tree(p).to_device(lut_depth=None), cam, opt)
        return _psnr(img[..., :3], dense[..., :3])

    # codebook-size sweep at thresh=0 (pure quantization error)
    curve = {b: quant_psnr(b, retain=1) for b in (6, 10, 16)}
    assert curve[6] <= curve[10] + 0.5 <= curve[16] + 1.0, curve
    # the reference's 2^16 codebook is visually transparent: well above
    # the ~48 dB 8-bit display quantum
    assert curve[16] > 60.0, curve
    # retaining the DC coefficient uncompressed helps at small codebooks
    assert quant_psnr(6, retain=1) >= quant_psnr(6, retain=0) - 0.5

    # decomposition of the default config's loss: apply ONLY the sigma
    # kill to the dense tree (no codebook) and compare
    killed = dict(z)
    data = np.array(killed["data"], np.float32)
    sig = data[..., -1]
    data[..., -1] = np.where(sig < 2.0, 0.0, sig)
    killed["data"] = data.astype(np.float16)
    kp = str(tmp_path / "killed.npz")
    np.savez(kp, **killed)
    kill_only = _psnr(
        _render(N3Tree(kp).to_device(lut_depth=None), cam, opt)[..., :3],
        dense[..., :3])
    with_codebook = quant_psnr(16, retain=1, sigma_thresh=2.0)
    # the 16-bit codebook moves the thresholded render by < 1 dB: the
    # sigma kill owns the quality loss at default settings
    assert abs(with_codebook - kill_only) < 1.0, (with_codebook, kill_only)
