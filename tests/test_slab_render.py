"""Slab (shear-warp) renderer vs the exact T2 renderer.

The slab path visits the same full-resolution voxels with the same
compositing math; differences come only from x/y corner-voxel clipping and
the per-segment step epsilon, so images must agree to high PSNR from every
viewing octant.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops import dense_grid, render_jax, slab_render
from volrend_tpu.ops.camera import Camera
from volrend_tpu.utils.options import RenderOptions


@pytest.fixture(scope="module")
def scene():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    return dev, grid


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def make_cam(back, width=48, height=48):
    back = np.asarray(back, np.float64)
    back /= np.linalg.norm(back)
    up = (0.0, 0.0, 1.0) if abs(back[2]) < 0.9 else (0.0, 1.0, 0.0)
    return Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                               v_world_up=up, width=width, height=height,
                               fx=60.0)


def test_bake_full_res_exact(scene):
    dev, grid = scene
    assert grid.G == dense_grid.full_resolution(dev)
    # voxel centers must hold exactly the leaf payloads
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    leaf_idx, _, _ = render_jax.query_batched(dev, jnp.asarray(pts))
    ref = np.asarray(dev.data)[np.asarray(leaf_idx)][:, :dev.data_dim]
    vox = np.clip((pts * grid.G).astype(np.int64), 0, grid.G - 1)
    got = np.asarray(grid.data)[vox[:, 0], vox[:, 1], vox[:, 2]]
    np.testing.assert_array_equal(got, ref)


def test_default_gi_tracks_grid(scene):
    """gi defaults to the volume's Nyquist rounded to the 128-lane tile
    (PSNR is flat in gi at/above G while march time scales ~gi^2)."""
    dev, grid = scene
    assert slab_render.default_gi(grid) == 128      # G=8 -> lane floor
    for G, want in ((128, 128), (256, 256), (300, 384), (512, 512),
                    (1024, 512)):
        fake = type("g", (), {"G": G})
        assert slab_render.default_gi(fake) == want
    # render_image with gi=None must route through the default
    cam = make_cam((1, 0.2, 0.3))
    opt = RenderOptions(max_steps=512)
    out = slab_render.render_image(grid, cam, opt)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    assert psnr(out[..., :3], ref[..., :3]) > 30.0


@pytest.mark.parametrize("back", [
    (1, 0.2, 0.3), (-1, 0.1, -0.2), (0.2, 1, 0.1), (0.1, -1, 0.25),
    (0.3, 0.1, 1), (-0.2, -0.1, -1), (0.5, 0.45, 0.4),
])
def test_slab_matches_exact_renderer(scene, back):
    dev, grid = scene
    cam = make_cam(back)
    opt = RenderOptions(max_steps=512)

    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    assert np.isfinite(slope)
    out = slab_render.render_image(grid, cam, opt, gi=128)

    p = psnr(out[..., :3], ref[..., :3])
    assert p > 30.0, f"PSNR {p:.1f} dB too low for back={back}"
    # alpha masks must agree except at silhouettes
    mismatch = np.mean(np.abs(out[..., 3] - ref[..., 3]) > 0.5)
    assert mismatch < 0.02


def test_depth_mode_runs(scene):
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3))
    opt = RenderOptions(render_depth=True, max_steps=512)
    out = slab_render.render_image(grid, cam, opt, gi=128)
    assert np.all(np.isfinite(out))


def test_render_bbox(scene):
    dev, grid = scene
    cam = make_cam((0.3, 0.1, 1))
    opt = RenderOptions(render_bbox=(0.25, 0.25, 0.25, 0.75, 0.75, 0.75),
                        max_steps=512)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    assert psnr(out[..., :3], ref[..., :3]) > 28.0


def test_banded_final_warp_matches_exact(scene, monkeypatch):
    """The banded gather path (H % 50 == 0, gi-1 >= 160) must render
    correctly (vs exact renderer) — exercises dynamic band slicing. The
    full-table threshold is forced to 0 so the small test table actually
    takes the banded branch (production crosses it at gi>=629 f16 /
    gi>=444 precise)."""
    import jax
    monkeypatch.setattr(slab_render, "_FULL_TABLE_MAX_BYTES", 0)
    jax.clear_caches()   # the threshold is trace-time; drop stale jits
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=100, height=100)
    opt = RenderOptions(max_steps=512)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=192)
    assert psnr(out[..., :3], ref[..., :3]) > 30.0


def test_render_frames_batch_matches_single(scene):
    """render_frames (hoisted transpose) == render_frame per pose."""
    import jax.numpy as jnp
    dev, grid = scene
    cams = [make_cam((1, 0.2 + 0.1 * i, 0.3)) for i in range(3)]
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cams[0].transform, cams[0].fx, cams[0].fy, 48, 48)
    trs = jnp.asarray(np.stack([c.transform for c in cams]))
    batch = np.asarray(slab_render.render_frames(
        grid, trs, cams[0].fx, cams[0].fy, perm, flip, 48, 48, opt, gi=128))
    for i, c in enumerate(cams):
        single = slab_render.render_image(grid, c, opt, gi=128)
        # display warp combines in f16: one f16 ulp (~1e-3 on display-range
        # values, below the 1/255 display quantum) may differ between the
        # batched and single compilations' fusion orders
        np.testing.assert_allclose(batch[i], single, atol=2e-3)


def test_pallas_path_matches_exact(scene):
    """TPU-only: the fused Pallas march must match the exact renderer."""
    import jax
    from volrend_tpu.ops import pallas_slab
    if not pallas_slab.available():
        pytest.skip("no TPU backend")
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=64, height=64)
    opt = RenderOptions(max_steps=512)
    assert slab_render._pallas_ok(grid, opt)
    out = slab_render.render_image(grid, cam, opt, gi=128)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    assert psnr(out[..., :3], ref[..., :3]) > 35.0


def _interpret_vs_xla(grid, cam, opt, monkeypatch, gi=96, gate=45.0,
                      atol_alpha=2e-2):
    """Render through XLA slab path and (interpret-mode) Pallas kernel."""
    import jax
    from volrend_tpu.ops import pallas_slab
    ref = slab_render.render_image(grid, cam, opt, gi=gi)
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        assert slab_render._pallas_ok(grid, opt)
        out = slab_render.render_image(grid, cam, opt, gi=gi)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    assert psnr(out[..., :3], ref[..., :3]) > gate, \
        f"interpret-kernel PSNR {psnr(out[..., :3], ref[..., :3]):.1f}"
    np.testing.assert_allclose(out[..., 3], ref[..., 3], atol=atol_alpha)


def test_pallas_interpret_early_exit_opaque(monkeypatch):
    """A near-opaque scene saturates transmittance within the first few
    slabs, so most windows hit the kernel's whole-frame early exit
    (any(T >= stop_thresh) false); the skipped windows must not change
    the image vs the XLA slab path (which marches every slab)."""
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=5000.0)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = make_cam((1, 0.2, 0.3), width=32, height=32)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=512), monkeypatch)


@pytest.mark.parametrize("k_per_step", [1, 2, 8])
def test_pallas_interpret_k_window_sizes(scene, monkeypatch, k_per_step):
    """march_slabs must be invariant to the slabs-per-window grouping
    (K-aligned occupancy masks, per-window hoisted planes, window
    liveness gate all depend on K)."""
    import jax
    from volrend_tpu.ops import pallas_slab
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=32, height=32)
    orig = pallas_slab.march_slabs

    def patched(*args, **kw):
        kw["k_per_step"] = k_per_step
        return orig(*args, **kw)

    monkeypatch.setattr(pallas_slab, "march_slabs", patched)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=512), monkeypatch)


def test_pallas_interpret_bf16_shade(scene, monkeypatch):
    """The display path's bfloat16 SH shading (march_slabs(shade_bf16=True))
    must agree with the XLA slab path: bf16 packs 2 values per VPU lane, so
    the basis-plane + payload-MAC accumulation runs ~2x faster at ~8
    mantissa bits — measured 63 dB vs f32 shading, far above the gate."""
    from volrend_tpu.ops import pallas_slab
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=32, height=32)
    monkeypatch.setattr(pallas_slab, "_BF16_SHADE", True)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=512), monkeypatch)


def test_pallas_interpret_depth_mode(scene, monkeypatch):
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=32, height=32)
    _interpret_vs_xla(grid, cam, RenderOptions(render_depth=True,
                                               max_steps=512),
                      monkeypatch, gate=40.0)


def test_pallas_interpret_rot_dirs(scene, monkeypatch):
    dev, grid = scene
    cam = make_cam((1, 0.2, 0.3), width=32, height=32)
    _interpret_vs_xla(grid, cam,
                      RenderOptions(rot_dirs=(0.3, -0.2, 0.5),
                                    max_steps=512), monkeypatch)


def test_pallas_interpret_sg(monkeypatch):
    from volrend_tpu.models.data_format import BasisType, DataFormat
    from volrend_tpu.models.synthetic import build_tree, make_blob_scene
    rng = np.random.default_rng(4)
    bd = 4
    _, refine, leaf_factory = make_blob_scene(n_blobs=3, seed=4,
                                              sigma_scale=50.0)
    tree = build_tree(refine, leaf_factory(bd, coeff_seed=2), max_depth=3,
                      data_dim=3 * bd + 1,
                      data_format=DataFormat(BasisType.SG, bd))
    mu = rng.normal(size=(bd, 3))
    mu /= np.linalg.norm(mu, axis=-1, keepdims=True)
    lam = rng.uniform(1.0, 6.0, (bd, 1))
    tree.extra = np.concatenate([lam, mu], -1).astype(np.float32)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = make_cam((1, 0.25, 0.3), width=32, height=32)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=256), monkeypatch)


def test_pallas_interpret_rgba(monkeypatch):
    from volrend_tpu.models.data_format import BasisType, DataFormat
    from volrend_tpu.models.synthetic import build_tree, make_blob_scene
    density, refine, _ = make_blob_scene(n_blobs=3, seed=6, sigma_scale=50.0)

    def leaf_fn(pts, cell):
        out = np.zeros((pts.shape[0], 4), np.float32)
        out[:, :3] = 0.5 + 0.5 * np.sin(pts * 7.0)
        out[:, 3] = density(pts)
        return out

    tree = build_tree(refine, leaf_fn, max_depth=3, data_dim=4,
                      data_format=DataFormat(BasisType.RGBA, -1))
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = make_cam((0.2, 1, 0.15), width=32, height=32)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=256), monkeypatch)


@pytest.mark.parametrize("back", [(1, 0.2, 0.3), (-0.2, -0.1, -1)])
def test_pallas_interpret_matches_xla_slab(scene, back, monkeypatch):
    """Pallas kernel semantics vs the XLA slab path, via interpret mode on
    CPU (same culled slab list, same compositing; only the warp-resample
    precision differs — bf16 one-hot matmuls vs f32 gathers)."""
    import jax
    from volrend_tpu.ops import pallas_slab
    if pallas_slab.available():
        pytest.skip("real TPU present; covered by the TPU parity test")
    dev, grid = scene
    cam = make_cam(back, width=48, height=48)
    opt = RenderOptions(max_steps=512)
    ref = slab_render.render_image(grid, cam, opt, gi=96)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        assert slab_render._pallas_ok(grid, opt)
        out = slab_render.render_image(grid, cam, opt, gi=96)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    assert psnr(out[..., :3], ref[..., :3]) > 45.0
    np.testing.assert_allclose(out[..., 3], ref[..., 3], atol=2e-2)


def test_int8_grid_quality(scene):
    """int8 dense grid (in-traversal dequant) vs f16 grid."""
    dev, grid = scene
    grid8 = dense_grid.bake_dense(dev, dtype="int8")
    assert grid8.quantized and grid8.data.dtype == np.int8
    cam = make_cam((1, 0.2, 0.3))
    opt = RenderOptions(max_steps=512)
    a = slab_render.render_image(grid, cam, opt, gi=128)
    b = slab_render.render_image(grid8, cam, opt, gi=128)
    assert psnr(b[..., :3], a[..., :3]) > 35.0


def test_slab_sg_basis():
    """SG trees render through the XLA slab path (kernel falls back)."""
    from volrend_tpu.models.data_format import BasisType, DataFormat
    from volrend_tpu.models.synthetic import build_tree, make_blob_scene
    rng = np.random.default_rng(4)
    bd = 4
    density, refine, _ = make_blob_scene(n_blobs=3, seed=4, sigma_scale=50.0)
    extra = np.concatenate([
        rng.uniform(2.0, 6.0, (bd, 1)),           # lambda
        rng.normal(size=(bd, 3)),                 # mu (normalized below)
    ], -1).astype(np.float32)
    extra[:, 1:] /= np.linalg.norm(extra[:, 1:], axis=-1, keepdims=True)

    def leaf_fn(pts, cell):
        out = rng.uniform(-1, 1, (pts.shape[0], 3 * bd + 1)).astype(
            np.float32)
        out[:, -1] = density(pts)
        return out

    tree = build_tree(refine, leaf_fn, max_depth=3, data_dim=3 * bd + 1,
                      data_format=DataFormat(BasisType.SG, bd))
    tree.extra = extra
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    assert not slab_render._pallas_ok(grid, RenderOptions())

    cam = make_cam((1, 0.25, 0.3))
    opt = RenderOptions(max_steps=256)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    assert psnr(out[..., :3], ref[..., :3]) > 30.0


def test_slab_asg_basis():
    """ASG trees render through the XLA slab path (kernel falls back)."""
    from volrend_tpu.models.data_format import BasisType, DataFormat
    from volrend_tpu.models.synthetic import build_tree, make_blob_scene
    rng = np.random.default_rng(12)
    bd = 4
    density, refine, leaf_factory = make_blob_scene(
        n_blobs=3, seed=4, sigma_scale=50.0)
    tree = build_tree(refine, leaf_factory(bd, coeff_seed=9), max_depth=3,
                      data_dim=3 * bd + 1,
                      data_format=DataFormat(BasisType.ASG, bd))
    extra = np.zeros((bd, 11), np.float32)
    for i in range(bd):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        extra[i, 0] = rng.uniform(0.5, 4.0)
        extra[i, 1] = rng.uniform(0.5, 4.0)
        extra[i, 2:] = q.T.reshape(-1)
    tree.extra = extra
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    assert not slab_render._pallas_ok(grid, RenderOptions())

    cam = make_cam((1, 0.25, 0.3))
    opt = RenderOptions(max_steps=256)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    assert psnr(out[..., :3], ref[..., :3]) > 30.0


def test_slab_rgba_format():
    """RGBA (basis-free) trees through the slab path."""
    from volrend_tpu.models.data_format import BasisType, DataFormat
    from volrend_tpu.models.synthetic import build_tree, make_blob_scene
    density, refine, _ = make_blob_scene(n_blobs=3, seed=6, sigma_scale=50.0)

    def leaf_fn(pts, cell):
        out = np.zeros((pts.shape[0], 4), np.float32)
        out[:, :3] = 0.5 + 0.5 * np.sin(pts * 7.0)
        out[:, 3] = density(pts)
        return out

    tree = build_tree(refine, leaf_fn, max_depth=3, data_dim=4,
                      data_format=DataFormat(BasisType.RGBA, -1))
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    cam = make_cam((0.2, 1, 0.15))
    opt = RenderOptions(max_steps=256)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    assert psnr(out[..., :3], ref[..., :3]) > 30.0


def test_full_resolution_800_parity():
    """800x800 end-to-end parity gate (VERDICT r1 weak #5): one pose at the
    bench's output resolution, XLA slab path vs exact per-ray T2 on a
    pixel-subsampled grid. Catches resampling artifacts the 48^2 tests
    can't (the r1 bench-scale 26.5 dB warp bug class)."""
    W = H = 800
    tree = make_test_tree(max_depth=5, basis_dim=4, seed=3, n_blobs=4,
                          sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    opt = RenderOptions(max_steps=512)
    cam = make_cam((1, 0.22, 0.31), width=W, height=H)
    cam.fx = cam.fy = 1111.11
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert np.isfinite(slope)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        W, H, opt, gi=448))

    ys = np.arange(0, H, 10)
    xs = np.arange(0, W, 10)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    got = frame[ys][:, xs].reshape(-1, 4)
    p = psnr(got[:, :3], exact[:, :3])
    assert p > 40.0, f"800^2 slab-vs-exact PSNR {p:.1f} dB"


@pytest.mark.slow
def test_pallas_static_matches_dynamic_dispatch(scene, monkeypatch):
    """The static-index window path (dense contiguous runs) and the
    scalar-prefetch path must produce bit-identical marches — they share
    the per-slab kernel body and differ only in how block indices reach
    Mosaic."""
    import jax
    from volrend_tpu.ops import pallas_slab
    dev, grid = scene
    cam = make_cam((1, 0.25, 0.35))
    opt = RenderOptions(max_steps=512)
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        assert slab_render._pallas_ok(grid, opt)
        a = slab_render.render_image(grid, cam, opt, gi=96)
        monkeypatch.setattr(pallas_slab, "_FORCE_DYNAMIC", True)
        jax.clear_caches()
        b = slab_render.render_image(grid, cam, opt, gi=96)
        monkeypatch.setattr(pallas_slab, "_FORCE_DYNAMIC", False)
        monkeypatch.setattr(pallas_slab, "_MANUAL_PIPE", True)
        jax.clear_caches()
        c = slab_render.render_image(grid, cam, opt, gi=96)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_DYNAMIC", False)
        monkeypatch.setattr(pallas_slab, "_MANUAL_PIPE", False)
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_solid_scene_sparse_and_matches_exact():
    """make_solid_tree must have realistic occupancy statistics (empty
    space + solid objects, unlike the fog of make_blob_scene) and render
    identically through the slab path."""
    from volrend_tpu.models.synthetic import make_solid_tree
    tree = make_solid_tree(max_depth=4, basis_dim=4, seed=3)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    G = grid.G
    sig = np.asarray(grid.data[..., -1], np.float32)
    occ = float((sig > 1e-2).mean())
    assert occ < 0.3, f"solid scene occupancy {occ:.2f} not sparse"
    # some slabs must be fully empty (culled by slab_ids)
    ids = grid.slab_ids(0, False, 1e-2)
    assert 0 < len(ids) < G
    cam = make_cam((1, 0.3, 0.4))
    opt = RenderOptions(max_steps=512)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 30.0, f"solid-scene slab PSNR {p:.1f}"


def test_fractional_boundary_uniform_sigma():
    """Constant-sigma volume: slab resampling of a constant field is exact,
    so the only slab-path error channel left is boundary quantization —
    entry/exit slabs must contribute by their FRACTIONAL overlap with the
    pixel's exact z-interval (the sub-slab analog of the reference clipping
    each ray's t-range, rt_core.cuh:17-34). Whole-slab quantization errs by
    ~sigma*dz/2 in tau (~0.02 absolute here); the fractional path must
    match the exact renderer to ~1e-3 on every channel incl. alpha."""
    from volrend_tpu.models.synthetic import build_tree
    from volrend_tpu.models.data_format import DataFormat, BasisType

    SIG = 2.0

    def refine(c, cs, d):
        return np.ones(len(c), bool)

    def leaf(c, cs):
        out = np.zeros((len(c), 4), np.float32)
        out[:, 0] = 2.0          # constant SH0 color coefficient
        out[:, -1] = SIG
        return out

    tree = build_tree(refine, leaf, max_depth=2, data_dim=4,
                      data_format=DataFormat(BasisType.SH, 1))
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    opt = RenderOptions(step_size=1e-5)   # shrink T2's per-step epsilon bias
    for back in ((0.3, 0.1, 1.0), (1.0, 0.2, 0.3), (0.5, 0.45, 0.4)):
        back = np.asarray(back, np.float64)
        back /= np.linalg.norm(back)
        up = (0.0, 0.0, 1.0) if abs(back[2]) < 0.9 else (0.0, 1.0, 0.0)
        # narrow FOV: the view cone stays strictly inside the cube, so no
        # silhouette pixels (those mix warp-resampled saturation — the
        # documented x/y class, not what this test isolates) and no
        # early-stop renorm; every ray crosses an entry AND an exit face
        cam = Camera.from_vectors(
            center=tuple(np.array([0.5] * 3) + 2.0 * back),
            v_back=tuple(back), v_world_up=up,
            width=32, height=32, fx=160.0)
        ref = np.asarray(render_jax.render_image(dev, cam, opt))
        out = np.asarray(slab_render.render_image(grid, cam, opt, gi=64))
        err = float(np.max(np.abs(out - ref)))
        assert err < 2e-3, f"back={back}: max abs err {err:.4f}"


def test_pallas_interpret_solid_scene_partial_masks(monkeypatch):
    """The static-index path with PARTIAL occupancy masks (sparse scene:
    per-slab @pl.when gating + zero-mask gap windows) must match the XLA
    slab path."""
    from volrend_tpu.models.synthetic import make_solid_tree
    tree = make_solid_tree(max_depth=4, basis_dim=4, seed=3)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    cam = make_cam((1, 0.3, 0.4), width=32, height=32)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=512), monkeypatch,
                      gate=40.0)


@pytest.mark.slow
def test_slab_fuzz_random_poses(scene):
    """Random-pose fuzz across the viewing sphere: every slab-compatible
    pose must agree with the exact renderer; incompatible poses must be
    flagged (finite-slope contract), never silently wrong."""
    dev, grid = scene
    rng = np.random.default_rng(11)
    opt = RenderOptions(max_steps=512)
    checked = 0
    for _ in range(12):
        back = rng.normal(size=3)
        back /= np.linalg.norm(back)
        r = rng.uniform(1.8, 3.5)
        up = rng.normal(size=3)
        up -= up @ back * back
        n = np.linalg.norm(up)
        if n < 0.3:
            continue
        cam = Camera.from_vectors(
            center=tuple(r * back), v_back=tuple(back),
            v_world_up=tuple(up / n), width=40, height=40,
            fx=rng.uniform(40.0, 90.0))
        perm, flip, slope = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, 40, 40)
        if not (np.isfinite(slope)
                and slope < slab_render.MAX_SLAB_SLOPE):
            continue
        out = slab_render.render_image(grid, cam, opt, gi=128)
        ref = np.asarray(render_jax.render_image(dev, cam, opt))
        p = psnr(out[..., :3], ref[..., :3])
        assert p > 26.0, (f"fuzz pose back={back} up={up} slope={slope:.2f}"
                          f" PSNR {p:.1f}")
        checked += 1
    assert checked >= 6, f"only {checked} fuzz poses were slab-compatible"


# ---------------------------------------------------------------------------
# NDC/LLFF trees on the slab fast path
# ---------------------------------------------------------------------------
# The NDC warp (volrend.cu:34-54) is a projective map, so a pinhole ray
# family stays a pinhole family in NDC space: the slab path renders NDC
# trees by warping the pose geometry (center = pi(origin), slope grid from
# warped corner dirs) and shading with the NDC-specific affine
# slope->world-dir map (FrameGeom.dirM).

@pytest.fixture(scope="module")
def ndc_scene():
    from volrend_tpu.models.n3tree import NdcConfig
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=4, sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=800.0, height=800.0, focal=1111.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    assert grid.ndc == (800.0, 800.0, 1111.0)
    return dev, grid


def make_ndc_cam(center=(0.0, 0.0, 0.2), back=(0.05, 0.02, 1.0),
                 width=48, height=48, fx=52.0):
    return Camera.from_vectors(center=center, v_back=back,
                               v_world_up=(0.0, 1.0, 0.0),
                               width=width, height=height, fx=fx)


@pytest.mark.parametrize("center,back", [
    ((0.0, 0.0, 0.2), (0.05, 0.02, 1.0)),    # camera behind z=0 plane
    ((0.1, -0.05, 0.35), (-0.08, 0.05, 1.0)),
    ((0.0, 0.0, -0.4), (0.0, 0.0, 1.0)),     # between scene and z=0
    # near the z=0 plane (the default LLFF viewing pose, ndc_camera):
    # warped rays are near-parallel — needs the range-proportional slope
    # pad (an absolute pad collapses the intermediate resolution)
    ((0.0, 0.0, 1e-3), (0.02, 0.01, 1.0)),
    ((0.0, 0.0, -1e-4), (0.02, 0.01, 1.0)),
])
def test_ndc_slab_matches_exact(ndc_scene, center, back):
    dev, grid = ndc_scene
    cam = make_ndc_cam(center, back)
    opt = RenderOptions(max_steps=512)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    assert perm[0] == 2 and np.isfinite(slope), (perm, slope)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    assert (ref[..., 3] > 0.5).mean() > 0.1
    out = slab_render.render_image(grid, cam, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 33.0, f"NDC slab PSNR {p:.1f} dB (center={center})"
    assert np.mean(np.abs(out[..., 3] - ref[..., 3]) > 0.5) < 0.02


def test_ndc_slab_depth_mode(ndc_scene):
    """Depth accumulates t from the NDC near plane (world2ndc places the
    warped ray origin on z' = -1), not from the warped pinhole center."""
    dev, grid = ndc_scene
    cam = make_ndc_cam()
    opt = RenderOptions(render_depth=True, max_steps=512)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 30.0, f"NDC depth PSNR {p:.1f} dB"


def test_ndc_interior_camera_falls_back(ndc_scene):
    """A camera physically inside the scene content (origin z < -1) puts
    the warped pinhole center inside the volume (the per-voxel slope
    caustic) — choose_axis must flag the pose for the exact path."""
    dev, grid = ndc_scene
    cam = make_ndc_cam(center=(0.0, 0.0, -2.0))
    _, _, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, cam.width, cam.height)
    assert not np.isfinite(slope)
    # camera exactly on the z=0 plane: pi(origin) is at infinity
    cam0 = make_ndc_cam(center=(0.0, 0.0, 0.0))
    _, _, slope0 = slab_render.choose_axis(
        grid, cam0.transform, cam0.fx, cam0.fy, cam0.width, cam0.height)
    assert not np.isfinite(slope0)


def test_pallas_interpret_ndc(ndc_scene, monkeypatch):
    """The fused kernel's affine slope->dir shading (params[20:29]) must
    reproduce the XLA slab path on an NDC tree."""
    dev, grid = ndc_scene
    cam = make_ndc_cam(width=32, height=32, fx=36.0)
    _interpret_vs_xla(grid, cam, RenderOptions(max_steps=512), monkeypatch)


def test_pallas_interpret_ndc_depth(ndc_scene, monkeypatch):
    dev, grid = ndc_scene
    cam = make_ndc_cam(width=32, height=32, fx=36.0)
    _interpret_vs_xla(grid, cam, RenderOptions(render_depth=True,
                                               max_steps=512),
                      monkeypatch, gate=40.0)


def test_ndc_slab_with_viz_options(ndc_scene):
    """NDC + viewdir rotation + render_bbox through the slab path (the
    dirM map composes with rodrigues; bbox clamps are tree-coord generic)."""
    dev, grid = ndc_scene
    cam = make_ndc_cam()
    opt = RenderOptions(max_steps=512, rot_dirs=(0.25, -0.15, 0.3),
                        render_bbox=(0.1, 0.1, 0.0, 0.9, 0.9, 1.0),
                        basis_minmax=(0, 2))
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_image(grid, cam, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 30.0, f"NDC viz-options PSNR {p:.1f} dB"


def test_pallas_interpret_ndc_int8(ndc_scene, monkeypatch):
    """NDC + int8 quantized grid through the fused kernel (in-kernel
    dequant + NDC dirM shading together)."""
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.models.n3tree import NdcConfig
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=4,
                          sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=800.0, height=800.0, focal=1111.0)
    grid8 = dense_grid.bake_dense(tree.to_device(lut_depth=None),
                                  dtype="int8")
    assert grid8.quantized and grid8.ndc is not None
    cam = make_ndc_cam(width=32, height=32, fx=36.0)
    _interpret_vs_xla(grid8, cam, RenderOptions(max_steps=512), monkeypatch,
                      gate=40.0)


def test_full_resolution_800_parity_ndc():
    """NDC twin of the 800^2 parity gate: one forward-facing LLFF pose at
    bench output resolution through the NDC slab path vs exact T2 rays."""
    from volrend_tpu.models.n3tree import NdcConfig
    W = H = 800
    tree = make_test_tree(max_depth=5, basis_dim=4, seed=3, n_blobs=4,
                          sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=float(W), height=float(H), focal=1111.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    opt = RenderOptions(max_steps=512)
    cam = make_ndc_cam(center=(0.02, -0.01, 0.15), back=(0.03, 0.015, 1.0),
                       width=W, height=H, fx=278.0)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert perm[0] == 2 and np.isfinite(slope)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        W, H, opt, gi=448))

    ys = np.arange(0, H, 10)
    xs = np.arange(0, W, 10)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt))
    got = frame[ys][:, xs].reshape(-1, 4)
    p = psnr(got[:, :3], exact[:, :3])
    assert p > 38.0, f"NDC 800^2 slab-vs-exact PSNR {p:.1f} dB"


def test_superquad_warp_block4(scene, monkeypatch):
    """The 4x4-screen-pixel superquad variant (16x fewer gather rows than
    per-pixel quads) must match the reference warp on a slab-axis-aligned
    pose — the geometry where its window fit holds (forward-facing / NDC
    poses in production). Pins the B=4 kernel DIRECTLY (the block cascade
    in warp_to_screen_sq can't distinguish which branch ran: both match),
    then checks the cascade picks it (fits4) and agrees."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
    W = H = 200
    gi = 64
    back = np.asarray((1.0, 0.05, 0.08))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.8 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=W,
                              height=H, fx=280.0)
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    rng = np.random.default_rng(7)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen_ref(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale))(inter))

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        B = 4
        gys, gxs, okm, Y0, X0, fits = display_warp._sub_geometry(
            g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0, g.dv,
            g.scale, B=B)
        assert bool(fits), "aligned pose must fit the 4x4 window at B=4"
        # the display default table dtype (int8 x127 fixed point when
        # display_warp._TABLE_INT8), so the direct build mirrors what the
        # warp_to_screen_sq cascade runs
        tdt = jnp.int8 if display_warp._TABLE_INT8 else jnp.bfloat16
        tbl = display_warp._build_table(inter, gi, dtype=tdt)
        qg = tbl[Y0 * (gi - 3) + X0]
        ry = gys - Y0.astype(jnp.float32)[None]
        rx = gxs - X0.astype(jnp.float32)[None]
        out = display_warp._combine_emit(
            jnp.transpose(qg, (2, 0, 1)), ry, rx, okm, H // B, W // B,
            float(opt.background_brightness), B=B,
            qscale=(1.0 / 255.0 if tdt == jnp.int8 else 1.0),
            qshift=(128.0 / 255.0 if tdt == jnp.int8 else 0.0))
        got = np.asarray(out).reshape(H, W, 4)
        # one display quantum (int8 table) + display-emit bf16 ulp
        # (values reach ~1.2 with bg composite —
        # display_warp._EXACT_EMIT=False is production)
        np.testing.assert_allclose(got, ref, atol=1.6e-2)
        assert np.any(got != ref)      # quantized table actually used
        # the cascade (fits4 -> fast4) must produce the same image up to
        # f32 fusion reassociation across the different jit partitions —
        # which the display emit's bf16 rounding can amplify to one ulp
        casc = np.asarray(jax.jit(
            lambda it: display_warp.warp_to_screen_sq(
                it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du,
                g.v0, g.dv, g.scale, block=4))(inter))
        np.testing.assert_allclose(casc, got, atol=1e-2)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


def test_superquad_warp_matches_reference(scene, monkeypatch):
    """The superquad display warp (4x-fewer-rows gather + Pallas tent
    combine, ops/display_warp.py) must match the reference quad-gather
    warp to two bf16 ulps (table + display emit rounding; the exact
    hi/lo emit is pinned by the precise-warp tests), including the
    ok-mask/background edges."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
    W = H = 200
    gi = 96
    # production-like focal (fx/W ~ 1111/800): the superquad window fit
    # holds everywhere, so the Pallas fast branch is the one exercised;
    # the wide-FOV fallback branch is pinned separately below
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
    rng = np.random.default_rng(7)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)

    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale))(inter))
    # the fit must hold for this pose (otherwise the fast branch is dead)
    assert not np.allclose(ref[..., 3], 0.0)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        assert display_warp.usable(W, H, gi)
        got = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale))(inter))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    # two bf16 ulps on display-range values + f16-vs-bf16 combine
    np.testing.assert_allclose(got, ref, atol=1.2e-2)
    # the FAST branch must have run: its bf16 table rounds values the
    # f16 reference keeps (bit-equality would mean the lax.cond fell back)
    assert np.any(got != ref)
    # the ok mask must agree exactly (the slope grid is built from the
    # image corners, so at this focal every pixel lands inside: no bg)
    np.testing.assert_array_equal(got[..., 3] == 0.0, ref[..., 3] == 0.0)


def test_superquad_warp_uint8_out(scene, monkeypatch):
    """out_dtype=jnp.uint8 emits RGBA8 straight from the combine kernel
    (the reference's surf2Dwrite RGBA8 display write-out,
    volrend.cu:166-172): the u8 frame must equal the f32 frame quantized,
    to one display quantum (kernel-vs-XLA rounding at .5 boundaries)."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
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
    rng = np.random.default_rng(11)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        assert display_warp.usable(W, H, gi)
        f32 = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale))(inter))
        u8 = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale, out_dtype=jnp.uint8))(inter))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    assert u8.dtype == np.uint8
    want = np.round(np.clip(f32, 0.0, 1.0) * 255.0)
    assert np.max(np.abs(u8.astype(np.float64) - want)) <= 1.0


def test_superquad_warp_wide_fov_falls_back(scene, monkeypatch):
    """A wide-FOV pose (grazing frustum corner: the slope-map pixel
    derivative diverges, quads stretch past the 4x4 cell window) must
    take the lax.cond fallback inside warp_to_screen_sq and match the
    reference quad-gather warp EXACTLY (same code path)."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
    W = H = 200
    gi = 96
    back = np.asarray((1.0, 0.25, 0.35))
    back /= np.linalg.norm(back)
    # fx=45 at W=200: FOV ~132 deg, ~2% of quads stretch past the window
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=W,
                              height=H, fx=45.0)
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    rng = np.random.default_rng(7)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen_ref(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale))(inter))
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        got = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale))(inter))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    np.testing.assert_array_equal(got, ref)


def test_superquad_warp_ndc(monkeypatch):
    """Superquad warp on an NDC tree: the per-subpixel world2ndc slope
    map must match the reference warp's per-pixel route."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    from volrend_tpu.models.n3tree import NdcConfig
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=11,
                          sigma_scale=40.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=200.0, height=200.0, focal=120.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    W = H = 200
    gi = 96
    cam = Camera.from_vectors(center=(0.0, 0.0, 0.2),
                              v_back=(0.05, 0.02, 1.0),
                              v_world_up=(0.0, 1.0, 0.0),
                              width=W, height=H, fx=120.0)
    opt = RenderOptions(max_steps=512)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert np.isfinite(slope)
    g = slab_render.FrameGeom(grid, jnp.asarray(cam.transform), cam.fx,
                              cam.fy, perm, flip, W, H, opt, gi)
    rng = np.random.default_rng(13)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)

    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale, ndc=grid.ndc, origin=g.origin_w))(inter))

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        got = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale, ndc=grid.ndc, origin=g.origin_w))(inter))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    np.testing.assert_allclose(got, ref, atol=1.2e-2)


def test_superquad_warp_mesh_bg(scene, monkeypatch):
    """Per-pixel mesh background through the superquad emit kernel must
    match the reference warp's mesh composite (bg_pix contract)."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
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
    rng = np.random.default_rng(3)
    inter = jnp.asarray(rng.uniform(0.0, 1.0, (gi, gi, 4)), jnp.float32)
    mesh_rgb = jnp.asarray(rng.uniform(0.0, 1.0, (H, W, 3)), jnp.float32)
    hit = jnp.asarray(rng.uniform(size=(H, W)) < 0.4)
    bg_pix = (mesh_rgb, hit)

    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen_ref(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale, bg_pix=bg_pix))(inter))
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        got = np.asarray(jax.jit(lambda it: display_warp.warp_to_screen_sq(
            it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
            g.dv, g.scale, bg_pix=bg_pix))(inter))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    np.testing.assert_allclose(got, ref, atol=1.2e-2)
    assert np.any(got != ref)       # fast branch ran (bf16 table)
    # alpha forced 1 on mesh pixels (exact: 1.0 is bf16-representable);
    # a non-mesh alpha a hair under 1 may round UP to 1.0 in the display
    # emit, so the converse only holds to one bf16 ulp
    hit_np = np.asarray(hit)
    assert np.all(got[..., 3][hit_np] >= 1.0)
    assert np.all(got[..., 3][~hit_np] <= 1.0 + 4e-3)
    ref_not1 = ref[..., 3][~hit_np] < 0.996
    assert not np.all(got[..., 3][~hit_np][ref_not1] >= 1.0)


def test_full_resolution_800_parity_mesh():
    """800^2 mesh-composite parity (VERDICT r2 item 1 gate): one pose at
    bench output resolution, slab path with a composited cube mesh vs
    exact per-ray T2 (tmax_bg/bg_rgb contract) on a pixel-subsampled
    grid."""
    from volrend_tpu.models.mesh import Mesh
    from volrend_tpu.ops.rasterize import rasterize_meshes
    W = H = 800
    tree = make_test_tree(max_depth=5, basis_dim=4, seed=3, n_blobs=4,
                          sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    opt = RenderOptions(max_steps=512)
    cam = make_cam((1, 0.22, 0.31), width=W, height=H)
    cam.fx = cam.fy = 1111.11
    cube = Mesh.Cube((1.0, 0.1, 0.1))
    cube.scale = 0.45
    cube.translation = np.asarray(cam.center * 0.35, np.float32)
    buf = rasterize_meshes([cube], cam)
    assert np.isfinite(buf.dist).any()

    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert np.isfinite(slope)
    frame = np.asarray(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        W, H, opt, gi=448, mesh_dist=buf.dist, mesh_rgb=buf.color))

    ys = np.arange(0, H, 10)
    xs = np.arange(0, W, 10)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins[sel]), jnp.asarray(dirs[sel]), opt,
        tmax_bg=jnp.asarray(buf.dist.reshape(-1)[sel]),
        bg_rgb=jnp.asarray(buf.color.reshape(-1, 3)[sel])))
    got = frame[ys][:, xs].reshape(-1, 4)
    p = psnr(got[:, :3], exact[:, :3])
    assert p > 38.0, f"800^2 mesh-composite PSNR {p:.1f} dB"
    # alpha forced 1 on mesh pixels, both paths
    hit = np.isfinite(buf.dist.reshape(-1)[sel])
    assert np.all(got[hit, 3] > 0.999)
    np.testing.assert_array_equal(exact[hit, 3] > 0.999, True)


def test_dir_win_shading_parity(scene, monkeypatch):
    """Window-shared shading dirs (pallas_slab._DIR_WIN, r4): the basis
    planes built once per K-slab window at the window-center camera
    distance must agree with exact per-slab dirs to >= 50 dB — the dir
    drift across a K=4 window is sub-0.2 deg at orbit distances, far
    below the int8 grid's own error (bench r4: identical PSNR to
    0.01 dB on chip)."""
    import jax
    from volrend_tpu.ops import pallas_slab
    dev, grid = scene
    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    W = H = 96
    cam = make_cam((1.0, 0.3, 0.45), width=W, height=H)
    opt = RenderOptions(max_steps=512)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform, jnp.float32)

    def render():
        jax.clear_caches()
        return np.asarray(slab_render.render_frame(
            grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt, gi=64))

    try:
        monkeypatch.setattr(pallas_slab, "_DIR_WIN", False)
        off = render()
        monkeypatch.setattr(pallas_slab, "_DIR_WIN", True)
        on = render()
    finally:
        # drop the interpret-mode traces cached under this test's knob
        # state (jit caches key on static args only, not module flags)
        jax.clear_caches()
    p = psnr(on[..., :3], off[..., :3])
    assert p > 50.0, f"dir_win on-vs-off PSNR {p:.1f} dB"


# --------------------------------------------------------------------------
# split-frame slab rendering (VERDICT r2 item 4): steep / wide-FOV /
# interior poses that break the single-axis shear-warp gate render as
# <= 6 per-dominant-axis slab passes stitched by per-pixel argmax —
# replacing the ~3-orders-slower exact-path fallback.
# --------------------------------------------------------------------------

def test_split_frame_steep_pose_matches_exact(scene):
    """A wide-FOV pose close to the volume (slope = inf: boundary rays
    straddle the slab axis) must render via render_frame_split and match
    the exact renderer."""
    dev, grid = scene
    back = np.asarray((1.0, 0.3, 0.4))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(1.2 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=16.0)
    opt = RenderOptions(max_steps=512)
    _, _, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, 48, 48)
    assert not (np.isfinite(slope) and slope < slab_render.MAX_SLAB_SLOPE)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_frame_split(
        grid, cam.transform, cam.fx, cam.fy, 48, 48, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 33.0, f"split-frame steep-pose PSNR {p:.1f} dB"
    assert np.mean(np.abs(out[..., 3] - ref[..., 3]) > 0.5) < 0.02
    # render_image routes steep poses to the split path transparently
    out2 = slab_render.render_image(grid, cam, opt, gi=128)
    np.testing.assert_array_equal(out, out2)


def test_split_frame_interior_camera(scene):
    """Camera inside the volume bbox: rays leave in many directions (up
    to 6 dominant-axis classes); the stitched passes must match exact."""
    dev, grid = scene
    cam = Camera.from_vectors(center=(0.05, 0.02, 0.0),
                              v_back=(0.6, 0.5, 0.62),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=14.0)
    opt = RenderOptions(max_steps=512)
    ref = np.asarray(render_jax.render_image(dev, cam, opt))
    out = slab_render.render_frame_split(
        grid, cam.transform, cam.fx, cam.fy, 48, 48, opt, gi=128)
    p = psnr(out[..., :3], ref[..., :3])
    assert p > 26.0, f"split-frame interior PSNR {p:.1f} dB"
    assert np.mean(np.abs(out[..., 3] - ref[..., 3]) > 0.5) < 0.03


def test_split_frame_elevation_sweep(scene):
    """Elevation-sweep orbit including slope > MAX_SLAB_SLOPE poses: every
    pose must render through a SLAB path (single-axis or split) and match
    exact — no pose falls to the per-sample octree march."""
    dev, grid = scene
    opt = RenderOptions(max_steps=512)
    steep_seen = 0
    for elev in (0.1, 0.6, 1.0, 1.35, 1.57):
        back = np.asarray([np.cos(elev), 0.15, np.sin(elev)])
        back /= np.linalg.norm(back)
        cam = Camera.from_vectors(
            center=tuple(1.5 * back), v_back=tuple(back),
            v_world_up=(0.0, 1.0, 0.0), width=48, height=48, fx=24.0)
        _, _, slope = slab_render.choose_axis(
            grid, cam.transform, cam.fx, cam.fy, 48, 48)
        steep = not (np.isfinite(slope)
                     and slope < slab_render.MAX_SLAB_SLOPE)
        steep_seen += int(steep)
        ref = np.asarray(render_jax.render_image(dev, cam, opt))
        out = slab_render.render_image(grid, cam, opt, gi=128)
        p = psnr(out[..., :3], ref[..., :3])
        assert p > 26.0, f"elev={elev} steep={steep} PSNR {p:.1f}"
    assert steep_seen >= 1, "sweep never hit the steep regime"


def test_superquad_warp_block44_win54(scene, monkeypatch):
    """The (4,4)-screen-pixel block with a 5x4 gather window (the r5
    cascade candidate: half the gather rows of (2,4); the 5th window row
    buys the y margin the parked square-window 4x4 lacked) must match the
    reference warp wherever its fit predicate passes, and its fit must
    actually pass on a production-like pose."""
    import jax
    from volrend_tpu.ops import display_warp, pallas_slab
    dev, grid = scene
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
    ref = np.asarray(jax.jit(lambda it: slab_render._warp_to_screen_ref(
        it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0,
        g.dv, g.scale))(inter))

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    jax.clear_caches()
    try:
        for win in ((5, 4), (5, 5)):
            B = (4, 4)
            gys, gxs, okm, Y0, X0, fits = display_warp._sub_geometry(
                g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du, g.v0, g.dv,
                g.scale, B=B, win=win)
            assert bool(fits), f"pose must fit (4,4) x {win}"
            # corners must leave the full window inside the grid
            assert int(np.max(np.asarray(Y0))) <= gi - win[0]
            assert int(np.max(np.asarray(X0))) <= gi - win[1]
            casc = np.asarray(jax.jit(
                lambda it, win=win: display_warp.warp_to_screen_sq(
                    it, opt, g.R, g.fx, g.fy, W, H, gi, perm, g.u0, g.du,
                    g.v0, g.dv, g.scale,
                    block=(((2, 2), (4, 4)), (B, win))))(inter))
            # int8 table quantum + display-emit bf16 ulp (same budget as
            # the (2,4)/(4,4)-window parity gates)
            np.testing.assert_allclose(casc, ref, atol=1.6e-2)
            assert np.any(casc != ref)  # the quantized-table branch ran
            np.testing.assert_array_equal(casc[..., 3] == 0.0,
                                          ref[..., 3] == 0.0)
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()


def test_inplane_crop_march_matches_uncropped(monkeypatch):
    """The in-plane occupancy crop (march_slabs crop=) must reproduce the
    uncropped fast-path render on a solid scene with empty borders — the
    cropped-away voxels are sub-threshold, so the march is exact, while
    compute/stream scale with the occupied sub-box (the slab-dataflow
    answer to rt_core.cuh:36-49 empty-space skipping)."""
    import jax
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops import pallas_slab
    tree = make_solid_tree(max_depth=4, basis_dim=4, seed=3)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    W = H = 64
    gi = 32
    cam = make_cam((1.0, 0.3, 0.35), width=W, height=H)
    opt = RenderOptions(max_steps=512)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert np.isfinite(slope)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(slab_render, "_CROP_MULT_Y", 8)
    monkeypatch.setattr(slab_render, "_CROP_MULT_X", 8)
    jax.clear_caches()
    try:
        monkeypatch.setattr(slab_render, "_INPLANE_CROP", False)
        assert slab_render.inplane_crop(
            grid, perm, float(opt.sigma_thresh)) is None  # switch off
        ref = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            W, H, opt, gi=gi))

        monkeypatch.setattr(slab_render, "_INPLANE_CROP", True)
        crop = slab_render.inplane_crop(grid, perm, float(opt.sigma_thresh))
        assert crop is not None, "solid scene must be croppable"
        y0, Gy, x0, Gx = crop
        G = grid.G
        assert Gy < G or Gx < G
        # every cropped-away slab row/col must be sub-threshold
        occ_y = np.asarray(grid.occ_max[perm[1]])
        occ_x = np.asarray(grid.occ_max[perm[2]])
        assert np.all(occ_y[:y0] <= opt.sigma_thresh)
        assert np.all(occ_y[y0 + Gy:] <= opt.sigma_thresh)
        assert np.all(occ_x[:x0] <= opt.sigma_thresh)
        assert np.all(occ_x[x0 + Gx:] <= opt.sigma_thresh)
        jax.clear_caches()
        got = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            W, H, opt, gi=gi))
        # the payload cache path must agree too (prepare_payload slices)
        pay = slab_render.prepare_payload(grid, perm, opt)
        assert tuple(pay.shape[-2:]) == (Gy, Gx)
        got_pay = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            W, H, opt, gi=gi, payload=pay))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    # exact: dropped terms are zeros; accumulation order of the surviving
    # terms is preserved inside the warp matmul contractions
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(got_pay, ref, atol=1e-6, rtol=1e-6)


def test_inplane_crop_with_mesh_compositing(monkeypatch):
    """Mesh compositing (zbounds clipped at the rasterized mesh distance)
    must be unaffected by the in-plane payload crop — the mesh clip lives
    in intermediate (zbounds) space, the crop in payload space."""
    import jax
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops import pallas_slab
    tree = make_solid_tree(max_depth=4, basis_dim=4, seed=3)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    W = H = 64
    gi = 32
    cam = make_cam((1.0, 0.3, 0.35), width=W, height=H)
    opt = RenderOptions(max_steps=512)
    perm, flip, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    assert np.isfinite(slope)
    rng = np.random.default_rng(5)
    md = np.full((H, W), np.inf, np.float32)
    md[H // 3:2 * H // 3, W // 3:2 * W // 3] = 2.4
    mc = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

    monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(slab_render, "_CROP_MULT_Y", 8)
    monkeypatch.setattr(slab_render, "_CROP_MULT_X", 8)
    jax.clear_caches()
    try:
        monkeypatch.setattr(slab_render, "_INPLANE_CROP", False)
        ref = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            W, H, opt, gi=gi, mesh_dist=md, mesh_rgb=mc))
        monkeypatch.setattr(slab_render, "_INPLANE_CROP", True)
        assert slab_render.inplane_crop(
            grid, perm, float(opt.sigma_thresh)) is not None
        jax.clear_caches()
        got = np.asarray(slab_render.render_frame(
            grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
            W, H, opt, gi=gi, mesh_dist=md, mesh_rgb=mc))
    finally:
        monkeypatch.setattr(pallas_slab, "_FORCE_INTERPRET", False)
        jax.clear_caches()
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)
    # the mesh actually composited (its color shows where it occludes)
    assert not np.allclose(ref[H // 2, W // 2], ref[2, 2])
