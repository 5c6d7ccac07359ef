"""Mesh subsystem: primitives, OBJ, drawlist npz, rasterizer, compositing."""

import io

import numpy as np
import pytest

from volrend_tpu.models.mesh import (Mesh, estimate_normals, load_basic_obj,
                                     open_drawlist)
from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.ops.camera import Camera
from volrend_tpu.ops.composite import (probe_coeffs, probe_image,
                                       render_frame_with_meshes,
                                       wireframe_mesh)
from volrend_tpu.ops.rasterize import rasterize_meshes
from volrend_tpu.utils.options import RenderOptions


def test_primitives_shapes():
    c = Mesh.Cube((1, 0, 0))
    assert c.vert.shape == (36, 9)
    assert np.allclose(np.abs(c.vert[:, :3]).max(), 0.5)
    assert np.allclose(c.vert[:, 3:6], [1, 0, 0])
    s = Mesh.Sphere(15, 30)
    assert s.vert.shape == (450, 9)
    assert s.faces.shape == (14 * 30 * 6,)
    assert np.allclose(np.linalg.norm(s.vert[:, :3], axis=1), 1.0, atol=1e-5)
    lat = Mesh.Lattice(4)
    assert lat.vert.shape == (64, 9) and lat.face_size == 1
    f = Mesh.CameraFrustum(1111.0, 800, 800)
    assert f.vert.shape == (5, 9) and f.faces.shape == (16,)
    ln = Mesh.Lines(np.arange(12, dtype=np.float32))
    assert ln.faces.tolist() == [0, 1, 1, 2, 2, 3]


def test_repeat_and_transform():
    m = Mesh.CameraFrustum(100.0, 64, 64)
    nv = m.n_verts
    m.repeat(3)
    assert m.n_verts == nv * 3
    assert m.faces[16] == nv  # second copy offset
    before = m.vert[nv:2 * nv, :3].copy()
    m.apply_transform((0, 0, np.pi / 2), (1.0, 2.0, 3.0), nv, 2 * nv)
    after = m.vert[nv:2 * nv, :3]
    exp = np.stack([-before[:, 1] + 1.0, before[:, 0] + 2.0,
                    before[:, 2] + 3.0], -1)
    np.testing.assert_allclose(after, exp, atol=1e-5)


def test_estimate_normals():
    vert = np.zeros((3, 9), np.float32)
    vert[1, 0] = 1.0
    vert[2, 1] = 1.0
    estimate_normals(vert, np.array([0, 1, 2], np.uint32))
    np.testing.assert_allclose(vert[:, 6:9], [[0, 0, 1]] * 3, atol=1e-6)


def test_obj_roundtrip(tmp_path):
    obj = """
v 0 0 0 1 0 0
v 1 0 0 0 1 0
v 0 1 0 0 0 1
v 1 1 0
f 1 2 3
f 1 2 3 4
"""
    m = load_basic_obj(obj, from_string=True)
    assert m.n_verts == 4
    assert m.faces.tolist() == [0, 1, 2, 0, 1, 2, 0, 2, 3]
    np.testing.assert_allclose(m.vert[0, 3:6], [1, 0, 0])


def test_obj_offs_sidecar(tmp_path):
    """A <name>.obj.offs sidecar auto-applies translation [+ scale] on OBJ
    load (main.cpp:423-431)."""
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    m = load_basic_obj(str(obj))
    np.testing.assert_allclose(m.translation, [0, 0, 0])
    (tmp_path / "m.obj.offs").write_text("0.5 -1.0 2.0")
    m = load_basic_obj(str(obj))
    np.testing.assert_allclose(m.translation, [0.5, -1.0, 2.0])
    assert m.scale == 1.0
    (tmp_path / "m.obj.offs").write_text("1 2 3 0.25")
    m = load_basic_obj(str(obj))
    np.testing.assert_allclose(m.translation, [1, 2, 3])
    assert m.scale == 0.25
    # stream-extraction semantics: leading floats read, trailing junk
    # ignored (reference ifs >> reads stop at the first bad token)
    (tmp_path / "m.obj.offs").write_text("4 5 6 junk")
    m = load_basic_obj(str(obj))
    np.testing.assert_allclose(m.translation, [4, 5, 6])
    assert m.scale == 1.0


def test_drawlist_npz(tmp_path):
    p = str(tmp_path / "draw.npz")
    np.savez(
        p,
        mycube="cube",
        mycube__color=np.array([0.1, 0.2, 0.3], np.float32),
        mycube__scale=np.float32(2.0),
        mycube__translation=np.array([1, 2, 3], np.float32),
        cams="camerafrustum",
        cams__t=np.zeros((4, 3), np.float32),
        cams__r=np.zeros((4, 3), np.float32),
        cams__connect=np.int32(1),
        pts="points",
        pts__points=np.random.rand(10, 3).astype(np.float32),
        pts__vert_color=np.random.rand(10, 3).astype(np.float32),
    )
    meshes = {m.name: m for m in open_drawlist(p)}
    assert set(meshes) == {"mycube", "cams", "pts"}
    assert meshes["mycube"].scale == 2.0
    np.testing.assert_allclose(meshes["mycube"].vert[0, 3:6], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(meshes["mycube"].translation, [1, 2, 3])
    cams = meshes["cams"]
    assert cams.n_verts == 20
    assert cams.faces.shape[0] == 16 * 4 + 3 * 2  # 4 frusta + 3 connectors
    assert meshes["pts"].face_size == 1


@pytest.fixture(scope="module")
def cam():
    back = np.array([1.0, 0.3, 0.4])
    back /= np.linalg.norm(back)
    return Camera.from_vectors(center=tuple(back * 2.5), v_back=tuple(back),
                               width=48, height=48, fx=60.0)


def test_rasterize_cube(cam):
    cube = Mesh.Cube((0.2, 0.9, 0.3))
    buf = rasterize_meshes([cube], cam)
    hit = np.isfinite(buf.dist)
    assert 0.02 < hit.mean() < 0.9
    # distances are euclidean: all hits roughly |center| +- cube radius
    d = buf.dist[hit]
    assert d.min() > 2.5 - 1.0 and d.max() < 2.5 + 1.0
    assert buf.color[hit].max() > 0.05


def test_mesh_volume_compositing(cam):
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=256)
    plain = render_frame_with_meshes(dev, cam, opt, [])
    cube = Mesh.Cube((1.0, 0.0, 0.0))
    cube.scale = 0.4
    # place the cube between camera and volume so it occludes
    cube.translation = np.asarray(cam.center * 0.55, np.float32)
    withmesh = render_frame_with_meshes(dev, cam, opt, [cube])
    assert withmesh.shape == (48, 48, 4)
    diff = np.abs(withmesh - plain).max(axis=-1)
    assert (diff > 0.05).any()          # mesh visibly composited
    # mesh-covered pixels are opaque
    buf = rasterize_meshes([cube], cam)
    assert np.all(withmesh[..., 3][np.isfinite(buf.dist)] > 0.999)


def test_wireframe_and_probe():
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5)
    dev = tree.to_device(lut_depth=None)
    wf = wireframe_mesh(tree, max_depth=2)
    assert wf.face_size == 2 and wf.n_verts > 0 and wf.n_verts % 24 == 0
    co = probe_coeffs(dev, (0.1, 0.2, 0.3))
    assert co.shape == (tree.data_dim,)
    img = probe_image(dev, (0.1, 0.2, 0.3), size=32)
    assert img.shape == (32, 32, 3)
    assert np.all((img >= 0) & (img <= 1))


def test_probe_inset_in_frame():
    """The in-frame probe inset (volrend.cu:100-134): circle pixels at the
    top-right are overwritten with the sigmoid'd lumisphere (alpha 1),
    pixels outside the circle are untouched, disabled probe is a no-op."""
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.ops.composite import draw_probe_inset
    from volrend_tpu.utils.options import RenderOptions

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5)
    dev = tree.to_device(lut_depth=None)
    cam = Camera.from_vectors(width=64, height=48, fx=60.0)
    H, W, s = 48, 64, 20
    frame = np.full((H, W, 4), 0.25, np.float32)
    opt = RenderOptions(enable_probe=True, probe=(0.1, 0.2, 0.3),
                        probe_disp_size=s)
    out = draw_probe_inset(frame, dev, cam, opt)
    # circle center pixel: x near W - s/2 - 5... compute like the kernel
    ys, xs = np.arange(H), np.arange(W)
    yy = ((ys[:, None] - 5) / np.float32(0.5 * s) - 1.0).astype(np.float32)
    xx = -((xs[None, :] - (W - s) + 5) / np.float32(0.5 * s)
           - 1.0).astype(np.float32)
    inside = (xx ** 2 + yy ** 2 <= 1.0) & (ys[:, None] < s + 5) \
        & (xs[None, :] >= W - s - 5)
    assert inside.sum() > 0
    assert np.all(out[inside][:, 3] == 1.0)          # alpha forced 1
    assert np.any(out[inside][:, :3] != 0.25)        # lumisphere drawn
    assert np.array_equal(out[~inside], frame[~inside])  # rest untouched
    # sigmoid output range
    assert np.all((out[inside][:, :3] > 0) & (out[inside][:, :3] < 1))
    # disabled: no-op
    out2 = draw_probe_inset(frame, dev, cam, opt.replace(
        enable_probe=False))
    assert np.array_equal(out2, frame)
    # uint8 frames keep dtype
    f8 = (frame * 255).astype(np.uint8)
    out8 = draw_probe_inset(f8, dev, cam, opt)
    assert out8.dtype == np.uint8 and np.all(out8[inside][:, 3] == 255)


# --------------------------------------------------------------------------
# mesh compositing on the SLAB fast path (VERDICT r2 item 1): the march is
# clipped at the mesh distance via the per-pixel zbounds (sub-slab exact)
# and the remaining transmittance composites over the rasterized mesh
# color — semantics pinned against the exact T2 composited renderer
# (render_jax tmax_bg/bg_rgb contract, volrend.cu:143-163).
# --------------------------------------------------------------------------

def _slab_mesh_scene():
    from volrend_tpu.ops import dense_grid
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev)
    cube = Mesh.Cube((1.0, 0.1, 0.1))
    cube.scale = 0.4
    return dev, grid, cube


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def test_slab_mesh_composite_matches_exact():
    from volrend_tpu.ops import slab_render
    dev, grid, cube = _slab_mesh_scene()
    back = np.asarray((1.0, 0.25, 0.35))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=60.0)
    # cube partially inside the volume AND occluding part of it
    cube.translation = np.asarray(cam.center * 0.35, np.float32)
    opt = RenderOptions(max_steps=512)
    ref = render_frame_with_meshes(dev, cam, opt, [cube])
    out = slab_render.render_image(grid, cam, opt, gi=128, meshes=[cube])
    # mesh visibly present on both, pixels opaque where the mesh pass hit
    buf = rasterize_meshes([cube], cam)
    hit = np.isfinite(buf.dist)
    assert hit.any()
    assert np.all(out[..., 3][hit] > 0.999)
    p = _psnr(out[..., :3], ref[..., :3])
    assert p > 28.0, f"slab mesh composite PSNR {p:.1f} dB"


def test_slab_mesh_zclip_occludes_volume():
    """A cube between camera and volume must remove the volume behind it
    (transmittance clipped at the mesh), matching T2 per-pixel."""
    from volrend_tpu.ops import slab_render
    dev, grid, cube = _slab_mesh_scene()
    back = np.asarray((1.0, 0.2, 0.3))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(2.5 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=60.0)
    cube.translation = np.asarray(cam.center * 0.55, np.float32)
    opt = RenderOptions(max_steps=512)
    ref = render_frame_with_meshes(dev, cam, opt, [cube])
    out = slab_render.render_image(grid, cam, opt, gi=128, meshes=[cube])
    p = _psnr(out[..., :3], ref[..., :3])
    assert p > 28.0, f"occluding-mesh PSNR {p:.1f} dB"
    plain = slab_render.render_image(grid, cam, opt, gi=128)
    diff = np.abs(out - plain).max(axis=-1)
    assert (diff > 0.05).any()


def test_slab_mesh_ndc_rejected():
    from volrend_tpu.models.n3tree import NdcConfig
    from volrend_tpu.ops import dense_grid, slab_render
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=4, sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=800.0, height=800.0, focal=1111.0)
    grid = dense_grid.bake_dense(tree.to_device(lut_depth=None))
    cam = Camera.from_vectors(center=(0.0, 0.0, 0.2),
                              v_back=(0.05, 0.02, 1.0),
                              v_world_up=(0.0, 1.0, 0.0),
                              width=48, height=48, fx=52.0)
    with pytest.raises(ValueError):
        slab_render.render_image(grid, cam, RenderOptions(max_steps=256),
                                 gi=96, meshes=[Mesh.Cube((1, 0, 0))])


def test_slab_mesh_composite_steep_pose_split():
    """Mesh compositing on the SPLIT-FRAME path: a steep pose (outside
    the single-axis slab gate) with a composited cube must match the
    exact T2 composite — each class pass clips at the mesh and the
    per-pixel stitch keeps the result consistent."""
    from volrend_tpu.ops import slab_render
    dev, grid, cube = _slab_mesh_scene()
    back = np.asarray((1.0, 0.3, 0.4))
    back /= np.linalg.norm(back)
    cam = Camera.from_vectors(center=tuple(1.2 * back), v_back=tuple(back),
                              v_world_up=(0.0, 0.0, 1.0), width=48,
                              height=48, fx=16.0)
    _, _, slope = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, 48, 48)
    assert not (np.isfinite(slope) and slope < slab_render.MAX_SLAB_SLOPE)
    cube.translation = np.asarray(cam.center * 0.55, np.float32)
    opt = RenderOptions(max_steps=512)
    ref = render_frame_with_meshes(dev, cam, opt, [cube])
    out = slab_render.render_image(grid, cam, opt, gi=128, meshes=[cube])
    buf = rasterize_meshes([cube], cam)
    hit = np.isfinite(buf.dist)
    assert hit.any()
    assert np.all(out[..., 3][hit] > 0.999)
    p = _psnr(out[..., :3], ref[..., :3])
    assert p > 26.0, f"split+mesh PSNR {p:.1f} dB"
