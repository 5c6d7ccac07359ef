"""Web viewer server: endpoints, input events, rendering."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from volrend_tpu.models.mesh import Mesh
from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.utils.png import read_png
from volrend_tpu.web.server import ViewerState, make_handler


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    cube = Mesh.Cube((1, 0, 0))
    cube.visible = False
    state = ViewerState(tree, [cube], use_slab=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", state
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def test_index_and_info(server):
    base, state = server
    html = _get(base + "/").decode()
    assert "<canvas" in html
    info = json.loads(_get(base + "/info"))
    assert info["format"] == "SH4"
    assert info["meshes"][0]["name"] == "Cube"
    assert "step_size" in info["options"]


def test_frame_render(server, tmp_path):
    base, state = server
    png = _get(base + "/frame?w=64&h=64")
    p = tmp_path / "f.png"
    p.write_bytes(png)
    img = read_png(str(p))
    assert img.shape == (64, 64, 4)
    assert (img[..., :3].min(-1) < 250).mean() > 0.005  # scene visible


def test_drag_orbit_changes_view(server, tmp_path):
    base, state = server
    before = _get(base + "/frame?w=48&h=48")
    _post(base + "/event", {"type": "down", "x": 10, "y": 10, "pan": False,
                            "about_origin": True})
    _post(base + "/event", {"type": "move", "x": 35, "y": 14})
    _post(base + "/event", {"type": "up"})
    after = _get(base + "/frame?w=48&h=48")
    assert before != after


def test_options_and_mesh_toggle(server):
    base, state = server
    _post(base + "/options", {"background_brightness": 0.25})
    assert state.opt.background_brightness == 0.25
    _post(base + "/mesh", {"name": "Cube", "visible": True})
    assert state.meshes[0].visible
    _post(base + "/mesh", {"name": "Cube", "visible": False})
    assert not state.meshes[0].visible


def test_wheel_dolly(server):
    base, state = server
    c0 = np.linalg.norm(state.cam.center - state.cam.origin)
    _post(base + "/event", {"type": "wheel", "dy": -100})
    c1 = np.linalg.norm(state.cam.center - state.cam.origin)
    assert c1 < c0


def test_probe_endpoint(server, tmp_path):
    base, state = server
    png = _get(base + "/probe?x=0.1&y=0.2&z=0.3&size=32")
    p = tmp_path / "probe.png"
    p.write_bytes(png)
    img = read_png(str(p))
    assert img.shape == (32, 32, 3)


def test_probe_inset_in_served_frame(server, tmp_path):
    """enable_probe draws the in-frame inset circle at the top-right of
    viewer frames (volrend.cu:100-134), and disabling removes it."""
    base, state = server
    _post(base + "/options", {"enable_probe": True, "probe": [0.1, 0.2, 0.3],
                              "probe_disp_size": 20})
    on = _get(base + "/frame?w=64&h=64")
    _post(base + "/options", {"enable_probe": False})
    off = _get(base + "/frame?w=64&h=64")
    pa, pb = tmp_path / "on.png", tmp_path / "off.png"
    pa.write_bytes(on)
    pb.write_bytes(off)
    a, b = read_png(str(pa)), read_png(str(pb))
    # the inset region differs; the bottom half doesn't
    assert np.any(a[:25, 64 - 25:] != b[:25, 64 - 25:])
    assert np.array_equal(a[32:], b[32:])


def test_ndc_camera_init():
    """NDC mean-pose camera init (main.cpp:731-741): fixed canonical pose
    + focal = ndc_focal * 0.25."""
    from volrend_tpu.models.n3tree import NdcConfig
    from volrend_tpu.ops.camera import ndc_camera
    ndc = NdcConfig(width=1008.0, height=756.0, focal=800.0,
                    avg_up=(0.1, 0.9, 0.2), avg_back=(0, 0, 1),
                    avg_cen=(1, 2, 3))
    cam = ndc_camera(ndc, width=640, height=480)
    assert cam.fx == pytest.approx(200.0)
    assert cam.fy == pytest.approx(200.0)
    # nudged 1e-3 off the z=0 plane so the default pose stays on the slab
    # fast path (pi(origin) is at infinity exactly on the plane)
    np.testing.assert_allclose(cam.center, [0, 0, 1e-3], atol=1e-7)
    np.testing.assert_allclose(cam.v_back, [0, 0, 1])
    np.testing.assert_allclose(cam.origin, [0, 0, -3])
    np.testing.assert_allclose(cam.v_world_up, [0, 1, 0])
    assert cam.movement_speed == pytest.approx(0.1)
    # orthonormal basis, right = up x back
    R = cam.transform[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # explicit fx wins over the ndc default
    assert ndc_camera(ndc, fx=333.0).fx == pytest.approx(333.0)


def test_viewer_ndc_tree_faces_scene(tmp_path):
    """Viewer on an NDC tree opens with the mean-pose camera and renders
    non-empty output."""
    from volrend_tpu.models.n3tree import NdcConfig
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=7, sigma_scale=80.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=800.0, height=800.0, focal=1000.0)
    state = ViewerState(tree, use_slab=False)
    assert state.fixed_focal
    assert state.cam.fx == pytest.approx(250.0)
    img = state.render(64, 64)
    p = tmp_path / "ndc.png"
    p.write_bytes(img)
    arr = read_png(str(p))
    assert state.cam.fx == pytest.approx(250.0)  # render didn't clobber it
    assert float(np.asarray(arr, np.float32).std()) > 1.0


def test_mesh_transform_endpoints(server):
    """The ImGuizmo manipulation surface (main.cpp:238-413): per-mesh
    translate/rotate/scale/unlit + delete via POST /mesh."""
    base, state = server
    _post(base + "/mesh", {"name": "Cube", "translation": [0.1, 0.2, 0.3],
                           "rotation": [0.0, 0.5, 0.0], "scale": 1.5,
                           "unlit": True, "visible": True})
    m = next(mm for mm in state.meshes if mm.name == "Cube")
    np.testing.assert_allclose(m.translation, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(m.rotation, [0.0, 0.5, 0.0])
    assert m.scale == 1.5 and m.unlit and m.visible
    info = json.loads(_get(base + "/info"))
    mi = next(mm for mm in info["meshes"] if mm["name"] == "Cube")
    assert mi["scale"] == 1.5 and mi["unlit"]

    # add a primitive, then delete it
    out = json.loads(_post(base + "/mesh/add", {"type": "sphere"}))
    assert out["name"] == "Sphere"
    assert any(mm.name == "Sphere" for mm in state.meshes)
    _post(base + "/mesh", {"name": "Sphere", "delete": True})
    assert not any(mm.name == "Sphere" for mm in state.meshes)


def test_probe_and_camera_keys(server):
    base, state = server
    # probe keys only act when the probe is enabled (main.cpp:519)
    _post(base + "/options", {"enable_probe": True, "probe": [0, 0, 1]})
    p0 = np.asarray(state.opt.probe)
    _post(base + "/event", {"type": "key", "key": "l"})
    _post(base + "/event", {"type": "key", "key": "i", "shift": True})
    p1 = np.asarray(state.opt.probe)
    assert p1[0] > p0[0]
    assert p1[1] - p0[1] > 5 * (p1[0] - p0[0]) - 1e-9  # shift = 5x
    # focal keys
    f0 = state.cam.fx
    _post(base + "/event", {"type": "key", "key": "-"})
    assert state.cam.fx < f0
    _post(base + "/event", {"type": "key", "key": "0"})
    from volrend_tpu.ops.camera import DEFAULT_FOCAL
    assert state.cam.fx == DEFAULT_FOCAL
    # world_up presets (main.cpp:546-570)
    _post(base + "/event", {"type": "key", "key": "3"})
    np.testing.assert_allclose(state.cam.v_world_up, [0, 1, 0])
    _post(base + "/event", {"type": "key", "key": "1"})
    np.testing.assert_allclose(state.cam.v_world_up, [0, 0, 1])
    _post(base + "/options", {"enable_probe": False})


def test_runtime_asset_loading(server, tmp_path):
    """Runtime tree/drawlist/obj loading via upload bytes and server path
    (web/main_web.cpp:139-294 analog)."""
    base, state = server
    # tree upload (bytes)
    t2 = make_test_tree(max_depth=3, basis_dim=1, seed=9, sigma_scale=70.0)
    p = tmp_path / "t2.npz"
    t2.save_npz(str(p))
    with open(p, "rb") as f:
        raw = f.read()
    import urllib.request
    req = urllib.request.Request(base + "/upload?kind=tree", data=raw,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["loaded"] == "tree"
    assert state.tree.data_dim == t2.data_dim

    # drawlist via server-side path
    draw = {"mycube": np.array(["cube"]),
            "mycube__color": np.array([1.0, 0.0, 0.0], np.float32)}
    dp = tmp_path / "draw.npz"
    np.savez(str(dp), **draw)
    out = json.loads(_post(base + "/load",
                           {"kind": "drawlist", "path": str(dp)}))
    assert out["meshes"] == ["mycube"]
    assert any(m.name == "mycube" for m in state.meshes)

    # obj upload
    obj = b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    req = urllib.request.Request(base + "/upload?kind=obj", data=obj,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["loaded"] == "obj"


def test_viewer_page_has_touch_and_mesh_ui(server):
    base, _ = server
    html = _get(base + "/").decode()
    for needle in ("touchstart", "touchmove", "touchend", "uploadAsset",
                   "addMesh", "meshVec"):
        assert needle in html, needle


def test_visualization_options_roundtrip(server):
    """The reference GUI's visualization section (main.cpp:200-236): SH
    band window, viewdir rotation, render bbox, depth toggle — /info must
    expose them and /options must accept them."""
    base, state = server
    info = json.loads(_get(base + "/info"))
    for k in ("basis_minmax", "rot_dirs", "render_bbox"):
        assert k in info["options"], k
    _post(base + "/options", {"basis_minmax": [1, 3],
                              "rot_dirs": [0.1, 0.0, -0.2],
                              "render_bbox": [0.1, 0.1, 0.1, 0.9, 0.9,
                                              0.9],
                              "render_depth": True})
    assert state.opt.basis_minmax == (1, 3)
    assert state.opt.rot_dirs == (0.1, 0.0, -0.2)
    assert state.opt.render_bbox == (0.1, 0.1, 0.1, 0.9, 0.9, 0.9)
    assert state.opt.render_depth is True
    # frame still renders with the visualization options active
    png = _get(base + "/frame?w=32&h=32")
    assert png[:4] == b"\x89PNG"
    _post(base + "/options", {"render_depth": False,
                              "basis_minmax": [0, 24],
                              "rot_dirs": [0.0, 0.0, 0.0],
                              "render_bbox": [0, 0, 0, 1, 1, 1]})


def test_anim_keyframe_editor(server, tmp_path):
    """Keyframe animation editor endpoints (the main_anim.cpp:350-925
    ImGui editor analog): capture/list/update/goto/seek/save/delete."""
    base, state = server
    state.keyframes = []
    # two poses captured from live camera state
    _post(base + "/event", {"type": "key", "key": "w"})
    a = json.loads(_post(base + "/anim/capture", {"t_max": 2.0}))
    assert a["n"] == 1 and a["index"] == 0
    c0 = np.asarray(state.cam.center, float).copy()
    _post(base + "/event", {"type": "key", "key": "d", "shift": True})
    a = json.loads(_post(base + "/anim/capture", {}))
    assert a["n"] == 2
    c1 = np.asarray(state.cam.center, float).copy()
    assert not np.allclose(c0, c1)

    lst = json.loads(_get(base + "/anim/list"))
    assert lst["n"] == 2
    # segment duration = END keyframe's t_max (frame_times semantics)
    assert lst["total"] == lst["keyframes"][1]["t_max"]

    # update duration
    json.loads(_post(base + "/anim/update", {"index": 1, "t_max": 4.0}))
    lst = json.loads(_get(base + "/anim/list"))
    assert lst["total"] == 4.0

    # goto restores the captured pose exactly
    _post(base + "/anim/goto", {"index": 0})
    np.testing.assert_allclose(np.asarray(state.cam.center, float), c0,
                               atol=1e-5)

    # seek to the midpoint matches anim.interpolate directly
    from volrend_tpu import anim
    out = json.loads(_post(base + "/anim/seek", {"t": 2.0}))
    assert out["segment"] == 0 and abs(out["q"] - 0.5) < 1e-6
    want = anim.interpolate(state.keyframes[0], state.keyframes[1], 0.5,
                            state.cam.v_world_up, first_segment=True)
    np.testing.assert_allclose(np.asarray(state.cam.center, float),
                               np.asarray(want[0], float), atol=1e-5)

    # save round-trips through the cli/animate script loader
    p = tmp_path / "anim.json"
    out = json.loads(_post(base + "/anim/save", {"path": str(p)}))
    assert out["n"] == 2
    kfs, cfg = anim.load_script(str(p))
    assert len(kfs) == 2 and kfs[1].t_max == 4.0
    np.testing.assert_allclose(kfs[0].center, c0, atol=1e-6)

    # load replaces the editor state
    state.keyframes = []
    out = json.loads(_post(base + "/anim/load", {"path": str(p)}))
    assert out["n"] == 2

    # delete
    out = json.loads(_post(base + "/anim/delete", {"index": 0}))
    assert out["n"] == 1
    state.keyframes = []


def test_anim_export_frames(server, tmp_path):
    """Export renders every scheduled frame to PNG (main_anim.cpp:95-110
    export mode), reporting progress via /anim/list."""
    import time
    base, state = server
    state.keyframes = []
    _post(base + "/anim/capture", {})
    _post(base + "/event", {"type": "key", "key": "a"})
    _post(base + "/anim/capture", {"t_max": 0.5})
    out_dir = tmp_path / "frames"
    out = json.loads(_post(base + "/anim/export", {
        "path": str(out_dir), "fps": 4, "width": 32, "height": 32}))
    assert out["started"]
    for _ in range(600):
        if not state.anim_status["running"]:
            break
        time.sleep(0.1)
    assert not state.anim_status["running"]
    import os
    files = sorted(os.listdir(out_dir))
    assert len(files) == out["total"] == state.anim_status["done"]
    from volrend_tpu.utils.png import read_png
    img = read_png(str(out_dir / files[0]))
    assert img.shape == (32, 32, 4)
    state.keyframes = []


def test_anim_error_paths(server):
    base, state = server
    state.keyframes = []
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _post(base + "/anim/seek", {"t": 0.0})   # needs >= 2 keyframes
    with pytest.raises(urllib.error.HTTPError):
        _post(base + "/anim/bogus", {})


def test_viewer_page_has_anim_ui(server):
    base, _ = server
    html = _get(base + "/").decode()
    for frag in ("animCapture", "animPlay", "animExport", "/anim/seek"):
        assert frag in html


def test_anim_unlit_roundtrips_through_script(server, tmp_path):
    """Mesh unlit state survives capture -> save -> load (review finding:
    it was captured and applied but dropped by the script writer/reader)."""
    from volrend_tpu import anim
    base, state = server
    state.keyframes = []
    state.meshes[0].unlit = True
    _post(base + "/anim/capture", {})
    _post(base + "/anim/capture", {})
    p = tmp_path / "unlit.json"
    _post(base + "/anim/save", {"path": str(p)})
    kfs, _ = anim.load_script(str(p))
    assert kfs[0].mesh_state["Cube"].unlit is True
    state.meshes[0].unlit = False
    state.keyframes = []


def test_anim_export_bad_path_does_not_wedge(server, tmp_path):
    """A failing export request must not leave anim_status running=True
    (review finding: makedirs after the status commit wedged the feature)."""
    import urllib.error
    base, state = server
    state.keyframes = []
    _post(base + "/anim/capture", {})
    _post(base + "/anim/capture", {})
    blocker = tmp_path / "afile"
    blocker.write_text("x")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/anim/export", {"path": str(blocker)})
    assert ei.value.code == 400
    assert not state.anim_status["running"]
    # feature still usable afterwards
    out_dir = tmp_path / "ok"
    out = json.loads(_post(base + "/anim/export", {
        "path": str(out_dir), "fps": 2, "width": 16, "height": 16}))
    assert out["started"]
    import time
    for _ in range(300):
        if not state.anim_status["running"]:
            break
        time.sleep(0.1)
    assert state.anim_status["done"] == out["total"]
    # load of a missing script returns 400, not a closed connection
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/anim/load", {"path": str(tmp_path / "nope.json")})
    assert ei.value.code == 400
    state.keyframes = []


def test_mesh_gizmo_projection_and_drag(server):
    """In-viewport gizmo (ImGuizmo analog): /gizmo projects the mesh center
    through the live camera; /mesh/drag maps pixel deltas to transforms."""
    base, state = server
    m = next(mm for mm in state.meshes if mm.name == "Cube")
    m.translation = np.zeros(3, np.float32)
    m.rotation = np.zeros(3, np.float32)
    m.scale = 1.0

    g = json.loads(_get(base + "/gizmo?name=Cube"))
    assert g["visible"]
    cx, cy = g["center"]
    # projected center must re-project consistently: move the mesh exactly
    # +right in world via a drag, screen x must increase
    out = json.loads(_post(base + "/mesh/drag",
                           {"name": "Cube", "mode": "translate",
                            "dx": 40.0, "dy": 0.0}))
    g2 = json.loads(_get(base + "/gizmo?name=Cube"))
    assert g2["center"][0] > cx + 20  # moved ~40 px right
    assert abs(g2["center"][1] - cy) < 2

    # vertical drag translates along -v_up
    before = np.asarray(out["translation"])
    out = json.loads(_post(base + "/mesh/drag",
                           {"name": "Cube", "mode": "translate",
                            "dx": 0.0, "dy": 30.0}))
    moved = np.asarray(out["translation"]) - before
    up = np.asarray(state.cam.v_up, np.float64)
    assert moved @ up < 0

    # rotate about the view axis changes the rotation vector
    out = json.loads(_post(base + "/mesh/drag",
                           {"name": "Cube", "mode": "rotate",
                            "dx": 50.0, "dy": 0.0}))
    rv = np.asarray(out["rotation"], np.float64)
    assert np.linalg.norm(rv) == pytest.approx(0.5, rel=1e-3)
    view = -np.asarray(state.cam.v_back, np.float64)
    assert abs(abs(rv / np.linalg.norm(rv) @ view) - 1.0) < 1e-6

    # scale: drag up grows, exp-compounded
    out = json.loads(_post(base + "/mesh/drag",
                           {"name": "Cube", "mode": "scale",
                            "dx": 0.0, "dy": -69.3}))
    assert out["scale"] == pytest.approx(2.0, rel=1e-2)

    # unknown mesh -> 404/400
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(base + "/gizmo?name=Nope")
    with pytest.raises(urllib.error.HTTPError):
        _post(base + "/mesh/drag", {"name": "Nope", "mode": "translate"})
    m.translation = np.zeros(3, np.float32)
    m.rotation = np.zeros(3, np.float32)
    m.scale = 1.0


def test_viewer_page_has_gizmo_ui(server):
    base, _ = server
    html = _get(base + "/").decode()
    for frag in ("drawGizmo", "/mesh/drag", "grab", "gizmo.mode"):
        assert frag in html


def test_info_reports_backend(server):
    """get_backend() parity (cuda_renderer.cpp:225): /info names the path
    that produced the last frame."""
    base, state = server
    _get(base + "/frame?w=32&h=32")
    info = json.loads(_get(base + "/info"))
    assert info["backend"] == "exact"   # fixture runs use_slab=False


def test_slab_backend_with_visible_mesh():
    """VERDICT r2 item 1 gate: a visible mesh (+ show_grid wireframe) must
    STAY on the slab fast path — /info reports slab-*, not 'exact' (the
    reference composites meshes inside the render kernel at full speed,
    volrend.cu:143-163)."""
    from volrend_tpu.models.mesh import Mesh
    from volrend_tpu.web.server import ViewerState
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5,
                          sigma_scale=60.0)
    cube = Mesh.Cube((1.0, 0.2, 0.2))
    cube.scale = 0.4
    state = ViewerState(tree, [cube], use_slab=True)
    state.opt = state.opt.replace(show_grid=True)
    png = state.render(64, 64)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert state.last_backend.startswith("slab-"), state.last_backend
