"""Dataset tools, Morton codes, SH-lobe meshes."""

import json
import os

import numpy as np

from volrend_tpu.utils.morton import (inv_morton_code_3, morton_code_3,
                                      ray_morton_order)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x, y, z = (rng.integers(0, 1 << 21, 1000) for _ in range(3))
    code = morton_code_3(x, y, z)
    rx, ry, rz = inv_morton_code_3(code)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)
    np.testing.assert_array_equal(rz, z)
    # locality: adjacent cells differ in low bits
    assert morton_code_3(0, 0, 1) == 1
    assert morton_code_3(0, 1, 0) == 2
    assert morton_code_3(1, 0, 0) == 4


def test_ray_morton_order_groups_neighbors():
    pts = np.array([[0.9, 0.9, 0.9], [0.1, 0.1, 0.1],
                    [0.11, 0.1, 0.11], [0.89, 0.9, 0.91]])
    order = ray_morton_order(pts)
    pairs = {tuple(sorted(order[:2])), tuple(sorted(order[2:]))}
    assert pairs == {(1, 2), (0, 3)}


def _write_synthetic_dataset(root, n_frames=3):
    scene = os.path.join(root, "lego")
    os.makedirs(scene, exist_ok=True)
    rng = np.random.default_rng(1)
    for split in ("test", "train"):
        frames = []
        for i in range(n_frames):
            th = 2 * np.pi * i / n_frames
            c2w = np.eye(4)
            c2w[:3, 3] = [3 * np.cos(th), 3 * np.sin(th), 1.0]
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(scene,
                               f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return scene


def test_extract_test_poses(tmp_path):
    from volrend_tpu.cli.extract_poses import extract_test_poses
    scene = _write_synthetic_dataset(str(tmp_path))
    n = extract_test_poses(str(tmp_path))
    assert n == 1
    pose = np.loadtxt(os.path.join(scene, "pose", "r_0.txt"))
    assert pose.shape == (4, 4)
    K = np.loadtxt(os.path.join(scene, "intrinsics.txt"))
    assert abs(K[0, 0] - 400 / np.tan(0.5 * 0.6911)) < 1e-6


def test_extract_cams_drawlist(tmp_path):
    from volrend_tpu.cli.extract_poses import extract_cams_drawlist
    from volrend_tpu.models.mesh import open_drawlist
    scene = _write_synthetic_dataset(str(tmp_path))
    n = extract_cams_drawlist(str(tmp_path))
    assert n == 1
    meshes = open_drawlist(os.path.join(scene, "lego_cams.draw.npz"))
    assert len(meshes) == 1
    assert meshes[0].n_verts == 3 * 5  # 3 frusta


def test_rotvec_roundtrip():
    from volrend_tpu.cli.extract_poses import _rotmat_to_rotvec
    from volrend_tpu.models.mesh import _axis_angle_matrix
    rng = np.random.default_rng(2)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.01, np.pi - 0.01)
        R = _axis_angle_matrix(axis * ang)[None]
        rv = _rotmat_to_rotvec(R)[0]
        np.testing.assert_allclose(rv, axis * ang, atol=1e-5)


def test_sh_lobe_mesh(tmp_path):
    from volrend_tpu.models.mesh import load_basic_obj
    from volrend_tpu.utils.sh_mesh import save_obj, sh_lobe_mesh
    m = sh_lobe_mesh(6, rings=8, sectors=12)
    assert m.n_verts == 96
    r = np.linalg.norm(m.vert[:, :3], axis=-1)
    assert r.max() > 0.1  # lobe has extent
    p = str(tmp_path / "sh6.obj")
    save_obj(m, p)
    back = load_basic_obj(p)
    np.testing.assert_allclose(back.vert[:, :3], m.vert[:, :3], atol=1e-5)
    np.testing.assert_allclose(back.vert[:, 3:6], m.vert[:, 3:6], atol=1e-3)


def test_bench_fail_soft_contract():
    """bench.py must survive ANY crash with exactly one JSON line on
    stdout and exit code 0 (VERDICT r3 item 2 — a failed knob/compile can
    never erase a round's perf evidence). Injects a tree-load failure via
    the VT_BENCH_INJECT_FAIL hook and checks the degraded record."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, VT_BENCH_INJECT_FAIL="tree",
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                       capture_output=True, text=True, timeout=300,
                       env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "render_throughput_800x800_sh16"
    assert rec["degraded"] is True
    assert any("injected" in e for e in rec["errors"])


def test_bench_scaling_contract(tmp_path):
    """tools/bench_scaling.py must produce the scaling artifact: render +
    train efficiency per device count, merged into the --out JSON
    (VERDICT r4 item 3 — the BASELINE >=90% target needs a recorded,
    reproducible measurement of what this environment can measure)."""
    import importlib.util
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_scaling_test_mod",
        os.path.join(root, "tools", "bench_scaling.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    out = str(tmp_path / "scal.json")
    doc = bs.main(["--out", out, "--counts", "1,2",
                   "--rays-per-dev", "2048", "--frame-side", "16",
                   "--reps", "1"])
    with open(out) as f:
        ondisk = json.load(f)
    for d in (doc, ondisk):
        cm = d["cpu_mesh"]
        assert set(cm["render_efficiency"]) == {"1", "2"}
        assert set(cm["train_efficiency"]) == {"1", "2"}
        assert cm["render_efficiency"]["1"] == 1.0
        assert all(v > 0 for v in cm["render_mrays_per_count"].values())
        assert all(v > 0 for v in cm["train_steps_per_s_per_count"].values())
    # merge semantics: a second run must preserve existing keys
    with open(out, "w") as f:
        json.dump(dict(ondisk, tpu_1chip={"render_mrays": 1.0}), f)
    doc2 = bs.main(["--out", out, "--counts", "1",
                    "--rays-per-dev", "2048", "--frame-side", "16",
                    "--reps", "1"])
    assert doc2["tpu_1chip"]["render_mrays"] == 1.0


def test_bench_train_write_preserves_keyed_records(tmp_path):
    """A plain (non---key) bench_train write must merge into the artifact,
    preserving keyed sub-records like g256_lean (r5 review fix: the old
    path overwrote the whole file, deleting banked entries)."""
    import importlib.util
    import json
    import types

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_train_test_mod", os.path.join(root, "tools",
                                             "bench_train.py"))
    bt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bt)
    out = str(tmp_path / "bt.json")
    with open(out, "w") as f:
        json.dump({"value": 1.0, "g256_lean": {"value": 99.0}}, f)
    args = types.SimpleNamespace(out=out, cpu_smoke=False, key=None)
    bt._write(args, {"value": 2.0, "unit": "ms"})
    with open(out) as f:
        doc = json.load(f)
    assert doc["value"] == 2.0
    assert doc["g256_lean"]["value"] == 99.0
    # keyed write updates only its key
    args.key = "g256_lean"
    bt._write(args, {"value": 50.0})
    with open(out) as f:
        doc = json.load(f)
    assert doc["value"] == 2.0 and doc["g256_lean"]["value"] == 50.0
