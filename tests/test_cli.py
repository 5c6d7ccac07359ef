"""Headless CLI + PNG writer tests (reference volrend_headless parity)."""

import os

import numpy as np
import pytest

from volrend_tpu.models.synthetic import make_test_tree
from volrend_tpu.utils.png import read_png, write_png


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (19, 23, 4), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)
    # float input
    write_png(p, img.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(read_png(p), img)


@pytest.fixture(scope="module")
def scene_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    tree_path = str(d / "tree.npz")
    tree.save_npz(tree_path)

    # NeRF-style pose txt (4x4) + intrinsics
    back = np.array([1.0, 0.2, 0.3])
    back /= np.linalg.norm(back)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, back)
    right /= np.linalg.norm(right)
    up2 = np.cross(back, right)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, up2, back], 1)
    c2w[:3, 3] = 2.5 * back
    pose_path = str(d / "pose_000.txt")
    np.savetxt(pose_path, c2w)
    intrin = np.eye(4)
    intrin[0, 0] = intrin[1, 1] = 60.0
    intrin_path = str(d / "intrinsics.txt")
    np.savetxt(intrin_path, intrin)
    return tree_path, pose_path, intrin_path


@pytest.mark.parametrize("renderer", ["exact", "slab"])
def test_headless_cli(scene_files, tmp_path, renderer):
    from volrend_tpu.cli import headless
    tree_path, pose_path, intrin_path = scene_files
    out_dir = str(tmp_path / f"out_{renderer}")
    # slab: omit --gi to exercise the grid-matched default (for this G=8
    # scene default_gi == 128, so cost is unchanged)
    rc = headless.main([
        tree_path, pose_path, "-i", intrin_path,
        "-W", "48", "-H", "48", "-o", out_dir, "--renderer", renderer,
    ] + ([] if renderer == "slab" else ["--gi", "128"]))
    assert rc == 0
    img = read_png(os.path.join(out_dir, "pose_000.png"))
    assert img.shape == (48, 48, 4)
    # scene should produce non-background pixels
    assert (img[..., :3].min(axis=-1) < 250).mean() > 0.01


def test_headless_cli_renderers_agree(scene_files, tmp_path):
    from volrend_tpu.cli import headless
    tree_path, pose_path, intrin_path = scene_files
    outs = {}
    for renderer in ("exact", "slab"):
        out_dir = str(tmp_path / f"agree_{renderer}")
        headless.main([
            tree_path, pose_path, "-i", intrin_path, "-W", "40", "-H", "40",
            "-o", out_dir, "--renderer", renderer, "--gi", "128"])
        outs[renderer] = read_png(
            os.path.join(out_dir, "pose_000.png")).astype(np.float32)
    diff = np.abs(outs["exact"] - outs["slab"]) / 255.0
    mse = float(np.mean(diff[..., :3] ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 28.0


def test_headless_cli_ndc_scene(tmp_path):
    """Headless render of an LLFF/NDC scene (sidecar *_poses_bounds.npy,
    n3tree.cpp:131-148): the slab renderer must take the NDC fast path and
    agree with the exact renderer."""
    d = tmp_path
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=4, sigma_scale=60.0)
    tree_path = str(d / "ndc_tree.npz")
    tree.save_npz(tree_path)
    # LLFF sidecar: one (17,) row = flattened 3x5 [(-up)|right|back|cen|hwf]
    # + 2 depth bounds
    block = np.zeros((3, 5))
    block[:, 0] = [0.0, -1.0, 0.0]      # -up
    block[:, 1] = [1.0, 0.0, 0.0]       # right
    block[:, 2] = [0.0, 0.0, 1.0]       # backward
    block[:, 3] = [0.0, 0.0, 0.5]       # cen sum
    block[:, 4] = [800.0, 800.0, 1111.0]
    row = np.concatenate([block.reshape(-1), [1.0, 10.0]])
    np.save(str(d / "ndc_tree_poses_bounds.npy"), row[None])

    # forward-facing pose near the z=0 plane (the LLFF viewing regime)
    back = np.array([0.05, 0.02, 1.0])
    back /= np.linalg.norm(back)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, back)
    right /= np.linalg.norm(right)
    up2 = np.cross(back, right)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, up2, back], 1)
    c2w[:3, 3] = [0.0, 0.0, 0.2]
    pose_path = str(d / "pose_000.txt")
    np.savetxt(pose_path, c2w)
    intrin = np.eye(4)
    intrin[0, 0] = intrin[1, 1] = 52.0
    intrin_path = str(d / "intrinsics.txt")
    np.savetxt(intrin_path, intrin)

    from volrend_tpu.cli import headless
    outs = {}
    for renderer in ("slab", "exact"):
        out_dir = str(d / f"out_{renderer}")
        rc = headless.main([
            tree_path, pose_path, "-i", intrin_path,
            "-W", "48", "-H", "48", "-o", out_dir, "--renderer", renderer,
            "--gi", "128",
        ])
        assert rc == 0
        outs[renderer] = read_png(
            os.path.join(out_dir, "pose_000.png")).astype(np.float32)
    a, b = outs["slab"][..., :3], outs["exact"][..., :3]
    assert (a.min(-1) < 250).mean() > 0.1          # scene visible
    mse = float(np.mean(((a - b) / 255.0) ** 2))
    psnr = 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)
    assert psnr > 30.0, f"NDC headless slab-vs-exact {psnr:.1f} dB"


def test_export_html_offline_preview(scene_files, tmp_path):
    """Self-contained HTML turntable export (the reference's no-server
    client-side viewing, web/main_web.cpp:547-576, as a pre-rendered
    offline artifact): one file, N embedded PNG frames, a scrubber."""
    import re
    from volrend_tpu.cli import export_html
    tree_path, _, _ = scene_files
    out = str(tmp_path / "scene.html")
    rc = export_html.main([tree_path, "-o", out, "--frames", "3",
                           "--size", "32"])
    assert rc == 0
    html = open(out).read()
    assert html.count("<canvas") == 1 and "FRAMES" in html
    n = len(re.findall(r'"[A-Za-z0-9+/=]{100,}"', html))
    assert n == 3
