"""Animation keyframe math + CLI."""

import json

import numpy as np
import pytest

from volrend_tpu.anim import (AnimKF, frame_times, interpolate, load_script,
                              sphc_interp)
from volrend_tpu.utils.options import RenderOptions

AX = np.array([1.0, 0, 0])
AY = np.array([0, 1.0, 0])
AZ = np.array([0, 0, 1.0])


def test_sphc_endpoints():
    a = np.array([2.0, 0.0, 0.0])
    b = np.array([0.0, 3.0, 0.0])
    np.testing.assert_allclose(sphc_interp(a, b, 0.0, AX, AY, AZ), a,
                               atol=1e-12)
    np.testing.assert_allclose(sphc_interp(a, b, 1.0, AX, AY, AZ), b,
                               atol=1e-12)


def test_sphc_arc_radius():
    a = np.array([2.0, 0.0, 0.0])
    b = np.array([0.0, 2.0, 0.0])
    mid = sphc_interp(a, b, 0.5, AX, AY, AZ)
    # stays on the radius-2 circle, bisecting the angle
    np.testing.assert_allclose(np.linalg.norm(mid), 2.0, atol=1e-12)
    np.testing.assert_allclose(mid, 2.0 * np.array(
        [np.cos(np.pi / 4), np.sin(np.pi / 4), 0]), atol=1e-12)


def test_sphc_shortest_path_wrap():
    a = np.array([np.cos(0.1), np.sin(0.1), 0.0])
    b = np.array([np.cos(-0.1), np.sin(-0.1), 0.0])
    mid = sphc_interp(a, b, 0.5, AX, AY, AZ)
    np.testing.assert_allclose(mid, [1, 0, 0], atol=1e-9)  # through 0, not pi


def test_sphc_loops():
    a = np.array([1.0, 0.0, 0.0])
    q = sphc_interp(a, a, 0.25, AX, AY, AZ, loops=1)
    np.testing.assert_allclose(q, [0, 1, 0], atol=1e-9)  # quarter loop CCW


def test_interpolate_options_lerp():
    k0 = AnimKF(center=np.array([3.0, 0, 0]), v_back=np.array([1.0, 0, 0]),
                opt=RenderOptions(background_brightness=0.0, step_size=1e-4))
    k1 = AnimKF(center=np.array([0.0, 3, 0]), v_back=np.array([0.0, 1, 0]),
                opt=RenderOptions(background_brightness=1.0, step_size=3e-4))
    c, vb, fx, fy, opt, ms = interpolate(k0, k1, 0.5, (0, 0, 1),
                                         first_segment=True)
    np.testing.assert_allclose(np.linalg.norm(c), 3.0, atol=1e-9)
    assert abs(opt.background_brightness - 0.5) < 1e-9
    assert abs(opt.step_size - 2e-4) < 1e-12


def test_frame_times():
    kfs = [AnimKF(center=np.zeros(3), v_back=np.array([1.0, 0, 0])),
           AnimKF(center=np.zeros(3), v_back=np.array([1.0, 0, 0]),
                  t_max=1.0)]
    ft = frame_times(kfs, fps=10)
    assert len(ft) == 11
    assert ft[0] == (0, 0.0) and ft[-1] == (0, 1.0)


def test_anim_cli(tmp_path):
    from volrend_tpu.cli import animate
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.utils.png import read_png

    tree = make_test_tree(max_depth=3, basis_dim=4, seed=5, sigma_scale=60.0)
    tp = str(tmp_path / "tree.npz")
    tree.save_npz(tp)
    script = {
        "fps": 4,
        "keyframes": [
            {"center": [2.5, 0, 0.5], "v_back": [1, 0, 0.2], "fx": 60.0},
            {"center": [0, 2.5, 0.5], "v_back": [0, 1, 0.2], "fx": 60.0,
             "t_max": 1.0},
        ],
    }
    sp = str(tmp_path / "script.json")
    with open(sp, "w") as f:
        json.dump(script, f)
    out = str(tmp_path / "frames")
    rc = animate.main([tp, sp, "-W", "32", "-H", "32", "-o", out,
                       "--renderer", "exact"])
    assert rc == 0
    img = read_png(str(tmp_path / "frames" / "000000.png"))
    assert img.shape == (32, 32, 4)
    img_last = read_png(str(tmp_path / "frames" / "000004.png"))
    assert not np.array_equal(img, img_last)
