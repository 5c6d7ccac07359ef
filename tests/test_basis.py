"""SH/SG/ASG basis unit tests.

SH values are checked against an independent scipy spherical-harmonics
computation (real SH from complex sph_harm) and against the hardcoded
constants' defining properties — not against our own implementation.
"""

import numpy as np
import pytest

from volrend_tpu.models.data_format import BasisType, DataFormat
from volrend_tpu.ops.basis import (apply_basis_window, eval_basis,
                                   eval_sg_basis, eval_sh_basis)


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _real_sh_scipy(l, m, dirs):
    """Real SH in the google/spherical-harmonics convention used by the
    reference table (lumisphere.hpp:38-80): complex SH with Condon-Shortley
    phase, m!=0 mapped to sqrt(2)*Re / sqrt(2)*Im with no extra (-1)^m."""
    try:
        from scipy.special import sph_harm_y
    except ImportError:  # scipy < 1.15
        from scipy.special import sph_harm

        def sph_harm_y(n, mm, theta, phi):
            return sph_harm(mm, n, phi, theta)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = np.arccos(np.clip(z, -1, 1))  # polar
    phi = np.arctan2(y, x)                # azimuth
    Y = sph_harm_y(l, abs(m), theta, phi)
    if m > 0:
        return np.sqrt(2) * Y.real
    if m < 0:
        return np.sqrt(2) * Y.imag
    return Y.real


@pytest.mark.parametrize("basis_dim", [1, 4, 9, 16, 25])
def test_sh_matches_scipy(basis_dim):
    dirs = _random_dirs(64)
    ours = eval_sh_basis(dirs, basis_dim)
    i = 0
    deg = int(np.sqrt(basis_dim)) - 1
    for l in range(deg + 1):
        for m in range(-l, l + 1):
            ref = _real_sh_scipy(l, m, dirs)
            np.testing.assert_allclose(
                ours[:, i], ref, rtol=1e-5, atol=1e-6,
                err_msg=f"l={l} m={m} (index {i})")
            i += 1
    assert i == basis_dim


def test_sh_orthonormality():
    """Monte-Carlo orthonormality over the sphere: <Y_i Y_j> = d_ij/(4pi)."""
    dirs = _random_dirs(200000, seed=3)
    vals = eval_sh_basis(dirs, 16)
    gram = 4 * np.pi * (vals.T @ vals) / dirs.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.06)


def test_sg_basis():
    extra = np.array([[2.0, 0, 0, 1], [5.0, 1, 0, 0]], np.float32)
    dirs = np.array([[0, 0, 1.0], [1.0, 0, 0]])
    out = eval_sg_basis(dirs, extra)
    # exp(lam*(mu.d - 1)) / basis_dim, basis_dim = 2
    np.testing.assert_allclose(
        out,
        [[np.exp(0) / 2, np.exp(5 * (0 - 1)) / 2],
         [np.exp(2 * (0 - 1)) / 2, np.exp(0) / 2]],
        rtol=1e-6)


def test_asg_closed_form():
    """ASG numeric values against hand evaluation of
    S*exp(-a(d.mu_x)^2 - b(d.mu_y)^2)/B (lumisphere.hpp:14-28; the
    reference marks ASG 'UNTESTED' — this pins our semantics numerically)."""
    from volrend_tpu.ops.basis import eval_asg_basis
    # lobe 0: canonical frame; lobe 1: rotated frame
    rot = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    extra = np.array([
        [2.0, 3.0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
        np.concatenate([[0.5, 1.5], rot.reshape(-1)]),
    ], dtype=np.float32)
    dirs = _random_dirs(32, seed=9)
    out = eval_asg_basis(dirs, extra)
    B = extra.shape[0]
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    want0 = z * np.exp(-2.0 * x * x - 3.0 * y * y) / B
    np.testing.assert_allclose(out[:, 0], want0, rtol=1e-5, atol=1e-7)
    dx, dy, dz = (dirs @ rot[0], dirs @ rot[1], dirs @ rot[2])
    want1 = dz * np.exp(-0.5 * dx * dx - 1.5 * dy * dy) / B
    np.testing.assert_allclose(out[:, 1], want1, rtol=1e-5, atol=1e-7)
    # hand-picked point: d = +mu_z of lobe 0 -> exactly 1/B
    out_z = eval_asg_basis(np.array([[0.0, 0.0, 1.0]]), extra)
    np.testing.assert_allclose(out_z[0, 0], 1.0 / B, rtol=1e-6)


def test_asg_jnp_matches_numpy():
    from volrend_tpu.ops.basis import eval_asg_basis
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    extra = rng.normal(size=(3, 11)).astype(np.float32)
    extra[:, :2] = np.abs(extra[:, :2])
    dirs = _random_dirs(16, seed=5)
    a = eval_asg_basis(dirs, extra)
    b = np.asarray(eval_asg_basis(jnp.asarray(dirs), jnp.asarray(extra),
                                  xp=jnp))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_basis_window():
    vals = np.ones((4, 9))
    w = apply_basis_window(vals, (2, 5))
    assert w[:, :2].sum() == 0 and w[:, 6:].sum() == 0
    assert (w[:, 2:6] == 1).all()


def test_dispatch_rgba_none():
    assert eval_basis(BasisType.RGBA, -1, _random_dirs(4)) is None


def test_data_format_parse():
    f = DataFormat.parse("SH16")
    assert f.format == BasisType.SH and f.basis_dim == 16
    assert f.to_string() == "SH16"
    f = DataFormat.parse("SG25")
    assert f.format == BasisType.SG and f.basis_dim == 25
    f = DataFormat.parse("ASG8")
    assert f.format == BasisType.ASG and f.basis_dim == 8
    f = DataFormat.parse("RGBA")
    assert f.format == BasisType.RGBA and f.basis_dim == -1
    assert f.to_string() == "RGBA"
