"""Spherical basis evaluation: SH (deg 0-4), SG, ASG.

Vectorized re-derivation of the reference per-ray basis precompute
(``include/volrend/internal/lumisphere.hpp:9-87``): identical hardcoded SH
coefficients (from google/spherical-harmonics), SG ``exp(lambda(mu.d - 1))/B``
with 4 floats per lobe, ASG with 11 floats per lobe.

Functions take ``dirs`` of shape (..., 3) and return (..., basis_dim); they are
written against the array-module argument ``xp`` so the same code serves the
NumPy oracle and the JAX renderer (one semantics, two execution tiers).
"""

from __future__ import annotations

import numpy as np

from volrend_tpu.models.data_format import BasisType

# SH normalization constants, identical to lumisphere.hpp:38-80
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)

SH_SUPPORTED_DIMS = (1, 4, 9, 16, 25)


def eval_sh_basis(dirs, basis_dim: int, xp=np):
    """Evaluate real SH basis values at unit directions.

    dirs: (..., 3); returns (..., basis_dim). basis_dim in {1,4,9,16,25}.
    """
    if basis_dim not in SH_SUPPORTED_DIMS:
        raise ValueError(f"unsupported SH basis_dim {basis_dim}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = xp.ones_like(x)
    out = [_C0 * ones]
    if basis_dim >= 4:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if basis_dim >= 9:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [_C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz, _C2[4] * (xx - yy)]
    if basis_dim >= 16:
        out += [_C3[0] * y * (3 * xx - yy),
                _C3[1] * xy * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy),
                _C3[5] * z * (xx - yy),
                _C3[6] * x * (xx - 3 * yy)]
    if basis_dim >= 25:
        out += [_C4[0] * xy * (xx - yy),
                _C4[1] * yz * (3 * xx - yy),
                _C4[2] * xy * (7 * zz - 1.0),
                _C4[3] * yz * (7 * zz - 3.0),
                _C4[4] * (zz * (35 * zz - 30) + 3),
                _C4[5] * xz * (7 * zz - 3),
                _C4[6] * (xx - yy) * (7 * zz - 1.0),
                _C4[7] * xz * (xx - 3 * yy),
                _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return xp.stack(out, axis=-1)


def eval_sg_basis(dirs, extra, xp=np):
    """Spherical gaussians: extra is (basis_dim, 4) = [lambda, mu_x,mu_y,mu_z].

    out_i = exp(lambda_i * (mu_i . d - 1)) / basis_dim   (lumisphere.hpp:30-36)
    """
    basis_dim = extra.shape[0]
    lam = extra[:, 0]                                 # (B,)
    mu = extra[:, 1:4]                                # (B, 3)
    dot = xp.einsum("...d,bd->...b", dirs, mu)
    return xp.exp(lam * (dot - 1.0)) / basis_dim


def eval_asg_basis(dirs, extra, xp=np):
    """Anisotropic SG: extra is (basis_dim, 11) =
    [a, b, mu_x(3), mu_y(3), mu_z(3)] (lumisphere.hpp:14-28; marked
    UNTESTED upstream — our numeric semantics are pinned by
    tests/test_basis.py::test_asg_closed_form).

    out_i = (d . mu_z) * exp(-a (d.mu_x)^2 - b (d.mu_y)^2) / basis_dim
    """
    basis_dim = extra.shape[0]
    a, b = extra[:, 0], extra[:, 1]
    mu_x, mu_y, mu_z = extra[:, 2:5], extra[:, 5:8], extra[:, 8:11]
    dx = xp.einsum("...d,bd->...b", dirs, mu_x)
    dy = xp.einsum("...d,bd->...b", dirs, mu_y)
    s = xp.einsum("...d,bd->...b", dirs, mu_z)
    return s * xp.exp(-a * dx * dx - b * dy * dy) / basis_dim


def eval_basis(fmt: BasisType, basis_dim: int, dirs, extra=None, xp=np):
    """Dispatch on data format; RGBA returns None (no basis)."""
    if fmt == BasisType.SH:
        return eval_sh_basis(dirs, basis_dim, xp=xp)
    if fmt == BasisType.SG:
        return eval_sg_basis(dirs, extra, xp=xp)
    if fmt == BasisType.ASG:
        return eval_asg_basis(dirs, extra, xp=xp)
    return None


def apply_basis_window(basis_vals, basis_minmax, xp=np):
    """Zero out basis indices outside [min, max] (rt_core.cuh:98-102)."""
    lo, hi = basis_minmax
    n = basis_vals.shape[-1]
    idx = xp.arange(n)
    mask = (idx >= lo) & (idx <= hi)
    return xp.where(mask, basis_vals, xp.zeros_like(basis_vals))
