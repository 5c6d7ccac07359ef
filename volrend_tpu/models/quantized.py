"""Quantized octree with on-device dequantization (BASELINE config[3]).

The host loader (``models/n3tree.py``) eagerly decodes codebook-quantized
trees to dense fp16 — the reference's approach (``src/n3tree.cpp:279-340``,
a CPU hot loop at load). This module instead keeps the codebooks resident in
HBM and dequantizes **inside the traversal**: a leaf fetch gathers the
per-basis uint16 ids (one row) plus per-basis codebook entries — the
codebooks (n_q x 65536 x 3) are small-table gathers, the fast class on TPU.
HBM cost per leaf: 2*n_q bytes of ids vs 6*n_q bytes of dense fp16 colors —
a 3x residency saving for SH16 trees, matching the compressed npz on disk.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from volrend_tpu.models.n3tree import N3Tree, TreeArrays

__all__ = ["QuantLeaves", "load_quantized", "to_device_quantized"]


def _register(cls):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=["codebooks", "ids", "sigma", "retained"],
        meta_fields=["n_q", "n_retain", "basis_dim", "data_dim"],
    )(cls)


@_register
@dataclasses.dataclass
class QuantLeaves:
    """Drop-in replacement for the dense ``TreeArrays.data`` array.

    codebooks: (n_q, n_codes, 3) float16
    ids:       (K, n_q) uint16   per-leaf codebook indices (basis-major)
    sigma:     (K,) float16
    retained:  (K, 3 * n_retain) float16 (first-k uncompressed coeffs)
    """
    codebooks: object
    ids: object
    sigma: object
    retained: object
    n_q: int = 0
    n_retain: int = 0
    basis_dim: int = 1
    data_dim: int = 4

    @property
    def shape(self):
        return (self.ids.shape[0], self.data_dim)

    @property
    def dtype(self):
        return jnp.float16

    def fetch_rows(self, leaf_idx):
        """Gather + dequantize leaf payload rows -> (..., data_dim) f16.

        Layout matches the dense decode (n3tree.cpp:310-340): channel-major
        [c0: retained..quant, c1: ..., c2: ..., sigma]."""
        bd = self.basis_dim
        ids = self.ids[leaf_idx]                       # (..., n_q) u16
        parts = []
        # per-basis codebook gathers (small tables -> fast path)
        qcols = [self.codebooks[j][ids[..., j].astype(jnp.int32)]
                 for j in range(self.n_q)]             # each (..., 3)
        ret = self.retained[leaf_idx]                  # (..., 3*n_retain)
        for c in range(3):
            if self.n_retain:
                parts.append(ret.reshape(ret.shape[:-1] + (self.n_retain, 3)
                                         )[..., c])
            parts.append(jnp.stack([q[..., c] for q in qcols], -1)
                         if self.n_q else
                         jnp.zeros(ids.shape[:-1] + (0,), jnp.float16))
        sig = self.sigma[leaf_idx][..., None]
        return jnp.concatenate(parts + [sig], -1).astype(jnp.float16)


def load_quantized(path_or_dict) -> N3Tree:
    """Parse a compressed npz WITHOUT decoding; returns an N3Tree whose
    ``quant`` attribute holds the raw quantized arrays (data stays None)."""
    if isinstance(path_or_dict, dict):
        npz = path_or_dict
    else:
        with np.load(path_or_dict, allow_pickle=False) as f:
            npz = dict(f.items())
    assert "quant_colors" in npz, "not a quantized tree"

    tree = N3Tree()
    dense_keys = {k: v for k, v in npz.items()
                  if k not in ("quant_colors", "quant_map", "sigma",
                               "data_retained")}
    # reuse the standard field parsing with a dummy dense payload
    tree.load_npz({**dense_keys,
                   "data": np.zeros((0, 1, 1, 1, 1), np.float16),
                   "data_dim": npz["data_dim"]})
    tree.capacity = int(npz["quant_map"].shape[1])
    tree.data = None
    tree.quant = {
        "quant_colors": np.asarray(npz["quant_colors"], np.float16),
        "quant_map": np.asarray(npz["quant_map"], np.uint16),
        "sigma": np.asarray(npz["sigma"], np.float16),
        "data_retained": np.asarray(npz["data_retained"], np.float16)
        if "data_retained" in npz else None,
    }
    return tree


def to_device_quantized(tree: N3Tree,
                        lut_depth: Optional[int] = None) -> TreeArrays:
    """Upload with QuantLeaves payload (no host-side decode)."""
    assert getattr(tree, "quant", None) is not None
    q = tree.quant
    n_q = int(q["quant_map"].shape[0])
    K = tree.capacity * tree.N3
    ret = q["data_retained"]
    n_retain = int(ret.shape[0]) if ret is not None else 0
    if ret is not None:
        retained = np.moveaxis(ret.reshape(n_retain, K, 3), 0, 1
                               ).reshape(K, n_retain * 3)
        # fetch_rows reshapes (..., n_retain, 3); keep (k, basis, ch) order
    else:
        retained = np.zeros((K, 0), np.float16)

    # build the dense-form container first for child/lut/scale handling
    # (data is None -> a (0, D) placeholder we immediately replace)
    dev = tree.to_device(lut_depth=lut_depth)

    leaves = QuantLeaves(
        codebooks=jnp.asarray(q["quant_colors"]),
        ids=jnp.asarray(
            np.moveaxis(q["quant_map"].reshape(n_q, K), 0, 1).copy()),
        sigma=jnp.asarray(q["sigma"].reshape(K)),
        retained=jnp.asarray(retained),
        n_q=n_q,
        n_retain=n_retain,
        basis_dim=tree.data_format.basis_dim,
        data_dim=tree.data_dim,
    )
    return dataclasses.replace(dev, data=leaves)
