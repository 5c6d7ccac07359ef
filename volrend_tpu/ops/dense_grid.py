"""Dense-grid baking: octree -> regular voxel grid for the slab renderer.

Why this exists: the reference's per-sample octree pointer-chase
(``n3tree_query.hpp:13-48``) maps to per-row HBM gathers on TPU, which
measure ~80 Mrows/s on v5e — three orders of magnitude short of the
samples/s a real-time frame needs. The TPU-native answer is to trade the
sparse pointer structure for **dense contiguous streaming**: bake leaf
payloads into a [G, G, G, D] voxel grid once per scene, then render by
streaming z-slabs through VMEM (``ops/slab_render.py``) — HBM traffic
becomes `sizeof(grid)` per frame at full bandwidth instead of millions of
scattered row fetches.

Baking samples the octree at voxel centers with the exact batched query of
``ops/render_jax.py``; when G equals the tree's finest resolution the grid
holds *exactly* the leaf values (piecewise-constant equivalence — splitting
a leaf chord into same-valued subsegments leaves front-to-back compositing
algebraically unchanged).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from volrend_tpu.models.data_format import BasisType
from volrend_tpu.models.n3tree import N3Tree, TreeArrays
from volrend_tpu.ops import render_jax

__all__ = ["DenseGrid", "bake_dense", "full_resolution"]

#: int8-bake color-scale percentile (100.0 = exact absmax, the r4
#: behavior). PARKED PROBE KNOB (r5, measured): clipping outlier SH
#: coefficients to the 98-99.9th percentile changes the rendered int8-vs-
#: f16 PSNR by <0.01 dB (81.85 dB either way on the solid scene — the
#: sigmoid squashes coefficient quantization), so the int8 grid is NOT
#: the sparse-scene PSNR ceiling; the ceiling is the slab path's
#: geometric silhouette discretization vs the exact DDA (PSNR-vs-exact
#: follows ~+6 dB per G doubling: 36.8 dB at G=64 -> ~49 at G=256,
#: matching the measured 48.4 saturation). Keep at 100.0.
_INT8_PCTL = 100.0


def _register(cls):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=["data", "offset", "scale", "extra", "qscale",
                     "sigma_grid"],
        meta_fields=["G", "data_dim", "basis_dim", "fmt", "quantized",
                     "occ_max", "ndc"],
    )(cls)


@_register
@dataclasses.dataclass
class DenseGrid:
    """Dense voxel payload grid (a JAX pytree).

    data  : float16 [G, G, G, D]  leaf payloads at voxel centers
            (z-major: axis 0 is the slab axis before per-frame permutation);
            int8 when ``quantized`` (per-channel linear codes)
    offset/scale : world->tree transform (same as TreeArrays)
    extra : SG/ASG lobe params ((0,0) when unused)
    qscale: float32 [D] per-channel dequant scales (ones when not quantized)
    """
    data: object
    offset: object
    scale: object
    extra: object
    qscale: object = None
    #: (G, G, G) bfloat16 density plane kept at full precision — the march
    #: kernel always reads sigma here (transmittance is precision-critical;
    #: int8-quantizing it costs ~12 dB)
    sigma_grid: object = None
    G: int = 1
    data_dim: int = 4
    basis_dim: int = -1
    fmt: BasisType = BasisType.RGBA
    quantized: bool = False
    #: per-axis slab occupancy: occ_max[a][i] = max sigma over slab i along
    #: tree axis a (3 tuples of G floats; static so the renderer can cull
    #: empty slabs at trace time). None = unknown (no culling).
    occ_max: Optional[Tuple[Tuple[float, ...], ...]] = None
    #: (width, height, focal) of the LLFF/NDC warp when the tree lives in
    #: NDC coordinates (TreeArrays.ndc); None for world-space trees. The
    #: slab renderer uses it to warp pose geometry into NDC space — the
    #: NDC map is projective, so a pinhole ray family stays a pinhole
    #: family and the shear-warp factorization still applies.
    ndc: Optional[Tuple[float, float, float]] = None

    def slab_ids(self, axis: int, reverse: bool,
                 sigma_thresh: float) -> Tuple[int, ...]:
        """March-ordered z-indices of the non-empty slabs along ``axis``."""
        order = range(self.G - 1, -1, -1) if reverse else range(self.G)
        if self.occ_max is None:
            return tuple(order)
        occ = self.occ_max[axis]
        return tuple(i for i in order if occ[i] > sigma_thresh)


def full_resolution(tree) -> int:
    """Finest voxel resolution of the tree (N ** (max_depth + 1))."""
    return int(tree.N ** (tree.max_depth + 1))


def _supersample_edge_band(dev, data, G: int, meta, n_sub: int,
                           thresh: float):
    """Re-bake occupancy-boundary voxels as the mean of n_sub^3 sub-center
    octree samples (area-weighted silhouettes; see bake_dense).

    The band is found on host (one ~G^3-byte occupancy download at bake
    time); the re-bake itself stays on device, chunked like the base bake.
    """
    occ_host = np.asarray(
        jax.jit(lambda d: d[..., -1].astype(jnp.float32) > thresh)(data))
    band = np.zeros_like(occ_host)
    for ax in range(3):
        a = np.swapaxes(occ_host, 0, ax)
        b = np.swapaxes(band, 0, ax)
        b[1:] |= a[1:] != a[:-1]
        b[:-1] |= a[1:] != a[:-1]
    ids = np.flatnonzero(band.reshape(-1)).astype(np.int32)
    if ids.size == 0:
        return data
    # pad to a whole number of chunks with a BAND id (repeating a band
    # voxel just rewrites its own averaged value; padding with voxel 0
    # would supersample a voxel outside the band, violating the
    # interior-voxels-keep-exact-samples contract)
    sub_chunk = max(1, (2 ** 21) // (n_sub ** 3))
    pad = (-ids.size) % sub_chunk
    ids_p = np.concatenate([ids, np.full(pad, ids[0], np.int32)])
    offs = (np.arange(n_sub, dtype=np.float32) + 0.5) / n_sub  # in-voxel
    oz, oy, ox = np.meshgrid(offs, offs, offs, indexing="ij")
    sub = np.stack([oz, oy, ox], -1).reshape(-1, 3)            # (n^3, 3)

    @jax.jit
    def rebake(child, lut, tdata, data, ids_dev):
        def mean_rows(vox_ids):
            z = vox_ids // (G * G)
            y = (vox_ids // G) % G
            x = vox_ids % G
            base = jnp.stack([z, y, x], -1).astype(jnp.float32)
            pos = ((base[:, None, :] + jnp.asarray(sub)[None]) / G
                   ).reshape(-1, 3)
            leaf_idx, _, _ = render_jax._query(child, lut, pos, meta)
            rows = render_jax._fetch_rows(
                tdata, leaf_idx)[:, :dev.data_dim].astype(jnp.float32)
            return jnp.mean(rows.reshape(vox_ids.shape[0], -1,
                                         dev.data_dim), axis=1)

        vals = jax.lax.map(
            mean_rows, ids_dev.reshape(-1, sub_chunk)).reshape(
                -1, dev.data_dim).astype(data.dtype)
        return data.reshape(-1, dev.data_dim).at[ids_dev.reshape(-1)].set(
            vals).reshape(data.shape)

    return rebake(dev.child, dev.lut, dev.data, data, jnp.asarray(ids_p))


def bake_dense(tree, G: Optional[int] = None,
               chunk: int = 2 ** 21, dtype: str = "f16",
               edge_supersample: int = 0,
               edge_thresh: float = 1e-2) -> DenseGrid:
    """Sample the octree at G^3 voxel centers into a DenseGrid.

    tree: N3Tree (host) or TreeArrays (device).
    G: grid resolution; default = the tree's full resolution (exact bake).
    dtype: "f16" (exact leaf values) or "int8" (per-channel linear
        quantization — halves HBM residency + per-frame stream traffic;
        dequantized on the fly inside the traversal/march kernels, the dense
        analog of the reference's compressed trees).
    edge_supersample: when n >= 2, voxels in the occupancy BOUNDARY band
        (sigma crosses ``edge_thresh`` across a face neighbor) are re-baked
        as the average of n^3 sub-center samples — an area-weighted
        anti-aliased silhouette. Interior/empty voxels keep the exact
        point sample. NOTE: at G == the tree's full resolution this is a
        measured NO-OP (every sub-sample lands in the same leaf — the
        octree is piecewise-constant at voxel granularity), so it cannot
        lift the bench's sparse PSNR (VERDICT r4 item 7 probe, r5): it
        only matters when baking COARSER than the tree (G < full
        resolution). 0/1 = off (exact bake).
    """
    if isinstance(tree, N3Tree):
        dev = tree.to_device(lut_depth=None)
    else:
        dev = tree
    if G is None:
        G = full_resolution(dev)

    meta = render_jax.tree_meta(dev)
    n = G * G * G
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2

    @jax.jit
    def sample_all(child, lut, data):
        # stays fully on device: chunked map over all voxel ids
        # (tree arrays passed as args, NOT closed over — closure capture
        # would embed them as giant HLO constants)
        def sample_rows(z0_rows):
            z = z0_rows // (G * G)
            y = (z0_rows // G) % G
            x = z0_rows % G
            pos = (jnp.stack([z, y, x], -1).astype(jnp.float32) + 0.5) / G
            leaf_idx, _, _ = render_jax._query(child, lut, pos, meta)
            return render_jax._fetch_rows(data, leaf_idx)[:, :dev.data_dim]

        ids = jnp.arange(n, dtype=jnp.int32).reshape(-1, chunk)
        return jax.lax.map(sample_rows, ids).reshape(G, G, G, dev.data_dim)

    data = sample_all(dev.child, dev.lut, dev.data)
    if edge_supersample >= 2:
        data = _supersample_edge_band(dev, data, G, meta,
                                      n_sub=int(edge_supersample),
                                      thresh=float(edge_thresh))
    sigma_grid = jax.jit(
        lambda d: d[..., -1].astype(jnp.bfloat16))(data)
    # per-axis slab occupancy (one tiny host transfer; lets the renderer
    # cull empty slabs statically — the dominant content-dependent saving)
    occ = np.asarray(jax.jit(lambda s: jnp.stack([
        jnp.max(s, (1, 2)), jnp.max(s, (0, 2)), jnp.max(s, (0, 1)),
    ]))(sigma_grid.astype(jnp.float32)), np.float32)
    occ_max = tuple(tuple(float(v) for v in row) for row in occ)
    qscale = jnp.ones((dev.data_dim,), jnp.float32)
    quantized = False
    if dtype == "int8":
        # colors: per-channel signed int8; sigma: 14-bit fixed point split
        # across TWO int8 channels (hi*128 + lo) — transmittance needs more
        # than 8 bits, and keeping it inside the one payload array preserves
        # the march kernel's single streamed input (a separate per-slab
        # sigma input measurably breaks the DMA pipeline)
        bd = dev.basis_dim

        @jax.jit
        def quantize(d):
            df = d.astype(jnp.float32)
            cols = df[..., :-1]
            if _INT8_PCTL < 100.0:
                # percentile-clipped scale: a handful of outlier coeffs
                # (hard silhouettes swing SH coefficients far past the
                # bulk) would otherwise set the whole channel's step —
                # clipping them to the percentile trades their (already
                # sigmoid-saturated) accuracy for a finer step everywhere
                absmax = jnp.percentile(
                    jnp.abs(cols.reshape(-1, cols.shape[-1])),
                    _INT8_PCTL, axis=0)
            else:
                absmax = jnp.max(jnp.abs(cols), axis=(0, 1, 2))
            if bd > 0 and dev.data_dim == 3 * bd + 1:
                # share each basis function's scale across rgb: the march
                # kernel then scales the BASIS plane once per k instead of
                # dequantizing 3 channel planes separately (48 -> 16 plane
                # multiplies per slab); costs <=log2(brightest/dimmest
                # channel) bits on the dimmer channels
                am = absmax.reshape(3, bd)
                absmax = jnp.broadcast_to(
                    jnp.max(am, axis=0, keepdims=True), (3, bd)).reshape(-1)
            qs_c = jnp.maximum(absmax, 1e-12) / 127.0
            codes = jnp.clip(jnp.round(cols / qs_c),
                             -127, 127).astype(jnp.int8)
            sig = jnp.maximum(df[..., -1], 0.0)
            qs_s = jnp.maximum(jnp.max(sig), 1e-12) / 16383.0
            s16 = jnp.clip(jnp.round(sig / qs_s), 0, 16383).astype(jnp.int32)
            hi = (s16 // 128).astype(jnp.int8)
            lo = (s16 % 128).astype(jnp.int8)
            out = jnp.concatenate(
                [codes, hi[..., None], lo[..., None]], -1)
            return out, jnp.concatenate([qs_c, qs_s[None], qs_s[None]])

        data, qscale = quantize(data)
        quantized = True
    elif dtype != "f16":
        raise ValueError(f"unsupported grid dtype {dtype!r}")

    return DenseGrid(
        data=data,
        sigma_grid=sigma_grid,
        offset=dev.offset,
        scale=dev.scale,
        extra=dev.extra,
        qscale=qscale,
        G=G,
        data_dim=dev.data_dim,
        basis_dim=dev.basis_dim,
        fmt=dev.fmt,
        quantized=quantized,
        occ_max=occ_max,
        ndc=dev.ndc,
    )
