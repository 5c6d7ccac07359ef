"""N3Tree structure tests: construction invariants, npz round-trip,
batched query vs an independent naive recursive descent, LUT exactness,
quantized decode."""

import numpy as np
import pytest

from volrend_tpu.models.data_format import BasisType, DataFormat
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.models.synthetic import make_test_tree


@pytest.fixture(scope="module")
def tree():
    return make_test_tree(max_depth=4, basis_dim=4, seed=0)


def naive_query(tree: N3Tree, pt):
    """Independent recursive descent (not the flattened-pointer algorithm)."""
    xyz = np.clip(np.asarray(pt, np.float64), 0.0, 1.0 - 1e-6)
    node = 0
    depth = 0
    while True:
        N = tree.N
        cell = np.minimum((xyz * N).astype(int), N - 1)
        skip = tree.child[node, cell[0], cell[1], cell[2]]
        if skip == 0:
            flat = ((node * N + cell[0]) * N + cell[1]) * N + cell[2]
            return flat, float(N ** (depth + 1))
        node = node + int(skip)
        xyz = xyz * N - cell
        depth += 1


def test_structure(tree):
    assert tree.child.shape[0] == tree.capacity
    assert tree.data.shape == (tree.capacity, 2, 2, 2, tree.data_dim)
    assert tree.capacity > 10
    # relative skips always point forward and in range
    flat = tree.child.reshape(tree.capacity, -1)
    nodes = np.arange(tree.capacity)[:, None]
    tgt = nodes + flat
    nz = flat != 0
    assert (flat[nz] > 0).all()
    assert (tgt[nz] < tree.capacity).all()
    # every non-root node has exactly one parent
    counts = np.bincount(tgt[nz].ravel(), minlength=tree.capacity)
    assert (counts[1:] == 1).all() and counts[0] == 0
    assert tree.max_depth == 4


def test_npz_roundtrip(tree, tmp_path):
    p = str(tmp_path / "t.npz")
    tree.save_npz(p)
    t2 = N3Tree(p)
    assert t2.data_dim == tree.data_dim
    assert t2.data_format.to_string() == tree.data_format.to_string()
    np.testing.assert_array_equal(t2.child, tree.child)
    np.testing.assert_array_equal(t2.data, tree.data)
    np.testing.assert_allclose(t2.scale, tree.scale)
    np.testing.assert_allclose(t2.offset, tree.offset)
    assert t2.max_depth == tree.max_depth


def test_legacy_autodetect(tree, tmp_path):
    import numpy as np
    p = str(tmp_path / "legacy.npz")
    np.savez(p, data_dim=np.int64(tree.data_dim),
             invradius=np.float64(tree.scale[0]),
             offset=tree.offset, child=tree.child, data=tree.data)
    t2 = N3Tree(p)
    assert t2.data_format.format == BasisType.SH
    assert t2.data_format.basis_dim == (tree.data_dim - 1) // 3


def test_query_batched_vs_naive(tree):
    import jax.numpy as jnp
    from volrend_tpu.ops.render_jax import query_batched

    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.05, 1.05, (500, 3)).astype(np.float32)
    dev = tree.to_device(lut_depth=0)
    leaf_idx, cube_sz, rel = (np.asarray(x) for x in
                              query_batched(dev, jnp.asarray(pts)))
    for i in range(pts.shape[0]):
        want_idx, want_cube = naive_query(tree, pts[i])
        assert leaf_idx[i] == want_idx, (i, pts[i])
        assert cube_sz[i] == want_cube
        assert (rel[i] >= 0).all() and (rel[i] < 1).all()


@pytest.mark.parametrize("lut_depth", [None, 3, 2])
def test_query_lut_matches_descent(tree, lut_depth):
    import jax.numpy as jnp
    from volrend_tpu.ops.render_jax import query_batched

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(0, 1, (400, 3)).astype(np.float32))
    dev0 = tree.to_device(lut_depth=0)
    dev1 = tree.to_device(lut_depth=lut_depth)
    assert dev1.lut_depth > 0
    i0, c0, r0 = query_batched(dev0, pts)
    i1, c1, r1 = query_batched(dev1, pts)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-5)


def test_quantized_decode(tree, tmp_path):
    """Build a codebook-quantized npz by hand; decode must reproduce the
    dense data (for values present in the codebook)."""
    rng = np.random.default_rng(3)
    bd = tree.data_format.basis_dim
    n_retain = 1
    n_q = bd - n_retain
    n_child = tree.capacity * tree.N ** 3
    D = tree.data_dim
    dense = tree.data.reshape(n_child, D)

    quant_colors = np.zeros((n_q, 65536, 3), np.float16)
    quant_map = np.zeros((n_q, n_child), np.uint16)
    for j in range(n_q):
        cols = dense[:, [c * bd + n_retain + j for c in range(3)]]
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        assert uniq.shape[0] <= 65536
        quant_colors[j, :uniq.shape[0]] = uniq
        quant_map[j] = inv.astype(np.uint16)
    retained = np.stack(
        [dense[:, [c * bd + j for c in range(3)]] for j in range(n_retain)]
    ).astype(np.float16)

    p = str(tmp_path / "q.npz")
    np.savez(
        p, data_dim=np.int64(D), data_format=np.str_(f"SH{bd}"),
        invradius3=tree.scale, offset=tree.offset, child=tree.child,
        quant_colors=quant_colors,
        quant_map=quant_map.reshape(n_q, tree.capacity, 2, 2, 2),
        sigma=dense[:, -1].reshape(tree.capacity, 2, 2, 2),
        data_retained=retained.reshape(n_retain, tree.capacity, 2, 2, 2, 3))
    t2 = N3Tree(p)
    np.testing.assert_array_equal(
        t2.data.reshape(n_child, D), dense)


def test_wireframe(tree):
    verts = tree.gen_wireframe(max_depth=1)
    assert verts.shape[1] == 9
    assert verts.shape[0] % 24 == 0  # 24 verts (12 line segments) per cube
