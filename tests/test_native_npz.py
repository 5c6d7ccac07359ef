"""Native C++ npz loader vs numpy (correctness; skips if no toolchain)."""

import numpy as np
import pytest

from volrend_tpu.io import native_npz


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    data = {
        "f32": rng.normal(size=(33, 7)).astype(np.float32),
        "f16": rng.normal(size=(2, 2, 2, 13)).astype(np.float16),
        "i32": rng.integers(-5, 5, (64,)).astype(np.int32),
        "u16": rng.integers(0, 60000, (31,)).astype(np.uint16),
        "scalar": np.int64(7),
        "string": np.str_("SH16"),
        "big": rng.normal(size=(1 << 20,)).astype(np.float32),
    }
    stored = str(d / "stored.npz")
    comp = str(d / "comp.npz")
    np.savez(stored, **data)
    np.savez_compressed(comp, **data)
    return stored, comp, data


def test_native_available():
    assert native_npz.available(), "g++/zlib toolchain expected in this image"


@pytest.mark.parametrize("which", [0, 1])
def test_native_matches_numpy(archives, which):
    path = archives[which]
    got = native_npz.load_npz(path)
    ref = dict(np.load(path, allow_pickle=False).items())
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(got[k], ref[k])


def test_tree_open_uses_native(archives, tmp_path):
    from volrend_tpu.models.n3tree import N3Tree
    from volrend_tpu.models.synthetic import make_test_tree
    tree = make_test_tree(max_depth=3, basis_dim=4, seed=1)
    p = str(tmp_path / "t.npz")
    tree.save_npz(p)
    again = N3Tree(p)
    np.testing.assert_array_equal(again.child, tree.child)
    np.testing.assert_array_equal(again.data, tree.data)
