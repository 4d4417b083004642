"""Tests for the native C++ fastgraph kernels vs the NumPy fallbacks."""

import numpy as np
import pytest

from ragraph_tpu.utils.native import (build_csr_native, native_available,
                                      negative_sample_native,
                                      parse_edge_file_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def test_parse_edge_file(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0\t1 2 3\t100 200 300\n"
                 "5\t7\t400\n"
                 "2\t4 9\t500 600\n")
    users, items, times = parse_edge_file_native(str(p))
    np.testing.assert_array_equal(users, [0, 0, 0, 5, 2, 2])
    np.testing.assert_array_equal(items, [1, 2, 3, 7, 4, 9])
    np.testing.assert_array_equal(times, [100, 200, 300, 400, 500, 600])


def test_parse_edge_file_crlf_and_stray_bytes(tmp_path):
    """CRLF line endings (and any stray non-digit byte) must parse, not
    hang: parse_int does not advance on non-digits, so the item/time
    loops used to spin forever on '\\r'."""
    p = tmp_path / "crlf.txt"
    p.write_bytes(b"0\t1 2\t100 200\r\n5\t7\t400\r\n\r\n")
    users, items, times = parse_edge_file_native(str(p))
    np.testing.assert_array_equal(users, [0, 0, 5])
    np.testing.assert_array_equal(items, [1, 2, 7])
    np.testing.assert_array_equal(times, [100, 200, 400])


def test_parse_matches_python_fallback(tmp_path):
    from ragraph_tpu.data.edgelist import parse_edge_file
    p = tmp_path / "t.txt"
    p.write_text("1\t10 11\t5 6\n3\t12\t7\n")
    rows_native = parse_edge_file(str(p), use_native=True)
    rows_python = parse_edge_file(str(p), use_native=False)
    assert rows_native == rows_python


def test_negative_sample_avoids_history():
    rng = np.random.default_rng(0)
    num_items = 50
    users = rng.integers(0, 10, size=200).astype(np.int32)
    # each user interacted with items [0..9]
    hist = np.unique(np.concatenate(
        [np.arange(10, dtype=np.int64) + u * num_items for u in range(10)]))
    out = negative_sample_native(users, hist, num_items, seed=42, n_negs=3)
    assert out.shape == (200, 3)
    for u, row in zip(users, out):
        for item in row:
            assert item >= 10  # items 0..9 are history for every user


def test_negative_sample_deterministic():
    users = np.arange(20, dtype=np.int32)
    hist = np.asarray([], np.int64)
    a = negative_sample_native(users, hist, 100, seed=7, n_negs=2)
    b = negative_sample_native(users, hist, 100, seed=7, n_negs=2)
    np.testing.assert_array_equal(a, b)


def test_build_csr_matches_scipy():
    import scipy.sparse as sp
    rng = np.random.default_rng(1)
    n = 30
    src = rng.integers(0, n, 200).astype(np.int32)
    dst = rng.integers(0, n, 200).astype(np.int32)
    indptr, indices = build_csr_native(src, dst, n)
    ref = sp.csr_matrix((np.ones(200), (src, dst)), shape=(n, n))
    # compare row partitioning (values may be in a different order per row)
    np.testing.assert_array_equal(
        np.diff(indptr),
        np.bincount(src, minlength=n))
    for v in range(n):
        ours = sorted(indices[indptr[v]:indptr[v + 1]].tolist())
        # scipy dedups duplicate entries; compare against raw edge list
        raw = sorted(dst[src == v].tolist())
        assert ours == raw


def test_edge_dataset_uses_native(tmp_path):
    from ragraph_tpu.data.edgelist import load_edge_dataset
    p = tmp_path / "train.txt"
    p.write_text("0\t1 2\t10 20\n1\t0 2\t30 40\n")
    t = tmp_path / "test.txt"
    t.write_text("0\t2\n1\t1\n")
    ds = load_edge_dataset(str(p), str(t))
    assert ds.num_edges == 4
    rng = np.random.default_rng(0)
    negs = ds.sample_negatives(ds.edgelist[:, 0], rng)
    for u, neg in zip(ds.edgelist[:, 0], negs.ravel()):
        assert int(neg) not in ds.train_user_dict[int(u)]
