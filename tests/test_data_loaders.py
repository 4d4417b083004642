"""Real-data gateway tests: TU text format + Planetoid pickle format.

Generates tiny on-disk fixtures in the exact upstream file formats, parses
them with our loaders, and (for Planetoid) cross-checks against the
reference's own ``utils/process.py::load_data`` executed on the same files.
"""

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp
import torch

from _reference_loader import load_reference


@pytest.fixture(scope="module")
def R():
    return load_reference()


# ---------------------------------------------------------------------------
# TU text format
# ---------------------------------------------------------------------------

def write_tu_dir(root, name="TINY"):
    """Three graphs (3, 4, 2 nodes), 2 continuous attrs, 2 node classes."""
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, name)
    # 1-based node ids; both edge directions listed, as in real TU files
    edges = [(1, 2), (2, 1), (2, 3), (3, 2),            # graph 1 path
             (4, 5), (5, 4), (5, 6), (6, 5), (6, 7), (7, 6), (7, 4), (4, 7),
             (8, 9), (9, 8)]                            # graph 3 single edge
    with open(base + "_A.txt", "w") as f:
        for r, c in edges:
            f.write(f"{r}, {c}\n")
    with open(base + "_graph_indicator.txt", "w") as f:
        f.write("\n".join(["1"] * 3 + ["2"] * 4 + ["3"] * 2))
    with open(base + "_graph_labels.txt", "w") as f:
        f.write("1\n2\n1")
    with open(base + "_node_labels.txt", "w") as f:
        f.write("\n".join(str(v) for v in [0, 1, 0, 1, 1, 0, 0, 1, 0]))
    attrs = np.round(np.random.default_rng(0).random((9, 2)), 4)
    with open(base + "_node_attributes.txt", "w") as f:
        for row in attrs:
            f.write(f"{row[0]}, {row[1]}\n")
    return attrs


def test_load_tu_dataset_exact(tmp_path):
    from ragraph_tpu.data import load_tu_dataset
    attrs = write_tu_dir(str(tmp_path))
    ds = load_tu_dataset(str(tmp_path), "TINY")

    assert len(ds) == 3
    assert ds.num_node_attributes == 2
    assert ds.num_node_classes == 2
    assert ds.num_graph_classes == 2

    sizes = [3, 4, 2]
    labels = [0, 1, 0]  # graph labels shifted to 0-based
    offset = 0
    for g, (n, y) in enumerate(zip(sizes, labels)):
        graph = ds[g]
        assert graph.adj.shape == (n, n)
        assert graph.graph_label == y
        np.testing.assert_allclose(graph.features,
                                   attrs[offset:offset + n], atol=1e-6)
        # adjacency symmetric, no self loops, correct degree
        np.testing.assert_allclose(graph.adj, graph.adj.T)
        assert np.trace(graph.adj) == 0
        offset += n

    # graph 1 is the 3-path: degrees 1,2,1
    np.testing.assert_allclose(ds[0].adj.sum(1), [1, 2, 1])
    # graph 2 is the 4-cycle: all degree 2
    np.testing.assert_allclose(ds[1].adj.sum(1), [2, 2, 2, 2])
    # node one-hots
    np.testing.assert_allclose(ds[0].node_labels,
                               np.eye(2, dtype=np.float32)[[0, 1, 0]])


def test_tu_cli_smoke(tmp_path, monkeypatch):
    """pretrain + vanilla on a generated TU directory (the --dataset !=
    SYNTH path no other test exercises)."""
    from ragraph_tpu.cli import node as node_cli
    monkeypatch.chdir(tmp_path)
    write_tu_dir(str(tmp_path / "data"))
    common = ["--dataset", "TINY", "--data-root", str(tmp_path / "data"),
              "--hidden", "8", "--batch-size", "4",
              "--save-dir", str(tmp_path / "m"),
              "--results-dir", str(tmp_path / "r")]
    node_cli.main(["pretrain", "--pretrain-epochs", "1"] + common)
    assert os.path.exists(tmp_path / "m" / "model_TINY.pkl")
    acc = node_cli.main(["vanilla", "--test-times", "1",
                         "--library-capacity", "1024"] + common)
    assert np.isfinite(acc)


# ---------------------------------------------------------------------------
# Planetoid pickle format (cross-checked against the reference loader)
# ---------------------------------------------------------------------------

def write_planetoid(data_dir, name, n_train=6, n_allx=10, n_test=5,
                    n_feat=4, n_class=3, missing_test=()):
    """Write ``ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index}``.

    ``missing_test`` simulates Citeseer's isolated test nodes: those
    offsets within the test range are absent from tx/ty/test.index.
    """
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    n_total = n_allx + n_test
    present = [i for i in range(n_test) if i not in missing_test]

    feats = rng.random((n_total, n_feat)).astype(np.float32)
    labels = np.eye(n_class, dtype=np.int64)[
        rng.integers(0, n_class, size=n_total)]

    x = sp.csr_matrix(feats[:n_train])
    allx = sp.csr_matrix(feats[:n_allx])
    tx = sp.csr_matrix(feats[n_allx + np.asarray(present)])
    y, ally = labels[:n_train], labels[:n_allx]
    ty = labels[n_allx + np.asarray(present)]

    graph = {i: [] for i in range(n_total)}
    for _ in range(3 * n_total):
        u, v = rng.integers(0, n_total, size=2)
        if u != v and v not in graph[int(u)]:
            graph[int(u)].append(int(v))
            graph[int(v)].append(int(u))

    objs = {"x": x, "y": y, "tx": tx, "ty": ty,
            "allx": allx, "ally": ally, "graph": graph}
    for k, v in objs.items():
        with open(os.path.join(data_dir, f"ind.{name}.{k}"), "wb") as f:
            pickle.dump(v, f)
    test_index = (n_allx + np.asarray(present))[::-1]  # unsorted on purpose
    with open(os.path.join(data_dir, f"ind.{name}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in test_index))
    return feats, labels


def _compare_with_reference(R, tmp_path, monkeypatch, name, missing_test):
    from ragraph_tpu.data import load_planetoid, row_normalize_features
    data_dir = tmp_path / "data"
    write_planetoid(str(data_dir), name, missing_test=missing_test)

    adj, feats, labels, idx_train, idx_val, idx_test = load_planetoid(
        str(data_dir), name)

    monkeypatch.chdir(tmp_path)  # reference hardcodes "data/ind.<name>.*"
    r_adj, r_feats, r_labels, r_train, r_val, r_test = \
        R.node_process.load_data(name)

    np.testing.assert_allclose(
        np.asarray(adj.todense()),
        (np.asarray(r_adj.todense()) > 0).astype(np.float32))
    np.testing.assert_allclose(
        feats,
        row_normalize_features(np.asarray(r_feats.todense(),
                                          dtype=np.float32)),
        atol=1e-6)
    np.testing.assert_allclose(labels, r_labels)
    assert idx_train == list(r_train)
    assert idx_val == list(r_val)
    assert idx_test == list(r_test)


def test_planetoid_parity_cora(R, tmp_path, monkeypatch):
    _compare_with_reference(R, tmp_path, monkeypatch, "cora",
                            missing_test=())


def test_planetoid_parity_citeseer_isolated(R, tmp_path, monkeypatch):
    """Citeseer path: test range has holes -> zero-padded tx/ty rows."""
    _compare_with_reference(R, tmp_path, monkeypatch, "citeseer",
                            missing_test=(1, 3))


def test_micro_f1_parity(R):
    from ragraph_tpu.data import micro_f1
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((20, 6)).astype(np.float32)
    labels = (rng.random((20, 6)) < 0.4).astype(np.float32)
    ref = R.node_process.micro_f1(torch.tensor(logits), torch.tensor(labels))
    ours = micro_f1(logits, labels)
    assert abs(float(ours) - float(ref)) < 1e-6
