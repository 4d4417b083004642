"""In-process smoke tests for the CLI drivers (tiny synthetic configs).

conftest forces the CPU backend, so these exercise the full driver paths
(pretrain → checkpoint → finetune → results JSON) without the TPU.
"""

import json
import os

import numpy as np
import pytest

from ragraph_tpu.cli import edge as edge_cli
from ragraph_tpu.cli import node as node_cli


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_node_pretrain_then_finetune(workdir):
    node_cli.main(["pretrain", "--dataset", "SYNTH", "--hidden", "16",
                   "--pretrain-epochs", "2", "--batch-size", "8",
                   "--save-dir", str(workdir / "m"),
                   "--results-dir", str(workdir / "r")])
    assert os.path.exists(workdir / "m" / "model_SYNTH.pkl")

    mean = node_cli.main(["finetune", "--dataset", "SYNTH", "--hidden",
                          "16", "--epochs", "2", "--batch-size", "8",
                          "--test-times", "1",
                          "--library-capacity", "8192",
                          "--save-dir", str(workdir / "m"),
                          "--results-dir", str(workdir / "r")])
    out = json.load(open(workdir / "r" / "finetune_node_SYNTH.json"))
    assert np.isfinite(out["mean"])
    assert mean > 40.0  # well above 33% chance even with 2 epochs


def test_node_vanilla_graph_level(workdir):
    node_cli.main(["pretrain", "--dataset", "SYNTH", "--hidden", "16",
                   "--pretrain-epochs", "1", "--batch-size", "8",
                   "--save-dir", str(workdir / "m"),
                   "--results-dir", str(workdir / "r")])
    mean = node_cli.main(["vanilla", "--dataset", "SYNTH", "--level",
                          "graph", "--hidden", "16", "--batch-size", "8",
                          "--test-times", "1",
                          "--library-capacity", "4096",
                          "--save-dir", str(workdir / "m"),
                          "--results-dir", str(workdir / "r")])
    assert np.isfinite(mean)


def test_edge_pretrain_and_vanilla(workdir):
    edge_cli.main(["pretrain", "--data-path", "SYNTH", "--emb-size", "8",
                   "--epochs", "3", "--batch-size", "128",
                   "--save-dir", str(workdir / "s")])
    assert os.path.exists(workdir / "s" / "pretrain_RAGraph_SYNTH.pkl")
    recalls, ndcgs = edge_cli.main(
        ["vanilla", "--data-path", "SYNTH", "--emb-size", "8",
         "--save-dir", str(workdir / "s")])
    assert len(recalls) == 4
    assert all(np.isfinite(recalls))


def test_edge_staged_finetune(workdir):
    edge_cli.main(["pretrain", "--data-path", "SYNTH", "--emb-size", "8",
                   "--epochs", "2", "--batch-size", "128",
                   "--save-dir", str(workdir / "s")])
    result = edge_cli.main(
        ["finetune", "--data-path", "SYNTH", "--emb-size", "8",
         "--epochs", "2", "--batch-size", "128",
         "--save-dir", str(workdir / "s")])
    assert len(result.recalls) == 4
    out = json.load(open(workdir / "s" / "finetune_RAGraph_SYNTH.json"))
    assert np.isfinite(out["avg_recall"])


def test_fewshot_vanilla(workdir):
    from ragraph_tpu.cli import fewshot as fs_cli
    mean = fs_cli.main(["vanilla", "--dataset", "SYNTH", "--hidden", "16",
                        "--batch-size", "8", "--test-times", "1",
                        "--retrieve-num", "3",
                        "--library-capacity", "16384",
                        "--save-dir", str(workdir / "m"),
                        "--results-dir", str(workdir / "r")])
    assert np.isfinite(mean)
    assert mean > 33.0  # above chance


def test_fewshot_finetune_node(workdir):
    from ragraph_tpu.cli import fewshot as fs_cli
    mean = fs_cli.main(["finetune", "--dataset", "SYNTH", "--hidden", "16",
                        "--batch-size", "8", "--test-times", "1",
                        "--epochs", "2", "--retrieve-num", "3",
                        "--library-capacity", "16384",
                        "--save-dir", str(workdir / "m"),
                        "--results-dir", str(workdir / "r")])
    assert np.isfinite(mean)


def test_fewshot_finetune_graph_level(workdir):
    from ragraph_tpu.cli import fewshot as fs_cli
    mean = fs_cli.main(["finetune", "--dataset", "SYNTH", "--level",
                        "graph", "--hidden", "16", "--batch-size", "8",
                        "--test-times", "1", "--epochs", "2",
                        "--retrieve-num", "3",
                        "--library-capacity", "16384",
                        "--save-dir", str(workdir / "m"),
                        "--results-dir", str(workdir / "r")])
    assert np.isfinite(mean)
