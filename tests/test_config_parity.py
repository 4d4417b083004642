"""Config-constant parity: our typed defaults must equal the reference's
documented knob values (cited file:line in each config's docstring)."""

from ragraph_tpu.models import (FEWSHOT_GRAPH_WEIGHTS, FEWSHOT_NODE_WEIGHTS,
                                GRAPH_FUSION_WEIGHTS, RAGraphGraphConfig,
                                RAGraphNodeConfig, fewshot_library_config,
                                graph_library_config)
from ragraph_tpu.models.edge import EDGE_DATASET_CONFIGS, EdgeModelConfig
from ragraph_tpu.rag import LibraryConfig


def test_node_library_defaults():
    """RAGraph_node/ragraph_utils/ToyGraphBase.py:18-32."""
    cfg = LibraryConfig()
    assert cfg.num_inverse_sample == 10
    assert cfg.num_augment_scale == 3
    assert cfg.noise_retrieve_num == 1
    assert cfg.num_anchors == 10
    assert cfg.dis_q == 10
    assert cfg.semantic_weight == 0.999
    assert cfg.structure_weight == 0.0   # commented out in node variant


def test_node_model_defaults():
    """RAGraph_node/RAGraph.py:18-26."""
    cfg = RAGraphNodeConfig()
    assert cfg.retrieve_weight == 0.5
    assert cfg.label_weight == 0.5
    assert cfg.query_graph_hop == 3
    assert cfg.library.toy_graph_hop == cfg.query_graph_hop - 1


def test_graph_library_defaults():
    """RAGraph_graph/ragraph_utils/ToyGraphBase.py:21-28."""
    cfg = graph_library_config(num_class=3)
    assert cfg.level == "graph"
    assert cfg.num_inverse_sample == 0
    assert cfg.num_augment_scale == 0
    assert cfg.retrieve_num == min(3, 3 + 1)
    assert cfg.noise_mode == "gaussian"
    assert cfg.noise_std == 0.01


def test_graph_model_defaults():
    """RAGraph_graph/RAGraph.py:25-33 (active weights 0.3/0.3, hop 1)."""
    cfg = RAGraphGraphConfig()
    assert cfg.retrieve_weight == 0.3
    assert cfg.label_weight == 0.3
    assert cfg.query_graph_hop == 1
    # per-dataset table (RAGraph_graph/RAGraph.py:15-24)
    assert GRAPH_FUSION_WEIGHTS["BZR"] == (0.1, 0.5)
    assert GRAPH_FUSION_WEIGHTS["COX2"] == (0.3, 0.6)
    assert GRAPH_FUSION_WEIGHTS["PROTEINS"] == (0.5, 0.5)
    assert GRAPH_FUSION_WEIGHTS["ENZYMES"] == (0.3, 0.8)


def test_fewshot_defaults():
    """RAGraph_node_fewshot/ragraph_utils/ToyGraphBase.py:17-29 and
    RAGraph.py:24-33 / RAGraph_graph_fewshot/RAGraph.py:15-29."""
    cfg = fewshot_library_config()
    assert cfg.num_inverse_sample == 10
    assert cfg.num_augment_scale == 3
    assert cfg.structure_weight == 0.001
    assert cfg.semantic_weight == 0.999
    assert FEWSHOT_NODE_WEIGHTS == {"ENZYMES": (0.5, 0.5),
                                    "PROTEINS": (0.3, 0.8)}
    assert FEWSHOT_GRAPH_WEIGHTS["ENZYMES"] == (0.3, 0.8)
    assert FEWSHOT_GRAPH_WEIGHTS["BZR"] == (0.1, 0.5)


def test_edge_defaults():
    """RAGraph_edge/utils/parse_args.py:20-45."""
    cfg = EdgeModelConfig()
    assert cfg.emb_size == 64
    assert cfg.num_layers == 3
    assert cfg.edge_dropout == 0.5
    assert cfg.batch_size == 2048
    assert cfg.eval_batch_size == 512
    assert cfg.lr == 1e-3
    assert cfg.weight_decay == 1e-4
    assert cfg.early_stop_patience == 10
    assert cfg.metrics == ("recall", "ndcg")
    assert cfg.metrics_k == (20,)
    assert cfg.lora_rank == 16       # modules/RAGraph.py:20
    assert cfg.n_negs == 16          # parse_args.py:62


def test_edge_dataset_table():
    """modules/RAGraph.py:33-85 per-dataset knobs."""
    am = EDGE_DATASET_CONFIGS["amazon"]
    assert am["retrieve_weight"] == 0.3
    assert am["vanilla"]["retrieve_num"] == 50
    assert am["vanilla"]["rag_chunk"] == 32768
    assert am["finetune"]["retrieve_num"] == 10
    for name in ("koubei", "taobao"):
        d = EDGE_DATASET_CONFIGS[name]
        assert d["vanilla"]["retrieve_num"] == 100000
        assert d["vanilla"]["rag_chunk"] == 512
        assert d["finetune"]["retrieve_num"] == 20
        assert d["vanilla"]["num_augment_scale"] == 1


def test_edge_config_rejects_dtype_typos():
    # Programmatic typos must fail at construction, not silently fall
    # back to the default tier (ADVICE r3): every consumer string-matches.
    import dataclasses
    import pytest
    with pytest.raises(ValueError, match="selection_dtype"):
        EdgeModelConfig(selection_dtype="bf-16")
    with pytest.raises(ValueError, match="retrieve_dtype"):
        EdgeModelConfig(retrieve_dtype="int-8")
    ok = EdgeModelConfig(selection_dtype="bf16", retrieve_dtype="int8")
    # dataclasses.replace re-runs the validation too
    with pytest.raises(ValueError):
        dataclasses.replace(ok, selection_dtype="fp32")
