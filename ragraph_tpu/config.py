"""Unified typed experiment configuration.

The reference scatters hyperparameters across per-script argparse blocks,
hardcoded in-file constants and in-class knobs (SURVEY.md §5: e.g.
``RAGraph_node/finetune-rag.py:27-32``, ``RAGraph.py:18-19``,
``ToyGraphBase.py:18-29``, the global args singleton in
``RAGraph_edge/utils/parse_args.py``). Here every component already takes
a typed frozen dataclass (:class:`LibraryConfig`,
:class:`RAGraphNodeConfig`, :class:`EdgeModelConfig`, ...);
:class:`ExperimentConfig` binds them into one serializable record so a
whole run is reproducible from a single JSON file.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from ragraph_tpu.models.edge.base import EdgeModelConfig
from ragraph_tpu.rag.library import LibraryConfig


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = task + model + library + training knobs."""

    task: str = "node"            # node | graph | fewshot | edge
    dataset: str = "SYNTH"
    seed: int = 42
    # model
    emb_size: int = 256
    encoder_layers: int = 1
    num_class: int = 3
    retrieve_weight: float = 0.5
    label_weight: float = 0.5
    query_graph_hop: int = 3
    finetune: bool = True
    noise_finetune: bool = False
    # training
    batch_size: int = 16
    epochs: int = 50
    pretrain_epochs: int = 30
    lr: float = 1e-3
    test_times: int = 5
    library_capacity: int = 65536
    # nested component configs
    library: LibraryConfig = dataclasses.field(default_factory=LibraryConfig)
    edge: EdgeModelConfig = dataclasses.field(default_factory=EdgeModelConfig)

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path: str | None = None) -> str:
        s = json.dumps(self.to_dict(), indent=2, default=_jsonify)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        d = dict(d)
        if "library" in d and isinstance(d["library"], dict):
            d["library"] = LibraryConfig(**d["library"])
        if "edge" in d and isinstance(d["edge"], dict):
            ed = dict(d["edge"])
            for k in ("metrics", "metrics_k"):
                if k in ed and isinstance(ed[k], list):
                    ed[k] = tuple(ed[k])
            d["edge"] = EdgeModelConfig(**ed)
        return cls(**d)

    @classmethod
    def from_json(cls, s_or_path: str) -> "ExperimentConfig":
        if s_or_path.strip().startswith("{"):
            return cls.from_dict(json.loads(s_or_path))
        with open(s_or_path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kwargs) -> "ExperimentConfig":
        return dataclasses.replace(self, **kwargs)


def _jsonify(obj: Any):
    # json.dumps handles tuples natively (as lists); anything reaching
    # this hook is genuinely unserializable
    raise TypeError(f"not JSON-serializable: {obj!r}")
