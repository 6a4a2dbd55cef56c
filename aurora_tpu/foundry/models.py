"""Server-side model registry.

Re-design of the reference registry (reference: aurora/foundry/common/model.py): each
entry pairs a model wrapper class with a checkpoint artifact; ``run`` is the jitted
roll-out, with each prediction moved to host as it is produced. Device selection is
automatic (TPU when present, else CPU).
"""

from __future__ import annotations

import logging
from typing import Generator

import jax.numpy as jnp

from aurora_tpu.batch import Batch
from aurora_tpu.model import aurora as aurora_models
from aurora_tpu.rollout import rollout

__all__ = ["ServedModel", "models", "ARTIFACTS"]

logger = logging.getLogger(__name__)

# ``<name, artifact_path>`` entries pointing at checkpoint files on the server.
ARTIFACTS: dict[str, str] = {}


class ServedModel:
    """A named model + checkpoint that can serve roll-out requests."""

    name: str
    model_cls: type

    def __init__(self):
        self.model = self.model_cls()
        self.params = self._load_params()

    def _load_params(self):
        path = ARTIFACTS.get(self.name)
        if path is None:
            raise KeyError(f"No artifact registered for `{self.name}`.")
        if path.endswith(".ckpt"):
            from aurora_tpu.checkpoint import load_torch_checkpoint

            params = load_torch_checkpoint(path, self.model.cfg, dtype=jnp.float32)
        else:
            from aurora_tpu.checkpoint import restore_params

            params = restore_params(path)
        if self.model.cfg.autocast:
            # Serving memory: the backbone computes in bf16 under autocast, so bf16
            # STORAGE is bitwise-identical and halves the largest parameter block —
            # this is what fits the 0.1° model on a 16 GB chip (BASELINE.md).
            from aurora_tpu.model.aurora import cast_backbone_params

            params = cast_backbone_params(params)
        # Scan-over-blocks layout: bit-identical forward, ~4.5× less compiled
        # program text and minutes less compile latency per served geometry
        # (tests/test_scan_blocks.py, tools/headline_bisect.py --layout stacked).
        from aurora_tpu.model.aurora import stack_block_params

        params = stack_block_params(params)
        return params

    def run(self, batch: Batch, num_steps: int) -> Generator[Batch, None, None]:
        """Run the roll-out, yielding host-resident predictions."""
        for pred in rollout(self.model, self.params, batch, steps=num_steps):
            yield pred.to_numpy()


def _served(name: str, model_cls) -> type[ServedModel]:
    return type(
        f"Served_{model_cls.__name__}", (ServedModel,), {"name": name, "model_cls": model_cls}
    )


models: dict[str, type[ServedModel]] = {
    "aurora-0.25-finetuned": _served("aurora-0.25-finetuned", aurora_models.Aurora),
    "aurora-0.25-pretrained": _served("aurora-0.25-pretrained", aurora_models.AuroraPretrained),
    "aurora-0.25-small-pretrained": _served(
        "aurora-0.25-small-pretrained", aurora_models.AuroraSmallPretrained
    ),
    "aurora-0.25-12h-pretrained": _served(
        "aurora-0.25-12h-pretrained", aurora_models.Aurora12hPretrained
    ),
    "aurora-0.1-finetuned": _served("aurora-0.1-finetuned", aurora_models.AuroraHighRes),
    "aurora-0.4-air-pollution": _served(
        "aurora-0.4-air-pollution", aurora_models.AuroraAirPollution
    ),
    "aurora-0.25-wave": _served("aurora-0.25-wave", aurora_models.AuroraWave),
}
"""All served models by name (the reference's seven variants)."""
