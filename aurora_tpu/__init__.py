"""aurora_tpu: a TPU-native JAX/XLA/Pallas framework for Earth-system foundation models.

A from-scratch re-design of the capabilities of the reference release (microsoft/aurora)
for TPU hardware: functional parameter pytrees, a single jitted forward core, host-side
float64 encoding precompute, GSPMD/shard_map multi-chip parallelism, and Pallas kernels
on the hot paths.
"""

from aurora_tpu import metrics
from aurora_tpu.batch import Batch, Metadata
from aurora_tpu.model.aurora import (
    Aurora,
    Aurora12hPretrained,
    AuroraAirPollution,
    AuroraHighRes,
    AuroraPretrained,
    AuroraSmall,
    AuroraSmallPretrained,
    AuroraWave,
    cast_backbone_params,
    stack_block_params,
)
from aurora_tpu.model.config import AuroraConfig
from aurora_tpu.rollout import rollout, rollout_scan
from aurora_tpu.tracker import Tracker

__all__ = [
    "Aurora",
    "AuroraPretrained",
    "AuroraSmallPretrained",
    "AuroraSmall",
    "Aurora12hPretrained",
    "AuroraHighRes",
    "AuroraAirPollution",
    "AuroraWave",
    "AuroraConfig",
    "Batch",
    "Metadata",
    "Tracker",
    "rollout",
    "rollout_scan",
    "cast_backbone_params",
    "stack_block_params",
    "metrics",
]
