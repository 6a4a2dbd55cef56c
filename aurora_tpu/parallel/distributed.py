"""Multi-host (pod) runtime initialisation.

On Cloud TPU pods, call :func:`initialize` once per host process before any jax API
use; the coordinator/process topology is discovered from the TPU environment
automatically. Replaces the reference's "bring your own torch.distributed" story
(SURVEY.md §2.5) with the jax.distributed runtime: ICI collectives inside a slice,
DCN across slices, no user-visible process groups.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["initialize", "is_multi_host", "local_device_count", "process_summary"]


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise the distributed runtime (no-op on a single host).

    With no arguments, topology is auto-detected from the TPU metadata; pass explicit
    values for CPU/GPU clusters or tests.
    """
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed runtime up: process %d/%d, %d local of %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        # Auto-detect on a single host (no TPU metadata) lands here, as does a
        # double initialise — both benign. A failure with *explicit* topology
        # arguments is a real pod misconfiguration: silently degrading to a
        # single-process runtime would produce per-host-divergent programs, so
        # fail fast instead.
        if explicit and "already initialized" not in str(e).lower():
            raise
        logger.info("distributed init skipped: %s", e)


def is_multi_host() -> bool:
    return jax.process_count() > 1


def local_device_count() -> int:
    return jax.local_device_count()


def process_summary() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
