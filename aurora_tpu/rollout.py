"""Autoregressive roll-out.

Reference behaviour: aurora/rollout.py:14-49. TPU-native notes: every step reuses the
same jitted forward core (the roll-out step is traced, so LoRA-per-step selection does
not recompile), and the history shift is a device-side concat. The generator yields
predictions as they are produced; callers that keep many steps should move them to host
(`pred.to_numpy()`) to bound device memory, exactly like the reference documents.
"""

from __future__ import annotations

import dataclasses
from typing import Generator

import jax.numpy as jnp

from aurora_tpu.batch import Batch
from aurora_tpu.model.aurora import Aurora

__all__ = ["rollout"]


def rollout(model: Aurora, params, batch: Batch, steps: int) -> Generator[Batch, None, None]:
    """Roll the model out for ``steps`` steps, yielding the prediction after each step."""
    # Ensure the batch is in its model form before we start concatenating history.
    batch = model.batch_transform_hook(batch)
    batch = batch.crop(model.cfg.patch_size)

    for _ in range(steps):
        pred = model.forward(params, batch)
        yield pred

        batch = dataclasses.replace(
            pred,
            surf_vars={
                k: jnp.concatenate([jnp.asarray(batch.surf_vars[k])[:, 1:], v], axis=1)
                for k, v in pred.surf_vars.items()
            },
            atmos_vars={
                k: jnp.concatenate([jnp.asarray(batch.atmos_vars[k])[:, 1:], v], axis=1)
                for k, v in pred.atmos_vars.items()
            },
        )
