"""Fine-tuning / training: optax optimiser + jitted, sharded train step.

Replaces the reference's user-owned 45-line loop (reference: finetuning/finetune.py)
with a first-class training path: AdamW, latitude-weighted MAE loss, buffer donation,
bf16 autocast backbone, and ``jax.checkpoint`` rematerialisation at the same module
boundaries as the reference's activation checkpointing (aurora.py:506-547; enable with
``cfg.replace(remat=True)``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from aurora_tpu.model.aurora import forward_core
from aurora_tpu.model.config import AuroraConfig

__all__ = ["mae_loss", "make_train_step", "adamw"]


def adamw(lr: float = 3e-4, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """The reference fine-tuning optimiser (AdamW, 3e-4)."""
    return optax.adamw(lr, weight_decay=weight_decay)


def mae_loss(pred_surf, pred_atmos, tgt_surf, tgt_atmos, lat_weights=None):
    """Mean absolute error over all variables, optionally latitude-weighted.

    ``lat_weights`` has shape ``(H,)`` (proportional to cell area); weighting is the
    standard verification convention for global grids.
    """
    total = 0.0
    count = 0
    for k, p in pred_surf.items():
        err = jnp.abs(p - tgt_surf[k])
        if lat_weights is not None:
            err = err * lat_weights[:, None]
        total = total + err.mean()
        count += 1
    for k, p in pred_atmos.items():
        err = jnp.abs(p - tgt_atmos[k])
        if lat_weights is not None:
            err = err * lat_weights[:, None]
        total = total + err.mean()
        count += 1
    return total / count


def make_train_step(
    cfg: AuroraConfig,
    optimizer: optax.GradientTransformation,
    atmos_levels: tuple[float, ...],
    loss_fn=mae_loss,
):
    """Build a jitted train step ``(params, opt_state, batch, targets, enc, step) →
    (params, opt_state, loss)`` with donated params/opt_state.

    Under an active ``jax.set_mesh`` context the step runs SPMD: batch sharded over
    ``data``, spatial dims over ``(lat, lon)``, gradient all-reduce inserted by XLA.
    """

    def compute_loss(params, surf, static, atmos, enc, rollout_step, tgt_surf, tgt_atmos):
        pred_surf, pred_atmos = forward_core(
            params, surf, static, atmos, enc, rollout_step, atmos_levels, cfg
        )
        return loss_fn(pred_surf, pred_atmos, tgt_surf, tgt_atmos)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, surf, static, atmos, enc, rollout_step, tgt_surf, tgt_atmos):
        loss, grads = jax.value_and_grad(compute_loss)(
            params, surf, static, atmos, enc, rollout_step, tgt_surf, tgt_atmos
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
