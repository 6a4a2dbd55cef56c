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

__all__ = [
    "mae_loss",
    "make_train_step",
    "make_rollout_train_step",
    "adamw",
    "lora_mask",
]


def lora_mask(params) -> dict:
    """Boolean pytree marking LoRA adapter leaves (``lora_qkv``/``lora_proj`` banks).

    Use with ``adamw(trainable=lora_mask)`` for the LoRA-only fine-tuning recipe:
    the base model stays frozen, only the per-rollout-step adapter banks train
    (reference contract: docs/finetuning.md "extending the model with LoRA").
    """

    def walk(tree, in_lora=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_lora or k.startswith("lora_")) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, in_lora) for v in tree]
        return in_lora

    return walk(params)


def adamw(
    lr: float = 3e-4,
    weight_decay: float = 0.0,
    accum_steps: int = 1,
    trainable=None,
) -> optax.GradientTransformation:
    """The reference fine-tuning optimiser (AdamW, 3e-4), with first-class extras:

    * ``trainable``: a params→bool-pytree callable (e.g. :func:`lora_mask`) — only
      marked leaves get optimiser state and updates (``optax.masked``), so a
      LoRA-only run carries ~KBs of AdamW moments instead of 2×1.3 B.
    * ``accum_steps``: gradient accumulation via ``optax.MultiSteps`` — parameters
      move every N micro-batches with the averaged gradient.
    """
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if trainable is not None:
        tx = optax.masked(tx, trainable)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


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
    trainable=None,
):
    """Build a jitted train step ``(params, opt_state, batch, targets, enc, step) →
    (params, opt_state, loss)`` with donated params/opt_state.

    Under an active ``jax.set_mesh`` context the step runs SPMD: batch sharded over
    ``data``, spatial dims over ``(lat, lon)``, gradient all-reduce inserted by XLA.

    ``trainable`` (params→bool-pytree, e.g. :func:`lora_mask`) stops gradients into
    frozen leaves so XLA dead-code-eliminates their backward pass — pass the same
    mask to :func:`adamw` so they get no optimiser state either.
    """

    def compute_loss(
        params, surf, static, atmos, enc, rollout_step, tgt_surf, tgt_atmos, rng
    ):
        if trainable is not None:
            mask = trainable(params)
            params = jax.tree_util.tree_map(
                lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
            )
        pred_surf, pred_atmos = forward_core(
            params, surf, static, atmos, enc, rollout_step, atmos_levels, cfg, rng=rng
        )
        return loss_fn(pred_surf, pred_atmos, tgt_surf, tgt_atmos)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(
        params, opt_state, surf, static, atmos, enc, rollout_step, tgt_surf,
        tgt_atmos, rng=None,
    ):
        """``rng``: per-step PRNG key for the stochastic training knobs
        (``cfg.drop_path`` / ``cfg.drop_rate``); ``None`` = deterministic step."""
        loss, grads = jax.value_and_grad(compute_loss)(
            params, surf, static, atmos, enc, rollout_step, tgt_surf, tgt_atmos, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_rollout_train_step(
    cfg: AuroraConfig,
    optimizer: optax.GradientTransformation,
    atmos_levels: tuple[float, ...],
    steps: int,
    loss_fn=mae_loss,
    trainable=None,
):
    """Build a train step that BACKPROPS THROUGH a ``steps``-step autoregressive
    roll-out — the regime that produces the per-roll-out-step LoRA banks
    (``lora_mode='all'``/``'from_second'``; reference ships only the single-step
    loop, finetuning/finetune.py:17-46, and tells users to build this themselves).

    The roll-out runs as one ``lax.scan`` whose body is rematerialised
    (``jax.checkpoint``): activation memory stays at ONE forward step regardless of
    ``steps``; the backward replays each step. Per-step losses against the target
    trajectory are averaged. The per-step absolute-time encodings arrive stacked
    ``(steps, B, D)`` (build them like :func:`aurora_tpu.rollout.rollout_scan`
    does, or pass ``enc`` with a leading step axis on ``absolute_time`` /
    ``dynamic_scalars``).

    Signature: ``(params, opt_state, surf, static, atmos, enc, abs_t_steps,
    rollout_step0, tgt_surf_steps, tgt_atmos_steps, rng=None, dyn_steps=None)``
    where targets have a leading ``steps`` axis, ``abs_t_steps`` is
    ``(steps, B, embed_dim)``, and ``dyn_steps`` is the per-step dynamic
    time-feature stack ``(steps, B, 6)`` — REQUIRED for ``cfg.dynamic_vars``
    models (air pollution), whose time-of-day/week/year features advance every
    roll-out step.
    """
    import dataclasses as _dc

    def compute_loss(
        params, surf, static, atmos, enc, abs_t_steps, step0, tgt_surf, tgt_atmos,
        rng, dyn_steps,
    ):
        if trainable is not None:
            mask = trainable(params)
            params = jax.tree_util.tree_map(
                lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
            )

        @jax.checkpoint
        def body(carry, xs):
            surf_c, atmos_c, step, i = carry
            abs_t_i, dyn_i, tgt_s, tgt_a = xs
            enc_i = _dc.replace(
                enc, absolute_time=abs_t_i,
                **({"dynamic_scalars": dyn_i} if dyn_i is not None else {}),
            )
            k = jax.random.fold_in(rng, i) if rng is not None else None
            pred_s, pred_a = forward_core(
                params, surf_c, static, atmos_c, enc_i, step, atmos_levels, cfg,
                rng=k,
            )
            loss_i = loss_fn(pred_s, pred_a, tgt_s, tgt_a)
            surf_n = {
                k2: jnp.concatenate([surf_c[k2][:, 1:], pred_s[k2][:, None]], axis=1)
                for k2 in surf_c
            }
            atmos_n = {
                k2: jnp.concatenate([atmos_c[k2][:, 1:], pred_a[k2][:, None]], axis=1)
                for k2 in atmos_c
            }
            return (surf_n, atmos_n, step + 1, i + 1), loss_i

        (_, _, _, _), losses = jax.lax.scan(
            body,
            (surf, atmos, step0, jnp.asarray(0, jnp.int32)),
            (abs_t_steps, dyn_steps, tgt_surf, tgt_atmos),
            length=steps,
        )
        return losses.mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(
        params, opt_state, surf, static, atmos, enc, abs_t_steps, rollout_step0,
        tgt_surf_steps, tgt_atmos_steps, rng=None, dyn_steps=None,
    ):
        if cfg.dynamic_vars and dyn_steps is None:
            raise ValueError(
                "cfg.dynamic_vars models need the per-step dynamic time features: "
                "pass dyn_steps of shape (steps, B, 6)."
            )
        loss, grads = jax.value_and_grad(compute_loss)(
            params, surf, static, atmos, enc, abs_t_steps, rollout_step0,
            tgt_surf_steps, tgt_atmos_steps, rng, dyn_steps,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
