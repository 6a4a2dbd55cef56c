"""Multi-step roll-out fine-tuning: train the per-step LoRA banks.

The released flagship checkpoints carry per-roll-out-step LoRA adapters
(``lora_mode='all'``: a different rank-8 adapter per step, selected in-graph by the
traced step index). The reference repository ships only a single-step loop
(finetuning/finetune.py) and leaves multi-step training to the user; here it is
first-class: :func:`aurora_tpu.training.train.make_rollout_train_step` backprops
through a K-step autoregressive roll-out as ONE rematerialised ``lax.scan`` —
activation memory stays at a single step regardless of K.

Run on a TPU VM:  python examples/finetune_rollout.py
"""

import dataclasses
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraPretrained, Batch, Metadata
from aurora_tpu.training.train import adamw, lora_mask, make_rollout_train_step

STEPS = 4  # roll-out depth to train through (1 day at 6 h)


def main():
    model = AuroraPretrained(autocast=True, remat=True, use_lora=True, lora_mode="all")
    cfg = model.cfg
    params = model.load_checkpoint(strict=False)  # fresh LoRA banks start at zero

    # --- data: replace with your ERA5/HRES loader (see docs/example_era5.ipynb).
    H, W, levels = 720, 1440, (100, 250, 500, 850)
    rng = np.random.default_rng(0)
    batch = Batch(
        surf_vars={k: rng.standard_normal((1, 2, H, W)).astype(np.float32) for k in cfg.surf_vars},
        static_vars={k: np.abs(rng.standard_normal((H, W))).astype(np.float32) for k in cfg.static_vars},
        atmos_vars={
            k: rng.standard_normal((1, 2, len(levels), H, W)).astype(np.float32)
            for k in cfg.atmos_vars
        },
        metadata=Metadata(
            lat=np.linspace(90, -90, H + 1)[:H],
            lon=np.linspace(0, 360, W, endpoint=False),
            time=(datetime(2021, 1, 1, 0),),
            atmos_levels=levels,
        ),
    ).crop(cfg.patch_size)
    # Target trajectory: (STEPS, B, ...) ground truth at t+6h, t+12h, ... — here zeros.
    B = 1
    tgt_surf = {k: jnp.zeros((STEPS, B, H, W), jnp.float32) for k in cfg.surf_vars}
    tgt_atmos = {
        k: jnp.zeros((STEPS, B, len(levels), H, W), jnp.float32) for k in cfg.atmos_vars
    }

    # Per-step encodings: absolute time advances each roll-out step.
    encs = []
    for i in range(STEPS):
        md_i = dataclasses.replace(
            batch.metadata, time=tuple(t + i * cfg.timestep for t in batch.metadata.time)
        )
        encs.append(model.prepare_encodings(dataclasses.replace(batch, metadata=md_i)))
    abs_t = jnp.stack([e.absolute_time for e in encs])  # (STEPS, B, D)

    surf = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
    atmos_levels = tuple(float(x) for x in levels)

    # LoRA-only: the base model stays frozen, only the per-step adapters train —
    # KBs of optimiser state instead of 2×1.3 B.
    optimizer = adamw(1e-4, trainable=lora_mask)
    opt_state = optimizer.init(params)
    train_step = make_rollout_train_step(
        cfg, optimizer, atmos_levels, STEPS, trainable=lora_mask
    )

    for it in range(10):
        params, opt_state, loss = train_step(
            params, opt_state, surf, static, atmos, encs[0], abs_t,
            jnp.asarray(0, jnp.int32), tgt_surf, tgt_atmos,
            rng=jax.random.PRNGKey(it),
        )
        print(f"iter {it}: rollout loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
