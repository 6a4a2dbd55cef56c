"""LoRA-only fine-tuning recipe: freeze the 1.3 B base, train the adapter banks.

The reference ships LoRA adapters in its checkpoints but leaves training them to the
user (reference docs/finetuning.md "Extending Aurora with LoRA" + lora.py). Here it
is a two-line change from the full fine-tune (examples/finetune.py):

* ``adamw(trainable=lora_mask)`` — only LoRA leaves get AdamW moments/updates
  (~6 M params instead of 1.3 B: the optimiser state drops from ~10 GB to ~50 MB);
* ``make_train_step(..., trainable=lora_mask)`` — gradients into frozen leaves are
  stopped, so XLA prunes their backward pass.

Gradient accumulation (``accum_steps``) composes freely for large effective batches.
"""

from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraPretrained
from aurora_tpu.batch import Batch, Metadata
from aurora_tpu.parallel.mesh import auto_mesh
from aurora_tpu.parallel.sharding import shard_batch_arrays, shard_params
from aurora_tpu.training.train import adamw, lora_mask, make_train_step

LEVELS = (100.0, 250.0, 500.0, 850.0)


def main():
    model = AuroraPretrained(autocast=True, remat=True, use_lora=True)
    # params = model.load_checkpoint()          # released weights (LoRA included)
    params = model.init(jax.random.PRNGKey(0))  # or from scratch
    # Scan-over-blocks layout: this is what fits the full 0.25° LoRA fine-tune
    # step on ONE 16 GiB chip (13.38 GiB peak — TRAIN_BENCH.json; the reference
    # recipe needs an 80 GB A100).
    from aurora_tpu import stack_block_params

    params = stack_block_params(params)

    optimizer = adamw(1e-3, trainable=lora_mask, accum_steps=2)
    train_step = make_train_step(model.cfg, optimizer, LEVELS, trainable=lora_mask)

    mesh = auto_mesh(len(jax.devices()))
    B, T, H, W = max(1, int(mesh.shape["data"])), 2, 96, 192
    rng = np.random.default_rng(0)
    surf = {k: jnp.asarray(rng.standard_normal((B, T, H, W)), jnp.float32)
            for k in model.cfg.surf_vars}
    static = {k: jnp.asarray(np.abs(rng.standard_normal((H, W))), jnp.float32)
              for k in model.cfg.static_vars}
    atmos = {k: jnp.asarray(rng.standard_normal((B, T, len(LEVELS), H, W)), jnp.float32)
             for k in model.cfg.atmos_vars}
    tgt_surf = {k: v[:, -1] for k, v in surf.items()}
    tgt_atmos = {k: v[:, -1] for k, v in atmos.items()}

    batch = Batch(
        surf_vars=surf, static_vars=static, atmos_vars=atmos,
        metadata=Metadata(
            lat=np.linspace(90, -90, H + 1)[:H], lon=np.linspace(0, 360, W, endpoint=False),
            time=tuple(datetime(2020, 6, 1, 12) for _ in range(B)), atmos_levels=LEVELS,
        ),
    )
    enc = model.prepare_encodings(batch)
    step = jnp.asarray(0, jnp.int32)

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        surf, static, atmos = shard_batch_arrays(surf, static, atmos, mesh)
        for i in range(10):
            params, opt_state, loss = train_step(
                params, opt_state, surf, static, atmos, enc, step, tgt_surf, tgt_atmos
            )
            print(f"micro-step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
