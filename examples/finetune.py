"""Reference fine-tuning recipe (mirrors reference finetuning/finetune.py:17-46).

The reference trains the 1.3 B model on one 80 GB A100 with bf16 autocast + activation
checkpointing. The TPU equivalent: ``autocast=True`` (bf16 backbone) + ``remat=True``
(jax.checkpoint at the same block boundaries), AdamW via optax, and — unlike the
reference, which leaves model parallelism "to the user" — a ready-made sharded train
step over a ``Mesh(('data', 'lat', 'lon'))`` (see aurora_tpu/parallel).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraPretrained
from aurora_tpu.parallel.mesh import auto_mesh
from aurora_tpu.parallel.sharding import shard_batch_arrays, shard_params
from aurora_tpu.training.train import adamw, make_train_step

LEVELS = (100.0, 250.0, 500.0, 850.0)


def main():
    # remat_scope="no_outer" spends spare HBM on −8.8% step time at 0.25° B=1
    # (keeps stage+block checkpointing; see docs/finetuning.md).
    model = AuroraPretrained(autocast=True, remat=True, remat_scope="no_outer",
                             use_lora=False)
    # params = model.load_checkpoint()          # the released pretrained weights
    params = model.init(jax.random.PRNGKey(0))  # or from scratch

    optimizer = adamw(3e-4)
    train_step = make_train_step(model.cfg, optimizer, LEVELS)

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

    from aurora_tpu.batch import Batch, Metadata
    from datetime import datetime

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
            print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
