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

__all__ = ["rollout", "rollout_scan"]


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


def rollout_scan(
    model: Aurora, params, batch: Batch, steps: int, host_offload: bool = False
) -> list[Batch]:
    """Whole-roll-out as ONE compiled ``lax.scan`` program.

    The history shift, per-step LoRA selection, variant hooks, and clamp gating all
    happen in-graph; the per-step absolute-time (and dynamic time-feature) encodings
    are precomputed host-side for every step and scanned over.

    ``host_offload=False`` stacks every step's prediction on device (fine for small
    models / few steps). ``host_offload=True`` bounds device memory at ONE step for
    any length: each step's prediction is shipped to host through an ordered
    ``io_callback`` inside the scan and the device carries only the rolling history
    (donated, so XLA reuses the buffers in place) — this is how the flagship 1.3 B
    0.25° model rolls out arbitrarily many steps on a 16 GB chip in a single
    compiled program (reference semantics: aurora/rollout.py:33-49, which yields to
    the caller per step instead).

    Matches :func:`rollout` step for step (tests/test_rollout.py).
    """
    import dataclasses as _dc
    import functools

    import jax
    import numpy as _np
    from aurora_tpu.model.aurora import forward_core

    cfg = model.cfg
    batch = model.batch_transform_hook(batch)
    batch = batch.crop(cfg.patch_size)

    # Mirror forward(): compute in the parameter dtype (encodings stay f32 for bf16
    # trees — the backbone casts internally), so scan and eager rollouts match for
    # bf16 (serving) and f64 (parity) parameter trees alike. Inferred from the
    # encoder subtree: the backbone may be stored bf16 (cast_backbone_params).
    ref_leaves = params["encoder"] if "encoder" in params else params
    dtype = jax.tree_util.tree_leaves(ref_leaves)[0].dtype
    enc_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

    # Per-step encodings: times advance by cfg.timestep each step.
    enc_steps = []
    md = batch.metadata
    for i in range(steps):
        md_i = _dc.replace(md, time=tuple(t + i * cfg.timestep for t in md.time))
        enc_steps.append(
            model.prepare_encodings(_dc.replace(batch, metadata=md_i), dtype=enc_dtype)
        )
    enc0 = enc_steps[0]
    abs_t = jnp.stack([e.absolute_time for e in enc_steps])  # (S, B, D)
    dyn = (
        jnp.stack([e.dynamic_scalars for e in enc_steps])
        if enc0.dynamic_scalars is not None
        else None
    )

    surf0 = {k: jnp.asarray(v, dtype) for k, v in batch.surf_vars.items()}
    static0 = {k: jnp.asarray(v, dtype) for k, v in batch.static_vars.items()}
    atmos0 = {k: jnp.asarray(v, dtype) for k, v in batch.atmos_vars.items()}
    levels = tuple(float(x) for x in md.atmos_levels)
    step0 = jnp.asarray(batch.metadata.rollout_step, jnp.int32)

    # Host-side store for the offload path, filled by the ordered io_callback as
    # the compiled scan executes.
    host_store: list = []

    def ship_to_host(surf_pred, atmos_pred):
        host_store.append(
            (
                {k: _np.asarray(v) for k, v in surf_pred.items()},
                {k: _np.asarray(v) for k, v in atmos_pred.items()},
            )
        )

    def make_scan_body(params_, static_, enc0_):
        def body(carry, xs):
            surf, atmos, step = carry
            abs_t_i, dyn_i = xs
            enc_i = _dc.replace(enc0_, absolute_time=abs_t_i, dynamic_scalars=dyn_i)
            surf_pred, atmos_pred = forward_core(
                params_, surf, static_, atmos, enc_i, step, levels, cfg
            )
            surf_next = {
                k: jnp.concatenate([surf[k][:, 1:], surf_pred[k][:, None]], axis=1)
                for k in surf
            }
            atmos_next = {
                k: jnp.concatenate([atmos[k][:, 1:], atmos_pred[k][:, None]], axis=1)
                for k in atmos
            }
            if host_offload:
                from jax.experimental import io_callback

                io_callback(ship_to_host, None, surf_pred, atmos_pred, ordered=True)
                out = None
            else:
                out = (surf_pred, atmos_pred)
            return (surf_next, atmos_next, step + 1), out

        if dyn is None:
            def body_nodyn(carry, xs):
                return body(carry, (xs[0], None))
            return body_nodyn
        return body

    xs = (abs_t, dyn if dyn is not None else jnp.zeros((steps, 1)))

    if host_offload:
        # Donate the rolling history so XLA updates the carry in place: device
        # memory stays at one step's working set for any number of steps. Fresh
        # copies are donated — the caller's batch arrays must survive. Params,
        # statics AND the step-0 encodings are explicit jit ARGUMENTS: closing
        # over them would bake them into the program as constants (the 2.8 GiB
        # param tree, and the (L, D) pos/scale encodings — ~0.27 GiB at 0.25°,
        # which alone overran the dev tunnel's compile request limit).
        @functools.partial(jax.jit, donate_argnums=(3,))
        def run(params_, static_, enc0_, carry, xs):
            final_carry, _ = jax.lax.scan(
                make_scan_body(params_, static_, enc0_), carry, xs, length=steps
            )
            return final_carry

        surf_d = {k: jnp.array(v) for k, v in surf0.items()}
        atmos_d = {k: jnp.array(v) for k, v in atmos0.items()}
        import os as _os

        if _os.environ.get("AURORA_SCAN_DEBUG_SIZE"):
            low = run.lower(params, static0, enc0, (surf_d, atmos_d, step0), xs)
            import sys as _sys

            print(
                f"rollout_scan lowered StableHLO: "
                f"{len(low.as_text()) / 2**20:.1f} MiB text",
                file=_sys.stderr, flush=True,
            )
        run(params, static0, enc0, (surf_d, atmos_d, step0), xs)
        jax.effects_barrier()
        assert len(host_store) == steps
        per_step = [
            ({k: v[:, None] for k, v in s.items()}, {k: v[:, None] for k, v in a.items()})
            for s, a in host_store
        ]
    else:
        (_, _, _), (surf_stack, atmos_stack) = jax.lax.scan(
            make_scan_body(params, static0, enc0), (surf0, atmos0, step0), xs,
            length=steps
        )
        per_step = [
            (
                {k: v[i][:, None] for k, v in surf_stack.items()},
                {k: v[i][:, None] for k, v in atmos_stack.items()},
            )
            for i in range(steps)
        ]

    preds = []
    for i, (s_i, a_i) in enumerate(per_step):
        preds.append(
            Batch(
                surf_vars=s_i,
                static_vars=dict(batch.static_vars),
                atmos_vars=a_i,
                metadata=_dc.replace(
                    md,
                    time=tuple(t + (i + 1) * cfg.timestep for t in md.time),
                    rollout_step=batch.metadata.rollout_step + i + 1,
                ),
            )
        )
    return preds
