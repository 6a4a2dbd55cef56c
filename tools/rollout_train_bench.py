#!/usr/bin/env python
"""K-step roll-out fine-tuning measured on the real chip.

The reference's production fine-tuning regime backprops through a short
autoregressive roll-out with per-roll-out-step LoRA banks (lora_mode "all" /
"from_second"; the reference ships only the single-step loop —
/root/reference/finetuning/finetune.py:17-46 — and leaves the roll-out loop to
the user). aurora_tpu ships it as :func:`make_rollout_train_step`: ONE jitted
program whose roll-out runs as a rematerialised ``lax.scan`` — activation
memory stays at one forward step regardless of K (training/train.py:141-232).
This tool records the first hardware datapoints: compiled peak HBM and s/step
for K ∈ {2, ...} at 0.5° (0.25° via --H/--W; use --compile-only to just
measure the envelope).

Usage: python tools/rollout_train_bench.py [--K 2] [--steps 3]
       [--H 361 --W 720] [--remat-scope full|no_outer|blocks] [--compile-only]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=2, help="roll-out steps to backprop through")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--H", type=int, default=361)
    ap.add_argument("--W", type=int, default=720)
    ap.add_argument("--remat-scope", choices=("full", "no_outer", "blocks"),
                    default="full")
    ap.add_argument("--lora-mode", choices=("all", "from_second"), default="all")
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--hbm-gate", type=float, default=15.2,
                    help="skip the timed run when compiled peak exceeds this (GiB)")
    args = ap.parse_args()
    if args.steps < 1:
        ap.error("--steps must be >= 1 (one warm-up iteration is always run)")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import LEVELS, make_numpy_batch, open_film_gates
    from aurora_tpu import cast_backbone_params
    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, init_params, stack_block_params
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.training.train import (
        adamw,
        lora_mask,
        make_rollout_train_step,
    )

    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True, lora_mode=args.lora_mode, remat=True,
        remat_scope=args.remat_scope,
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    # Open the adaLN-zero gates so LoRA gradients are nonzero (bench.open_film_gates).
    params = open_film_gates(params)
    params = cast_backbone_params(params)
    params = stack_block_params(params)

    data = make_numpy_batch(H=args.H, W=args.W)
    batch = Batch(
        surf_vars=data["surf"], static_vars=data["static"], atmos_vars=data["atmos"],
        metadata=Metadata(
            lat=data["lat"], lon=data["lon"], time=data["time"], atmos_levels=LEVELS
        ),
    ).crop(cfg.patch_size)

    # Per-step absolute-time encodings, stacked (K, B, D) — the same host-side
    # precompute rollout_scan does (aurora_tpu/rollout.py:85-99).
    md = batch.metadata
    enc_steps = [
        model.prepare_encodings(
            dataclasses.replace(
                batch,
                metadata=dataclasses.replace(
                    md, time=tuple(t + i * cfg.timestep for t in md.time)
                ),
            ),
            dtype=jnp.float32,
        )
        for i in range(args.K)
    ]
    enc0 = enc_steps[0]
    abs_t_steps = jnp.stack([e.absolute_time for e in enc_steps])

    surf = {k: jnp.asarray(v) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(v) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(v) for k, v in batch.atmos_vars.items()}
    levels = tuple(float(x) for x in LEVELS)
    # Persistence target trajectory: every step's target is the last input frame
    # (magnitudes only matter for timing/memory).
    tgt_surf = {k: jnp.stack([v[:, -1]] * args.K) for k, v in surf.items()}
    tgt_atmos = {k: jnp.stack([v[:, -1]] * args.K) for k, v in atmos.items()}

    optimizer = adamw(3e-4, trainable=lora_mask)
    train_step = make_rollout_train_step(
        cfg, optimizer, levels, steps=args.K, trainable=lora_mask
    )
    opt_state = optimizer.init(params)
    step0 = jnp.asarray(0, jnp.int32)

    t0 = time.time()
    lowered = train_step.lower(
        params, opt_state, surf, static, atmos, enc0, abs_t_steps, step0,
        tgt_surf, tgt_atmos,
    )
    compiled = lowered.compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()
    gib = 2.0**30
    peak = (
        ma.temp_size_in_bytes + ma.argument_size_in_bytes
        + ma.output_size_in_bytes - ma.alias_size_in_bytes
    ) / gib
    print(f"compile {compile_s:.1f} s, peak {peak:.2f} GiB", file=sys.stderr)

    out = {
        "metric": "rollout_train_step_lora",
        "grid": [args.H, args.W],
        "K": args.K,
        "lora_mode": args.lora_mode,
        "remat_scope": args.remat_scope,
        "compile_s": round(compile_s, 1),
        "peak_gib": round(peak, 3),
        "fits_16gb": peak < 15.75,
    }
    if args.compile_only:
        out["skipped"] = "--compile-only"
    elif peak > args.hbm_gate:
        out["skipped"] = f"peak {peak:.2f} GiB > gate {args.hbm_gate} (not timed)"
        print(f"SKIPPED run: {out['skipped']}", file=sys.stderr)
    if "skipped" not in out:
        times, losses = [], []
        for i in range(args.steps + 1):
            t0 = time.time()
            params, opt_state, loss = compiled(
                params, opt_state, surf, static, atmos, enc0, abs_t_steps,
                jnp.asarray(0, jnp.int32), tgt_surf, tgt_atmos,
            )
            losses.append(float(loss))
            times.append(time.time() - t0)
        out.update(
            s_per_update=round(min(times[1:]), 4),
            s_per_rollout_step=round(min(times[1:]) / args.K, 4),
            times=[round(t, 3) for t in times],
            loss_first=round(losses[0], 4),
            loss_last=round(losses[-1], 4),
        )
        print(
            f"K={args.K}: {out['s_per_update']} s/update "
            f"({out['s_per_rollout_step']} s per roll-out step), "
            f"loss {losses[0]:.2f} -> {losses[-1]:.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
