#!/usr/bin/env python
"""Same-session A/B of train-step speed levers at 0.25° on the real chip.

The round-5 scan-over-blocks layout dropped the 1.3 B 0.25° LoRA train step to
13.38 GiB peak on a 15.75 GiB v5e (TRAIN_BENCH.json) — leaving ~2.4 GiB of HBM
headroom. This probe spends that headroom on speed, two levers at a time:

1. ``cfg.remat_scope``: the reference's FULL nested checkpoint list (encoder/
   decoder + whole backbone + stage + block) replays the forward ~3× in the
   backward. "no_outer" / "blocks" drop the outer wraps level by level — each
   dropped level removes one forward replay and keeps that level's activations
   resident instead.
2. Backward chunk budgets (``AURORA_BWD_CHUNK_MIB`` attention, default 192;
   ``AURORA_MLP_BWD_CHUNK_MIB`` MLP, default 256; ``AURORA_RESAMPLER_BWD_CHUNK``
   de-agg columns, default 8192): round 4 sized these for the inlined layout's
   17.5 GiB squeeze; larger chunks = fewer scan iterations re-streaming weights.

Every arm compiles in THIS process and is memory-gated (compile-measured peak
< --hbm-gate before running); a repeat of the base arm controls for the shared
dev chip's tenancy drift (~6%, tools/headline_bisect.py). Output:
TRAIN_SPEED_PROBE.json.

Usage: python tools/train_speed_probe.py [--steps 3] [--H 721 --W 1440]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--H", type=int, default=721)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument("--hbm-gate", type=float, default=15.2)
    ap.add_argument("--arms", default="base,no_outer,blocks,blocks_chunks,base2")
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
    from aurora_tpu.training.train import adamw, lora_mask, make_train_step

    base_cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True, remat=True,
    )
    model = Aurora(base_cfg)
    params = init_params(jax.random.PRNGKey(0), base_cfg, dtype=jnp.float32)

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
    ).crop(base_cfg.patch_size)
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    surf = {k: jnp.asarray(v) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(v) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(v) for k, v in batch.atmos_vars.items()}
    levels = tuple(float(x) for x in LEVELS)
    tgt_surf = {k: v[:, -1] for k, v in surf.items()}
    tgt_atmos = {k: v[:, -1] for k, v in atmos.items()}

    optimizer = adamw(3e-4, trainable=lora_mask)
    opt_state = optimizer.init(params)

    CHUNK_VARS = (
        "AURORA_BWD_CHUNK_MIB", "AURORA_MLP_BWD_CHUNK_MIB", "AURORA_RESAMPLER_BWD_CHUNK",
    )
    ARMS = {
        "base": ("full", {}),
        "no_outer": ("no_outer", {}),
        "blocks": ("blocks", {}),
        "blocks_chunks": (
            "blocks",
            {
                "AURORA_BWD_CHUNK_MIB": "768",
                "AURORA_MLP_BWD_CHUNK_MIB": "768",
                "AURORA_RESAMPLER_BWD_CHUNK": "32768",
            },
        ),
        "no_outer_chunks": (
            "no_outer",
            {
                "AURORA_BWD_CHUNK_MIB": "384",
                "AURORA_MLP_BWD_CHUNK_MIB": "512",
                "AURORA_RESAMPLER_BWD_CHUNK": "16384",
            },
        ),
        "full_chunks": (
            "full",
            {
                "AURORA_BWD_CHUNK_MIB": "768",
                "AURORA_MLP_BWD_CHUNK_MIB": "768",
                "AURORA_RESAMPLER_BWD_CHUNK": "32768",
            },
        ),
        # remat OFF entirely — viable at 0.5°, where the full-remat step peaks
        # at only 5.8 GiB of the chip's 15.75 (TRAIN_BENCH.json).
        "none": (None, {}),
        "base2": ("full", {}),
    }

    gib = 2.0**30
    results = []
    # Default (0.25°) grid keeps the canonical name; other grids get a suffix so
    # runs at multiple resolutions don't clobber each other's artifacts.
    suffix = "" if (args.H, args.W) == (721, 1440) else f"_{args.H}x{args.W}"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        f"TRAIN_SPEED_PROBE{suffix}.json")

    def flush():
        with open(path, "w") as f:
            json.dump(
                {
                    "date": time.strftime("%Y-%m-%d"),
                    "grid": [args.H, args.W],
                    "recipe": "LoRA fine-tune step, scan-over-blocks, bf16 backbone",
                    "loss_note": (
                        "params/opt_state carry through ALL arms (re-uploading "
                        "5.2 GB per arm through the tunnel would dwarf the "
                        "measurement), so the per-arm losses form ONE continuing "
                        "training trajectory; only the TIMINGS compare across "
                        "arms (that is what the base2 regime control checks)."
                    ),
                    "arms": results,
                },
                f, indent=1,
            )

    for arm in args.arms.split(","):
        scope, env = ARMS[arm]
        for k in CHUNK_VARS:
            os.environ.pop(k, None)
        os.environ.update(env)
        cfg = (
            base_cfg.replace(remat=False)
            if scope is None
            else base_cfg.replace(remat_scope=scope)
        )
        train_step = make_train_step(cfg, optimizer, levels, trainable=lora_mask)
        step0 = jnp.asarray(0, jnp.int32)
        t0 = time.time()
        try:
            lowered = train_step.lower(
                params, opt_state, surf, static, atmos, enc, step0, tgt_surf, tgt_atmos
            )
            compiled = lowered.compile()
        except Exception as e:  # e.g. the remote compiler's own HBM-capacity check
            import re

            # The tunnel's error lines carry ANSI colour escapes + timestamps;
            # strip them so the JSON artifact stays machine-readable.
            msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
            m = [ln for ln in msg.splitlines() if "memory" in ln.lower()][:1]
            rec = {
                "arm": arm, "remat_scope": scope, "env": env,
                "compile_error": (m[0].strip() if m else msg[:200]),
            }
            print(f"[{arm}] COMPILE FAILED: {rec['compile_error']}", file=sys.stderr)
            results.append(rec)
            flush()
            continue
        compile_s = time.time() - t0
        ma = compiled.memory_analysis()
        peak = (
            ma.temp_size_in_bytes + ma.argument_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes
        ) / gib
        rec = {
            "arm": arm,
            "remat_scope": scope,
            "env": env,
            "compile_s": round(compile_s, 1),
            "peak_gib": round(peak, 3),
            "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        }
        print(f"[{arm}] compile {compile_s:.1f}s peak {peak:.2f} GiB", file=sys.stderr)
        if peak > args.hbm_gate:
            rec["skipped"] = f"peak {peak:.2f} GiB > gate {args.hbm_gate}"
            print(f"[{arm}] SKIPPED: {rec['skipped']}", file=sys.stderr)
            results.append(rec)
            flush()
            continue

        times, losses = [], []
        for i in range(args.steps + 1):
            t0 = time.time()
            params, opt_state, loss = compiled(
                params, opt_state, surf, static, atmos, enc,
                jnp.asarray(i % 3, jnp.int32), tgt_surf, tgt_atmos,
            )
            losses.append(float(loss))  # fetches → syncs
            times.append(time.time() - t0)
        rec.update(
            s_per_step=round(min(times[1:]), 4),
            times=[round(t, 3) for t in times],
            loss_first=round(losses[0], 4),
            loss_last=round(losses[-1], 4),
        )
        print(
            f"[{arm}] {rec['s_per_step']} s/step  losses {losses[0]:.2f}->{losses[-1]:.2f}",
            file=sys.stderr,
        )
        results.append(rec)
        flush()

    for k in CHUNK_VARS:
        os.environ.pop(k, None)
    with open(path) as f:
        print(f.read())


if __name__ == "__main__":
    main()
