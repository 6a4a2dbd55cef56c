#!/usr/bin/env python
"""Hardware cost of the mesh over-padding geometry (VERDICT r3 weak #2 'done' item).

Round 4 keeps the fused Pallas kernels ON for shard-misaligned grids by over-padding
the token grid to window × mesh multiples with whole pad-only windows
(model/swin3d.py `swin_block_apply`). The flagship example is the SERVING shape —
B=1, 0.25° (token grid 180×360) over 8 chips — where round 3 silently fell back to
unfused XLA on every block (~1.5-2× per chip by the perf ledger).

Only one physical chip is available, so this tool measures the pure geometry cost:
the SAME 1.3 B 0.25° production forward with ``AURORA_FORCE_OVERPAD=lat,lon`` (the
trace-time hook that applies a mesh factorization's over-padding on a single chip)
vs the unpadded baseline. The pad tokens flow through every kernel exactly as they
would per shard at degree N, so the relative overhead measured here is the per-chip
compute cost the mesh pays to keep the kernels fused. Target: < 2 % for (1, 8),
against the ~1.5-2× cost of the unfused fallback it replaces.

Usage: python tools/overpad_bench.py [--steps 3] [--geom 1,8 --geom 2,4]
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
    ap.add_argument(
        "--geom", action="append", default=None,
        help="lat,lon mesh geometry to over-pad for (repeatable); default 1,8 and 2,4",
    )
    args = ap.parse_args()
    geoms = args.geom or ["1,8", "2,4"]

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

    from functools import partial

    from bench import LEVELS, make_numpy_batch
    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, forward_core, init_params
    from aurora_tpu.model.config import LARGE_CONFIG

    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True,
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    data = make_numpy_batch()

    batch = Batch(
        surf_vars=data["surf"], static_vars=data["static"], atmos_vars=data["atmos"],
        metadata=Metadata(
            lat=data["lat"], lon=data["lon"], time=data["time"], atmos_levels=LEVELS
        ),
    ).crop(cfg.patch_size)
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    surf = {k: jnp.asarray(v) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(v) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(v) for k, v in batch.atmos_vars.items()}
    levels = tuple(float(x) for x in LEVELS)

    def time_steps(label):
        # A fresh partial → a fresh jit cache entry, so the env hook is re-read
        # at trace time.
        fwd = jax.jit(partial(forward_core, atmos_levels=levels, cfg=cfg))

        def run_once(i):
            out = fwd(params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(leaf[(0,) * leaf.ndim])

        run_once(0)
        times = []
        for i in range(args.steps):
            t0 = time.time()
            run_once(i)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{label}: {dt:.3f} s/step ({[f'{t:.3f}' for t in times]})",
              file=sys.stderr)
        return dt

    os.environ.pop("AURORA_FORCE_OVERPAD", None)
    dt_base = time_steps("baseline (no over-padding)")

    out = {
        "metric": "overpad_cost",
        "base_s_per_step": round(dt_base, 4),
    }
    for geom in geoms:
        os.environ["AURORA_FORCE_OVERPAD"] = geom
        dt = time_steps(f"over-padded for mesh (1, {geom.replace(',', ', ')})")
        key = geom.replace(",", "x")
        out[f"overpad_{key}_s_per_step"] = round(dt, 4)
        out[f"overpad_{key}_overhead"] = round(dt / dt_base - 1, 4)
    os.environ.pop("AURORA_FORCE_OVERPAD", None)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
