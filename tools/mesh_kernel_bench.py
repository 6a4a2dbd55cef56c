#!/usr/bin/env python
"""Mesh-mode per-chip throughput on real hardware (VERDICT r2 weak #1 'done' item).

Only one physical chip is available, so multi-chip time cannot be measured directly.
This tool measures the next-best evidence: the SAME 1.3 B 0.25° forward under an
active ``make_mesh(1, 1, 1)`` — all the mesh machinery (sharding constraints, the
shard_map'd fused kernels, GSPMD partitioning) at degree 1 — against the no-mesh
single-chip fast path. Round 2 turned every Pallas kernel off under a mesh, so the
mesh run regressed to the unfused path (~1.5-2x); round 3's shard_map kernels should
bring the two within a few percent. Halo-exchange cost at degree > 1 is bounded
separately in docs/parallel.md (thin strips over ICI, <1%/step at 8 chips).

Usage: python tools/mesh_kernel_bench.py [--steps 3]
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
    args = ap.parse_args()

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
    from aurora_tpu.parallel.mesh import make_mesh
    from aurora_tpu.parallel.sharding import shard_batch_arrays, replicate

    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True,
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    data = make_numpy_batch()
    from datetime import datetime

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
    fwd = jax.jit(partial(forward_core, atmos_levels=levels, cfg=cfg))

    def run_once(i):
        out = fwd(params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf[(0,) * leaf.ndim])

    def time_steps(label):
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

    dt_plain = time_steps("no mesh (single-chip fast path)")

    mesh = make_mesh(data=1, lat=1, lon=1)
    with jax.set_mesh(mesh):
        params_m = replicate(params, mesh)
        surf_m, static_m, atmos_m = shard_batch_arrays(surf, static, atmos, mesh)
        params, surf, static, atmos = params_m, surf_m, static_m, atmos_m
        dt_mesh = time_steps("mesh(1,1,1) (shard_map'd kernels)")

    gp = (args.H - 1) * args.W
    print(json.dumps({
        "metric": "mesh_mode_per_chip",
        "no_mesh_s_per_step": round(dt_plain, 4),
        "mesh_s_per_step": round(dt_mesh, 4),
        "mesh_overhead": round(dt_mesh / dt_plain - 1, 4),
        "mesh_grid_points_per_s": round(gp / dt_mesh, 1),
    }))


if __name__ == "__main__":
    main()
