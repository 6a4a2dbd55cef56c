#!/usr/bin/env python
"""Bisect the round-4 headline regression (VERDICT r4 next-round item #1).

BENCH_r03 measured the 1.3 B 0.25° production forward at 0.804 s/step; BENCH_r04
at 0.846-0.849 (+5.3%), with first-step compile 31.9 -> 183.5 s. Three round-4
changes are suspects:

  (i)  in-graph mask biases (9c0adfc) — the 142 MiB f32 bias constants became a
       where() over 1 MiB s32 id tables, possibly recomputed per block;
  (ii) f32 q/k perceiver modes (b8bd0a5) — correctness-mandatory (fixed a 20%
       production error), but its throughput cost was never isolated;
  (iii) fused agg-core routing (9bc0571) — the Pallas perceiver core won its
       microbench (1.17×) but the integrated effect is unmeasured.

This tool measures all arms in ONE session on the chip (same allocator state,
same tunnel), a fresh jit cache entry per arm (fresh functools.partial) so the
trace-time env hooks are re-read:

  head            — current defaults (in-graph masks, fused core routed, f32 q/k)
  mask_constants  — AURORA_MASK_CONSTANTS=1 (round-3 constant form)
  core_off        — AURORA_FUSE_PERCEIVER_CORE=0 (chunked-XLA perceiver core)
  both            — mask constants + core off (closest round-3-equivalent
                    still running the mandatory f32-q/k fix)

Compile time per arm is recorded from the first call (cold local jit cache per
arm; the persistent compile cache is redirected to a fresh temp dir unless
--keep-cache).  Output: one JSON line with per-arm steady s/step + compile s.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--keep-cache", action="store_true",
                    help="use the shared persistent compile cache (compile times "
                         "then measure cache hits, not compiles)")
    ap.add_argument("--arms", default="head,mask_constants,core_off,both")
    ap.add_argument("--layout", default="list", choices=["list", "stacked"],
                    help="block-param layout: 'stacked' = scan-over-blocks "
                         "(stack_block_params)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
        if args.keep_cache
        else tempfile.mkdtemp(prefix="bisect-jaxcache-")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from functools import partial

    from bench import LEVELS, make_numpy_batch
    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import (
        Aurora,
        cast_backbone_params,
        forward_core,
        init_params,
        stack_block_params,
    )
    from aurora_tpu.model.config import LARGE_CONFIG

    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True,
    )
    model = Aurora(cfg)
    print("initialising 1.3B params ...", file=sys.stderr, flush=True)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = cast_backbone_params(params)

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

    ARMS = {
        # Defaults (post-bisect): fused-core wrapper with the chunked-XLA primal.
        "head": {},
        "mask_constants": {"AURORA_MASK_CONSTANTS": "1"},
        # The round-4 routing: Pallas kernel primal for agg/f32-deagg geometries.
        "kernel_on": {"AURORA_PERCEIVER_USE_KERNEL": "1"},
        # Fused-core wrapper off entirely → the round-3 chunked lax.map path.
        "core_off": {"AURORA_FUSE_PERCEIVER_CORE": "0"},
        "both": {"AURORA_MASK_CONSTANTS": "1", "AURORA_FUSE_PERCEIVER_CORE": "0"},
        # Round-3 full-bf16 perceiver (the behaviour the b8bd0a5 correctness fix
        # removed), on the XLA core so the delta vs core_off prices the f32-q/k
        # split alone. PROBE-ONLY — wrong numerics by design.
        "bf16_qk": {
            "AURORA_UNSAFE_BF16_QK": "1",
            "AURORA_FUSE_PERCEIVER_CORE": "0",
        },
        # Single-shot (unchunked) XLA primal for the wrapper's non-kernel
        # geometries (bf16 de-agg): the 8-chunk lax.map exists for TRAIN
        # transients; inference has ~5 GiB to spare, and the loop costs
        # read/write per chunk. (REJECTED with data: +47 ms, bisect4.)
        "core_chunk1": {"AURORA_RESAMPLER_BWD_CHUNK": "65536"},
        # Scan-over-blocks with the body unrolled 2x: half the loop trips,
        # program text still depth/4 of inlined — does it buy back part of the
        # stacked layout's ~12 ms?
        "unroll2": {"AURORA_SCAN_UNROLL": "2"},
    }
    KNOBS = (
        "AURORA_RESAMPLER_BWD_CHUNK",
        "AURORA_SCAN_UNROLL",
        "AURORA_MASK_CONSTANTS",
        "AURORA_FUSE_PERCEIVER_CORE",
        "AURORA_PERCEIVER_USE_KERNEL",
        "AURORA_UNSAFE_BF16_QK",
    )

    stacked_params = None
    out = {"metric": "headline_bisect", "steps": args.steps,
           "cold_cache": not args.keep_cache}
    # An arm may carry a per-arm layout suffix: "core_off:stacked" measures that
    # arm with scan-over-blocks params in the SAME session (cross-session chip
    # noise is ~5%, so only same-session deltas are trustworthy).
    for arm_spec in args.arms.split(","):
        arm, _, arm_layout = arm_spec.partition(":")
        arm_layout = arm_layout or args.layout
        if arm_layout == "stacked" and stacked_params is None:
            stacked_params = stack_block_params(params)
        arm_params = stacked_params if arm_layout == "stacked" else params
        env = ARMS[arm]
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)

        fwd = jax.jit(partial(forward_core, atmos_levels=levels, cfg=cfg))

        def run_once(i):
            o = fwd(arm_params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32))
            leaf = jax.tree_util.tree_leaves(o)[0]
            return float(leaf[(0,) * leaf.ndim])

        t0 = time.time()
        run_once(0)
        compile_s = time.time() - t0
        times = []
        for i in range(args.steps):
            t0 = time.time()
            run_once(i)
            times.append(time.time() - t0)
        dt = min(times)
        key = arm_spec.replace(":", "_")
        print(
            f"{arm_spec}: {dt:.3f} s/step (compile {compile_s:.1f} s) "
            f"({[f'{t:.3f}' for t in times]})",
            file=sys.stderr, flush=True,
        )
        out[f"{key}_s_per_step"] = round(dt, 4)
        out[f"{key}_compile_s"] = round(compile_s, 1)
        out[f"{key}_times"] = [round(t, 4) for t in times]

    for k in KNOBS:
        os.environ.pop(k, None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
