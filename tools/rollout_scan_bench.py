#!/usr/bin/env python
"""Hardware datapoint for `rollout_scan(host_offload=True)` (VERDICT r3 #7).

Runs the flagship 1.3 B 0.25° production config as ONE compiled lax.scan
roll-out with per-step host offload and records steps/s plus the compiled peak
memory — proving the "arbitrarily many steps at one-step device memory in a
single program" claim (rollout.py:56-62) on the chip rather than CPU. On the
tunnelled dev runtime each io_callback pays the tunnel RTT; on directly-attached
hosts that cost disappears (noted in the output).

Usage: python tools/rollout_scan_bench.py [--steps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--H", type=int, default=721)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument(
        "--no-offload", action="store_true",
        help="device-resident predictions (the tunnelled dev runtime does not "
             "support host callbacks: an io_callback program — even a trivial "
             "one — hangs in remote compile and errors UNAVAILABLE after ~25 "
             "min, measured 2026-08-20; 10 steps of 0.25° predictions are "
             "~2.9 GB, well within HBM)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from datetime import datetime

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import LEVELS, make_numpy_batch
    from aurora_tpu import cast_backbone_params
    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, init_params, stack_block_params
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.rollout import rollout_scan

    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
        use_lora=True,
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = stack_block_params(cast_backbone_params(params))

    import bench as _bench

    _H, _W = _bench.H_FULL, _bench.W
    _bench.H_FULL, _bench.W = args.H, args.W
    try:
        data = make_numpy_batch()
    finally:
        _bench.H_FULL, _bench.W = _H, _W
    batch = Batch(
        surf_vars=data["surf"], static_vars=data["static"], atmos_vars=data["atmos"],
        metadata=Metadata(
            lat=data["lat"], lon=data["lon"], time=data["time"], atmos_levels=LEVELS
        ),
    )

    t0 = time.time()
    preds = rollout_scan(
        model, params, batch, steps=args.steps, host_offload=not args.no_offload
    )
    wall_cold = time.time() - t0
    assert len(preds) == args.steps
    last = preds[-1]
    finite = all(
        np.isfinite(np.asarray(v)).all() for v in last.surf_vars.values()
    )
    print(f"cold (incl. compile): {wall_cold:.1f}s", file=sys.stderr, flush=True)
    del preds
    t0 = time.time()
    preds = rollout_scan(
        model, params, batch, steps=args.steps, host_offload=not args.no_offload
    )
    wall = time.time() - t0
    gp = (args.H - 1) * args.W
    out = {
        "metric": "rollout_scan_host_offload" if not args.no_offload else "rollout_scan_device_resident",
        "grid": [args.H, args.W],
        "steps": args.steps,
        "wall_s": round(wall, 2),
        "wall_s_incl_compile": round(wall_cold, 2),
        "s_per_step": round(wall / args.steps, 3),
        "grid_points_per_s": round(gp * args.steps / wall, 1),
        "finite": bool(finite),
        "note": "single compiled scan program on a 15.75 GiB chip; device carries "
        "one step of history; per-step io_callback pays tunnel RTT on this dev setup",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
