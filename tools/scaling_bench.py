#!/usr/bin/env python
"""Scaling-efficiency harness: grid-points/s per chip from 1 chip to N chips.

On real hardware run this on a pod slice (one process per host; jax.distributed is
initialised automatically under the TPU runtime). Without TPU hardware it runs on a
virtual CPU mesh (`--virtual N`) — useful to validate the sharded program and the
collective structure, not the absolute numbers.

Target (BASELINE.md): ≥80% grid-points/s scaling efficiency 1 -> N hosts.
"""

import argparse
import os
import sys
import time
from datetime import datetime
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0, help="force an N-device CPU mesh")
    ap.add_argument("--H", type=int, default=721)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, forward_core, init_params
    from aurora_tpu.model.config import LARGE_CONFIG, SMALL_CONFIG
    from aurora_tpu.parallel.mesh import auto_mesh
    from aurora_tpu.parallel.sharding import shard_batch_arrays, shard_params

    n_avail = len(jax.devices())
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    cfg = (SMALL_CONFIG if args.small else LARGE_CONFIG).replace(
        autocast=True, agg_chunk_size=8192
    )
    H, W = args.H, args.W
    rng = np.random.default_rng(0)
    B, T = 1, 2

    batch = Batch(
        surf_vars={k: rng.standard_normal((B, T, H, W)).astype(np.float32) for k in cfg.surf_vars},
        static_vars={k: np.abs(rng.standard_normal((H, W))).astype(np.float32) for k in cfg.static_vars},
        atmos_vars={
            k: rng.standard_normal((B, T, len(levels), H, W)).astype(np.float32)
            for k in cfg.atmos_vars
        },
        metadata=Metadata(
            lat=np.linspace(90, -90, H), lon=np.linspace(0, 360, W, endpoint=False),
            time=(datetime(2020, 6, 1, 12),), atmos_levels=levels,
        ),
    ).crop(cfg.patch_size)
    Hc, Wc = batch.spatial_shape

    model = Aurora(cfg)
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    params_host = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lv = tuple(float(x) for x in levels)
    fwd = jax.jit(partial(forward_core, atmos_levels=lv, cfg=cfg))

    def run_mesh(n):
        mesh = auto_mesh(n)
        with jax.set_mesh(mesh):
            params = shard_params(params_host, mesh)
            surf, static, atmos = shard_batch_arrays(
                {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()},
                {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()},
                {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()},
                mesh,
            )

            def sync(i):
                out = fwd(params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return float(leaf[(0,) * leaf.ndim])

            sync(0)
            ts = []
            for i in range(args.steps):
                t0 = time.perf_counter()
                sync(i)
                ts.append(time.perf_counter() - t0)
        return min(ts)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    print(f"devices available: {n_avail}; grid {Hc}x{Wc}")
    for n in sizes:
        dt = run_mesh(n)
        gps = Hc * Wc / dt
        if base is None:
            base = gps
        eff = gps / (base * n) * 100
        print(f"n={n}: {dt*1e3:.0f} ms/step, {gps/1e3:.0f}k gp/s, scaling eff {eff:.0f}%")


if __name__ == "__main__":
    main()
