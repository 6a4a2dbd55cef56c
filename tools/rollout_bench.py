#!/usr/bin/env python
"""BASELINE config 3: 1.3 B 0.25-deg autoregressive roll-out throughput (+ tracker).

Measures sustained roll-out steps/s with the per-step loop (device-resident history)
and runs the TC tracker on each prediction to include the post-processing path.
"""

import sys
import time
from datetime import datetime

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, init_params
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.rollout import rollout
    from aurora_tpu.tracker import Tracker

    cfg = LARGE_CONFIG.replace(autocast=True, agg_chunk_size=8192)
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    H, W = 721, 1440
    rng = np.random.default_rng(0)
    t0 = datetime(2022, 9, 16, 12)
    batch = Batch(
        surf_vars={k: rng.standard_normal((1, 2, H, W)).astype(np.float32) for k in cfg.surf_vars},
        static_vars={k: np.abs(rng.standard_normal((H, W))).astype(np.float32) for k in cfg.static_vars},
        atmos_vars={
            k: rng.standard_normal((1, 2, len(levels), H, W)).astype(np.float32)
            for k in cfg.atmos_vars
        },
        metadata=Metadata(
            lat=np.linspace(90, -90, H), lon=np.linspace(0, 360, W, endpoint=False),
            time=(t0,), atmos_levels=levels,
        ),
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tracker = Tracker(init_lat=25.3, init_lon=129.2, init_time=t0)

    steps = 6
    times = []
    t_start = time.time()
    for i, pred in enumerate(rollout(model, params, batch, steps=steps)):
        leaf = jax.tree_util.tree_leaves(pred.surf_vars)[0]
        float(leaf[(0,) * leaf.ndim])  # sync
        t_now = time.time()
        times.append(t_now - t_start)
        t_start = t_now
        tracker.step(pred)
        print(f"step {i}: {times[-1]:.2f}s (incl. tracker+host move after sync)",
              file=sys.stderr, flush=True)
    dt = min(times[1:])  # exclude compile step
    df = tracker.results()
    print(f"tracked fixes: {len(df)}, fails: {tracker.fails}", file=sys.stderr)
    print(f"rollout: {1/dt:.3f} steps/s ({dt*1e3:.0f} ms/step incl. encodings + history shift)")


if __name__ == "__main__":
    main()
