#!/usr/bin/env python
"""0.1-deg HighRes (1801x3600, patch 10) single-chip inference benchmark.

The reference runs this config on a single GPU via the larger patch size
(aurora/model/aurora.py:624-643); BASELINE.md config 5 uses it as the multi-host
stress case. This measures the single-chip floor with the same fetch-synced
methodology as bench.py.
"""

import sys
import time
from datetime import datetime
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, forward_core, init_params
    from aurora_tpu.model.config import HIGHRES_CONFIG

    cfg = HIGHRES_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, use_lora=False, deagg_bf16=True, agg_bf16=True
    )
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    H, W = 1801, 3600
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
    print(f"grid {Hc}x{Wc}, patch {cfg.patch_size}", file=sys.stderr, flush=True)

    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # Serving configuration: backbone weights stored bf16 (bitwise-identical
    # backbone compute under autocast — the kernels cast per use anyway). Saves
    # ~2.4 GiB of HBM: program total 15.7 -> 13.3 GiB on the 15.75 GiB v5e.
    from aurora_tpu.model.aurora import cast_backbone_params, stack_block_params

    params = stack_block_params(cast_backbone_params(params))
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    surf = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.surf_vars.items()}
    static = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.static_vars.items()}
    atmos = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.atmos_vars.items()}
    lv = tuple(float(x) for x in levels)
    # Donate the input field buffers (the right semantics for single-shot forwards).
    # Note: measured peak stays ~16.5 GB either way on v5e — the backbone's scheduled
    # intermediates, not the inputs, set the high-water mark; see ROADMAP.md.
    fwd = jax.jit(
        partial(forward_core, atmos_levels=lv, cfg=cfg), donate_argnums=(1, 2, 3)
    )

    host = {
        "surf": {k: np.asarray(v) for k, v in batch.surf_vars.items()},
        "static": {k: np.asarray(v) for k, v in batch.static_vars.items()},
        "atmos": {k: np.asarray(v) for k, v in batch.atmos_vars.items()},
    }

    def upload():
        s_d = {k: jax.device_put(jnp.asarray(v)) for k, v in host["surf"].items()}
        st_d = {k: jax.device_put(jnp.asarray(v)) for k, v in host["static"].items()}
        a_d = {k: jax.device_put(jnp.asarray(v)) for k, v in host["atmos"].items()}
        jax.block_until_ready((s_d, st_d, a_d))
        return s_d, st_d, a_d

    def step(args, i):
        s_d, st_d, a_d = args
        out = fwd(params, s_d, st_d, a_d, enc, jnp.asarray(i % 3, jnp.int32))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf[(0,) * leaf.ndim])

    del surf, static, atmos
    t0 = time.time()
    step(upload(), 0)
    print(f"first step (incl. compile + upload): {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    up_ts, dev_ts = [], []
    for i in range(3):
        t0 = time.time()
        args = upload()
        up_ts.append(time.time() - t0)
        t0 = time.time()
        step(args, i)
        dev_ts.append(time.time() - t0)
    dt = min(dev_ts)
    print(f"upload times: {[f'{t:.2f}' for t in up_ts]} s; device step times: "
          f"{[f'{t:.3f}' for t in dev_ts]} s", file=sys.stderr)
    print(f"highres_0.1deg: {dt*1e3:.0f} ms/step device-resident -> "
          f"{Hc*Wc/dt/1e6:.2f} M grid_points/s/chip")


if __name__ == "__main__":
    main()
