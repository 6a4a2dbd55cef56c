#!/usr/bin/env python
"""Probe: bf16-stored backbone weights (cast_backbone_params) on the 0.25° headline.

The 0.1° bench gained 21% from halving weight HBM traffic (BASELINE.md); this measures
the same lever on the flagship 0.25° production config (use_lora=True). Compute is
bitwise-identical under autocast (tests/test_smoke.py::test_cast_backbone_params_bitwise).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import LEVELS, make_numpy_batch, H_FULL, W, log
from aurora_tpu.batch import Batch, Metadata
from aurora_tpu.model.aurora import Aurora, cast_backbone_params, forward_core, init_params
from aurora_tpu.model.config import LARGE_CONFIG


def run_config(cast: bool, steps: int = 4):
    cfg = LARGE_CONFIG.replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True, use_lora=True
    )
    model = Aurora(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    if cast:
        params = cast_backbone_params(params)
    data = make_numpy_batch()
    batch = Batch(
        surf_vars=data["surf"],
        static_vars=data["static"],
        atmos_vars=data["atmos"],
        metadata=Metadata(lat=data["lat"], lon=data["lon"], time=data["time"], atmos_levels=LEVELS),
    )
    cropped = batch.crop(cfg.patch_size)
    enc = model.prepare_encodings(cropped, dtype=jnp.float32)
    surf = {k: jax.device_put(jnp.asarray(v)) for k, v in cropped.surf_vars.items()}
    static = {k: jax.device_put(jnp.asarray(v)) for k, v in cropped.static_vars.items()}
    atmos = {k: jax.device_put(jnp.asarray(v)) for k, v in cropped.atmos_vars.items()}
    fwd = jax.jit(partial(forward_core, atmos_levels=tuple(float(x) for x in LEVELS), cfg=cfg))

    def run(i):
        out = fwd(params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf[(0,) * leaf.ndim])

    t0 = time.time()
    run(0)
    log(f"cast={cast}: first step {time.time() - t0:.1f}s")
    times = []
    for i in range(steps):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)
    log(f"cast={cast}: steps {[f'{t:.3f}' for t in times]} -> min {min(times):.3f}s")
    return min(times)


if __name__ == "__main__":
    dt_cast = run_config(cast=True)
    import gc

    gc.collect()
    dt_f32 = run_config(cast=False)
    log(f"bf16-stored backbone: {dt_cast:.3f}s vs f32-stored {dt_f32:.3f}s "
        f"({(dt_f32 - dt_cast) / dt_f32 * 100:.1f}% faster)")
