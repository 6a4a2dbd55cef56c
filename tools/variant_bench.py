#!/usr/bin/env python
"""Variant throughput: air-pollution (CAMS 0.4°) and ocean-wave (0.25°) models.

BASELINE.md config 4 asks for grid-points/s on the variant models alongside hook
correctness (covered by tests/test_parity_variants.py at 1e-8). Both variants carry
machinery the base model lacks — level-conditioned patch embeds, dynamic time
features, a separate chemistry perceiver and modulation heads (pollution); ~50
supplemented surface channels with density/angle splits (wave) — so their throughput
is measured, not inferred. Same fetch-synced methodology as bench.py.

Usage: python tools/variant_bench.py [--variants pollution,wave] [--steps 3]
"""

import argparse
import json
import sys
import time
from datetime import datetime

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench_variant(model_cls, H, W, label, steps):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import cast_backbone_params, forward_core, init_params

    model = model_cls()
    cfg = model.cfg.replace(autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True)
    model.cfg = cfg
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    rng = np.random.default_rng(0)
    # Build the RAW batch (pre-hook variable set) like a user would.
    raw_surf = {
        k: np.abs(rng.standard_normal((1, 2, H, W))).astype(np.float32)
        for k in ("2t", "10u", "10v", "msl")
    }
    if cfg.variant == "air_pollution":
        for k in cfg.surf_vars:
            raw_surf.setdefault(k, np.abs(rng.standard_normal((1, 2, H, W))).astype(np.float32))
    else:  # wave: the model's var set is the supplemented one; feed the raw WAM set
        for k in ("swh", "mwd", "mwp", "pp1d", "shww", "mdww", "mpww", "shts", "mdts",
                  "mpts", "swh1", "mwd1", "mwp1", "swh2", "mwd2", "mwp2", "wind", "dwi"):
            raw_surf[k] = np.abs(rng.standard_normal((1, 2, H, W))).astype(np.float32)
    static = {
        k: np.abs(rng.standard_normal((H, W))).astype(np.float32)
        for k in cfg.static_vars
    }
    atmos = {
        k: np.abs(rng.standard_normal((1, 2, len(levels), H, W))).astype(np.float32)
        for k in cfg.atmos_vars
    }
    batch = Batch(
        surf_vars=raw_surf, static_vars=static, atmos_vars=atmos,
        metadata=Metadata(
            lat=np.linspace(90, -90, H), lon=np.linspace(0, 360, W, endpoint=False),
            time=(datetime(2022, 6, 1, 0),), atmos_levels=levels,
        ),
    )
    batch = model.batch_transform_hook(batch).crop(cfg.patch_size)
    Hc, Wc = batch.spatial_shape

    params = cast_backbone_params(init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    surf_d = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
    static_d = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
    atmos_d = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
    lv = tuple(float(x) for x in levels)
    fwd = jax.jit(partial(forward_core, atmos_levels=lv, cfg=cfg))

    def run(i):
        out = fwd(params, surf_d, static_d, atmos_d, enc, jnp.asarray(i % 3, jnp.int32))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf[(0,) * leaf.ndim])

    t0 = time.time()
    run(0)
    print(f"{label}: first step (compile) {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    times = []
    for i in range(steps):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)
    dt = min(times)
    gp = Hc * Wc
    print(f"{label}: {dt * 1e3:.0f} ms/step -> {gp / dt / 1e6:.3f} M grid_points/s",
          file=sys.stderr, flush=True)
    return {"s_per_step": round(dt, 4), "grid_points_per_s": round(gp / dt, 1),
            "grid": f"{Hc}x{Wc}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="pollution,wave")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aurora_tpu.model.aurora import AuroraAirPollution, AuroraWave

    out = {}
    if "pollution" in args.variants:
        out["air_pollution_0.4deg"] = bench_variant(
            AuroraAirPollution, 451, 900, "air_pollution 0.4deg", args.steps
        )
        import gc

        gc.collect()
    if "wave" in args.variants:
        out["wave_0.25deg"] = bench_variant(AuroraWave, 721, 1440, "wave 0.25deg", args.steps)
    print(json.dumps({"metric": "variant_inference", **out}))


if __name__ == "__main__":
    main()
