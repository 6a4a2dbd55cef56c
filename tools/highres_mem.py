#!/usr/bin/env python
"""Where does the 0.1° single-chip forward's memory go? (compile-only)

Compiles the full forward and each component in isolation at 0.1° (1800x3600,
patch 10) on the current backend and prints XLA's buffer-assignment aggregates
(`compiled.memory_analysis()`). No execution — safe on a chip the config doesn't
fit on. Drives VERDICT round-2 item 2 (fit 0.1° in 15.75 GB).

Usage: python tools/highres_mem.py [--dtype float32|bfloat16] [--component all|forward|encoder|backbone|decoder]
"""

import argparse
import sys
from datetime import datetime
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def report(label, lowered):
    try:
        ma = lowered.compile().memory_analysis()
        print(
            f"{label:>10}: temp {ma.temp_size_in_bytes/2**30:6.2f} GiB | "
            f"args {ma.argument_size_in_bytes/2**30:6.2f} | "
            f"out {ma.output_size_in_bytes/2**30:6.2f} | "
            f"alias {ma.alias_size_in_bytes/2**30:6.2f} | "
            f"peak(temp+args+out-alias) "
            f"{(ma.temp_size_in_bytes+ma.argument_size_in_bytes+ma.output_size_in_bytes-ma.alias_size_in_bytes)/2**30:6.2f} GiB",
            flush=True,
        )
    except Exception as e:
        print(f"{label}: failed: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--component", default="all")
    ap.add_argument("--donate", action="store_true", help="donate inputs to the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model import decoder as dec_mod
    from aurora_tpu.model import encoder as enc_mod
    from aurora_tpu.model import swin3d
    from aurora_tpu.model.aurora import Aurora, forward_core, init_params
    from aurora_tpu.model.config import HIGHRES_CONFIG

    dtype = jnp.dtype(args.dtype)
    cfg = HIGHRES_CONFIG.replace(autocast=True, agg_chunk_size=8192, use_lora=False)
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    H, W = 1800, 3600
    B, T = 1, 2
    print(f"backend {jax.default_backend()}, dtype {dtype}, grid {H}x{W}", flush=True)

    # Abstract inputs: ShapeDtypeStructs — nothing is allocated anywhere.
    surf = {k: jax.ShapeDtypeStruct((B, T, H, W), dtype) for k in cfg.surf_vars}
    static = {k: jax.ShapeDtypeStruct((H, W), dtype) for k in cfg.static_vars}
    atmos = {k: jax.ShapeDtypeStruct((B, T, len(levels), H, W), dtype) for k in cfg.atmos_vars}
    params = jax.eval_shape(lambda k: init_params(k, cfg, dtype=dtype), jax.random.PRNGKey(0))
    step = jax.ShapeDtypeStruct((), jnp.int32)

    batch_meta = Batch(
        surf_vars={k: np.zeros((1, 1, 2, 2), np.float32) for k in cfg.surf_vars},
        static_vars={k: np.zeros((2, 2), np.float32) for k in cfg.static_vars},
        atmos_vars={k: np.zeros((1, 1, len(levels), 2, 2), np.float32) for k in cfg.atmos_vars},
        metadata=Metadata(
            lat=np.linspace(90, -90, H + 1)[:H],
            lon=np.linspace(0, 360, W, endpoint=False),
            time=(datetime(2020, 6, 1, 12),),
            atmos_levels=levels,
        ),
    )
    # prepare_encodings only reads metadata; give it the real lat/lon.
    model = Aurora(cfg)
    enc = model.prepare_encodings(batch_meta, dtype=jnp.float32)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e9:.2f} B -> {n_params*dtype.itemsize/2**30:.2f} GiB", flush=True)

    patch_res = (cfg.latent_levels, H // cfg.patch_size, W // cfg.patch_size)
    Ltok = patch_res[0] * patch_res[1] * patch_res[2]
    comp = args.component

    if comp in ("all", "forward"):
        fwd = partial(forward_core, atmos_levels=tuple(float(x) for x in levels), cfg=cfg)
        donate = (1, 2, 3) if args.donate else ()
        report(
            "forward",
            jax.jit(fwd, donate_argnums=donate).lower(params, surf, static, atmos, enc, step),
        )
    if comp in ("all", "encoder"):
        static5 = {k: jax.ShapeDtypeStruct((B, T, H, W), dtype) for k in cfg.static_vars}
        report(
            "encoder",
            jax.jit(
                lambda p, s, st, a: enc_mod.encoder_apply(
                    p["encoder"], s, st, a, tuple(float(x) for x in levels), enc, cfg
                )
            ).lower(params, surf, static5, atmos),
        )
    if comp in ("all", "backbone"):
        x = jax.ShapeDtypeStruct((B, Ltok, cfg.embed_dim), jnp.bfloat16)
        report(
            "backbone",
            jax.jit(
                lambda p, xx, s: swin3d.backbone_apply(
                    p["backbone"], xx, enc.lead_time, s, patch_res, cfg.backbone
                )
            ).lower(params, x, step),
        )
    if comp in ("all", "decoder"):
        y = jax.ShapeDtypeStruct((B, Ltok, cfg.decoder_embed_dim), jnp.float32)
        report(
            "decoder",
            jax.jit(
                lambda p, xx: dec_mod.decoder_apply(
                    p["decoder"], xx, tuple(cfg.surf_vars), tuple(cfg.atmos_vars),
                    tuple(float(x) for x in levels), enc.levels_dec, patch_res, H, W, cfg,
                )
            ).lower(params, y),
        )


if __name__ == "__main__":
    main()
