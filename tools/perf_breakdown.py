#!/usr/bin/env python
"""Per-stage timing of the 1.3 B 0.25° forward on the current default device.

Times (a) the full jitted forward_core with device-resident inputs, (b) encoder,
backbone and decoder in isolation, each after warm-up, so the host-transfer and
encoding-precompute costs of Aurora.forward are excluded. Use this to direct kernel
work; bench.py stays the headline number.

Usage: python tools/perf_breakdown.py [--small] [--steps N]
"""

import argparse
import sys
import time
from datetime import datetime
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, make_args, steps=5, warmup=2):
    """Tunnel-safe timing: the remote runtime dedupes identical dispatches and does
    not block reliably in block_until_ready, so every call gets a fresh argument
    buffer (``make_args(i)``) and syncs by fetching one scalar from the output."""
    import jax

    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf[(0,) * leaf.ndim])

    for i in range(warmup):
        out = fn(*make_args(i))
    sync(out)
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        out = fn(*make_args(warmup + i))
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--H", type=int, default=721)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.model.aurora import Aurora, forward_core, init_params
    from aurora_tpu.model.config import LARGE_CONFIG, SMALL_CONFIG
    from aurora_tpu.model import encoder as enc_mod
    from aurora_tpu.model import decoder as dec_mod
    from aurora_tpu.model import swin3d

    # Production serving config — matches bench.py (autocast backbone + bf16
    # level agg/de-agg modes).
    cfg = (SMALL_CONFIG if args.small else LARGE_CONFIG).replace(
        autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True
    )
    levels = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)
    H, W = args.H, args.W
    dtype = jnp.dtype(args.dtype)

    print(f"device: {jax.devices()[0].device_kind}, grid {H}x{W}, dtype {dtype}", flush=True)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e9:.2f} B", flush=True)

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
            lat=np.linspace(90, -90, H),
            lon=np.linspace(0, 360, W, endpoint=False),
            time=(datetime(2020, 6, 1, 12),),
            atmos_levels=levels,
        ),
    )
    model = Aurora(cfg)
    batch = batch.crop(cfg.patch_size)
    Hc, Wc = batch.spatial_shape
    enc = model.prepare_encodings(batch, dtype=jnp.float32)
    surf = {k: jax.device_put(jnp.asarray(v, dtype)) for k, v in batch.surf_vars.items()}
    static = {k: jax.device_put(jnp.asarray(v, dtype)) for k, v in batch.static_vars.items()}
    atmos = {k: jax.device_put(jnp.asarray(v, dtype)) for k, v in batch.atmos_vars.items()}
    step = jnp.asarray(0, jnp.int32)

    fwd = jax.jit(
        partial(forward_core, atmos_levels=tuple(float(x) for x in levels), cfg=cfg)
    )
    t, _ = timeit(
        fwd,
        lambda i: (params, surf, static, atmos, enc, jnp.asarray(i % 3, jnp.int32)),
        steps=args.steps,
    )
    gp = Hc * Wc
    print(f"forward_core (device-resident): {t*1e3:.1f} ms  -> {gp/t/1e6:.2f} M grid_points/s", flush=True)

    # --- encoder alone
    patch_res = (cfg.latent_levels, Hc // cfg.patch_size, Wc // cfg.patch_size)
    static_exp = {k: jnp.broadcast_to(v[None, None], (B, T, Hc, Wc)) for k, v in static.items()}

    # Each sub-stage fn takes a fresh tiny eps buffer per call (perturbing one small
    # operand) so the tunnelled runtime sees a fresh dispatch every iteration.
    enc_fn = jax.jit(
        lambda p, s, st, a, eps: enc_mod.encoder_apply(
            p["encoder"],
            {k: (v + eps if k == next(iter(s)) else v) for k, v in s.items()},
            st, a, tuple(float(x) for x in levels), enc, cfg,
        )
    )
    t_enc, x_tokens = timeit(
        enc_fn,
        lambda i: (params, surf, static_exp, atmos, jnp.asarray(i * 1e-30, dtype)),
        steps=args.steps,
    )
    print(f"encoder: {t_enc*1e3:.1f} ms   tokens {x_tokens.shape}", flush=True)

    # --- backbone alone (bf16 like autocast)
    xb = x_tokens.astype(jnp.bfloat16)
    bb_fn = jax.jit(
        lambda p, x, s: swin3d.backbone_apply(
            p["backbone"], x, enc.lead_time, s, patch_res, cfg.backbone
        )
    )
    t_bb, y = timeit(
        bb_fn, lambda i: (params, xb, jnp.asarray(i % 3, jnp.int32)), steps=args.steps
    )
    print(f"backbone (bf16): {t_bb*1e3:.1f} ms", flush=True)

    # --- decoder alone
    surf_names = tuple(cfg.surf_vars)
    atmos_names = tuple(cfg.atmos_vars)
    dec_fn = jax.jit(
        lambda p, x, eps: dec_mod.decoder_apply(
            p["decoder"], x.astype(jnp.float32) + eps, surf_names, atmos_names,
            tuple(float(x) for x in levels), enc.levels_dec, patch_res, Hc, Wc, cfg,
        )
    )
    t_dec, _ = timeit(
        dec_fn, lambda i: (params, y, jnp.asarray(i * 1e-30, jnp.float32)), steps=args.steps
    )
    print(f"decoder: {t_dec*1e3:.1f} ms  (incl. one eps-add pass over the input)", flush=True)
    print(f"sum enc+bb+dec: {(t_enc+t_bb+t_dec)*1e3:.1f} ms vs full {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
