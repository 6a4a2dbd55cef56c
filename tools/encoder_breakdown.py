#!/usr/bin/env python
"""Encoder stage timing at 1.3 B / 0.25°: where do the ~140 ms go?

Isolates: surface/atmos patch embeds (conv + layout), the level-aggregation
resampler, the surface MLP chain, and the position/scale encoding adds, against
the full encoder. FLOP total is ~20 ms at MXU peak, so the gap is layout.

Usage: python tools/encoder_breakdown.py [--steps 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aurora_tpu.model import encoder as enc_mod
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.model.nn import layernorm, linear, mlp
    from aurora_tpu.model.patchembed import level_patch_embed_apply

    cfg = LARGE_CONFIG.replace(agg_chunk_size=8192)
    D = cfg.embed_dim
    H, W = 720, 1440
    P = cfg.patch_size
    L = (H // P) * (W // P)
    C_A = 13
    B, T = 1, 2
    key = jax.random.PRNGKey(0)
    print(f"device {jax.devices()[0].device_kind}; L={L}, D={D}, C_A={C_A}", flush=True)

    params = enc_mod.encoder_init(key, cfg, dtype=jnp.float32)

    def timed(label, fn, *arrs):
        out = fn(*arrs, jnp.float32(0))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf[(0,) * leaf.ndim])
        times = []
        for i in range(args.steps):
            t0 = time.time()
            out = fn(*arrs, jnp.float32((i + 1) * 1e-30))
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(leaf[(0,) * leaf.ndim])
            times.append(time.time() - t0)
        print(f"{label}: {min(times)*1e3:7.1f} ms   (~30 ms of this is tunnel RTT)", flush=True)
        return min(times)

    # --- full encoder
    rng = np.random.default_rng(0)
    surf = {k: jnp.asarray(rng.standard_normal((B, T, H, W)), jnp.float32) for k in cfg.surf_vars}
    static = {
        k: jnp.asarray(np.abs(rng.standard_normal((B, T, H, W))), jnp.float32)
        for k in cfg.static_vars
    }
    atmos = {
        k: jnp.asarray(rng.standard_normal((B, T, C_A, H, W)), jnp.float32)
        for k in cfg.atmos_vars
    }
    enc = enc_mod.EncoderEncodings(
        pos=jnp.asarray(rng.standard_normal((L, D)), jnp.float32),
        scale=jnp.asarray(rng.standard_normal((L, D)), jnp.float32),
        levels=jnp.asarray(rng.standard_normal((C_A, D)), jnp.float32),
        levels_dec=jnp.asarray(rng.standard_normal((C_A, 2 * D)), jnp.float32),
        lead_time=jnp.asarray(rng.standard_normal((D,)), jnp.float32),
        absolute_time=jnp.asarray(rng.standard_normal((B, D)), jnp.float32),
    )
    levels = (50.0, 100.0, 150.0, 200.0, 250.0, 300.0, 400.0, 500.0, 600.0, 700.0, 850.0, 925.0, 1000.0)

    def full(s, st, a, ee, eps):
        s = {k: v + eps for k, v in s.items()}
        return enc_mod.encoder_apply(params, s, st, a, levels, ee, cfg)

    fullj = jax.jit(full)
    timed("encoder FULL", lambda s, eps: fullj(s, static, atmos, enc, eps), surf)

    # --- surface patch embed (7 vars + statics merged upstream; here 7 = 4 surf + 3 static)
    x_surf = jnp.asarray(rng.standard_normal((B, 7, T, H, W)), jnp.float32)
    names7 = cfg.surf_vars + cfg.static_vars

    def pe_surf(xx, eps):
        return level_patch_embed_apply(params["surf_token_embeds"], xx + eps, names7, P)

    timed("surf patch embed (7ch)", jax.jit(pe_surf), x_surf)

    # --- atmos patch embed (13 levels x 5 vars)
    x_atmos = jnp.asarray(rng.standard_normal((B * C_A, 5, T, H, W)), jnp.float32)

    def pe_atmos(xx, eps):
        return level_patch_embed_apply(params["atmos_token_embeds"], xx + eps, cfg.atmos_vars, P)

    timed("atmos patch embed (13 lvl)", jax.jit(pe_atmos), x_atmos)

    # --- level aggregation
    xa = jnp.asarray(rng.standard_normal((B, C_A, L, D)), jnp.float32)

    def agg(xx, eps):
        return enc_mod._aggregate_levels(params, xx + eps, cfg)

    timed("level aggregation", jax.jit(agg), xa)

    # --- surface MLP chain
    xs = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def surf_mlp(xx, eps):
        y = xx + eps
        return y + layernorm(params["surf_norm"], mlp(params["surf_mlp"], y))

    timed("surf MLP chain", jax.jit(surf_mlp), xs)

    # --- pos/scale embeds + adds over (B, C_l, L, D)
    x4 = jnp.asarray(rng.standard_normal((B, cfg.latent_levels, L, D)), jnp.float32)

    def pos_scale(xx, pos, sc, eps):
        y = xx + linear(params["pos_embed"], pos + eps)[None, None]
        y = y + linear(params["scale_embed"], sc)[None, None]
        return y

    psj = jax.jit(pos_scale)
    timed("pos+scale adds", lambda xx, eps: psj(xx, enc.pos, enc.scale, eps), x4)


if __name__ == "__main__":
    main()
