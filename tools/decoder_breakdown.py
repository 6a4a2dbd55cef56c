#!/usr/bin/env python
"""Decoder stage timing at 1.3 B / 0.25°: where do the ~226 ms of de-agg go?

Isolates the de-aggregation's internal stages (kv GEMM / attention core / out+MLP
chain) plus the input rearrange, head GEMM, and unpatchify. The full de-agg runs 8
chunks inside one dispatch, so the ~30 ms tunnel RTT is minor there; the isolated
stages are also chunked identically.

Usage: python tools/decoder_breakdown.py [--steps 3]
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

    from aurora_tpu.model import decoder as dec
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.model.nn import layernorm, linear, linear_init, mlp
    from aurora_tpu.model.perceiver import perceiver_resampler_init

    cfg = LARGE_CONFIG.replace(agg_chunk_size=8192)
    D = cfg.decoder_embed_dim
    C_l, Hp, Wp = cfg.latent_levels, 180, 360
    L = Hp * Wp
    C_A = 13
    Cp = C_l - 1
    P = cfg.patch_size
    nh = cfg.num_heads
    dh = D // nh
    chunk = 8192
    key = jax.random.PRNGKey(0)
    print(f"device {jax.devices()[0].device_kind}; L={L}, D={D}, C_A={C_A}", flush=True)

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

    rs = perceiver_resampler_init(
        key, latent_dim=D, context_dim=D, depth=cfg.dec_depth,
        head_dim=dh, num_heads=nh, mlp_ratio=cfg.dec_mlp_ratio, dtype=jnp.float32,
    )
    l0 = rs["layers"][0]
    le = jax.random.normal(key, (C_A, D), jnp.float32)
    # Level-major, as the backbone hands it to the decoder (see dec._deaggregate).
    ctx = jax.random.normal(key, (1, Cp, L, D), jnp.float32)

    # --- full de-agg (current production path)
    def deagg(cc, eps):
        return dec._deaggregate(rs, le, cc + eps, cfg)

    timed("deaggregate FULL (chunk 8192)", jax.jit(deagg), ctx)

    # --- bf16 variant
    rs16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), rs)

    def deagg16(cc, eps):
        out = dec._deaggregate(
            rs16, le.astype(jnp.bfloat16), (cc + eps).astype(jnp.bfloat16), cfg
        )
        return out.astype(jnp.float32)

    timed("deaggregate FULL bf16", jax.jit(deagg16), ctx)

    # --- stage isolation (same chunking; stages run m-major like the kernel's rows)
    ctx_fl = ctx.reshape(Cp, L, D).transpose(1, 0, 2)
    pad = (-L) % chunk
    ctx_fl = jnp.pad(ctx_fl, ((0, pad), (0, 0), (0, 0)))
    blocks = ctx_fl.reshape(-1, chunk, Cp, D)  # 8 chunks, like production

    def kv_stage(bb, eps):
        def one(cb):
            return linear(l0["attn"]["to_kv"], cb)
        return jax.lax.map(one, bb + eps)

    timed("  kv GEMM only", jax.jit(kv_stage), blocks)

    q0 = linear(l0["attn"]["to_q"], le).reshape(C_A, nh, dh)
    kvb = jax.lax.map(lambda cb: linear(l0["attn"]["to_kv"], cb), blocks)

    def attn_stage(kv, eps):
        def one(kvc):
            k, v = jnp.split(kvc + eps, 2, axis=-1)
            k = k.reshape(chunk, Cp, nh, dh)
            v = v.reshape(chunk, Cp, nh, dh)
            logits = jnp.einsum("qhd,mkhd->mhqk", q0, k)
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("mhqk,mkhd->mqhd", w, v).reshape(chunk, C_A, D)
        return jax.lax.map(one, kv)

    timed("  attention core (einsums+softmax)", jax.jit(attn_stage), kvb)

    nblk = kvb.shape[0]
    del kvb  # free ~2.4 GB before allocating the tail-stage input
    o0 = jax.random.normal(key, (nblk, chunk, C_A, D), jnp.float32) * 0.02

    def tail_stage(oo, eps):
        def one(oc):
            attn = linear(l0["attn"]["to_out"], oc + eps)
            lat = layernorm(l0["ln1"], attn) + le[None]
            lat = layernorm(l0["ln2"], mlp(l0["mlp"], lat)) + lat
            return lat
        return jax.lax.map(one, oo)

    timed("  out-proj + LN + MLP chain", jax.jit(tail_stage), o0)

    # --- heads + unpatchify
    xa_latent = jax.random.normal(key, (1, L, C_A, D), jnp.float32)
    heads = {
        name: linear_init(k, D, P * P, dtype=jnp.float32)
        for name, k in zip(cfg.atmos_vars, jax.random.split(key, len(cfg.atmos_vars)))
    }

    def run_heads(xx, eps):
        return linear(dec._stack_heads(heads, tuple(cfg.atmos_vars)), xx + eps)

    timed("fused atmos head GEMM", jax.jit(run_heads), xa_latent)

    xa = jax.random.normal(key, (1, L, C_A, P * P * len(cfg.atmos_vars)), jnp.float32)

    def unp(xx, eps):
        return dec.unpatchify(xx + eps, len(cfg.atmos_vars), Hp * P, Wp * P, P)

    timed("unpatchify (13 levels)", jax.jit(unp), xa)

    def unp16(xx, eps):
        return dec.unpatchify(
            (xx + eps).astype(jnp.bfloat16), len(cfg.atmos_vars), Hp * P, Wp * P, P
        ).astype(jnp.float32)

    timed("unpatchify bf16 shuffle", jax.jit(unp16), xa)

    Vv = len(cfg.atmos_vars)

    def unp_lanes(xx, eps):
        # C-in-lanes two-step shuffle: every intermediate keeps a >=260-lane minor.
        y = (xx + eps).reshape(1, Hp, Wp, C_A * P * P * Vv)
        t1 = y.reshape(1, Hp, Wp, C_A, P, P * Vv)
        t1 = t1.transpose(0, 1, 4, 2, 3, 5).reshape(1, Hp * P, Wp, C_A * P * Vv)
        t2 = t1.reshape(1, Hp * P, Wp, C_A, P, Vv)
        t2 = t2.transpose(0, 5, 3, 1, 2, 4).reshape(1, Vv, C_A, Hp * P, Wp * P)
        return t2

    timed("unpatchify C-in-lanes", jax.jit(unp_lanes), xa)

    x = jax.random.normal(key, (1, C_l * L, D), jnp.float32)

    def rearrange(xx, eps):
        return (xx + eps).reshape(1, C_l, L, D).transpose(0, 2, 1, 3)

    timed("input rearrange (C,L)->(L,C)", jax.jit(rearrange), x)


if __name__ == "__main__":
    main()
