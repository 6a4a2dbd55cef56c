#!/usr/bin/env python
"""Close SURVEY §2.5 item 3 with data: are patch-embed and merge/split at roofline?

The round-1 kernel slate named three Pallas targets: fused window-SDPA (done),
patch-embed conv, and the patch merge/split shuffles. This measures the latter two
in isolation at the 1.3 B / 0.25° shapes and compares against the chip's analytic
floors (compute for the embed GEMM, HBM bandwidth for the shuffles). If measured ≈
floor, XLA is already speed-of-light and a Pallas kernel cannot win; the result is
recorded in ROADMAP.md.

Usage: python tools/kernel_slate.py [--steps 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="CPU smoke run (tiny grid)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aurora_tpu.model import swin3d
    from aurora_tpu.model.config import LARGE_CONFIG
    from aurora_tpu.model.patchembed import level_patch_embed_apply, level_patch_embed_init
    from aurora_tpu.utils.profiling import roofline

    cfg = LARGE_CONFIG
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    ITERS = 8  # in-jit repetitions: amortise the ~30 ms tunnel round-trip

    def timed(fn, make_args, label, flops, bytes_moved):
        """Time jit(fori_loop(ITERS, fn)) per iteration (tunnel-RTT-free)."""
        import jax.numpy as jnp

        w, x0 = make_args(0)

        def body(_, xx):
            y = fn(w, xx)
            # Feed a same-shaped perturbation of the input back so iterations chain.
            leaf = jax.tree_util.tree_leaves(y)[0]
            probe = leaf.reshape(-1)[0].astype(xx.dtype)
            return xx * jnp.asarray(1.0, xx.dtype) + probe * jnp.asarray(1e-30, xx.dtype)

        g = jax.jit(lambda xx: fn(w, jax.lax.fori_loop(0, ITERS - 1, body, xx)))
        out = g(x0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf[(0,) * leaf.ndim])
        # Fresh argument buffer each call (the tunnelled runtime dedupes identical
        # dispatches); the perturbation must not underflow the dtype.
        eps = 1e-30 if x0.dtype == jnp.float32 else 1e-2
        times = []
        for i in range(args.steps):
            t0 = time.time()
            out = g(x0 + jnp.asarray((i + 1) * eps, x0.dtype))
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(leaf[(0,) * leaf.ndim])
            times.append(time.time() - t0)
        t = min(times) / ITERS
        r = roofline(flops, bytes_moved, dev)
        print(
            f"{label}: {t*1e3:7.2f} ms | floor {r['floor_s']*1e3:7.2f} ms "
            f"({r['bound']}-bound) | {r['floor_s']/t*100:5.1f}% of roofline",
            flush=True,
        )
        return t

    # ---- patch embed: the full encoder surf+atmos embedding at 0.25 deg.
    # Conv-as-GEMM: every output token row contracts V*T*P^2 (surf) inputs into D.
    B, T, H, W = 1, 2, 720, 1440
    if args.cpu:
        H, W = 48, 96
    P, D = cfg.patch_size, cfg.embed_dim
    Hp, Wp = H // P, W // P
    C_A = 13
    key = jax.random.PRNGKey(0)

    Vs = len(cfg.surf_vars) + len(cfg.static_vars)
    surf_names = tuple(cfg.surf_vars) + tuple(cfg.static_vars)
    surf_embeds = level_patch_embed_init(key, surf_names, P, D, history_size=T)
    surf_stack = jax.random.normal(key, (B, Vs, T, H, W), jnp.float32)

    embed = jax.jit(lambda w, x: level_patch_embed_apply(w, x, surf_names, P))

    flops_surf = 2 * B * Hp * Wp * (Vs * T * P * P) * D
    bytes_surf = (B * T * Vs * H * W + B * Hp * Wp * D) * 4
    timed(
        embed,
        lambda i: (surf_embeds, surf_stack + i * 1e-30),
        f"patch-embed surf ({Vs} vars)",
        flops_surf,
        bytes_surf,
    )

    Va = len(cfg.atmos_vars)
    atmos_names = tuple(cfg.atmos_vars)
    atmos_embeds = level_patch_embed_init(key, atmos_names, P, D, history_size=T)
    atmos_stack = jax.random.normal(key, (B, Va, T, C_A, H, W), jnp.float32)

    def embed_atmos(w, x):
        # per-level embed, like encoder_apply: (B, V, T, C, H, W) -> (B, C, L, D)
        return jax.vmap(
            lambda xc: level_patch_embed_apply(w, xc, atmos_names, P), in_axes=3, out_axes=1
        )(x)

    embed_a = jax.jit(embed_atmos)
    flops_atmos = 2 * B * C_A * Hp * Wp * (Va * T * P * P) * D
    bytes_atmos = (B * T * Va * C_A * H * W + B * C_A * Hp * Wp * D) * 4
    timed(
        embed_a,
        lambda i: (atmos_embeds, atmos_stack + i * 1e-30),
        f"patch-embed atmos ({Va} vars x {C_A} levels)",
        flops_atmos,
        bytes_atmos,
    )

    # ---- merge / split shuffles at stage-0/1 boundary shapes (bf16, like autocast).
    for label, make in (
        ("patch-merge s0->s1", "merge"),
        ("patch-split s1->s0", "split"),
    ):
        if make == "merge":
            res = (cfg.latent_levels, Hp, Wp)
            L = res[0] * res[1] * res[2]
            x0 = jax.random.normal(key, (B, *res, D), jnp.bfloat16)
            p = swin3d.patch_merge_init(key, D, dtype=jnp.float32)
            fn = jax.jit(lambda pp, xx: swin3d.patch_merge_apply(pp, xx, res))
            flops = 2 * B * (L // 4) * (4 * D) * (2 * D)
            bts = (B * L * D + B * (L // 4) * 2 * D) * 2
        else:
            res = (cfg.latent_levels, Hp // 2, Wp // 2)
            L = res[0] * res[1] * res[2]
            x0 = jax.random.normal(key, (B, *res, 2 * D), jnp.bfloat16)
            p = swin3d.patch_split_init(key, 2 * D, dtype=jnp.float32)
            fn = jax.jit(
                lambda pp, xx: swin3d.patch_split_apply(pp, xx, res, (0, 0, 0))
            )
            flops = 2 * B * L * (2 * D) * (4 * D) + 2 * B * 4 * L * D * D // 2
            bts = (B * L * 2 * D + B * 4 * L * D) * 2
        timed(fn, lambda i: (p, x0 + i * 1e-8), label, flops, bts)


if __name__ == "__main__":
    main()
