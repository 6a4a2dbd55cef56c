#!/usr/bin/env python
"""Backbone ablation bench: where does the 1.3 B backbone's time/memory go?

Runs the full bf16 backbone under a series of ablations in ONE process (compiles
serialize through the remote-compile helper, so batching them here is much cheaper
than separate runs):

  base        attention=pallas, mlp=xla (the round-1 production config)
  mlp_pallas  fused-MLP Pallas kernel on (the round-1 rejected config)
  no_adaln    AdaptiveLayerNorm replaced by identity (cost of FiLM/LN passes)
  no_roll     cyclic shifts removed (cost of the roll layout ops)
  no_attn     attention core replaced by identity (GEMMs + layout only)

Each variant reports steady-state time (tunnel-safe: fresh traced input per
iteration, scalar-fetch sync) and the compiled program's temp-memory high-water mark
(`compiled.memory_analysis()` — reliable even through the axon tunnel).

Usage: python tools/backbone_ablate.py [--steps N] [--H 721 --W 1440]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--H", type=int, default=721)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument("--stages", default="0,1,2", help="stage filter for sweeps")
    ap.add_argument(
        "--variants",
        default="base,mlp_pallas,no_adaln,no_roll,no_attn",
        help="comma-separated subset to run",
    )
    args = ap.parse_args()

    import jax

    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aurora_tpu.model import swin3d
    from aurora_tpu.model.config import LARGE_CONFIG

    cfg = LARGE_CONFIG
    bb = cfg.backbone
    P = cfg.patch_size
    Hc, Wc = args.H - (args.H % P), args.W - (args.W % P)
    patch_res = (cfg.latent_levels, Hc // P, Wc // P)
    L = patch_res[0] * patch_res[1] * patch_res[2]
    D = cfg.embed_dim

    print(f"device {jax.devices()[0].device_kind}; tokens {patch_res} = {L}, D={D}", flush=True)

    key = jax.random.PRNGKey(0)
    params = swin3d.backbone_init(key, bb, dtype=jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, L, D), jnp.bfloat16)
    lead = jnp.ones((D,), jnp.float32)

    def timed_run(fn, label):
        """Steady-state min time; vary rollout_step so dispatches are fresh."""
        out = fn(params, x0, jnp.asarray(0, jnp.int32))
        leaf = out
        float(leaf[(0,) * leaf.ndim])  # warm
        times = []
        for i in range(args.steps):
            t0 = time.time()
            out = fn(params, x0, jnp.asarray(i % 3, jnp.int32))
            float(out[(0,) * out.ndim])
            times.append(time.time() - t0)
        print(f"{label}: {min(times)*1e3:.0f} ms  (all: {[f'{t*1e3:.0f}' for t in times]})", flush=True)
        return min(times)

    def mem_report(fn, label):
        try:
            lowered = jax.jit(fn).lower(params, x0, jnp.asarray(0, jnp.int32))
            ma = lowered.compile().memory_analysis()
            print(
                f"{label} memory: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
                f"args={ma.argument_size_in_bytes/2**30:.2f} GiB "
                f"out={ma.output_size_in_bytes/2**30:.2f} GiB",
                flush=True,
            )
        except Exception as e:
            print(f"{label} memory analysis unavailable: {e}", flush=True)

    def make_fn(cfg_bb):
        def f(p, x, step):
            return swin3d.backbone_apply(p, x, lead, step, patch_res, cfg_bb)
        return jax.jit(f)

    variants = args.variants.split(",")

    if "base" in variants:
        fn = make_fn(bb)
        mem_report(lambda p, x, s: swin3d.backbone_apply(p, x, lead, s, patch_res, bb), "base")
        timed_run(fn, "base (attn=pallas, mlp=xla)")

    if "mlp_pallas" in variants:
        bb2 = dataclasses_replace(bb, mlp_impl="pallas")
        fn = make_fn(bb2)
        mem_report(lambda p, x, s: swin3d.backbone_apply(p, x, lead, s, patch_res, bb2), "mlp_pallas")
        timed_run(fn, "mlp_pallas")

    if "mlp_fused" in variants:
        bb3 = dataclasses_replace(bb, mlp_impl="fused")
        fn = make_fn(bb3)
        mem_report(lambda p, x, s: swin3d.backbone_apply(p, x, lead, s, patch_res, bb3), "mlp_fused")
        timed_run(fn, "mlp_fused (mlp+adaln+residual kernel)")

    if "no_adaln" in variants:
        orig = swin3d.adaptive_layernorm
        swin3d.adaptive_layernorm = lambda p, x, c, scale_bias=0.0: x
        try:
            timed_run(make_fn(bb), "no_adaln (identity film)")
        finally:
            swin3d.adaptive_layernorm = orig

    if "no_roll" in variants:
        orig_roll = jnp.roll
        swin3d.jnp.roll = lambda x, shift, axis: x
        try:
            timed_run(make_fn(bb), "no_roll")
        finally:
            swin3d.jnp.roll = orig_roll

    ITERS = 16  # in-jit repetitions: amortises the ~30 ms tunnel round-trip

    def timed_loop(f, x_init, label, per_iter_work, unit="ms"):
        """Time jit(fori_loop(ITERS, f)) and report per-iteration cost."""
        g = jax.jit(
            lambda xx: jax.lax.fori_loop(0, ITERS, lambda _, acc: f(acc), xx)
        )
        out = g(x_init)
        float(out[(0,) * out.ndim])
        times = []
        for i in range(args.steps):
            t0 = time.time()
            out = g(x_init + jnp.bfloat16((i + 1) * 1e-8))
            float(out[(0,) * out.ndim])
            times.append(time.time() - t0)
        t = (min(times)) / ITERS
        if unit == "ms":
            print(f"{label}: {t*1e3:6.2f} ms/iter", flush=True)
        else:  # TF/s
            print(
                f"{label}: {t*1e3:6.2f} ms = {per_iter_work/t/1e12:6.1f} TF/s "
                f"({per_iter_work/t/1e12/197*100:4.1f}% MXU)",
                flush=True,
            )
        return t

    if "gemms" in variants:
        # Pure dot rates at the block GEMM shapes (stage 0; stages 1/2 have the same
        # FLOPs at half/quarter M and 2x/4x D). M = B*L.
        M = L
        for name, K, Nn in (
            ("qkv", D, 3 * D),
            ("proj", D, D),
            ("fc1", D, 4 * D),
            ("fc2", 4 * D, D),
        ):
            w = jax.random.normal(jax.random.PRNGKey(3), (K, Nn), jnp.bfloat16)
            a0 = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)

            if Nn >= K:
                def step(a, w=w, K=K):
                    y = a @ w
                    return y[:, :K] * jnp.bfloat16(0.999)
            else:
                def step(a, w=w, K=K, Nn=Nn):
                    y = a @ w
                    reps = K // Nn
                    return jnp.concatenate([y] * reps, axis=1) * jnp.bfloat16(0.999)

            timed_loop(step, a0, f"gemm {name} ({M}x{K}x{Nn})", 2 * M * K * Nn, unit="tf")

    if "layout" in variants:
        ws = bb.window_size
        x5 = jax.random.normal(jax.random.PRNGKey(4), (1, *patch_res, D), jnp.bfloat16)

        def part_rev(xx):
            wdw = swin3d.window_partition(xx, ws)
            return swin3d.window_reverse(wdw, ws, *patch_res) * jnp.bfloat16(0.999)

        timed_loop(part_rev, x5, "partition+reverse roundtrip", 0)

        def rolls(xx):
            y = jnp.roll(xx, shift=(-1, -3, -6), axis=(1, 2, 3))
            return jnp.roll(y, shift=(1, 3, 6), axis=(1, 2, 3)) * jnp.bfloat16(0.999)

        timed_loop(rolls, x5, "roll roundtrip", 0)

    if "kernels" in variants:
        # The two fused block-tail kernels + the qkv GEMM at each stage's shape,
        # vs their analytic floors (197 TF/s MXU, ~819 GB/s HBM on v5e).
        from aurora_tpu.ops.mlp import linear_adaln_residual_fused, mlp_adaln_residual_fused

        PEAK_TF, PEAK_BW = 197e12, 819e9

        for stage, (Ds, Ls) in enumerate(
            [(D, L), (2 * D, L // 4), (4 * D, L // 16)]
        ):
            Hs = 4 * Ds
            key_s = jax.random.PRNGKey(10 + stage)
            xs = jax.random.normal(key_s, (1, Ls, Ds), jnp.bfloat16)
            w1 = jax.random.normal(key_s, (Ds, Hs), jnp.float32) * 0.02
            b1 = jnp.zeros((Hs,), jnp.float32)
            w2 = jax.random.normal(key_s, (Hs, Ds), jnp.float32) * 0.02
            b2 = jnp.zeros((Ds,), jnp.float32)
            wp = jax.random.normal(key_s, (Ds, Ds), jnp.float32) * 0.02
            bp = jnp.zeros((Ds,), jnp.float32)
            sh = jnp.zeros((1, Ds), jnp.float32)
            sc = jnp.ones((1, Ds), jnp.float32) * 0.1

            def mlp_step(a, w1=w1, b1=b1, w2=w2, b2=b2, sh=sh, sc=sc):
                return mlp_adaln_residual_fused(a, w1, b1, w2, b2, sh, sc)

            fl = 4 * Ls * Ds * Hs
            by = (2 * Ls * Ds + 2 * Ds * Hs) * 2
            floor = max(fl / PEAK_TF, by / PEAK_BW)
            t = timed_loop(mlp_step, xs, f"s{stage} mlp_fused (L={Ls},D={Ds})", fl, unit="tf")
            print(f"    floor {floor*1e3:6.2f} ms -> {floor/t*100:4.0f}% of floor", flush=True)

            def proj_step(a, wp=wp, bp=bp, sh=sh, sc=sc):
                return linear_adaln_residual_fused(a, wp, bp, a, sh, sc)

            fl = 2 * Ls * Ds * Ds
            by = (3 * Ls * Ds + Ds * Ds) * 2
            floor = max(fl / PEAK_TF, by / PEAK_BW)
            t = timed_loop(proj_step, xs, f"s{stage} proj_fused (L={Ls},D={Ds})", fl, unit="tf")
            print(f"    floor {floor*1e3:6.2f} ms -> {floor/t*100:4.0f}% of floor", flush=True)

            wq = jax.random.normal(key_s, (Ds, 3 * Ds), jnp.bfloat16) * 0.02

            def qkv_step(a, wq=wq, Ds=Ds):
                y = a @ wq
                return y[..., :Ds] * jnp.bfloat16(0.999)

            fl = 2 * Ls * Ds * 3 * Ds
            by = (4 * Ls * Ds + 3 * Ds * Ds) * 2
            floor = max(fl / PEAK_TF, by / PEAK_BW)
            t = timed_loop(qkv_step, xs, f"s{stage} qkv xla (L={Ls},D={Ds})", fl, unit="tf")
            print(f"    floor {floor*1e3:6.2f} ms -> {floor/t*100:4.0f}% of floor", flush=True)

    if "attn" in variants:
        # The qkv-fused window-attention kernel at each stage's (nW, N, D) shape,
        # masked and unmasked, vs its analytic floor (MXU qkv GEMM + attention core
        # FLOPs, HBM: read x + write out + weight).
        from aurora_tpu.ops.masks import window_group_ids

        PEAK_TF, PEAK_BW = 197e12, 819e9
        ws = bb.window_size
        N = ws[0] * ws[1] * ws[2]
        stage_geom = [  # (res, D, heads) per stage (0.25 deg, latent levels 4)
            ((4, 180, 360), D, bb.encoder_num_heads[0]),
            ((4, 90, 180), 2 * D, bb.encoder_num_heads[1]),
            ((4, 48, 96), 4 * D, bb.encoder_num_heads[2]),
        ]
        for stage, (res, Ds, heads) in enumerate(stage_geom):
            if str(stage) not in args.stages.split(","):
                continue
            nW = (res[0] // ws[0]) * (res[1] // ws[1]) * (res[2] // ws[2])
            xw = jax.random.normal(jax.random.PRNGKey(5 + stage), (1, nW, N, Ds), jnp.bfloat16)
            wq = jax.random.normal(jax.random.PRNGKey(6), (Ds, 3 * Ds), jnp.bfloat16) * 0.02
            bq = jnp.zeros((3 * Ds,), jnp.bfloat16)
            ss = (ws[0] // 2, ws[1] // 2, ws[2] // 2)
            groups = window_group_ids(*res, ws, ss, warped=True)
            fl = 2 * nW * N * Ds * 3 * Ds + 4 * nW * N * N * Ds
            by = 2 * nW * N * Ds * 2 + 3 * Ds * Ds * 2
            floor = max(fl / PEAK_TF, by / PEAK_BW)
            for label, g in (("unmasked", None), ("masked", groups)):

                def attn_step(a, wq=wq, bq=bq, heads=heads, g=g):
                    return swin3d._attn_windows_qkv_fused_pallas(a, wq, bq, heads, g)

                t = timed_loop(
                    attn_step, xw, f"s{stage} attn_qkv_fused {label} (nW={nW},D={Ds})",
                    fl, unit="tf",
                )
                print(f"    floor {floor*1e3:6.2f} ms -> {floor/t*100:4.0f}% of floor", flush=True)

    if "attn_tiles" in variants:
        # Window-batch (VMEM budget) sweep for the qkv-fused attention kernel.
        from aurora_tpu.ops.masks import window_group_ids

        ws = bb.window_size
        N = ws[0] * ws[1] * ws[2]
        stage_geom = [
            ((4, 180, 360), D, bb.encoder_num_heads[0]),
            ((4, 90, 180), 2 * D, bb.encoder_num_heads[1]),
            ((4, 48, 96), 4 * D, bb.encoder_num_heads[2]),
        ]
        for stage, (res, Ds, heads) in enumerate(stage_geom):
            if str(stage) not in args.stages.split(","):
                continue
            nW = (res[0] // ws[0]) * (res[1] // ws[1]) * (res[2] // ws[2])
            xw = jax.random.normal(jax.random.PRNGKey(5 + stage), (1, nW, N, Ds), jnp.bfloat16)
            wq = jax.random.normal(jax.random.PRNGKey(6), (Ds, 3 * Ds), jnp.bfloat16) * 0.02
            bq = jnp.zeros((3 * Ds,), jnp.bfloat16)
            ss = (ws[0] // 2, ws[1] // 2, ws[2] // 2)
            groups = window_group_ids(*res, ws, ss, warped=True)
            fl = 2 * nW * N * Ds * 3 * Ds + 4 * nW * N * N * Ds
            for mb in (4, 8, 16, 24, 32, 48, 64):

                def attn_step(a, wq=wq, bq=bq, heads=heads, groups=groups, mb=mb):
                    return swin3d._attn_windows_qkv_fused_pallas(
                        a, wq, bq, heads, groups, budget_mb=mb
                    )

                try:
                    timed_loop(attn_step, xw, f"s{stage} attn mb={mb} (nW={nW},D={Ds})", fl, unit="tf")
                except Exception as e:
                    print(f"s{stage} attn mb={mb}: FAIL {type(e).__name__}: {str(e)[:80]}", flush=True)

    if "ln_probe" in variants:
        # Is the f32 two-pass LN (lane reductions) a real cost inside the fused
        # MLP kernel? Compare against a stats-skipped variant (TIMING ONLY).
        from aurora_tpu.ops import mlp as mlp_mod

        Ds, Ls, Hs = D, L, 4 * D
        key_s = jax.random.PRNGKey(10)
        xs = jax.random.normal(key_s, (1, Ls, Ds), jnp.bfloat16)
        w1 = jax.random.normal(key_s, (Ds, Hs), jnp.float32) * 0.02
        b1 = jnp.zeros((Hs,), jnp.float32)
        w2 = jax.random.normal(key_s, (Hs, Ds), jnp.float32) * 0.02
        b2 = jnp.zeros((Ds,), jnp.float32)
        sh = jnp.zeros((1, Ds), jnp.float32)
        sc = jnp.ones((1, Ds), jnp.float32) * 0.1
        fl_m = 4 * Ls * Ds * Hs

        import jax.numpy as _jnp

        orig_mean = _jnp.mean

        def mlp_step(a):
            return mlp_mod.mlp_adaln_residual_fused(a, w1, b1, w2, b2, sh, sc)

        timed_loop(mlp_step, xs, "s0 mlp ln=full", fl_m, unit="tf")

        # monkeypatch: make LN stats constants (skips both reductions + rsqrt)
        import aurora_tpu.ops.mlp as _m
        src_fn = _m.mlp_adaln_residual_fused

        def patched(*a, **kw):
            return src_fn(*a, **kw)

        # crude: patch jnp.mean used inside the kernel body via module global
        _m_jnp_mean = _m.jnp.mean
        _m.jnp = type(_m.jnp)("jnp_shim") if False else _m.jnp
        try:
            real_mean = _m.jnp.mean
            _m.jnp.mean = lambda x, axis=None, keepdims=False: (
                x[..., :1] * 0.0 if keepdims else x[..., 0] * 0.0
            )
            timed_loop(mlp_step, xs, "s0 mlp ln=skipped", fl_m, unit="tf")
        finally:
            _m.jnp.mean = real_mean

    if "rollfuse" in variants:
        # In-situ comparison of the shifted-block layout chain:
        #   pallas: roll3d_pallas -> XLA partition ... reverse -> roll3d_pallas
        #   xla:    jnp.roll      -> XLA partition ... reverse -> jnp.roll
        # The Pallas roll is a faster STANDALONE op, but it is opaque to XLA —
        # jnp.roll can fuse into the partition transpose's copy loop.
        from aurora_tpu.ops.roll import roll3d_pallas

        ws = bb.window_size
        sh = (ws[0] // 2, ws[1] // 2, ws[2] // 2)
        x5 = jax.random.normal(jax.random.PRNGKey(4), (1, *patch_res, D), jnp.bfloat16)

        def chain_pallas(xx):
            y = roll3d_pallas(xx, (-sh[0], -sh[1], -sh[2]))
            wdw = swin3d.window_partition(y, ws)
            y = swin3d.window_reverse(wdw * jnp.bfloat16(0.999), ws, *patch_res)
            return roll3d_pallas(y, sh)

        def chain_xla(xx):
            y = jnp.roll(xx, shift=(-sh[0], -sh[1], -sh[2]), axis=(1, 2, 3))
            wdw = swin3d.window_partition(y, ws)
            y = swin3d.window_reverse(wdw * jnp.bfloat16(0.999), ws, *patch_res)
            return jnp.roll(y, shift=sh, axis=(1, 2, 3))

        timed_loop(chain_pallas, x5, "shifted chain (pallas roll)", 0)
        timed_loop(chain_xla, x5, "shifted chain (jnp.roll)", 0)

    if "mlp_t" in variants:
        # Transposed-internals fused MLP probe: load x (R, D), transpose once to
        # (D, R); h^T = w1^T-contracted dot (M=H, K=D, N=R all wide); out^T via
        # (M=D, K=H, N=R); LN reduces over the LEADING axis (sublanes — cheaper
        # than lane reductions); transpose back before store. Tests whether the
        # narrow-N fc2 cap is beaten by wide-N + 2 in-VMEM transposes.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        for stage, (Ds, Ls) in enumerate([(D, L), (2 * D, L // 4), (4 * D, L // 16)]):
            if str(stage) not in args.stages.split(","):
                continue
            Hs = 4 * Ds
            key_s = jax.random.PRNGKey(10 + stage)
            xs = jax.random.normal(key_s, (Ls, Ds), jnp.bfloat16)
            w1 = (jax.random.normal(key_s, (Ds, Hs), jnp.float32) * 0.02).astype(jnp.bfloat16)
            b1 = jnp.zeros((Hs, 1), jnp.float32)
            w2 = (jax.random.normal(key_s, (Hs, Ds), jnp.float32) * 0.02).astype(jnp.bfloat16)
            b2 = jnp.zeros((Ds, 1), jnp.float32)
            sh = jnp.zeros((Ds, 1), jnp.float32)
            sc = jnp.ones((Ds, 1), jnp.float32) * 0.1
            fl_m = 4 * Ls * Ds * Hs

            for R in (1800, 3600, 5400):
                if Ls % R:
                    continue
                vmem = (Ds * Hs * 2 * 2 + R * Ds * 2 * 4 + R * Ds * 4 + R * Hs * 4)
                if vmem > 110 * 2**20:
                    continue

                def make_mlp_t(R=R, Ds=Ds, Hs=Hs):
                    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, sh_ref, sc_ref, out_ref):
                        xt = x_ref[...]  # (R, D)
                        xT = xt.T  # (D, R) in-VMEM transpose
                        hT = jax.lax.dot_general(
                            w1_ref[...], xT,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) + b1_ref[...]  # (H, R)
                        from aurora_tpu.ops.mlp import _gelu_exact
                        hT = _gelu_exact(
                            hT.astype(xt.dtype).astype(jnp.float32), accurate=False
                        ).astype(xt.dtype)
                        accT = jax.lax.dot_general(
                            w2_ref[...], hT,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (D, R)
                        yT = (accT + b2_ref[...]).astype(xt.dtype)
                        yf = yT.astype(jnp.float32)
                        mean = jnp.mean(yf, axis=0, keepdims=True)
                        var = jnp.mean(jnp.square(yf - mean), axis=0, keepdims=True)
                        ln = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
                        mod = ln * sc_ref[...] + sh_ref[...]
                        outT = (xT.astype(jnp.float32) + mod).astype(out_ref.dtype)
                        out_ref[...] = outT.T

                    def run(a):
                        return pl.pallas_call(
                            kernel,
                            grid=(Ls // R,),
                            in_specs=[
                                pl.BlockSpec((R, Ds), lambda i: (i, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Ds, Hs), lambda i: (0, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Hs, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Hs, Ds), lambda i: (0, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Ds, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Ds, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                                pl.BlockSpec((Ds, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                            ],
                            out_specs=pl.BlockSpec((R, Ds), lambda i: (i, 0), memory_space=pltpu.VMEM),
                            out_shape=jax.ShapeDtypeStruct((Ls, Ds), a.dtype),
                            cost_estimate=pl.CostEstimate(
                                flops=4 * Ls * Ds * Hs,
                                bytes_accessed=2 * Ls * Ds * 2 + 2 * Ds * Hs * 2,
                                transcendentals=Ls * Hs,
                            ),
                            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
                        )(a, w1, b1, w2, b2, sh, sc)

                    return run

                try:
                    timed_loop(make_mlp_t(), xs, f"s{stage} mlp_t R={R} (L={Ls},D={Ds})", fl_m, unit="tf")
                except Exception as e:
                    print(f"s{stage} mlp_t R={R}: FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)

    if "attn_probe" in variants:
        # What inside the qkv-fused attention kernel costs the time? Timing-only
        # kernel variants (some numerically WRONG by construction) at stage-0 shape.
        import math as _math
        from functools import partial as _partial

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        res, Ds, heads = (4, 180, 360), D, bb.encoder_num_heads[0]
        ws = bb.window_size
        N = ws[0] * ws[1] * ws[2]
        nW = (res[0] // ws[0]) * (res[1] // ws[1]) * (res[2] // ws[2])
        dh = Ds // heads
        scale = 1.0 / _math.sqrt(dh)
        xw = jax.random.normal(jax.random.PRNGKey(5), (1, nW, N, Ds), jnp.bfloat16)
        wq = jax.random.normal(jax.random.PRNGKey(6), (Ds, 3 * Ds), jnp.bfloat16) * 0.02
        bq = jnp.zeros((1, 3 * Ds), jnp.bfloat16)
        per_window = N * 6 * Ds * 2
        KW = max(c for c in range(1, (8 * 2**20) // per_window + 1) if nW % c == 0)
        fl = 2 * nW * N * Ds * 3 * Ds + 4 * nW * N * N * Ds

        def make_probe(mode):
            def kernel(x_ref, w_ref, bias_ref, out_ref):
                xt = x_ref[0].reshape(KW * N, Ds)
                qkv = jax.lax.dot_general(
                    xt, w_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(xt.dtype) + bias_ref[...]
                if mode == "no_core":
                    out_ref[0] = qkv[:, :Ds].reshape(KW, N, Ds)
                    return
                x = qkv.reshape(KW, N, 3 * Ds)
                if mode == "fulld":
                    q = x[..., :Ds]
                    k = x[..., Ds : 2 * Ds]
                    v = x[..., 2 * Ds :]
                    logits = jax.lax.dot_general(
                        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ) * scale
                    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                    out_ref[0] = jax.lax.dot_general(
                        w, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)
                    return
                if mode in ("batched_heads", "bf16_batched"):
                    # All heads' logits in TWO single-batch-dim dots instead of the
                    # per-head Python loop — VERDICT r3 probe (ii). Head slices are
                    # CONCATenated along the batch axis (lane slices + copies; the
                    # (N, h) transpose form crashes the Mosaic backend).
                    q = jnp.concatenate(
                        [x[..., hh * dh : (hh + 1) * dh] for hh in range(heads)], axis=0
                    )  # (h·KW, N, dh)
                    k = jnp.concatenate(
                        [x[..., Ds + hh * dh : Ds + (hh + 1) * dh] for hh in range(heads)],
                        axis=0,
                    )
                    v = jnp.concatenate(
                        [
                            x[..., 2 * Ds + hh * dh : 2 * Ds + (hh + 1) * dh]
                            for hh in range(heads)
                        ],
                        axis=0,
                    )
                    logits = jax.lax.dot_general(
                        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    if mode == "bf16_batched":
                        logits = logits.astype(x.dtype) * scale
                    else:
                        logits = logits * scale
                    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                    o = jax.lax.dot_general(
                        w, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)  # (h·KW, N, dh)
                    out_ref[0] = jnp.concatenate(
                        [o[hh * KW : (hh + 1) * KW] for hh in range(heads)], axis=-1
                    )
                    return
                outs = []
                for hh in range(heads):
                    q = x[..., hh * dh : (hh + 1) * dh]
                    k = x[..., Ds + hh * dh : Ds + (hh + 1) * dh]
                    v = x[..., 2 * Ds + hh * dh : 2 * Ds + (hh + 1) * dh]
                    # bf16_core (VERDICT r3 probe (i)): SOFTMAX runs on bf16
                    # (Mosaic requires a 32-bit matmul accumulator, so the dot
                    # stays f32-accumulated and is rounded right after).
                    logits = jax.lax.dot_general(
                        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    logits = (
                        logits.astype(x.dtype) * scale
                        if mode == "bf16_core"
                        else logits * scale
                    )
                    if mode == "no_softmax":
                        w = logits.astype(x.dtype)
                    else:
                        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                    outs.append(jax.lax.dot_general(
                        w, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype))
                out_ref[0] = jnp.concatenate(outs, axis=-1)

            def run(a):
                return pl.pallas_call(
                    kernel,
                    grid=(1, nW // KW),
                    in_specs=[
                        pl.BlockSpec((1, KW, N, Ds), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((Ds, 3 * Ds), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 3 * Ds), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, KW, N, Ds), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((1, nW, N, Ds), a.dtype),
                    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
                )(a, wq, bq)

            return run

        for mode in (
            "baseline", "no_softmax", "no_core", "fulld",
            "bf16_core", "batched_heads", "bf16_batched",
        ):
            try:
                timed_loop(make_probe(mode), xw, f"s0 attn_probe {mode} (KW={KW})", fl, unit="tf")
            except Exception as e:
                print(f"s0 attn_probe {mode}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)

    if "proj_tiles" in variants:
        # Row-tile sweep for the proj block-tail kernel only.
        from aurora_tpu.ops.mlp import linear_adaln_residual_fused

        for stage, (Ds, Ls) in enumerate([(D, L), (2 * D, L // 4), (4 * D, L // 16)]):
            if str(stage) not in args.stages.split(","):
                continue
            key_s = jax.random.PRNGKey(10 + stage)
            xs = jax.random.normal(key_s, (1, Ls, Ds), jnp.bfloat16)
            wp = jax.random.normal(key_s, (Ds, Ds), jnp.float32) * 0.02
            bp = jnp.zeros((Ds,), jnp.float32)
            sh = jnp.zeros((1, Ds), jnp.float32)
            sc = jnp.ones((1, Ds), jnp.float32) * 0.1
            fl_p = 2 * Ls * Ds * Ds
            for rt in (None, 960, 1800, 3240, 5400, 8100, 16200):
                if rt is not None and (Ls % rt or rt * Ds * 2 * 10 > 110 * 2**20):
                    continue

                def proj_step(a, wp=wp, bp=bp, sh=sh, sc=sc, rt=rt):
                    return linear_adaln_residual_fused(a, wp, bp, a, sh, sc, row_tile=rt)

                try:
                    timed_loop(proj_step, xs, f"s{stage} proj rt={rt} (L={Ls},D={Ds})", fl_p, unit="tf")
                except Exception as e:
                    print(f"s{stage} proj rt={rt}: FAIL {type(e).__name__}", flush=True)

    if "gelu" in variants:
        # In-kernel VPU cost of the exact-erf GELU: rerun the fused MLP kernel at
        # stage-0 shape with _gelu_exact swapped for identity / cheaper forms.
        # The delta vs "exact" is the GELU's contribution to the critical path
        # (MXU and VPU do not overlap within a grid step).
        from aurora_tpu.ops import mlp as mlp_mod

        Ds, Ls, Hs = D, L, 4 * D
        key_s = jax.random.PRNGKey(10)
        xs = jax.random.normal(key_s, (1, Ls, Ds), jnp.bfloat16)
        w1 = jax.random.normal(key_s, (Ds, Hs), jnp.float32) * 0.02
        b1 = jnp.zeros((Hs,), jnp.float32)
        w2 = jax.random.normal(key_s, (Hs, Ds), jnp.float32) * 0.02
        b2 = jnp.zeros((Ds,), jnp.float32)
        sh = jnp.zeros((1, Ds), jnp.float32)
        sc = jnp.ones((1, Ds), jnp.float32) * 0.1
        fl_m = 4 * Ls * Ds * Hs

        def poly_gelu(h):
            # Odd minimax-ish polynomial for erf on |x|<=4 (clamped): no div, no exp.
            z = jnp.clip(h * 0.7071067811865476, -3.9, 3.9)
            z2 = z * z
            # Taylor coefficients of erf(z)/z (TIMING PROBE ONLY — same op count
            # as a real minimax fit, but inaccurate for |z|>1; do not ship).
            c = (1.1283791670955126, -0.37612638903183754, 0.11283791670955126,
                 -0.026866170645131251, 0.0052239776254421878,
                 -0.00085483270234508528, 0.00012055332981789664)
            p7 = c[6]
            for cc in c[5::-1]:
                p7 = p7 * z2 + cc
            return 0.5 * h * (1.0 + z * p7)

        mlp_mod._gelu_fast_probe = lambda h: 0.5 * h * (1.0 + mlp_mod._erf(h * 0.7071067811865476, accurate=False))
        for name, fn_gelu in (
            ("exact", mlp_mod._gelu_exact),
            ("identity", lambda h, **kw: h),
            ("tanh", lambda h, **kw: jax.nn.gelu(h, approximate=True)),
            ("fast", lambda h, **kw: mlp_mod._gelu_fast_probe(h)),
        ):
            orig = mlp_mod._gelu_exact
            mlp_mod._gelu_exact = fn_gelu
            try:
                def mlp_step(a, w1=w1, b1=b1, w2=w2, b2=b2, sh=sh, sc=sc):
                    return mlp_mod.mlp_adaln_residual_fused(a, w1, b1, w2, b2, sh, sc)

                timed_loop(mlp_step, xs, f"s0 mlp gelu={name}", fl_m, unit="tf")
            except Exception as e:
                print(f"s0 mlp gelu={name}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
            finally:
                mlp_mod._gelu_exact = orig

    if "kernel_tiles" in variants:
        # Tile-size sweep for the two fused block-tail kernels, per stage shape.
        from aurora_tpu.ops.mlp import linear_adaln_residual_fused, mlp_adaln_residual_fused

        for stage, (Ds, Ls) in enumerate([(D, L), (2 * D, L // 4), (4 * D, L // 16)]):
            Hs = 4 * Ds
            key_s = jax.random.PRNGKey(10 + stage)
            xs = jax.random.normal(key_s, (1, Ls, Ds), jnp.bfloat16)
            w1 = jax.random.normal(key_s, (Ds, Hs), jnp.float32) * 0.02
            b1 = jnp.zeros((Hs,), jnp.float32)
            w2 = jax.random.normal(key_s, (Hs, Ds), jnp.float32) * 0.02
            b2 = jnp.zeros((Ds,), jnp.float32)
            wp = jax.random.normal(key_s, (Ds, Ds), jnp.float32) * 0.02
            bp = jnp.zeros((Ds,), jnp.float32)
            sh = jnp.zeros((1, Ds), jnp.float32)
            sc = jnp.ones((1, Ds), jnp.float32) * 0.1

            fl_p = 2 * Ls * Ds * Ds
            for rt in (None, 960, 1800, 3240, 5400, 8100, 16200, 32400):
                if rt is not None and (Ls % rt or rt * Ds * 2 * 10 > 110 * 2**20):
                    continue

                def proj_step(a, wp=wp, bp=bp, sh=sh, sc=sc, rt=rt):
                    return linear_adaln_residual_fused(a, wp, bp, a, sh, sc, row_tile=rt)

                try:
                    timed_loop(proj_step, xs, f"s{stage} proj rt={rt}", fl_p, unit="tf")
                except Exception as e:
                    print(f"s{stage} proj rt={rt}: FAIL {type(e).__name__}", flush=True)

            fl_m = 4 * Ls * Ds * Hs
            for rt, ht in ((None, None), (960, None), (1800, None), (3240, None),
                           (960, Hs), (1800, Hs), (3240, Hs), (5400, Hs),
                           (960, 2048), (1800, 2048), (3240, 2048)):
                if rt is not None and Ls % rt:
                    continue
                if ht is not None and (ht > Hs or Hs % ht):
                    continue
                # Rough VMEM guard: weights + x/out/acc/hidden tiles.
                rt_eff, ht_eff = rt or 480, ht or 1024
                vmem = (2 * Ds * ht_eff * 2 * 2          # w1/w2 tiles double-buffered
                        + rt_eff * Ds * 2 * 4            # x/out tiles (+db)
                        + rt_eff * Ds * 4                # f32 acc
                        + rt_eff * ht_eff * 4)           # hidden f32
                if vmem > 110 * 2**20:
                    continue

                def mlp_step(a, w1=w1, b1=b1, w2=w2, b2=b2, sh=sh, sc=sc, rt=rt, ht=ht):
                    return mlp_adaln_residual_fused(
                        a, w1, b1, w2, b2, sh, sc, row_tile=rt, hidden_tile=ht
                    )

                try:
                    timed_loop(mlp_step, xs, f"s{stage} mlp rt={rt} ht={ht}", fl_m, unit="tf")
                except Exception as e:
                    print(f"s{stage} mlp rt={rt} ht={ht}: FAIL {type(e).__name__}", flush=True)

    if "attn5d_check" in variants:
        # Full-backbone A/B on real hardware: the 5D direct-window kernel path vs
        # the pre-5D windowed kernel path ("pallas_windowed"). Reports max|Δ| (the
        # two paths compute identical math; any drift means a Mosaic miscompile)
        # and the end-to-end times.
        bb5 = dataclasses_replace(bb, attention_impl="pallas")
        bbw = dataclasses_replace(bb, attention_impl="pallas_windowed")
        f5, fw = make_fn(bb5), make_fn(bbw)
        step = jnp.asarray(0, jnp.int32)
        o5 = np.asarray(f5(params, x0, step), dtype=np.float32)
        ow = np.asarray(fw(params, x0, step), dtype=np.float32)
        d = np.max(np.abs(o5 - ow))
        r = d / (np.max(np.abs(ow)) + 1e-30)
        print(f"attn5d_check: max|delta| = {d:.3e} (rel {r:.3e})", flush=True)
        timed_run(f5, "backbone attention_impl=pallas (5d direct)")
        timed_run(fw, "backbone attention_impl=pallas_windowed")

    if "attn5d" in variants:
        # Can the attention kernel read windows DIRECTLY from the 5D token tensor
        # (one BlockSpec block = a (ws0, ws1, Wp) row of windows), erasing the
        # partition/reverse HBM relayouts entirely? The in-kernel gather/scatter is
        # a VMEM relayout (split Wp -> (W1, ws2), move W1 leading) — VMEM bandwidth
        # is ~20x HBM, so this wins iff Mosaic emits sane code for it. Timing-only
        # (unmasked) comparison per stage:
        #   chain : partition -> qkv-fused kernel -> reverse   [production today]
        #   direct: 5D-window kernel (in-kernel relayout)
        import math as _math

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ws = bb.window_size
        N = ws[0] * ws[1] * ws[2]
        for stage, (Ds, heads, res) in enumerate(
            [
                (D, bb.encoder_num_heads[0], patch_res),
                (2 * D, bb.encoder_num_heads[1], (patch_res[0], patch_res[1] // 2, patch_res[2] // 2)),
                (4 * D, bb.encoder_num_heads[2], (patch_res[0], patch_res[1] // 4, patch_res[2] // 4)),
            ]
        ):
            if str(stage) not in args.stages.split(","):
                continue
            C, H, W = res
            Cp, Hp, Wp = C + (-C) % ws[0], H + (-H) % ws[1], W + (-W) % ws[2]
            C1, H1, W1 = Cp // ws[0], Hp // ws[1], Wp // ws[2]
            nW = C1 * H1 * W1
            dh = Ds // heads
            scale = 1.0 / _math.sqrt(dh)
            x5 = jax.random.normal(jax.random.PRNGKey(7 + stage), (1, Cp, Hp, Wp, Ds), jnp.bfloat16)
            wq = jax.random.normal(jax.random.PRNGKey(8 + stage), (Ds, 3 * Ds), jnp.bfloat16) * 0.02
            bq = jnp.zeros((3 * Ds,), jnp.bfloat16)
            fl = 2 * nW * N * Ds * 3 * Ds + 4 * nW * N * N * Ds

            def chain(xx, Ds=Ds, heads=heads, nW=nW, Cp=Cp, Hp=Hp, Wp=Wp, C1=C1, H1=H1, W1=W1):
                wdw = swin3d.window_partition(xx, ws)
                o = swin3d._attn_windows_qkv_fused_pallas(
                    wdw.reshape(1, nW, N, Ds), wq, bq, heads, None
                )
                return swin3d.window_reverse(o.reshape(1, C1, H1, W1, N, Ds), ws, Cp, Hp, Wp)

            timed_loop(chain, x5, f"s{stage} chain part+qkvattn+rev (nW={nW})", fl, unit="tf")

            def make_direct(mode, Ds=Ds, heads=heads, dh=dh, scale=scale, Cp=Cp, Hp=Hp, Wp=Wp, C1=C1, H1=H1, W1=W1, wq=wq, bq=bq):
                wqk = wq
                bqk = bq.reshape(1, 3 * Ds)

                def kernel(x_ref, w_ref, b_ref, out_ref):
                    blk = x_ref[0]  # (ws0, ws1, Wp, Ds)
                    if mode == "vec":
                        xt = blk.reshape(ws[0], ws[1], W1, ws[2], Ds)
                        xt = xt.transpose(2, 0, 1, 3, 4).reshape(W1 * N, Ds)
                    else:
                        xt = jnp.concatenate(
                            [
                                blk[:, :, j * ws[2] : (j + 1) * ws[2], :].reshape(N, Ds)
                                for j in range(W1)
                            ],
                            axis=0,
                        )
                    qkv = (
                        jax.lax.dot_general(
                            xt, w_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(xt.dtype)
                        + b_ref[...]
                    )
                    x = qkv.reshape(W1, N, 3 * Ds)
                    outs = []
                    for hh in range(heads):
                        q = x[..., hh * dh : (hh + 1) * dh]
                        k = x[..., Ds + hh * dh : Ds + (hh + 1) * dh]
                        v = x[..., 2 * Ds + hh * dh : 2 * Ds + (hh + 1) * dh]
                        logits = (
                            jax.lax.dot_general(
                                q, k,
                                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            )
                            * scale
                        )
                        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                        outs.append(
                            jax.lax.dot_general(
                                w, v,
                                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            ).astype(x.dtype)
                        )
                    o = jnp.concatenate(outs, axis=-1)  # (W1, N, Ds)
                    if mode == "vec":
                        o5 = o.reshape(W1, ws[0], ws[1], ws[2], Ds)
                        out_ref[0] = o5.transpose(1, 2, 0, 3, 4).reshape(ws[0], ws[1], Wp, Ds)
                    else:
                        o4 = o.reshape(W1, ws[0] * ws[1], ws[2], Ds)
                        for j in range(W1):
                            out_ref[0, :, :, j * ws[2] : (j + 1) * ws[2], :] = o4[j].reshape(
                                ws[0], ws[1], ws[2], Ds
                            )

                def run(a):
                    return pl.pallas_call(
                        kernel,
                        grid=(C1, H1),
                        in_specs=[
                            pl.BlockSpec(
                                (1, ws[0], ws[1], Wp, Ds),
                                lambda c, h: (0, c, h, 0, 0),
                                memory_space=pltpu.VMEM,
                            ),
                            pl.BlockSpec((Ds, 3 * Ds), lambda c, h: (0, 0), memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, 3 * Ds), lambda c, h: (0, 0), memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec(
                            (1, ws[0], ws[1], Wp, Ds),
                            lambda c, h: (0, c, h, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
                    )(a, wqk, bqk)

                return run

            for mode in ("vec", "loop"):
                try:
                    timed_loop(make_direct(mode), x5, f"s{stage} direct5d {mode}", fl, unit="tf")
                except Exception as e:
                    print(f"s{stage} direct5d {mode}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "no_attn" in variants:
        orig_wa = swin3d.window_attention_apply

        def wa_skip(p, x, num_heads, groups, rollout_step, cfg, project=True):
            # keep qkv+proj GEMMs, drop the attention core
            Dd = x.shape[-1]
            from aurora_tpu.model.nn import linear

            qkv = linear(p["qkv"], x)
            out = qkv[..., :Dd]
            return linear(p["proj"], out) if project else out

        swin3d.window_attention_apply = wa_skip
        try:
            timed_run(make_fn(bb), "no_attn (gemms+layout only)")
        finally:
            swin3d.window_attention_apply = orig_wa


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


if __name__ == "__main__":
    main()
