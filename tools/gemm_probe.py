#!/usr/bin/env python
"""Probe XLA + Pallas GEMM throughput vs output width N at backbone shapes.

Observed (tools/backbone_ablate.py --variants gemms): GEMM wall time tracks M·K and
is nearly independent of N for K=512 (proj N=512 runs at 19% MXU while fc1 N=2048
runs at 73%). This maps the curve and tests whether a hand-blocked Pallas GEMM can
beat XLA for the narrow shapes, which decides the fix for the block tails
(tile choice vs structural widening).
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = args.iters
    print(f"device {jax.devices()[0].device_kind}", flush=True)

    def timed_loop(f, x_init, label, per_iter_flops):
        g = jax.jit(lambda xx: jax.lax.fori_loop(0, ITERS, lambda _, acc: f(acc), xx))
        out = g(x_init)
        float(out[(0,) * out.ndim])
        times = []
        for i in range(args.steps):
            t0 = time.time()
            out = g(x_init + jnp.bfloat16((i + 1) * 1e-8))
            float(out[(0,) * out.ndim])
            times.append(time.time() - t0)
        t = min(times) / ITERS
        print(
            f"{label}: {t*1e3:6.2f} ms = {per_iter_flops/t/1e12:6.1f} TF/s "
            f"({per_iter_flops/t/1e12/197*100:4.1f}% MXU)",
            flush=True,
        )
        return t

    M, K = 259200, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)

    # 1) XLA: N sweep at fixed M, K. Chain via slicing the output back to (M, K).
    for N in (512, 1024, 2048):
        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02

        def step(a, w=w):
            y = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            return y[:, :K]

        timed_loop(step, x, f"xla M={M} K={K} N={N}", 2 * M * K * N)

    # 2) XLA f32 accumulate-to-f32-out vs bf16 out at proj shape (write cost?).
    w512 = jax.random.normal(jax.random.PRNGKey(1), (K, K), jnp.bfloat16) * 0.02

    def step_f32out(a):
        y = jax.lax.dot_general(
            a.astype(jnp.bfloat16), w512, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y  # chained in f32? shape mismatch -> wrap below

    g = jax.jit(
        lambda xx: jax.lax.fori_loop(
            0, ITERS, lambda _, acc: step_f32out(acc).astype(jnp.bfloat16), xx
        )
    )
    out = g(x)
    float(out[(0, 0)])
    ts = []
    for i in range(args.steps):
        t0 = time.time()
        out = g(x + jnp.bfloat16((i + 1) * 1e-8))
        float(out[(0, 0)])
        ts.append(time.time() - t0)
    t = min(ts) / ITERS
    print(f"xla proj f32-acc: {t*1e3:6.2f} ms = {2*M*K*K/t/1e12:6.1f} TF/s", flush=True)

    # 3) Pallas pure GEMM at proj shape: M-block sweep, full K, full N in VMEM.
    def pallas_gemm(a, w, MB):
        rows = a.shape[0]
        N = w.shape[1]

        def kernel(a_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(rows // MB,),
            in_specs=[
                pl.BlockSpec((MB, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((a.shape[1], N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MB, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, N), a.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * a.shape[1] * N,
                bytes_accessed=(rows * a.shape[1] + a.shape[1] * N + rows * N) * 2,
                transcendentals=0,
            ),
        )(a, w)

    for MB in (512, 1024, 2160, 3240):
        if M % MB:
            continue

        def stepp(a, MB=MB):
            return pallas_gemm(a, w512, MB)

        try:
            timed_loop(stepp, x, f"pallas proj MB={MB}", 2 * M * K * K)
        except Exception as e:
            print(f"pallas proj MB={MB}: FAIL {type(e).__name__}: {e}", flush=True)

    # 3b) Feature-major activations: X stored (K, M), output (N, M).
    # The N-sweep above fits t = c1*M*K + (M*K*N/peak): a fixed per-(M,K) cost
    # ~3x the pure-FLOP time at N=512, i.e. the M-major activation stream feeds
    # the MXU at ~120 GB/s. If the transposed layout kills the offset, the block
    # GEMMs should run feature-major.
    xT = jnp.asarray(x.T)  # (K, M) contiguous
    for N in (512, 2048):
        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02

        def step_t(aT, w=w, N=N):
            # (K, N) x (K, M) -> (N, M), contracting dim 0 of both ("TN" GEMM).
            y = jax.lax.dot_general(
                w, aT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            return y[:K] if N >= K else jnp.concatenate([y] * (K // N), axis=0)

        timed_loop(step_t, xT, f"xla feat-major K={K} N={N} (out (N,M))", 2 * M * K * N)

    # 3c) f32 M-major at N=512: is the fixed offset a bf16-layout cost?
    xf = x.astype(jnp.float32)
    wf32 = jax.random.normal(jax.random.PRNGKey(1), (K, K), jnp.float32) * 0.02

    def step_f(a):
        y = jax.lax.dot_general(
            a, wf32, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y

    timed_loop(step_f, xf, f"xla f32 M={M} K={K} N={K}", 2 * M * K * K)

    # 4) fc2 shape (K=2048 -> N=512): XLA vs Pallas with K accumulation in-VMEM.
    M2, K2, N2 = 64800, 2048, 512
    x2 = jax.random.normal(jax.random.PRNGKey(2), (M2, K2), jnp.bfloat16)
    wf = jax.random.normal(jax.random.PRNGKey(3), (K2, N2), jnp.bfloat16) * 0.02

    def fc2_step(a):
        y = jax.lax.dot_general(
            a, wf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return jnp.concatenate([y, y, y, y], axis=-1)

    timed_loop(fc2_step, x2, f"xla fc2 M={M2} K={K2} N={N2} (+concat)", 2 * M2 * K2 * N2)

    for MB in (540, 1080, 2160):
        if M2 % MB:
            continue

        def stepf(a, MB=MB):
            y = pallas_gemm(a, wf, MB)
            return jnp.concatenate([y, y, y, y], axis=-1)

        try:
            timed_loop(stepf, x2, f"pallas fc2 MB={MB}", 2 * M2 * K2 * N2)
        except Exception as e:
            print(f"pallas fc2 MB={MB}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
