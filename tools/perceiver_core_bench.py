#!/usr/bin/env python
"""A/B the fused perceiver attention core against the chunked XLA formulation.

VERDICT r3 weak #7 / next-round #6: the agg/de-agg cross-attention core was the
largest above-floor slice left (encoder 76 vs ~40 ms floor, decoder de-agg ~96 ms
production). ops/resampler.py fuses kv-projection -> softmax -> weighted sum ->
out-proj -> ln1+residual into one Pallas kernel. This tool times both paths at
the REAL flagship shapes (decoder de-agg: K=3, M=64800, D=1024, Q=13; encoder
agg: K=13, M=64800, D=512, Q=3+ln_k) on the chip, same-run, and prints a JSON
accept/reject line per case.

Usage: python tools/perceiver_core_bench.py [--reps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_case(name, K, M, D, Q, heads, ln_k_q, value_bf16, reps):
    import jax
    import jax.numpy as jnp
    from aurora_tpu.model.perceiver import (
        perceiver_resampler_init,
        resampler_shared_query_apply,
    )

    kp, kq, kc = jax.random.split(jax.random.PRNGKey(0), 3)
    p = perceiver_resampler_init(
        kp, latent_dim=D, context_dim=D, depth=1, head_dim=D // heads,
        num_heads=heads, ln_k_q=ln_k_q,
    )
    queries = jax.random.normal(kq, (Q, D), jnp.float32)
    ctx = jax.random.normal(kc, (K, M, D), jnp.float32)

    def run(fuse_core):
        fn = jax.jit(
            lambda p_, q_, c_: resampler_shared_query_apply(
                p_, q_, c_, heads, ln_eps=1e-5, chunk_size=8192, k_major=True,
                fuse_mlp=True, value_bf16=value_bf16, fuse_core=fuse_core,
            )
        )
        # Time via a fused scalar reduction: on the tunnelled dev runtime,
        # block_until_ready can return before remote execution completes for
        # some output dtypes — a host scalar fetch is the reliable sync.
        fn_sum = jax.jit(
            lambda p_, q_, c_: resampler_shared_query_apply(
                p_, q_, c_, heads, ln_eps=1e-5, chunk_size=8192, k_major=True,
                fuse_mlp=True, value_bf16=value_bf16, fuse_core=fuse_core,
            ).sum()
        )
        out = fn(p, queries, ctx)
        jax.block_until_ready(out)
        float(fn_sum(p, queries, ctx))
        times = []
        for _ in range(reps):
            t0 = time.time()
            float(fn_sum(p, queries, ctx))
            times.append(time.time() - t0)
        return min(times), out

    import gc
    import numpy as np

    t_xla, out_xla = run(False)
    ref_slice = np.asarray(out_xla[:2048], np.float32)
    del out_xla
    gc.collect()
    t_fused, out_fused = run(True)
    fused_slice = np.asarray(out_fused[:2048], np.float32)
    del out_fused
    gc.collect()
    err = float(
        np.abs(fused_slice - ref_slice).max() / (np.abs(ref_slice).max() + 1e-30)
    )
    rec = {
        "case": name,
        "shapes": {"K": K, "M": M, "D": D, "Q": Q, "heads": heads},
        "value_bf16": value_bf16,
        "xla_ms": round(t_xla * 1e3, 2),
        "fused_ms": round(t_fused * 1e3, 2),
        "speedup": round(t_xla / t_fused, 3),
        "max_rel_err": err,
        "accept": t_fused < t_xla,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    # Flagship 0.25 deg shapes: 180*360 = 64800 token columns.
    bench_case("deagg_production", K=3, M=64800, D=1024, Q=13, heads=16,
               ln_k_q=False, value_bf16=True, reps=args.reps)
    bench_case("deagg_f32", K=3, M=64800, D=1024, Q=13, heads=16,
               ln_k_q=False, value_bf16=False, reps=args.reps)
    bench_case("agg_production", K=13, M=64800, D=512, Q=3, heads=16,
               ln_k_q=True, value_bf16=True, reps=args.reps)
    bench_case("agg_f32", K=13, M=64800, D=512, Q=3, heads=16,
               ln_k_q=True, value_bf16=False, reps=args.reps)


if __name__ == "__main__":
    main()
