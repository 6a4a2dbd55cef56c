#!/usr/bin/env python
"""Analytical FLOP/byte cost model and roofline targets for the 1.3 B model.

Host-side arithmetic only (no device) — prints the per-stage matmul FLOPs, the
bandwidth-bound terms, and speed-of-light step times for a given chip, so measured
numbers (BASELINE.md) can be judged against hardware limits.
"""

import argparse


def fmt(x):
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6)):
        if x >= div:
            return f"{x / div:.2f} {unit}"
    return f"{x:.0f} "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=720)
    ap.add_argument("--W", type=int, default=1440)
    ap.add_argument("--patch", type=int, default=4)
    ap.add_argument("--levels", type=int, default=13)
    ap.add_argument("--bf16-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args()

    P, C_A = args.patch, args.levels
    Hp, Wp = args.H // P, args.W // P
    latent = 4
    D = 512
    L = latent * Hp * Wp  # backbone tokens
    Lcol = Hp * Wp        # token columns

    enc_depths, dec_depths = (6, 10, 8), (8, 10, 6)
    heads = None
    N = 2 * 6 * 12

    total_flops = 0.0

    def stage_tokens(i):
        return latent * (Hp >> i) * (Wp >> i)

    print(f"grid {args.H}x{args.W} patch {P}: backbone tokens L={L:,}")

    # Patch embeds: one strided conv per var set ~ 2*Lcol*(V*T*P^2)*D
    embed_flops = 2 * Lcol * (7 * 2 * P * P) * D + C_A * 2 * Lcol * (5 * 2 * P * P) * D
    total_flops += embed_flops
    print(f"patch embeds: {fmt(embed_flops)}F")

    # Encoder/decoder perceiver (agg + deagg), f32: kv/q/out + mlp over L columns.
    agg = 2 * Lcol * C_A * D * (2 * D) + 2 * Lcol * latent * D * D * 2 + 2 * Lcol * latent * D * 4 * D * 2
    deagg_D = 2 * D
    deagg = 2 * Lcol * C_A * deagg_D * (2 * deagg_D) + 2 * Lcol * C_A * deagg_D * deagg_D * 2 \
        + 2 * Lcol * C_A * deagg_D * 2 * deagg_D * 2
    total_flops += agg + deagg
    print(f"level agg/deagg: {fmt(agg)}F / {fmt(deagg)}F")

    # Backbone blocks.
    bb = 0.0
    for stage, depth in enumerate(enc_depths):
        d = D * 2**stage
        tok = stage_tokens(stage)
        per_block = 2 * tok * d * 3 * d + 2 * tok * d * d + 2 * 2 * tok * N * d + 2 * tok * d * 4 * d * 2
        bb += depth * per_block
    for stage, depth in zip((2, 1, 0), dec_depths):
        d = D * 2**stage
        tok = stage_tokens(stage)
        per_block = 2 * tok * d * 3 * d + 2 * tok * d * d + 2 * 2 * tok * N * d + 2 * tok * d * 4 * d * 2
        bb += depth * per_block
    total_flops += bb
    print(f"backbone matmuls: {fmt(bb)}F")

    # Decoder heads.
    head_flops = 2 * Lcol * (2 * D) * (4 * P * P) + C_A * 2 * Lcol * (2 * D) * (5 * P * P)
    total_flops += head_flops
    print(f"decoder heads: {fmt(head_flops)}F")

    # Bandwidth: inputs + outputs + one activation pass per block (optimistic).
    fields = (4 + 3 + 5 * C_A) * args.H * args.W * 4
    act_bytes = sum(
        2 * stage_tokens(s) * D * 2**s * 2 * d_cnt
        for s, d_cnt in enumerate(enc_depths)
    ) * 2
    bytes_moved = 2 * fields + act_bytes

    t_compute = total_flops / (args.bf16_tflops * 1e12)
    t_mem = bytes_moved / (args.hbm_gbps * 1e9)
    print(f"\ntotal matmul FLOPs: {fmt(total_flops)}F")
    print(f"speed of light: compute {t_compute*1e3:.0f} ms, memory floor {t_mem*1e3:.0f} ms")
    print(f"=> step floor ~{max(t_compute, t_mem)*1e3:.0f} ms on this chip "
          f"({args.bf16_tflops:.0f} TF/s bf16, {args.hbm_gbps:.0f} GB/s)")


if __name__ == "__main__":
    main()
