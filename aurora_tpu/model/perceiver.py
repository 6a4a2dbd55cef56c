"""Perceiver cross-attention resampler (level aggregation / de-aggregation).

Reference: aurora/model/perceiver.py:91-233. The resampler maps a small set of latent
query levels against a per-token context of physical pressure levels. In this framework
it runs batched over ``B × L`` token columns as one large batched matmul — the sequence
dims are tiny (≈3–13) but the batch is huge, which XLA maps well onto the MXU.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from aurora_tpu.model.nn import (
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    merge_heads,
    mlp,
    mlp_init,
    sdpa,
    split_heads,
)

__all__ = ["perceiver_resampler_init", "perceiver_resampler_apply", "resampler_shared_query_apply"]


def _attention_init(key, latent_dim, context_dim, head_dim, num_heads, ln_k_q, dtype):
    inner = head_dim * num_heads
    kq, kkv, ko = jax.random.split(key, 3)
    p = {
        "to_q": linear_init(kq, latent_dim, inner, bias=False, dtype=dtype),
        "to_kv": linear_init(kkv, context_dim, inner * 2, bias=False, dtype=dtype),
        "to_out": linear_init(ko, inner, latent_dim, bias=False, dtype=dtype),
    }
    if ln_k_q:
        p["ln_k"] = layernorm_init(inner, dtype=dtype)
        p["ln_q"] = layernorm_init(inner, dtype=dtype)
    return p


def _attention_apply(p, latents, x, num_heads):
    """Cross-attention latents←context. Shapes ``(..., L1, Dl)``, ``(..., L2, Dc)``.

    The optional extra LayerNorm on k/q (``stabilise_level_agg``) is applied *before*
    the head split (reference: aurora/model/perceiver.py:144-146).
    """
    q = linear(p["to_q"], latents)
    kv = linear(p["to_kv"], x)
    k, v = jnp.split(kv, 2, axis=-1)
    if "ln_k" in p:
        k = layernorm(p["ln_k"], k)
        q = layernorm(p["ln_q"], q)
    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    out = merge_heads(sdpa(q, k, v))
    return linear(p["to_out"], out)


def perceiver_resampler_init(
    key,
    latent_dim: int,
    context_dim: int,
    depth: int = 1,
    head_dim: int = 64,
    num_heads: int = 16,
    mlp_ratio: float = 4.0,
    ln_k_q: bool = False,
    dtype=jnp.float32,
):
    layers = []
    for i, k in enumerate(jax.random.split(key, depth)):
        ka, km = jax.random.split(k)
        layers.append(
            {
                "attn": _attention_init(
                    ka, latent_dim, context_dim, head_dim, num_heads,
                    ln_k_q=(ln_k_q and i == 0), dtype=dtype,
                ),
                "mlp": mlp_init(km, latent_dim, int(latent_dim * mlp_ratio), dtype=dtype),
                "ln1": layernorm_init(latent_dim, dtype=dtype),
                "ln2": layernorm_init(latent_dim, dtype=dtype),
            }
        )
    return {"layers": layers}


def perceiver_resampler_apply(
    p,
    latents: jax.Array,
    x: jax.Array,
    num_heads: int,
    ln_eps: float = 1e-5,
    residual_latent: bool = True,
) -> jax.Array:
    """Post-res-norm Perceiver blocks (Swin-v2 style; reference: perceiver.py:212-233)."""
    for layer in p["layers"]:
        attn_out = layernorm(layer["ln1"], _attention_apply(layer["attn"], latents, x, num_heads), eps=ln_eps)
        latents = attn_out + latents if residual_latent else attn_out
        latents = layernorm(layer["ln2"], mlp(layer["mlp"], latents), eps=ln_eps) + latents
    return latents


def _fuse_core_enabled() -> bool:
    """Escape hatch for the fused perceiver attention core (ops/resampler.py):
    AURORA_FUSE_PERCEIVER_CORE=0 falls back to the chunked XLA formulation."""
    import os

    return os.environ.get("AURORA_FUSE_PERCEIVER_CORE", "1") == "1"


def resampler_shared_query_apply(
    p,
    queries: jax.Array,
    ctx: jax.Array,
    num_heads: int,
    ln_eps: float = 1e-5,
    chunk_size=None,
    k_major: bool = False,
    fuse_mlp: bool = False,
    value_bf16: bool = False,
    fuse_core: bool = False,
) -> jax.Array:
    """Resampler specialised for queries that are IDENTICAL for every context row.

    ``queries``: (Q, D); ``ctx``: (M, K, D) -> (M, Q, D). Both the encoder's level
    aggregation (learned latents) and the decoder's de-aggregation (pressure-level
    embeddings) have this property, which the reference's per-column Perceiver calls
    cannot exploit (reference encoder.py:173-196 / decoder.py:140-166). Layer 0's
    query projection (+ optional stabilising LN) runs once on (Q, D); the per-row
    work reduces to three large flat GEMMs (kv / out / MLP) plus a tiny batched
    softmax. Deeper layers have row-dependent latents and run generically.

    ``k_major=True`` takes ``ctx`` as (K, M, D) instead — the layout the backbone
    hands the decoder ((C, H·W) token order). The (M, K) transpose of a tensor whose
    K axis is tiny (3–13) runs far below copy bandwidth on TPU (sublane-padded,
    measured 37 ms at 0.25°), so the resampler reads the level-major layout
    directly; the output is M-major either way.

    ``chunk_size`` bounds peak memory by lax.map-ing over column blocks —
    bit-identical to the single-shot path (rows are independent).

    ``value_bf16`` (the production ``agg_bf16``/``deagg_bf16`` mode) runs only the
    VALUE path — the v-projection, attention-weighted sum, out-projection and MLP,
    i.e. the FLOP- and bandwidth-dominant GEMMs — in bf16, while q/k/logits stay
    f32. The split matters: this is raw dot-product attention (unlike the backbone's
    cosine-bounded swin logits), so bf16-rounding q/k perturbs logits by ~0.4% of
    their MAGNITUDE, which softmax turns into O(1) weight error whenever logits are
    large — measured 2e-1 end-to-end vs 4e-3 for the value-only split
    (tools/production_drift.py decomposition, 2026-08-20).
    """
    # PROBE-ONLY (tools/headline_bisect.py): revert to the round-3 full-bf16
    # cross-attention — the behaviour b8bd0a5 fixed (20% production error) — so
    # the throughput cost of the mandatory f32-q/k split can be priced on-chip.
    # Never set outside the bisect tool; loudly announced so a leaked env var
    # cannot silently corrupt a serving or training process.
    if value_bf16 and os.environ.get("AURORA_UNSAFE_BF16_QK", "0") == "1":
        import sys as _sys

        print(
            "WARNING: AURORA_UNSAFE_BF16_QK=1 — perceiver q/k/logits running in "
            "bf16. This reintroduces a ~20% production error (b8bd0a5) and is "
            "only for throughput probes.",
            file=_sys.stderr, flush=True,
        )
        ctx = ctx.astype(jnp.bfloat16)

    if k_major:
        K, M, D = ctx.shape
    else:
        M, K, D = ctx.shape
    Q = queries.shape[0]
    layers = p["layers"]
    l0 = layers[0]

    q0 = linear(l0["attn"]["to_q"], queries)  # (Q, inner)
    if "ln_q" in l0["attn"]:
        q0 = layernorm(l0["attn"]["ln_q"], q0)
    inner = q0.shape[-1]
    dh = inner // num_heads
    scale = 1.0 / (dh**0.5)
    qh = q0.reshape(Q, num_heads, dh)

    # The attention "GEMMs" here are degenerate — Q and K are 3-13 while the
    # batch is ~10^5 — so any layout with q/k in the minor dims pads (8, 128)
    # tiles up to 43x and runs ~20x below copy bandwidth (measured ~100 ms for
    # ~5 GFLOP at 0.25°, tools/decoder_breakdown.py). The k_major core instead:
    #   * computes all (head, query) logits as ONE wide GEMM against a
    #     block-diagonal (inner, h*Q) matrix built from the shared queries,
    #   * softmaxes over the LEADING level axis (pure elementwise ops), and
    #   * merges heads inside the out-projection's dot_general (the (m,h,q,d)
    #     -> (m,q,inner) relayout never materialises).
    # All three are exact reformulations (added terms are exact zeros).
    wq_blockdiag = jnp.einsum(
        "qhd,hk->hdkq", qh, jnp.eye(num_heads, dtype=qh.dtype)
    ).reshape(inner, num_heads * Q)

    def split_kv(c):
        """k/v projections; under ``value_bf16`` k stays f32, only v runs bf16."""
        att = l0["attn"]
        if not value_bf16:
            kv = linear(att["to_kv"], c)
            return jnp.split(kv, 2, axis=-1)
        w = att["to_kv"]["weight"]
        k = c @ w[:, :inner]
        v = c.astype(jnp.bfloat16) @ w[:, inner:].astype(jnp.bfloat16)
        if "bias" in att["to_kv"]:
            k = k + att["to_kv"]["bias"][:inner]
            v = v + att["to_kv"]["bias"][inner:].astype(v.dtype)
        return k, v

    def columns_k_major(c):  # (K, m, D) -> (m, Q, D)
        k, v = split_kv(c)  # (K, m, inner)
        if "ln_k" in l0["attn"]:
            k = layernorm(l0["attn"]["ln_k"], k)
        logits = jax.lax.dot_general(
            k, wq_blockdiag.astype(k.dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32 if k.dtype == jnp.bfloat16 else None,
        )  # (K, m, h*Q)
        compute_dtype = jnp.float32 if logits.dtype == jnp.bfloat16 else logits.dtype
        logits = logits.astype(compute_dtype) * scale
        w = jax.nn.softmax(logits, axis=0).astype(v.dtype)
        w4 = w.reshape(*w.shape[:-1], num_heads, Q)  # (K, m, h, Q)
        v4 = v.reshape(*v.shape[:-1], num_heads, dh)  # (K, m, h, dh)
        o4 = jnp.sum(w4[..., None] * v4[..., None, :], axis=0)  # (m, h, Q, dh)
        # Head merge folded into the out-projection (contract h and dh at once).
        w_out = l0["attn"]["to_out"]["weight"].astype(o4.dtype)  # (inner, D_out)
        attn = jax.lax.dot_general(
            o4, w_out.reshape(num_heads, dh, -1),
            dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        )  # (m, Q, D_out)
        if "bias" in l0["attn"]["to_out"]:
            attn = attn + l0["attn"]["to_out"]["bias"].astype(attn.dtype)
        return attn

    def columns(c):  # (m, K, D) [or (K, m, D) when k_major] -> (m, Q, D)
        if k_major:
            attn = columns_k_major(c)
        else:
            k, v = split_kv(c)
            if "ln_k" in l0["attn"]:
                k = layernorm(l0["attn"]["ln_k"], k)
            k = k.reshape(*k.shape[:-1], num_heads, dh)
            v = v.reshape(*v.shape[:-1], num_heads, dh)
            logits = jnp.einsum("qhd,mkhd->mhqk", qh.astype(k.dtype), k)
            compute_dtype = jnp.float32 if logits.dtype == jnp.bfloat16 else logits.dtype
            logits = logits.astype(compute_dtype) * scale
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("mhqk,mkhd->mqhd", w, v).reshape(-1, Q, inner)
            attn = linear(l0["attn"]["to_out"], o)
        lat = layernorm(l0["ln1"], attn, eps=ln_eps) + queries[None].astype(attn.dtype)
        if fuse_mlp:
            # lat + LN(mlp(lat)): the fused block-tail kernel with the affine LN
            # folded into the FiLM slot (scale_bias=0, scale=LN weight, shift=LN
            # bias). The 4x hidden activation (14 TF / ~7 GB at 0.25°) never
            # touches HBM.
            from aurora_tpu.ops.mlp import mlp_adaln_residual_fused

            mp, ln2 = l0["mlp"], l0["ln2"]
            D_lat = lat.shape[-1]
            lat = mlp_adaln_residual_fused(
                lat.reshape(1, -1, D_lat),
                mp["fc1"]["weight"], mp["fc1"]["bias"],
                mp["fc2"]["weight"], mp["fc2"]["bias"],
                shift=ln2["bias"][None].astype(jnp.float32),
                scale=ln2["weight"][None].astype(jnp.float32),
                scale_bias=0.0,
                ln_eps=ln_eps,
                interpret=jax.default_backend() != "tpu",  # CI runs the kernel too
            ).reshape(lat.shape)
        else:
            lat = layernorm(l0["ln2"], mlp(l0["mlp"], lat), eps=ln_eps) + lat
        if value_bf16 and len(layers) > 1:
            lat = lat.astype(jnp.float32)  # deeper (row-dependent) layers stay f32
        for layer in layers[1:]:
            c_m = jnp.swapaxes(c, 0, 1) if k_major else c  # generic layers are M-major
            attn_out = layernorm(
                layer["ln1"], _attention_apply(layer["attn"], lat, c_m, num_heads), eps=ln_eps
            )
            lat = attn_out + lat
            lat = layernorm(layer["ln2"], mlp(layer["mlp"], lat), eps=ln_eps) + lat
        return lat

    if fuse_core and k_major and len(layers) == 1:
        # Fused Pallas attention core (ops/resampler.py): the kernel's own grid
        # walks column blocks, so the lax.map chunking is unnecessary — k, v,
        # logits, softmax weights and the weighted sum never touch HBM.
        from aurora_tpu.ops.resampler import make_q_major_blockdiag, perceiver_core_fused

        att = l0["attn"]
        w_kv = att["to_kv"]["weight"]
        b_kv = att["to_kv"].get("bias")
        pad = 0 if ctx.shape[1] % 8 == 0 else 8 - ctx.shape[1] % 8
        ctx_k = jnp.pad(ctx, ((0, 0), (0, pad), (0, 0))) if pad else ctx
        # Kernel-vs-XLA primal routing, measured on-chip at the flagship shapes:
        # the kernel wins the agg geometry (K>=Q: 1.17× bf16 / 1.35× f32) and f32
        # de-agg (1.08×) in isolation (tools/perceiver_core_bench.py), and the
        # round-5 same-session integrated bisect (tools/headline_bisect.py,
        # 2026-08-20, run 3) confirms it within noise of the best form (kernel_on
        # 0.800-0.804 vs core_off 0.799 s/step) — while the chunked-XLA primal
        # INSIDE this wrapper is the one clearly bad form (+50 ms/step, run 2).
        # The bf16 de-agg (K<Q) still routes to flat XLA GEMMs (3% faster there);
        # the chunked-scan backward (the train-memory fix) applies either way.
        # AURORA_PERCEIVER_USE_KERNEL=0/1 forces the routing for A/B probes.
        _force = os.environ.get("AURORA_PERCEIVER_USE_KERNEL")
        if _force is not None:
            use_kernel = _force == "1"
        else:
            use_kernel = (K >= Q) or not value_bf16
        lat = perceiver_core_fused(
            ctx_k,
            w_kv[:, :inner],
            None if b_kv is None else b_kv[:inner],
            w_kv[:, inner:],
            None if b_kv is None else b_kv[inner:],
            make_q_major_blockdiag(qh, num_heads),
            att["to_out"]["weight"],
            att["to_out"].get("bias"),
            l0["ln1"]["weight"],
            l0["ln1"]["bias"],
            queries,
            att["ln_k"]["weight"] if "ln_k" in att else None,
            att["ln_k"]["bias"] if "ln_k" in att else None,
            num_heads=num_heads,
            scale=scale,
            ln_eps=ln_eps,
            value_bf16=value_bf16,
            interpret=jax.default_backend() != "tpu",
            use_kernel=use_kernel,
        )[: ctx.shape[1]]  # (M, Q, D_out)
        if fuse_mlp:
            from aurora_tpu.ops.mlp import mlp_adaln_residual_fused
            from aurora_tpu.ops.resampler import _largest_block

            mp, ln2 = l0["mlp"], l0["ln2"]
            D_lat = lat.shape[-1]

            def mlp_half(xc):
                return mlp_adaln_residual_fused(
                    xc.reshape(1, -1, D_lat),
                    mp["fc1"]["weight"], mp["fc1"]["bias"],
                    mp["fc2"]["weight"], mp["fc2"]["bias"],
                    shift=ln2["bias"][None].astype(jnp.float32),
                    scale=ln2["weight"][None].astype(jnp.float32),
                    scale_bias=0.0,
                    ln_eps=ln_eps,
                    interpret=jax.default_backend() != "tpu",
                ).reshape(xc.shape)

            # Chunk the MLP over column blocks: the fused kernel's own backward
            # (vjp of its XLA reference) materialises the f32 pre-GELU hidden of
            # whatever it is handed — full-M at 0.25 deg would be ~14 GiB; the
            # lax.map transpose bounds it to one chunk (same bound the chunked
            # attention-map path had).
            Mf = lat.shape[0]
            CHM = _largest_block(Mf, chunk_size or 8192)
            if CHM < Mf:
                xs = lat.reshape(Mf // CHM, CHM, *lat.shape[1:])
                lat = jax.lax.map(mlp_half, xs).reshape(lat.shape)
            else:
                lat = mlp_half(lat)
        else:
            lat = layernorm(l0["ln2"], mlp(l0["mlp"], lat), eps=ln_eps) + lat
        return lat

    if chunk_size is not None and M > chunk_size:
        pad = (-M) % chunk_size
        if k_major:
            if pad:
                ctx = jnp.pad(ctx, ((0, 0), (0, pad), (0, 0)))
            blocks = jnp.moveaxis(ctx.reshape(K, -1, chunk_size, D), 1, 0)
        else:
            if pad:
                ctx = jnp.pad(ctx, ((0, pad), (0, 0), (0, 0)))
            blocks = ctx.reshape(-1, chunk_size, K, D)
        out = jax.lax.map(columns, blocks)
        return out.reshape(-1, Q, out.shape[-1])[:M]
    return columns(ctx)
