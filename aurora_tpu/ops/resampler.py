"""Fused Pallas kernel for the shared-query Perceiver attention core.

The encoder's level aggregation and the decoder's de-aggregation (reference
aurora/model/perceiver.py:91-152, encoder.py:173-196, decoder.py:140-166) are
cross-attentions with a degenerate geometry: the key/query sequence lengths are
tiny (K = 3-13 latent/pressure levels, Q = 3-13 queries) while the batch is the
whole token grid (~10^5 columns at 0.25 deg). The XLA formulation
(perceiver.resampler_shared_query_apply's k-major core) already reduces the work
to three wide GEMMs + an elementwise softmax, but each intermediate — k, v,
logits, softmax weights, the per-head weighted sum — is an (K, M, inner)-sized
HBM round trip between fusions.

This kernel runs the whole chain per column block in VMEM: kv projection ->
(optional ln_k) -> logits against a q-major block-diagonal query matrix ->
softmax over the level axis -> weighted value sum -> out-projection -> ln1 +
query residual. HBM sees exactly one read of the context and one write of the
(M, Q, D) output. The value path runs bf16 under ``value_bf16`` (the production
``agg_bf16``/``deagg_bf16`` mode) while q/k/logits stay f32 — the same split as
the XLA path (raw dot-product logits are magnitude-sensitive to input rounding).

Autodiff: like every fused kernel here, the primal is the kernel and the
backward is the vjp of the bit-matched XLA reference (ops/ad.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from aurora_tpu.ops.ad import force_interpret as _force_interpret

__all__ = ["perceiver_core_fused", "make_q_major_blockdiag"]

_VMEM_LIMIT = int(os.environ.get("AURORA_VMEM_LIMIT_MB", "120")) * 2**20
_ROW_CAP = int(os.environ.get("AURORA_RESAMPLER_ROW_CAP", "512"))


def _largest_block(M: int, cap: int) -> int:
    """Largest divisor of ``M`` that is a multiple of 8 and <= cap (else M)."""
    for cand in range(min(M, cap) // 8 * 8, 0, -8):
        if M % cand == 0:
            return cand
    return M


def make_q_major_blockdiag(qh: jax.Array, num_heads: int) -> jax.Array:
    """(Q, h, dh) per-head queries -> (Q, inner, h) per-query block-diagonal stack.

    For query ``q``, ``out[q]`` is the (inner, h) matrix whose column ``head``
    holds that head's query slice — ``k @ out[q]`` gives all per-head logits of
    query ``q`` in one dot. Per-query stacking keeps every in-kernel operand 2-D
    (Mosaic rejects lane-dim splits like (inner) -> (h, dh)); the XLA fallback
    in perceiver.py uses the single-matrix h-major form — both are exact
    reformulations of the same per-head dot."""
    Q, h, dh = qh.shape
    eye = jnp.eye(num_heads, dtype=qh.dtype)
    return jnp.einsum("qhd,hk->qhdk", qh, eye).reshape(Q, h * dh, num_heads)


def _head_expand_matrix(num_heads: int, dh: int, dtype) -> jax.Array:
    """(h, h*dh) 0/1 matrix: ``w @ E`` repeats each head weight across its dh
    lanes — the Mosaic-friendly form of a per-head scalar broadcast."""
    eye = jnp.eye(num_heads, dtype=dtype)
    return jnp.repeat(eye, dh, axis=1)


def _layernorm_f32(y, w, b, eps):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    ln = (yf - mean) * jax.lax.rsqrt(var + eps)
    return ln * w.astype(jnp.float32) + b.astype(jnp.float32)


def perceiver_core_fused(
    ctx: jax.Array,
    wk: jax.Array,
    bk: jax.Array | None,
    wv: jax.Array,
    bv: jax.Array | None,
    wq_bd: jax.Array,
    wout: jax.Array,
    bout: jax.Array | None,
    ln1_w: jax.Array,
    ln1_b: jax.Array,
    queries: jax.Array,
    lnk_w: jax.Array | None = None,
    lnk_b: jax.Array | None = None,
    *,
    num_heads: int,
    scale: float,
    ln_eps: float = 1e-5,
    value_bf16: bool = False,
    interpret: bool = False,
    use_kernel: bool = True,
):
    """Fused shared-query cross-attention core.

    ``ctx``: (K, M, D) k-major context; ``wk``/``wv``: (D, inner) key/value
    projections (the split halves of ``to_kv``); ``wq_bd``: (inner, Q*h) from
    :func:`make_q_major_blockdiag` (to_q + optional ln_q already applied);
    ``wout``: (inner, D_out); ``queries``: (Q, D_out) residual added after ln1.
    Returns (M, Q, D_out) — ``lat`` ready for the resampler's MLP half. Output
    dtype is bf16 under ``value_bf16`` (matching the XLA path), else f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or _force_interpret()
    K, M, D = ctx.shape
    inner = wk.shape[1]
    h = num_heads
    dh = inner // h
    Q = wq_bd.shape[0]
    D_out = wout.shape[1]
    out_dtype = jnp.bfloat16 if value_bf16 else ctx.dtype
    has_lnk = lnk_w is not None

    MB = _largest_block(M, _ROW_CAP)
    nM = M // MB

    wk = wk.astype(ctx.dtype)
    bk = None if bk is None else bk.astype(jnp.float32).reshape(1, inner)
    if value_bf16:
        wv = wv.astype(jnp.bfloat16)
        bv = None if bv is None else bv.astype(jnp.bfloat16).reshape(1, inner)
    else:
        wv = wv.astype(ctx.dtype)
        bv = None if bv is None else bv.astype(ctx.dtype).reshape(1, inner)
    wq_bd = wq_bd.astype(jnp.float32)
    wout = wout.astype(out_dtype)
    bout = None if bout is None else bout.astype(out_dtype).reshape(1, D_out)
    ln1_w = ln1_w.astype(jnp.float32).reshape(1, D_out)
    ln1_b = ln1_b.astype(jnp.float32).reshape(1, D_out)
    queries = queries.astype(jnp.float32)
    if has_lnk:
        lnk_w = lnk_w.astype(jnp.float32).reshape(1, inner)
        lnk_b = lnk_b.astype(jnp.float32).reshape(1, inner)

    def kernel(*refs):
        it = iter(refs)
        ctx_ref = next(it)
        wk_ref = next(it)
        bk_ref = next(it) if bk is not None else None
        wv_ref = next(it)
        bv_ref = next(it) if bv is not None else None
        wq_ref = next(it)
        e_ref = next(it)
        wout_ref = next(it)
        bout_ref = next(it) if bout is not None else None
        ln1w_ref = next(it)
        ln1b_ref = next(it)
        q_ref = next(it)
        lnkw_ref = next(it) if has_lnk else None
        lnkb_ref = next(it) if has_lnk else None
        out_ref = next(it)

        xt = ctx_ref[...]  # (K, MB, D)
        x2 = xt.reshape(K * MB, D)
        k = jax.lax.dot_general(
            x2, wk_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bk_ref is not None:
            k = k + bk_ref[...]
        if has_lnk:
            mean = jnp.mean(k, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(k - mean), axis=-1, keepdims=True)
            k = ((k - mean) * jax.lax.rsqrt(var + 1e-5)) * lnkw_ref[...] + lnkb_ref[...]
        xv = x2.astype(jnp.bfloat16) if value_bf16 else x2
        v = jax.lax.dot_general(
            xv, wv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xv.dtype)
        if bv_ref is not None:
            v = v + bv_ref[...]
        v2 = v.reshape(K, MB, inner)
        wout_t = wout_ref[...]
        ex = e_ref[...]  # (h, inner) 0/1 head-expansion matrix
        for q in range(Q):
            lq = (
                jax.lax.dot_general(
                    k, wq_ref[q],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            ).reshape(K, MB, h)
            mx = jnp.max(lq, axis=0, keepdims=True)
            e = jnp.exp(lq - mx)
            wq = (e / jnp.sum(e, axis=0, keepdims=True)).astype(v.dtype)  # (K, MB, h)

            def head_bcast(t):  # (MB, h) -> (MB, inner), per-head lane repeat
                return jax.lax.dot_general(
                    t, ex,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(v.dtype)

            o = head_bcast(wq[0]) * v2[0]
            for kk in range(1, K):
                o = o + head_bcast(wq[kk]) * v2[kk]
            attn_q = jax.lax.dot_general(
                o.astype(out_dtype), wout_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
            if bout_ref is not None:
                attn_q = attn_q + bout_ref[...]
            ln = _layernorm_f32(attn_q, ln1w_ref[...][0], ln1b_ref[...][0], ln_eps)
            out_ref[:, q, :] = (ln + q_ref[...][q][None, :]).astype(out_ref.dtype)

    in_specs = [
        pl.BlockSpec((K, MB, D), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [ctx, wk]
    if bk is not None:
        in_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(bk)
    in_specs.append(pl.BlockSpec((D, inner), lambda i: (0, 0), memory_space=pltpu.VMEM))
    inputs.append(wv)
    if bv is not None:
        in_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(bv)
    ex_mat = _head_expand_matrix(h, dh, jnp.bfloat16 if value_bf16 else ctx.dtype)
    in_specs += [
        pl.BlockSpec((Q, inner, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((inner, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [wq_bd, ex_mat, wout]
    if bout is not None:
        in_specs.append(pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(bout)
    in_specs += [
        pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Q, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [ln1_w, ln1_b, queries]
    if has_lnk:
        in_specs += [
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [lnk_w, lnk_b]

    def kernel_call(*arrs):
        return pl.pallas_call(
            kernel,
            grid=(nM,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (MB, Q, D_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((M, Q, D_out), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * K * M * D * 2 * inner  # kv projections
                + 2 * K * M * inner * Q * h // max(1, dh)  # logits (against Q*h cols)
                + 2 * M * Q * inner * D_out,  # out projection
                bytes_accessed=(K * M * D + M * Q * D_out) * ctx.dtype.itemsize
                + 2 * D * inner * ctx.dtype.itemsize,
                transcendentals=K * M * Q * h,
            ),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(*arrs)

    def xla_ref_m(ctx_a, Mc, *arrs):
        it = iter(arrs)
        wk_a = next(it)
        bk_a = next(it) if bk is not None else None
        wv_a = next(it)
        bv_a = next(it) if bv is not None else None
        wq_a = next(it)
        _ex_a = next(it)  # head-expansion matrix: kernel-only, unused here
        wout_a = next(it)
        bout_a = next(it) if bout is not None else None
        ln1w_a = next(it)
        ln1b_a = next(it)
        q_a = next(it)
        lnkw_a = next(it) if has_lnk else None
        lnkb_a = next(it) if has_lnk else None

        x2 = ctx_a.reshape(K * Mc, D)
        k = jax.lax.dot_general(
            x2, wk_a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bk_a is not None:
            k = k + bk_a
        if has_lnk:
            mean = jnp.mean(k, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(k - mean), axis=-1, keepdims=True)
            k = ((k - mean) * jax.lax.rsqrt(var + 1e-5)) * lnkw_a + lnkb_a
        xv = x2.astype(jnp.bfloat16) if value_bf16 else x2
        v = jax.lax.dot_general(
            xv, wv_a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xv.dtype)
        if bv_a is not None:
            v = v + bv_a
        logits = (
            jax.lax.dot_general(
                k, wq_a, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        ).reshape(K, Mc, Q, h)
        w4 = jax.nn.softmax(logits, axis=0).astype(v.dtype)
        v4 = v.reshape(K, Mc, h, dh)
        o4 = jnp.sum(w4[..., None] * v4[:, :, None, :, :], axis=0)  # (M, Q, h, dh)
        attn = jax.lax.dot_general(
            o4.reshape(Mc * Q, inner).astype(out_dtype), wout_a,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        if bout_a is not None:
            attn = attn + bout_a
        ln = _layernorm_f32(attn, ln1w_a[0], ln1b_a[0], ln_eps)
        out = ln.reshape(Mc, Q, D_out) + q_a[None, :, :]
        return out.astype(out_dtype)

    # Chunked backward: columns are independent, so the vjp of the XLA reference
    # runs over column chunks (lax.map) — per-chunk transients (k f32, o4, the
    # cotangent chain) stay bounded while weight cotangents accumulate in f32.
    # The unchunked vjp would materialise ~5 GiB of full-M intermediates at
    # 0.25 deg, which is exactly the train-memory profile this kernel replaces.
    CH = _largest_block(M, int(os.environ.get("AURORA_RESAMPLER_BWD_CHUNK", "8192")))
    nC = M // CH

    def primal(*args):
        if use_kernel:
            return kernel_call(*args)
        # XLA-chunked primal: at the bf16 de-agg geometry the flat-GEMM XLA form
        # measured faster than the kernel (tools/perceiver_core_bench.py) — keep
        # it as the forward while still replacing the lax.map-transpose backward
        # (the train-memory hog) with the chunked scan below.
        ctx_a, *wargs = args
        if nC == 1:
            return xla_ref_m(ctx_a, M, *wargs)
        chunks = jnp.moveaxis(ctx_a.reshape(K, nC, CH, D), 1, 0)
        out = jax.lax.map(lambda c: xla_ref_m(c, CH, *wargs), chunks)
        return out.reshape(M, Q, D_out)

    @jax.custom_vjp
    def f(*args):
        return primal(*args)

    def fwd(*args):
        return primal(*args), args

    def bwd(res, g):
        ctx_r, *wargs = res

        def ref_chunk(ctx_c, *wa):
            return xla_ref_m(ctx_c, CH, *wa)

        ctx_chunks = jnp.moveaxis(ctx_r.reshape(K, nC, CH, D), 1, 0)
        g_chunks = g.reshape(nC, CH, Q, D_out)
        zero_w = tuple(jnp.zeros(a.shape, jnp.float32) for a in wargs)

        def step(carry, xs):
            ctx_c, g_c = xs
            _, vjp = jax.vjp(ref_chunk, ctx_c, *wargs)
            grads = vjp(g_c)
            carry = tuple(c + gw.astype(jnp.float32) for c, gw in zip(carry, grads[1:]))
            return carry, grads[0]

        acc, dctx_chunks = jax.lax.scan(step, zero_w, (ctx_chunks, g_chunks))
        dctx = jnp.moveaxis(dctx_chunks, 0, 1).reshape(K, M, D)
        return (dctx,) + tuple(a.astype(w.dtype) for a, w in zip(acc, wargs))

    f.defvjp(fwd, bwd)
    return f(*inputs)
