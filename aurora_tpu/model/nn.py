"""Minimal functional NN primitives on explicit parameter pytrees.

The whole framework is built on pure functions over nested-dict parameter pytrees — no
module framework. This is the most compiler-friendly shape for XLA: every model apply is
a pure function that composes freely with ``jit`` / ``grad`` / ``scan`` / ``shard_map`` /
``jax.checkpoint``, and the parameter tree maps 1:1 onto the reference checkpoint naming
(see :mod:`aurora_tpu.checkpoint` for the torch-name correspondence).

Conventions:
  * Linear: ``{"weight": (in, out), "bias": (out,)}`` — note the JAX (in, out) layout;
    the torch layout is ``(out, in)`` and is transposed by the checkpoint converter.
  * LayerNorm: ``{"weight": (d,), "bias": (d,)}``; non-affine LN has no parameters.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# ----------------------------------------------------------------------------- init


def trunc_normal_init(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal (±2σ) initialisation, the reference default for linear weights."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype=jnp.float32).astype(
        dtype
    )


def kaiming_uniform_init(key, shape, fan_in, dtype=jnp.float32):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the torch conv/LoRA-A default."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32).astype(
        dtype
    )


def linear_init(
    key, d_in: int, d_out: int, bias: bool = True, std: float = 0.02, dtype=jnp.float32
) -> Params:
    p = {"weight": trunc_normal_init(key, (d_in, d_out), std=std, dtype=dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def layernorm_init(d: int, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((d,), dtype=dtype), "bias": jnp.zeros((d,), dtype=dtype)}


# ---------------------------------------------------------------------------- apply


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layernorm(p: Optional[Params], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; pass ``p=None`` for the non-affine variant."""
    if x.dtype == jnp.bfloat16:
        # f32 statistics without materialising an f32 copy of the activation: the
        # two-pass f32 (x - mean) form makes XLA keep a full-size f32 buffer alive
        # (506 MB per LN for the 0.25-deg stage-1 tensor); reductions with an f32
        # accumulator fuse into single passes instead. Plain E[x^2]-E[x]^2 with a
        # bf16 square is catastrophically cancelled for |mean| >> std rows, so use
        # the *shifted* form: subtract a bf16 mean estimate before squaring. The
        # subtraction and square stay bf16 (no shared f32 buffer for CSE to
        # materialise); their rounding error is relative to |x - shift| ~ std, not
        # |x|, which bounds the variance error at ~1% of var for any mean/std ratio.
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        shift = mean.astype(x.dtype)
        meansq = jnp.mean(
            jnp.square(x - shift), axis=-1, keepdims=True, dtype=jnp.float32
        )
        resid = mean - shift.astype(jnp.float32)
        var = jnp.maximum(meansq - jnp.square(resid), 0.0)
        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    else:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU, matching ``torch.nn.GELU``."""
    return jax.nn.gelu(x, approximate=False)


def mlp_init(key, d_in: int, d_hidden: int, d_out: Optional[int] = None, dtype=jnp.float32):
    """Two-layer GELU MLP parameters (``fc1``/``fc2``)."""
    d_out = d_out or d_in
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, d_in, d_hidden, dtype=dtype),
        "fc2": linear_init(k2, d_hidden, d_out, dtype=dtype),
    }


def mlp(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def adaptive_layernorm_init(key, dim: int, context_dim: int, dtype=jnp.float32) -> Params:
    """FiLM-style adaptive LN (reference: aurora/model/film.py:14-49).

    The modulation linear is zero-initialised so the block starts as plain LN*(scale_bias).
    """
    return {
        "modulation": {
            "weight": jnp.zeros((context_dim, dim * 2), dtype=dtype),
            "bias": jnp.zeros((dim * 2,), dtype=dtype),
        }
    }


def adaptive_layernorm(
    p: Params, x: jax.Array, c: jax.Array, scale_bias: float = 0.0
) -> jax.Array:
    """``LN(x) * (scale_bias + scale(c)) + shift(c)`` with ``c`` of shape ``(B, Dc)``.

    ``x`` may have any rank ``(B, ..., D)``; the modulation broadcasts over the
    middle (token) axes.
    """
    mod = linear(p["modulation"], jax.nn.silu(c))  # (B, 2D)
    mod = mod.reshape(mod.shape[0], *([1] * (x.ndim - 2)), mod.shape[-1])
    shift, scale = jnp.split(mod, 2, axis=-1)
    return layernorm(None, x) * (scale_bias + scale) + shift


def dropout(x: jax.Array, rate: float, key: Optional[jax.Array]) -> jax.Array:
    """Inverted dropout (torch ``nn.Dropout`` semantics). Identity when ``key`` is
    ``None`` (inference) or ``rate == 0``."""
    if key is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def drop_path(x: jax.Array, rate: float, key: Optional[jax.Array]) -> jax.Array:
    """Stochastic depth (timm ``DropPath``): drop the whole residual branch per batch
    element with probability ``rate``, rescaling survivors by ``1/(1-rate)``.
    Identity when ``key`` is ``None`` (inference) or ``rate == 0``.
    Reference: aurora/model/swin3d.py:430,507-508.

    ``rate`` may be a traced scalar (the scan-over-blocks path feeds per-block
    rates as scan inputs); a traced 0 is bitwise identity (mask = 1, ×1.0/1.0)."""
    if key is None or (isinstance(rate, (int, float, np.floating)) and rate == 0.0):
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    # Divide in x.dtype: a traced (or strongly-typed numpy) rate would otherwise
    # promote bf16 activations to f32 — which breaks the scan-over-blocks carry
    # dtype under the autocast backbone (lax.scan requires a fixed carry type).
    return x * mask.astype(x.dtype) / jnp.asarray(keep, x.dtype)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over ``(..., heads, seq, head_dim)`` tensors.

    Softmax statistics are accumulated in f32 for low-precision inputs; the matmuls use
    the input dtype so they land on the MXU in bf16.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k)
    compute_dtype = jnp.float32 if logits.dtype == jnp.bfloat16 else logits.dtype
    logits = logits.astype(compute_dtype) * scale
    if bias is not None:
        logits = logits + bias.astype(compute_dtype)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...hkd->...hqd", weights, v)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """``(..., seq, H*Dh) -> (..., H, seq, Dh)``."""
    *lead, s, d = x.shape
    x = x.reshape(*lead, s, num_heads, d // num_heads)
    return jnp.swapaxes(x, -2, -3)


def merge_heads(x: jax.Array) -> jax.Array:
    """``(..., H, seq, Dh) -> (..., seq, H*Dh)``."""
    x = jnp.swapaxes(x, -2, -3)
    *lead, s, h, dh = x.shape
    return x.reshape(*lead, s, h * dh)


def keys(key, n: int):
    return list(jax.random.split(key, n))


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
