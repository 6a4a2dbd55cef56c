"""Equivalence + gradient tests for the fused perceiver attention core.

The fused kernel (ops/resampler.py, interpret mode on CPU) must match the
chunked XLA formulation it replaces (perceiver.resampler_shared_query_apply's
k-major core) — values per dtype budget, gradients through the chunked custom
vjp. Reference semantics: aurora/model/perceiver.py:91-152.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aurora_tpu.model.perceiver import (
    perceiver_resampler_init,
    resampler_shared_query_apply,
)

H = 4  # heads


def _setup(K=3, M=72, D=64, Q=5, ln_k_q=False, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kq, kc = jax.random.split(key, 3)
    p = perceiver_resampler_init(
        kp, latent_dim=D, context_dim=D, depth=1, head_dim=D // H, num_heads=H,
        ln_k_q=ln_k_q,
    )
    queries = jax.random.normal(kq, (Q, D), jnp.float32)
    ctx = jax.random.normal(kc, (K, M, D), jnp.float32)
    return p, queries, ctx


def _run(p, queries, ctx, fuse_core, value_bf16=False, chunk=None, fuse_mlp=False):
    return resampler_shared_query_apply(
        p, queries, ctx, H, ln_eps=1e-5, chunk_size=chunk, k_major=True,
        fuse_mlp=fuse_mlp, value_bf16=value_bf16, fuse_core=fuse_core,
    )


@pytest.mark.parametrize("ln_k_q", [False, True])
@pytest.mark.parametrize("fuse_mlp", [False, True])
def test_fused_core_matches_xla_f32(ln_k_q, fuse_mlp):
    p, queries, ctx = _setup(ln_k_q=ln_k_q)
    ref = _run(p, queries, ctx, fuse_core=False, chunk=24, fuse_mlp=fuse_mlp)
    out = _run(p, queries, ctx, fuse_core=True, fuse_mlp=fuse_mlp)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    assert err < 5e-6, err


def test_fused_core_matches_xla_bf16():
    p, queries, ctx = _setup()
    ref = _run(p, queries, ctx, fuse_core=False, value_bf16=True, chunk=24)
    out = _run(p, queries, ctx, fuse_core=True, value_bf16=True)
    assert out.dtype == ref.dtype == jnp.bfloat16
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-30)
    )
    assert err < 3e-2, err


def test_fused_core_pads_ragged_m():
    p, queries, ctx = _setup(M=70)  # not a multiple of 8 -> internal pad + crop
    ref = _run(p, queries, ctx, fuse_core=False)
    out = _run(p, queries, ctx, fuse_core=True)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    assert err < 5e-6, err


@pytest.mark.parametrize("chunked", [False, True])
def test_fused_core_gradients(chunked, monkeypatch):
    if chunked:
        monkeypatch.setenv("AURORA_RESAMPLER_BWD_CHUNK", "24")
    p, queries, ctx = _setup()

    def loss(p_, ctx_, fuse):
        out = _run(p_, queries, ctx_, fuse_core=fuse, chunk=24)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1))(p, ctx, False)
    g_out = jax.grad(loss, argnums=(0, 1))(p, ctx, True)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_o, _ = jax.tree_util.tree_flatten(g_out)
    for a, b in zip(flat_r, flat_o):
        sc = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / sc < 5e-5, (a.shape, b.shape)


def test_use_kernel_false_primal_matches():
    """The XLA-chunked primal (bf16 de-agg routing) equals the kernel primal."""
    from aurora_tpu.ops.resampler import make_q_major_blockdiag, perceiver_core_fused

    p, queries, ctx = _setup()
    att = p["layers"][0]["attn"]
    inner = att["to_q"]["weight"].shape[1]
    qh = (queries @ att["to_q"]["weight"]).reshape(-1, H, inner // H)
    args = dict(
        num_heads=H, scale=(inner // H) ** -0.5, ln_eps=1e-5, interpret=True,
    )
    common = (
        ctx,
        att["to_kv"]["weight"][:, :inner], None,
        att["to_kv"]["weight"][:, inner:], None,
        make_q_major_blockdiag(qh, H),
        att["to_out"]["weight"], None,
        p["layers"][0]["ln1"]["weight"], p["layers"][0]["ln1"]["bias"],
        queries,
    )
    a = perceiver_core_fused(*common, use_kernel=True, **args)
    b = perceiver_core_fused(*common, use_kernel=False, **args)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    assert err < 5e-6, err
