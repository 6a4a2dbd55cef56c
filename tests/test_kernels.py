"""Pallas-kernel equivalence (interpret mode) and low-precision numerics tests.

The production TPU attention path is the fused Pallas window-SDPA kernel
(aurora_tpu/model/swin3d.py); the CI suite runs on CPU, so without these tests the
kernel would ship unexercised. ``pl.pallas_call(..., interpret=True)`` runs the same
kernel body through the Pallas interpreter on any backend, which lets us assert
bit-level agreement in structure (same masking, same head slicing) against the plain
XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.model.nn import layernorm, sdpa
from aurora_tpu.model.swin3d import _sdpa_windows_fused_pallas
from aurora_tpu.ops.masks import window_group_ids


def _xla_sdpa_windows(qkv, num_heads, groups):
    """The reference XLA path of window_attention_apply (swin3d.py)."""
    B, nW, N, D3 = qkv.shape
    D = D3 // 3
    qkv = qkv.reshape(B, nW, N, 3, num_heads, D // num_heads)
    qkv = qkv.transpose(3, 0, 1, 4, 2, 5)
    q, k, v = qkv[0], qkv[1], qkv[2]
    bias = None
    if groups is not None:
        g = jnp.asarray(groups)
        bias = jnp.where(g[:, :, None] == g[:, None, :], 0.0, -100.0).astype(
            jnp.float32
        )[None, :, None, :, :]
    out = sdpa(q, k, v, bias=bias)
    return out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, D)


@pytest.mark.parametrize("num_heads", [2, 4])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_window_sdpa_matches_xla(num_heads, masked):
    """Fused Pallas kernel (interpret mode) == XLA SDPA, with and without masks.

    The masked case uses real shifted-window group ids on a grid that is NOT a
    window multiple, so padded-window group ids (the fresh id assigned to padding
    tokens) are exercised too.
    """
    ws, ss = (2, 3, 4), (0, 1, 2)
    C, H, W = 4, 7, 10  # H, W not multiples of ws -> padded windows
    groups = window_group_ids(C, H, W, ws, ss) if masked else None
    Cp, Hp, Wp = 4, 9, 12  # padded grid
    nW = (Cp // ws[0]) * (Hp // ws[1]) * (Wp // ws[2])
    N = ws[0] * ws[1] * ws[2]
    if masked:
        assert groups.shape == (nW, N)
        assert groups.max() >= 27  # padding group id present

    B, D = 2, 8 * num_heads
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, nW, N, 3 * D), jnp.float32)

    got = _sdpa_windows_fused_pallas(qkv, num_heads, groups, interpret=True)
    want = _xla_sdpa_windows(qkv, num_heads, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("num_heads", [2, 4])
@pytest.mark.parametrize("masked", [False, True])
def test_qkv_fused_window_attention_matches_xla(num_heads, masked):
    """QKV-projection-fused attention kernel (interpret mode) == linear + XLA SDPA."""
    from aurora_tpu.model.nn import linear
    from aurora_tpu.model.swin3d import _attn_windows_qkv_fused_pallas

    ws, ss = (2, 3, 4), (0, 1, 2)
    C, H, W = 4, 7, 10
    groups = window_group_ids(C, H, W, ws, ss) if masked else None
    Cp, Hp, Wp = 4, 9, 12
    nW = (Cp // ws[0]) * (Hp // ws[1]) * (Wp // ws[2])
    N = ws[0] * ws[1] * ws[2]

    B, D = 2, 8 * num_heads
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    xw = jax.random.normal(k1, (B, nW, N, D), jnp.float32)
    wqkv = jax.random.normal(k2, (D, 3 * D), jnp.float32) * 0.05
    bqkv = jax.random.normal(k3, (3 * D,), jnp.float32) * 0.02

    got = _attn_windows_qkv_fused_pallas(xw, wqkv, bqkv, num_heads, groups, interpret=True)
    qkv = linear({"weight": wqkv, "bias": bqkv}, xw.reshape(B * nW * N, D)).reshape(
        B, nW, N, 3 * D
    )
    want = _xla_sdpa_windows(qkv, num_heads, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("num_heads", [2, 4])
@pytest.mark.parametrize("masked", [False, True])
def test_attn_tail_fused_matches_xla(num_heads, masked):
    """Attention kernel with the in-kernel block tail (proj -> AdaLN -> +residual)
    == linear + XLA SDPA + the unfused tail chain, including FiLM modulations."""
    from aurora_tpu.model.nn import linear
    from aurora_tpu.model.swin3d import _attn_windows_qkv_fused_pallas

    ws, ss = (2, 3, 4), (0, 1, 2)
    C, H, W = 4, 7, 10
    groups = window_group_ids(C, H, W, ws, ss) if masked else None
    Cp, Hp, Wp = 4, 9, 12
    nW = (Cp // ws[0]) * (Hp // ws[1]) * (Wp // ws[2])
    N = ws[0] * ws[1] * ws[2]

    B, D = 2, 8 * num_heads
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    xw = jax.random.normal(ks[0], (B, nW, N, D), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.02
    wproj = jax.random.normal(ks[3], (D, D), jnp.float32) * 0.05
    bproj = jax.random.normal(ks[4], (D,), jnp.float32) * 0.02
    shift = jax.random.normal(ks[5], (B, D), jnp.float32)
    scale = jax.random.normal(ks[6], (B, D), jnp.float32) * 0.3

    got = _attn_windows_qkv_fused_pallas(
        xw, wqkv, bqkv, num_heads, groups, interpret=True,
        tail=(wproj, bproj, shift, scale),
    )

    qkv = linear({"weight": wqkv, "bias": bqkv}, xw.reshape(B * nW * N, D)).reshape(
        B, nW, N, 3 * D
    )
    attn = _xla_sdpa_windows(qkv, num_heads, groups)
    y = linear({"weight": wproj, "bias": bproj}, attn.reshape(B * nW * N, D)).reshape(
        B, nW, N, D
    )
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    ln = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    want = xw + ln * scale[:, None, None, :] + shift[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("num_heads", [2, 4])
@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("with_tail", [False, True])
def test_attn_5d_direct_matches_windowed_kernel(num_heads, masked, with_tail):
    """5D direct-window kernel == window_partition -> qkv-fused kernel -> reverse.

    The 5D kernel reads windows straight from the padded (B, Cp, Hp, Wp, D) token
    tensor via BlockSpecs (in-kernel gather/scatter); this asserts the exact
    production equivalence it replaces, for masked shifted windows on a padded
    grid and for the in-kernel block tail.
    """
    from aurora_tpu.model.swin3d import (
        _attn_windows_5d_fused_pallas,
        _attn_windows_qkv_fused_pallas,
        window_partition,
        window_reverse,
    )

    ws, ss = (2, 3, 4), (0, 1, 2)
    C, H, W = 4, 7, 10
    groups = window_group_ids(C, H, W, ws, ss) if masked else None
    Cp, Hp, Wp = 4, 9, 12  # padded grid (multiple windows along each axis)
    nW = (Cp // ws[0]) * (Hp // ws[1]) * (Wp // ws[2])
    N = ws[0] * ws[1] * ws[2]

    B, D = 2, 8 * num_heads
    ks = jax.random.split(jax.random.PRNGKey(11), 7)
    x5 = jax.random.normal(ks[0], (B, Cp, Hp, Wp, D), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.02
    tail = None
    if with_tail:
        wproj = jax.random.normal(ks[3], (D, D), jnp.float32) * 0.05
        bproj = jax.random.normal(ks[4], (D,), jnp.float32) * 0.02
        shift = jax.random.normal(ks[5], (B, D), jnp.float32)
        scale = jax.random.normal(ks[6], (B, D), jnp.float32) * 0.3
        tail = (wproj, bproj, shift, scale)

    got = _attn_windows_5d_fused_pallas(
        x5, wqkv, bqkv, num_heads, groups, ws, interpret=True, tail=tail
    )
    wdw = window_partition(x5, ws)
    ref = _attn_windows_qkv_fused_pallas(
        wdw.reshape(B, nW, N, D), wqkv, bqkv, num_heads, groups,
        interpret=True, tail=tail,
    )
    want = window_reverse(ref.reshape(wdw.shape), ws, Cp, Hp, Wp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("kw", [1, 2])
def test_attn_5d_direct_window_batching(masked, kw, monkeypatch):
    """KW < W1 (several grid steps per block row) gives results identical to
    KW == W1, and the mask block indexing stays aligned with the window order."""
    import aurora_tpu.model.swin3d as swin3d_mod
    from aurora_tpu.model.swin3d import _attn_windows_5d_fused_pallas

    ws, ss = (2, 3, 4), (1, 1, 2)
    Cp, Hp, Wp = 2, 6, 16  # W1 = 4 windows along W
    groups = window_group_ids(Cp, Hp, Wp, ws, ss) if masked else None
    B, D, num_heads = 1, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    x5 = jax.random.normal(ks[0], (B, Cp, Hp, Wp, D), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.02

    full = _attn_windows_5d_fused_pallas(
        x5, wqkv, bqkv, num_heads, groups, ws, interpret=True
    )
    monkeypatch.setattr(swin3d_mod, "_pick_window_row_batch", lambda W1, ws2, pw, b: kw)
    small = _attn_windows_5d_fused_pallas(
        x5, wqkv, bqkv, num_heads, groups, ws, interpret=True
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(small), atol=1e-6, rtol=1e-6)


def test_fused_window_sdpa_padding_tokens_isolated():
    """Padding tokens must not leak into real tokens' outputs.

    Compare a masked window where padding-token *values* are zeroed vs. filled with
    garbage: real-token outputs must be identical.
    """
    ws, ss = (1, 2, 4), (0, 1, 2)
    C, H, W = 1, 3, 6  # pads H 3->4
    groups = window_group_ids(C, H, W, ws, ss)
    nW, N = groups.shape
    pad_id = groups.max()
    B, h, D = 1, 2, 16
    key = jax.random.PRNGKey(1)
    qkv = jax.random.normal(key, (B, nW, N, 3 * D), jnp.float32)

    # The mask is the reference's *soft* -100 additive bias, so keep the garbage at
    # activation scale (huge values would overwhelm -100 in the reference too).
    pad_mask = jnp.asarray(groups == pad_id)[None, :, :, None]
    qkv_garbage = jnp.where(pad_mask, 7.0, qkv)

    out_a = _sdpa_windows_fused_pallas(qkv, h, groups, interpret=True)
    out_b = _sdpa_windows_fused_pallas(qkv_garbage, h, groups, interpret=True)
    real = ~np.asarray(groups == pad_id)
    np.testing.assert_allclose(
        np.asarray(out_a)[:, real], np.asarray(out_b)[:, real], atol=1e-4, rtol=1e-4
    )


def test_shared_query_resampler_fused_mlp_matches_unfused():
    """fuse_mlp=True (kernel tail, interpret mode on CPU) == the plain XLA tail."""
    from aurora_tpu.model.perceiver import (
        perceiver_resampler_init,
        resampler_shared_query_apply,
    )

    D, nh, Q, K, M = 64, 4, 13, 3, 48
    p = perceiver_resampler_init(
        jax.random.PRNGKey(0), latent_dim=D, context_dim=D, depth=1,
        head_dim=D // nh, num_heads=nh, mlp_ratio=2.0,
    )
    # Non-trivial affine LN so the fold (scale_bias=0, scale=w, shift=b) is exercised.
    p["layers"][0]["ln2"]["weight"] = 1.0 + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (D,))
    p["layers"][0]["ln2"]["bias"] = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (D,))
    queries = jax.random.normal(jax.random.PRNGKey(3), (Q, D))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (K, M, D))

    want = resampler_shared_query_apply(p, queries, ctx, nh, k_major=True)
    got = resampler_shared_query_apply(p, queries, ctx, nh, k_major=True, fuse_mlp=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "shifts", [(-1, -3, -6), (1, 3, 6), (0, 5, 0), (2, 0, 7), (0, 0, 3), (3, 2, 1)]
)
def test_roll3d_pallas_matches_jnp(shifts):
    """Single-pass Pallas roll (interpret mode) == jnp.roll over (C, H, W)."""
    from aurora_tpu.ops.roll import roll3d_pallas

    B, C, H, W, D = 2, 4, 10, 12, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, W, D), jnp.float32)
    want = jnp.roll(x, shift=shifts, axis=(1, 2, 3))
    got = roll3d_pallas(x, shifts, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_layernorm_large_mean_channels():
    """bf16 LN uses a shifted-variance form: must stay accurate when |mean| >> std.

    Transformer residual streams routinely carry large-mean outlier channels; the
    naive E[x^2]-E[x]^2 form with a bf16 square loses (mean/std)^2 * 0.4% of the
    variance to cancellation. The shifted form bounds the error at ~1% of var.
    """
    rng = np.random.default_rng(0)
    for mean, std in [(0.0, 1.0), (100.0, 0.5), (-3000.0, 1.0), (1e4, 2.0)]:
        x64 = mean + std * rng.standard_normal((4, 512))
        x = jnp.asarray(x64, jnp.bfloat16)
        got = np.asarray(layernorm(None, x), np.float64)

        # Reference: exact LN of the *bf16-quantised* values (the input the kernel
        # actually sees), in f64.
        xq = np.asarray(x, np.float64)
        mu = xq.mean(-1, keepdims=True)
        var = ((xq - mu) ** 2).mean(-1, keepdims=True)
        want = (xq - mu) / np.sqrt(var + 1e-5)

        err = np.abs(got - want).max()
        assert err < 0.06, f"mean={mean} std={std}: max err {err}"


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_mlp_adaln_residual_fused_matches_xla(dtype):
    """The fused block-tail kernel (mlp -> AdaLN -> +residual) == the unfused path."""
    import jax.numpy as jnp

    from aurora_tpu.model.nn import adaptive_layernorm, mlp
    from aurora_tpu.ops.mlp import mlp_adaln_residual_fused

    dt = jnp.dtype(dtype)
    B, L, D, Hd = 2, 64, 128, 256
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, L, D), dt)
    w1 = jax.random.normal(ks[1], (D, Hd), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (Hd,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[3], (Hd, D), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (D,), jnp.float32) * 0.05
    c = jax.random.normal(ks[5], (B, D), dt)
    mod_p = {
        "modulation": {
            "weight": jax.random.normal(jax.random.PRNGKey(9), (D, 2 * D), jnp.float32) * 0.02,
            "bias": jnp.zeros((2 * D,), jnp.float32),
        }
    }

    mlp_p = {"fc1": {"weight": w1, "bias": b1}, "fc2": {"weight": w2, "bias": b2}}
    want = x + adaptive_layernorm(mod_p, mlp(mlp_p, x), c)

    from aurora_tpu.model.nn import linear

    mod = linear(mod_p["modulation"], jax.nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    got = mlp_adaln_residual_fused(x, w1, b1, w2, b2, shift, scale, interpret=True)

    a = np.asarray(want, np.float64)
    b = np.asarray(got, np.float64)
    tol = 1e-5 if dtype == "float32" else 0.03
    assert np.abs(a - b).max() < tol, np.abs(a - b).max()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_linear_adaln_residual_fused_matches_xla(dtype):
    """The fused attention-tail kernel (proj -> AdaLN -> +residual) == unfused."""
    from aurora_tpu.model.nn import adaptive_layernorm, linear
    from aurora_tpu.ops.mlp import linear_adaln_residual_fused

    dt = jnp.dtype(dtype)
    B, L, D = 2, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (B, L, D), dt)
    shortcut = jax.random.normal(ks[1], (B, L, D), dt)
    w = jax.random.normal(ks[2], (D, D), jnp.float32) * 0.05
    b = jax.random.normal(ks[3], (D,), jnp.float32) * 0.05
    c = jax.random.normal(ks[4], (B, D), dt)
    mod_p = {
        "modulation": {
            "weight": jax.random.normal(jax.random.PRNGKey(8), (D, 2 * D), jnp.float32) * 0.02,
            "bias": jnp.zeros((2 * D,), jnp.float32),
        }
    }

    proj = {"weight": w, "bias": b}
    want = shortcut + adaptive_layernorm(mod_p, linear(proj, x), c)

    from aurora_tpu.model.nn import linear as _lin

    mod = _lin(mod_p["modulation"], jax.nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    got = linear_adaln_residual_fused(x, w, b, shortcut, shift, scale, interpret=True)

    a = np.asarray(want, np.float64)
    bb = np.asarray(got, np.float64)
    tol = 1e-5 if dtype == "float32" else 0.03
    assert np.abs(a - bb).max() < tol, np.abs(a - bb).max()


@pytest.mark.parametrize("ln_k_q", [False, True])
@pytest.mark.parametrize("depth", [1, 2])
def test_shared_query_resampler_matches_generic(ln_k_q, depth):
    """The hoisted shared-query resampler must equal the generic per-row path.

    Covers both production users: encoder level aggregation (learned latents,
    optional ln_k_q) and decoder de-aggregation (level embeddings, depth 1),
    chunked and single-shot.
    """
    from aurora_tpu.model.perceiver import (
        perceiver_resampler_apply,
        perceiver_resampler_init,
        resampler_shared_query_apply,
    )

    D, nh, Q, K, M = 64, 4, 5, 9, 23
    kp, kq, kc = jax.random.split(jax.random.PRNGKey(0), 3)
    p = perceiver_resampler_init(
        kp, latent_dim=D, context_dim=D, depth=depth, head_dim=D // nh,
        num_heads=nh, mlp_ratio=2.0, ln_k_q=ln_k_q, dtype=jnp.float32,
    )
    queries = jax.random.normal(kq, (Q, D), jnp.float32)
    ctx = jax.random.normal(kc, (M, K, D), jnp.float32)

    want = perceiver_resampler_apply(
        p, jnp.broadcast_to(queries[None], (M, Q, D)), ctx, nh
    )
    got = resampler_shared_query_apply(p, queries, ctx, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    got_chunked = resampler_shared_query_apply(p, queries, ctx, nh, chunk_size=8)
    np.testing.assert_allclose(
        np.asarray(got_chunked), np.asarray(got), atol=1e-7
    )


def test_mlp_chunked_backward_matches(monkeypatch):
    """Row-chunked MLP backward (AURORA_MLP_BWD_CHUNK_MIB) == unchunked grads."""
    import jax
    import jax.numpy as jnp
    from aurora_tpu.ops.mlp import mlp_adaln_residual_fused

    B, L, D, Hh = 2, 1024, 64, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, L, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, Hh)) * 0.1
    b1 = jax.random.normal(ks[2], (Hh,)) * 0.1
    w2 = jax.random.normal(ks[3], (Hh, D)) * 0.1
    b2 = jax.random.normal(ks[4], (D,)) * 0.1
    sh = jax.random.normal(ks[5], (B, D)) * 0.1
    sc = jax.random.normal(ks[6], (B, D)) * 0.1

    def loss(*a):
        return jnp.sum(mlp_adaln_residual_fused(*a, interpret=True) ** 2)

    monkeypatch.setenv("AURORA_MLP_BWD_CHUNK_MIB", "100000")
    g1 = jax.grad(loss, argnums=tuple(range(7)))(x, w1, b1, w2, b2, sh, sc)
    monkeypatch.setenv("AURORA_MLP_BWD_CHUNK_MIB", "1")  # forces 2 chunks
    g2 = jax.grad(loss, argnums=tuple(range(7)))(x, w1, b1, w2, b2, sh, sc)
    for a, b in zip(g1, g2):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
        assert err < 1e-5, (a.shape, err)


def test_mask_constants_knob_is_value_identical(monkeypatch):
    """AURORA_MASK_CONSTANTS=1 (the headline-bisect probe arm) swaps the in-graph
    where() bias for the embedded f32 constant — same values bit for bit."""
    import jax.numpy as jnp

    from aurora_tpu.ops import masks

    g = masks.window_group_ids(4, 12, 24, (2, 6, 12), (1, 3, 6))
    in_graph = masks.window_bias_in_graph(g)
    monkeypatch.setenv("AURORA_MASK_CONSTANTS", "1")
    constant = masks.window_bias_in_graph(g)
    assert jnp.array_equal(in_graph, jnp.asarray(constant))
