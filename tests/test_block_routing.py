"""Block-level kernel ROUTING coverage (ADVICE r2): with AURORA_PALLAS_INTERPRET=1 the
``swin_block_apply`` fast paths (5D direct-window kernel, in-kernel block tail, fused
MLP, Pallas roll) run through the Pallas interpreter on CPU — so CI exercises the
routing itself, not just the kernels in isolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.model import swin3d


def _cfg(**kw):
    return swin3d.BackboneConfig(
        embed_dim=64,
        encoder_depths=(2,),
        encoder_num_heads=(4,),
        decoder_depths=(2,),
        decoder_num_heads=(4,),
        window_size=(2, 4, 4),
        **kw,
    )


@pytest.mark.parametrize("shifted", [False, True])
@pytest.mark.parametrize("impl", ["pallas", "pallas_windowed"])
def test_block_kernel_routing_matches_xla(monkeypatch, shifted, impl):
    monkeypatch.setenv("AURORA_PALLAS_INTERPRET", "1")
    res = (2, 8, 12)
    D = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *res, D), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(1), (2, D), jnp.float32)
    step = jnp.asarray(0, jnp.int32)
    shift = (1, 2, 2) if shifted else (0, 0, 0)

    cfg_k = _cfg(attention_impl=impl, mlp_impl="fused")
    cfg_x = _cfg(attention_impl="xla", mlp_impl="xla")
    params = swin3d.swin_block_init(jax.random.PRNGKey(2), D, cfg_k, dtype=jnp.float32)

    got = swin3d.swin_block_apply(params, x, c, res, shift, 4, step, cfg_k)
    monkeypatch.delenv("AURORA_PALLAS_INTERPRET")
    ref = swin3d.swin_block_apply(params, x, c, res, shift, 4, step, cfg_x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("mode", ["single", "all"])
@pytest.mark.parametrize("step", [0, 2])
def test_lora_folds_into_fused_kernels(monkeypatch, mode, step):
    """With use_lora=True the fused kernel path folds the rank-r delta into the
    qkv/proj weights (VERDICT r2 weak #3): must match the unfused XLA side-path
    (linear + lora_apply) at f32 tolerance for a NONZERO-B adapter."""
    res = (2, 8, 12)
    D = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *res, D), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(1), (1, D), jnp.float32)

    cfg_k = _cfg(
        attention_impl="pallas", mlp_impl="fused",
        use_lora=True, lora_steps=4, lora_mode=mode,
    )
    cfg_x = _cfg(
        attention_impl="xla", mlp_impl="xla",
        use_lora=True, lora_steps=4, lora_mode=mode,
    )
    params = swin3d.swin_block_init(jax.random.PRNGKey(2), D, cfg_k, dtype=jnp.float32)
    # Zero-init AdaLN modulations make the block an identity — randomise them so the
    # attention/MLP branches (and hence LoRA) are visible in the output.
    for norm in ("norm1", "norm2"):
        for leaf in ("weight", "bias"):
            shp = params[norm]["modulation"][leaf].shape
            params[norm]["modulation"][leaf] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(len(norm + leaf)), shp
            )
    # A trained adapter has nonzero B (init is zero, which would fold trivially).
    for i, name in enumerate(("lora_qkv", "lora_proj")):
        params["attn"][name]["B"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(17 + i), params["attn"][name]["B"].shape
        )

    rollout_step = jnp.asarray(step, jnp.int32)
    monkeypatch.setenv("AURORA_PALLAS_INTERPRET", "1")
    got = swin3d.swin_block_apply(params, x, c, res, (1, 2, 2), 4, rollout_step, cfg_k)
    monkeypatch.delenv("AURORA_PALLAS_INTERPRET")
    ref = swin3d.swin_block_apply(params, x, c, res, (1, 2, 2), 4, rollout_step, cfg_x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)
    # The adapter actually moves the output (guard against a silently-inactive fold):
    # same params with B zeroed must give a different result.
    p0 = jax.tree_util.tree_map(lambda a: a, params)
    for name in ("lora_qkv", "lora_proj"):
        p0["attn"][name]["B"] = jnp.zeros_like(p0["attn"][name]["B"])
    ref_nolora = swin3d.swin_block_apply(
        p0, x, c, res, (1, 2, 2), 4, rollout_step, cfg_x
    )
    assert not np.allclose(np.asarray(ref), np.asarray(ref_nolora))


def test_block_5d_vmem_fallback(monkeypatch):
    """When no window-row batch fits the 5D VMEM budget, the block falls back to the
    windowed kernel path instead of compiling an oversized block (ADVICE r2 #3)."""
    monkeypatch.setenv("AURORA_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(swin3d, "_ATTN5D_VMEM_MB", 0)  # nothing fits
    res = (2, 8, 12)
    D = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *res, D), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(1), (1, D), jnp.float32)
    step = jnp.asarray(0, jnp.int32)
    cfg_k = _cfg(attention_impl="pallas", mlp_impl="fused")
    params = swin3d.swin_block_init(jax.random.PRNGKey(2), D, cfg_k, dtype=jnp.float32)
    got = swin3d.swin_block_apply(params, x, c, res, (1, 2, 2), 4, step, cfg_k)

    monkeypatch.delenv("AURORA_PALLAS_INTERPRET")
    cfg_x = _cfg(attention_impl="xla", mlp_impl="xla")
    ref = swin3d.swin_block_apply(params, x, c, res, (1, 2, 2), 4, step, cfg_x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
