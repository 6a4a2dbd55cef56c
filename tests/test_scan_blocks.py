"""Scan-over-blocks (stacked block params) — VERDICT r4 next-round item #2.

Round 4 measured the cost of inlining all ~54 swin blocks as separate program
text: 0.99 GiB of generated code in the production forward, a 2.45 GiB
program-overlays arena, 4.08 GiB allocator fragmentation and 183 s compiles at
0.25° train. ``stack_block_params`` re-lays each stage's block params as one
stacked pytree and ``_run_blocks`` then runs the stage as ONE ``lax.scan`` over
(unshifted, shifted) block pairs — the program holds 2 traced block bodies per
stage instead of ``depth``.

These tests pin the contract: bit-identical forward, matching grads under
nested remat, the odd-depth fallback, mesh (shard_map kernels inside the scan
body), the stochastic-training path, and the program-text reduction itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from aurora_tpu.model import swin3d
from aurora_tpu.parallel.mesh import make_mesh
from aurora_tpu.parallel.sharding import TOKENS_5D_SPEC, replicate


def _cfg(**kw):
    kw.setdefault("encoder_depths", (2, 4))
    kw.setdefault("encoder_num_heads", (2, 4))
    kw.setdefault("decoder_depths", (4, 2))
    kw.setdefault("decoder_num_heads", (4, 2))
    return swin3d.BackboneConfig(
        embed_dim=64,
        window_size=(2, 4, 4),
        **kw,
    )


def _setup(cfg, patch_res=(4, 8, 16), B=2, seed=0, lora_nonzero=True):
    D = cfg.embed_dim
    L = patch_res[0] * patch_res[1] * patch_res[2]
    params = swin3d.backbone_init(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    if lora_nonzero and cfg.use_lora:
        # B is zero-init; make the fold non-trivial so stacking covers LoRA banks.
        params = jax.tree_util.tree_map(lambda a: a + 0.01, params)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, L, D), jnp.float32)
    lead = jnp.ones((D,), jnp.float32)
    step = jnp.asarray(1, jnp.int32)
    return params, x, lead, step


@pytest.mark.parametrize("use_lora", [False, True])
def test_scan_blocks_forward_bitwise(use_lora):
    cfg = _cfg(use_lora=use_lora)
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)

    ref = jax.jit(
        lambda p, xx: swin3d.backbone_apply(p, xx, lead, step, patch_res, cfg)
    )(params, x)
    got = jax.jit(
        lambda p, xx: swin3d.backbone_apply(p, xx, lead, step, patch_res, cfg)
    )(stacked, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_scan_blocks_grad_matches_remat():
    """Nested remat (layer + per-block jax.checkpoint inside the scan body) must
    reproduce the eager-loop gradients (fp reassociation tolerance only)."""
    cfg = _cfg(remat=True)
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)

    def loss(p, xx):
        return jnp.mean(
            jnp.square(swin3d.backbone_apply(p, xx, lead, step, patch_res, cfg))
        )

    g_ref = jax.jit(jax.grad(loss))(params, x)
    g_scan = jax.jit(jax.grad(loss))(stacked, x)
    g_ref_stacked = swin3d.stack_backbone_blocks(g_ref)

    errs = jax.tree_util.tree_map(
        lambda a, b: float(
            np.abs(np.asarray(a) - np.asarray(b)).max()
            / (np.abs(np.asarray(b)).max() + 1e-30)
        ),
        g_scan, g_ref_stacked,
    )
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 1e-5, f"scan-blocks grad mismatch {worst:.3e}"


def test_scan_blocks_odd_depth():
    """Odd stage depth: scan over pairs + one inline trailing (unshifted) block."""
    cfg = _cfg(
        encoder_depths=(3,), encoder_num_heads=(4,),
        decoder_depths=(3,), decoder_num_heads=(4,),
    )
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)

    ref = swin3d.backbone_apply(params, x, lead, step, patch_res, cfg)
    got = swin3d.backbone_apply(stacked, x, lead, step, patch_res, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_scan_blocks_under_mesh(monkeypatch):
    """shard_map fused kernels inside the scan body: mesh == single device."""
    monkeypatch.setenv("AURORA_PALLAS_INTERPRET", "1")
    cfg = _cfg()
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)

    ref = swin3d.backbone_apply(stacked, x, lead, step, patch_res, cfg)

    mesh = make_mesh(data=2, lat=2, lon=2)
    with jax.set_mesh(mesh):
        p_sh = replicate(stacked, mesh)
        x_sh = jax.device_put(
            x.reshape(2, *patch_res, cfg.embed_dim),
            NamedSharding(mesh, TOKENS_5D_SPEC),
        ).reshape(2, -1, cfg.embed_dim)
        got = jax.jit(
            lambda p, xx, s: swin3d.backbone_apply(p, xx, lead, s, patch_res, cfg)
        )(p_sh, x_sh, step)

    err = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-30
    )
    assert err < 2e-5, f"scan-blocks mesh mismatch {err:.3e}"


def test_scan_blocks_stochastic_training():
    """drop_path + dropout: the scan body folds the SAME per-block PRNG indices as
    the eager loop, so a stage whose blocks are all stochastic matches exactly."""
    cfg = _cfg(drop_path=0.2, drop_rate=0.1)
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)
    rng = jax.random.PRNGKey(7)

    ref = swin3d.backbone_apply(params, x, lead, step, patch_res, cfg, rng=rng)
    got = swin3d.backbone_apply(stacked, x, lead, step, patch_res, cfg, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_scan_blocks_shrinks_program_text():
    """The point of the exercise: the optimized HLO of a depth-6 stage must be
    substantially smaller with the scan layout (2 bodies vs 6 inlined blocks)."""
    cfg = _cfg(
        encoder_depths=(6,), encoder_num_heads=(4,),
        decoder_depths=(6,), decoder_num_heads=(4,),
    )
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)

    def compiled_len(p):
        fn = jax.jit(
            lambda pp, xx: swin3d.backbone_apply(pp, xx, lead, step, patch_res, cfg)
        )
        return len(fn.lower(p, x).compile().as_text())

    inline_len = compiled_len(params)
    scan_len = compiled_len(stacked)
    assert scan_len < 0.6 * inline_len, (
        f"scan program not smaller: {scan_len} vs {inline_len}"
    )


def test_scan_blocks_stochastic_bf16_carry():
    """Autocast training regression: with a bf16 token carry and traced drop-path
    rates, drop_path must not upcast the branch to f32 — lax.scan requires a
    fixed carry dtype (found by review; failed at trace time before the fix)."""
    cfg = _cfg(drop_path=0.2, drop_rate=0.1)
    patch_res = (4, 8, 16)
    params, x, lead, step = _setup(cfg, patch_res)
    stacked = swin3d.stack_backbone_blocks(params)
    rng = jax.random.PRNGKey(3)

    x16 = x.astype(jnp.bfloat16)
    out = swin3d.backbone_apply(stacked, x16, lead, step, patch_res, cfg, rng=rng)
    assert out.dtype == jnp.bfloat16
    ref = swin3d.backbone_apply(params, x16, lead, step, patch_res, cfg, rng=rng)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
