"""Stochastic-depth / dropout training knobs (VERDICT r2 missing #1).

Reference semantics: DropPath on both residual branches with a linear 0 -> rate ramp
over the blocks (aurora/model/swin3d.py:430,507-508,813) and dropout on proj + both
MLP linears (swin3d.py:423-424,437). Identity at rate 0 or without a PRNG key.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.model import swin3d


def _small_cfg(**kw):
    return swin3d.BackboneConfig(
        embed_dim=64,
        encoder_depths=(2,),
        encoder_num_heads=(4,),
        decoder_depths=(2,),
        decoder_num_heads=(4,),
        window_size=(2, 4, 4),
        **kw,
    )


def _inputs(D=64, L=2 * 8 * 12):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, L, D), jnp.float32)
    lead = jnp.ones((D,), jnp.float32)
    return x, lead


def _perturb(params, scale=0.05, seed=9):
    """Randomise every leaf: the zero-initialised AdaLN modulations make a fresh
    backbone an identity function, so DropPath on its (zero) branches is invisible."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_identity_at_zero_rates():
    """With rates 0, passing an rng must not change anything (bitwise)."""
    cfg = _small_cfg()
    params = swin3d.backbone_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x, lead = _inputs()
    step = jnp.asarray(0, jnp.int32)
    ref = swin3d.backbone_apply(params, x, lead, step, (2, 8, 12), cfg)
    out = swin3d.backbone_apply(
        params, x, lead, step, (2, 8, 12), cfg, rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_drop_path_changes_output_and_is_key_dependent():
    cfg = _small_cfg(drop_path=0.5)
    params = _perturb(swin3d.backbone_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    x, lead = _inputs()
    step = jnp.asarray(0, jnp.int32)
    det = swin3d.backbone_apply(params, x, lead, step, (2, 8, 12), cfg)
    s1 = swin3d.backbone_apply(
        params, x, lead, step, (2, 8, 12), cfg, rng=jax.random.PRNGKey(1)
    )
    s2 = swin3d.backbone_apply(
        params, x, lead, step, (2, 8, 12), cfg, rng=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(det), np.asarray(s1))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_drop_path_changes_grads_in_train_step():
    """A fine-tune gradient under stochastic depth differs from the deterministic one
    (VERDICT r2 'done' criterion)."""
    cfg = _small_cfg(drop_path=0.3, drop_rate=0.1)
    params = _perturb(swin3d.backbone_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    x, lead = _inputs()
    step = jnp.asarray(0, jnp.int32)

    def loss(p, rng):
        out = swin3d.backbone_apply(p, x, lead, step, (2, 8, 12), cfg, rng=rng)
        return jnp.mean(jnp.square(out))

    g_det = jax.grad(loss)(params, None)
    g_sto = jax.grad(loss)(params, jax.random.PRNGKey(3))
    leaves_det = jax.tree_util.tree_leaves(g_det)
    leaves_sto = jax.tree_util.tree_leaves(g_sto)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_det, leaves_sto)
    )


def test_dropout_expectation_scaling():
    """Inverted dropout: E[dropout(x)] == x (checked on a large sample)."""
    from aurora_tpu.model.nn import dropout

    x = jnp.ones((200, 200))
    y = dropout(x, 0.3, jax.random.PRNGKey(0))
    assert abs(float(y.mean()) - 1.0) < 0.02
    # Survivors are rescaled by 1/keep.
    vals = np.unique(np.asarray(y))
    np.testing.assert_allclose(vals, [0.0, 1.0 / 0.7], rtol=1e-6)


def test_forward_core_accepts_rng():
    """rng plumbs through the full model; rates 0 keeps it deterministic."""
    from aurora_tpu.model.aurora import forward_core, init_params
    from aurora_tpu.model.config import SMALL_CONFIG
    from tests.conftest import make_batch

    cfg = SMALL_CONFIG.replace(drop_path=0.5)
    params = _perturb(init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32), scale=0.02)
    batch = make_batch(H=17, W=32, B=1, dtype=np.float32).crop(cfg.patch_size)
    from aurora_tpu.model.aurora import Aurora

    enc = Aurora(cfg).prepare_encodings(batch)
    surf = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
    levels = tuple(batch.metadata.atmos_levels)
    step = jnp.asarray(0, jnp.int32)

    s_det, _ = forward_core(params, surf, static, atmos, enc, step, levels, cfg)
    s_sto, _ = forward_core(
        params, surf, static, atmos, enc, step, levels, cfg,
        rng=jax.random.PRNGKey(5),
    )
    k = next(iter(s_det))
    assert not np.allclose(np.asarray(s_det[k]), np.asarray(s_sto[k]))
