"""Shape/sanity smoke tests for the forward pass."""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraSmallPretrained
from tests.conftest import make_batch


def test_forward_shapes():
    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)
    pred = model.forward(params, batch)

    H, W = 16, 32  # 17 latitudes crop to 16.
    for k, v in pred.surf_vars.items():
        assert v.shape == (1, 1, H, W), k
        assert np.isfinite(np.asarray(v)).all(), k
    for k, v in pred.atmos_vars.items():
        assert v.shape == (1, 1, 4, H, W), k
        assert np.isfinite(np.asarray(v)).all(), k
    assert pred.metadata.rollout_step == 1
    assert pred.metadata.time[0].hour == 18


def test_decoder_head_init():
    """Decoder head biases start at zero, weights do not (reference:
    tests/test_model.py:113-123)."""
    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    for head in params["decoder"]["surf_heads"].values():
        assert not np.all(np.asarray(head["weight"]) == 0)
        assert np.all(np.asarray(head["bias"]) == 0)
    for head in params["decoder"]["atmos_heads"].values():
        assert not np.all(np.asarray(head["weight"]) == 0)
        assert np.all(np.asarray(head["bias"]) == 0)


def test_cast_backbone_params_bitwise_under_autocast():
    """bf16 backbone STORAGE (cast_backbone_params, the 16 GB serving config) is
    bitwise-identical under autocast: the kernels cast weights to the bf16
    activations per use anyway."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aurora_tpu.model.aurora import cast_backbone_params, forward_core, init_params
    from aurora_tpu.model.config import SMALL_CONFIG
    from tests.conftest import make_batch
    from aurora_tpu.model.aurora import Aurora

    cfg = SMALL_CONFIG.replace(autocast=True)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = make_batch(H=17, W=32, dtype=np.float32).crop(cfg.patch_size)
    enc = Aurora(cfg).prepare_encodings(batch)
    surf = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
    levels = tuple(batch.metadata.atmos_levels)
    step = jnp.asarray(0, jnp.int32)

    s1, a1 = forward_core(params, surf, static, atmos, enc, step, levels, cfg)
    s2, a2 = forward_core(
        cast_backbone_params(params), surf, static, atmos, enc, step, levels, cfg
    )
    for k in s1:
        np.testing.assert_array_equal(np.asarray(s1[k]), np.asarray(s2[k]))
    for k in a1:
        np.testing.assert_array_equal(np.asarray(a1[k]), np.asarray(a2[k]))
