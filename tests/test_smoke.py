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
