"""Checkpoint history-size adaptation (mirrors reference tests/test_checkpoint_adaptation.py).

Operates on torch-layout state dicts (patch-embed kernels ``(D, 1, T, P, P)``) before
conversion to the JAX parameter tree, exactly like the reference's
``adapt_checkpoint_max_history_size`` (aurora/model/aurora.py:469-504).
"""

import numpy as np
import pytest

from aurora_tpu.checkpoint import adapt_max_history_size


@pytest.fixture
def checkpoint():
    rng = np.random.default_rng(0)
    return {
        "encoder.surf_token_embeds.weights.2t": rng.random((2, 1, 2, 4, 4)).astype(np.float32),
        "encoder.atmos_token_embeds.weights.t": rng.random((2, 1, 2, 4, 4)).astype(np.float32),
    }


@pytest.mark.parametrize("max_history", [4, 5])
def test_adapt_history_widens_with_zeros(checkpoint, max_history):
    orig = {k: v.copy() for k, v in checkpoint.items()}
    out = adapt_max_history_size(checkpoint, max_history)
    for name, weight in out.items():
        assert weight.shape[2] == max_history
        for j in range(weight.shape[2]):
            if j >= orig[name].shape[2]:
                np.testing.assert_allclose(weight[:, :, j], 0 * weight[:, :, j])
            else:
                np.testing.assert_allclose(weight[:, :, j], orig[name][:, :, j])


def test_adapt_history_shrink_fails(checkpoint):
    with pytest.raises(Exception):
        adapt_max_history_size(checkpoint, 1)


def test_adapt_history_idempotent(checkpoint):
    orig = {k: v.copy() for k, v in checkpoint.items()}
    out = adapt_max_history_size(checkpoint, 4)
    out = adapt_max_history_size(out, 4)
    for name, weight in out.items():
        assert weight.shape[2] == 4
        np.testing.assert_allclose(weight[:, :, :2], orig[name][:, :, :2])
        np.testing.assert_allclose(weight[:, :, 2:], 0 * weight[:, :, 2:])
