"""Native checkpoint save/restore round trip (Orbax)."""

import jax
import numpy as np

from aurora_tpu import AuroraSmallPretrained
from aurora_tpu.checkpoint import restore_params, save_params


def test_orbax_roundtrip(tmp_path):
    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    path = tmp_path / "ckpt"
    save_params(params, str(path))
    restored = restore_params(str(path))

    flat0, tree0 = jax.tree_util.tree_flatten(params)
    flat1, tree1 = jax.tree_util.tree_flatten(restored)
    assert tree0 == tree1
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
