"""End-to-end checkpoint loading: a torch-saved ``.ckpt`` through the full
load_checkpoint_local pipeline (schema migration -> history adaptation -> conversion)
must reproduce the reference model's forward output."""

import numpy as np
import pytest

from tests.conftest import load_reference, make_batch
from tests.test_parity_torch import (
    _assert_batches_close,
    _perturb_film,
    _to_torch_batch,
    f64_pos_encoding,  # noqa: F401
)

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def reference():
    return load_reference()


def test_load_checkpoint_local_roundtrip(reference, tmp_path, f64_pos_encoding):  # noqa: F811
    import torch

    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False).double()
    ref_model.eval()
    _perturb_film(ref_model)

    path = tmp_path / "small.ckpt"
    torch.save(ref_model.state_dict(), path)

    model = AuroraSmallPretrained()
    import jax.numpy as jnp

    params = model.load_checkpoint_local(str(path), dtype=jnp.float64)

    batch = make_batch()
    with torch.inference_mode():
        ref_pred = ref_model.forward(_to_torch_batch(reference, batch))
    pred = model.forward(params, batch)
    _assert_batches_close(pred, ref_pred, rtol=1e-8)


def test_legacy_schema_migration_roundtrip(reference, tmp_path):
    """The real released checkpoints use the OLD ID-based schema (with a ``net.``
    prefix); loading one must produce exactly the same parameter tree as converting the
    modern name-based state dict (migration: reference compat.py:18-75)."""
    import jax
    import jax.numpy as jnp
    import torch

    from aurora_tpu import AuroraSmallPretrained
    from aurora_tpu.checkpoint import convert_torch_state_dict

    ref_model = reference.AuroraSmallPretrained(use_lora=False).double()
    modern = ref_model.state_dict()
    P = ref_model.patch_size

    # Build the legacy dict by inverting the migration.
    legacy = {}
    surf_names = ("2t", "10u", "10v", "msl", "lsm", "z", "slt")
    atmos_names = ("z", "u", "v", "t", "q")
    legacy["net.encoder.surf_token_embeds.weight"] = torch.cat(
        [modern[f"encoder.surf_token_embeds.weights.{n}"] for n in surf_names], dim=1
    )
    legacy["net.encoder.atmos_token_embeds.weight"] = torch.cat(
        [modern[f"encoder.atmos_token_embeds.weights.{n}"] for n in atmos_names], dim=1
    )
    for head, names in (("surf_head", surf_names[:4]), ("atmos_head", atmos_names)):
        plural = head.replace("head", "heads")
        w = torch.stack([modern[f"decoder.{plural}.{n}.weight"] for n in names], dim=1)
        b = torch.stack([modern[f"decoder.{plural}.{n}.bias"] for n in names], dim=1)
        legacy[f"net.decoder.{head}.weight"] = w.reshape(len(names) * P**2, -1)
        legacy[f"net.decoder.{head}.bias"] = b.reshape(len(names) * P**2)
    for k, v in modern.items():
        if "token_embeds.weights." in k or ".surf_heads." in k or ".atmos_heads." in k:
            continue
        legacy[f"net.{k}"] = v

    path = tmp_path / "legacy.ckpt"
    torch.save(legacy, path)

    model = AuroraSmallPretrained()
    via_legacy = model.load_checkpoint_local(str(path), dtype=jnp.float64)
    via_modern = convert_torch_state_dict(
        {k: v.numpy() for k, v in modern.items()}, model.cfg, dtype=jnp.float64
    )

    flat_l, tree_l = jax.tree_util.tree_flatten(via_legacy)
    flat_m, tree_m = jax.tree_util.tree_flatten(via_modern)
    assert tree_l == tree_m
    for a, b in zip(flat_l, flat_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
