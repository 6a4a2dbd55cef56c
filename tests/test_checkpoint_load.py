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
