"""Numerical parity against the PyTorch reference implementation.

Strategy (the HF golden pickles need network access, which tests do not have): build the
reference model with *random* initialisation on CPU in float64, export its state dict,
convert it with the framework's checkpoint converter, and require the two forward passes
to agree to tight float64 tolerances. This is a strictly stronger check than the
reference's own golden test (tests/test_model.py:27-86), which allows mean relative
errors up to 5e-3; we require 1e-8.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import load_reference, make_batch

pytestmark = pytest.mark.parity


def _to_torch_batch(ref, batch):
    import torch

    return ref.Batch(
        surf_vars={k: torch.from_numpy(np.asarray(v)) for k, v in batch.surf_vars.items()},
        static_vars={k: torch.from_numpy(np.asarray(v)) for k, v in batch.static_vars.items()},
        atmos_vars={k: torch.from_numpy(np.asarray(v)) for k, v in batch.atmos_vars.items()},
        metadata=ref.Metadata(
            lat=torch.from_numpy(np.asarray(batch.metadata.lat)),
            lon=torch.from_numpy(np.asarray(batch.metadata.lon)),
            time=batch.metadata.time,
            atmos_levels=batch.metadata.atmos_levels,
            rollout_step=batch.metadata.rollout_step,
        ),
    )


def _convert(ref_model, cfg, dtype=jnp.float64):
    from aurora_tpu.checkpoint import convert_torch_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    return convert_torch_state_dict(sd, cfg, dtype=dtype)


def _assert_close(ours, theirs, label, rtol, equal_nan):
    if equal_nan:
        ours_nan, theirs_nan = np.isnan(ours), np.isnan(theirs)
        assert (ours_nan == theirs_nan).all(), f"{label}: NaN masks differ"
        ours = np.where(ours_nan, 0.0, ours)
        theirs = np.where(theirs_nan, 0.0, theirs)
    err = np.abs(ours - theirs).mean()
    mag = np.abs(theirs).mean() + 1e-30
    assert err / mag < rtol, f"{label}: rel err {err / mag:.3e}"


def _assert_batches_close(pred, ref_pred, rtol=1e-8, equal_nan=False):
    for k in ref_pred.surf_vars:
        ours = np.asarray(pred.surf_vars[k])
        theirs = ref_pred.surf_vars[k].double().numpy()
        _assert_close(ours, theirs, f"surf {k}", rtol, equal_nan)
    for k in ref_pred.atmos_vars:
        ours = np.asarray(pred.atmos_vars[k])
        theirs = ref_pred.atmos_vars[k].double().numpy()
        _assert_close(ours, theirs, f"atmos {k}", rtol, equal_nan)


@pytest.fixture(scope="module")
def reference():
    return load_reference()


@pytest.fixture()
def f64_pos_encoding(reference):
    """Run the reference's pos/scale-encoding pooling in float64.

    The reference pools the (float32-rounded) lat/lon meshgrid and computes patch areas in
    float32 (aurora/model/posencoding.py:92-101). Under the scale expansion's ~1.1e-4
    minimum wavelength a 1-ULP float32 difference in the area decorrelates the
    high-frequency channels entirely — the reference's CPU and CUDA backends already
    disagree there, so bit-parity with "the" reference is ill-defined for grids that
    tickle unlucky roundings (e.g. grids containing the poles). Our implementation does
    that arithmetic in float64 (the value every float32 backend approximates); this
    fixture makes the reference do the same so the rest of the model can be compared at
    1e-8.
    """
    import aurora.model.posencoding as ref_pos

    orig = ref_pos.pos_scale_enc_grid

    def f64_grid(encode_dim, grid, patch_dims, pos_expansion, scale_expansion):
        return orig(encode_dim, grid.double(), patch_dims, pos_expansion, scale_expansion)

    ref_pos.pos_scale_enc_grid = f64_grid
    yield
    ref_pos.pos_scale_enc_grid = orig


def _perturb_film(ref_model, std=0.02):
    """Randomise the zero-initialised FiLM modulation weights.

    Both implementations zero-init the AdaptiveLayerNorm modulation (film.py:33-36), so at
    random init every Swin block is exactly the identity and the attention/MLP paths would
    not be compared at all. Real checkpoints have nonzero modulations; emulate that.
    """
    import torch

    with torch.no_grad():
        gen = torch.Generator().manual_seed(7)
        for name, p in ref_model.named_parameters():
            if "ln_modulation" in name:
                p.normal_(std=std, generator=gen)


def _run_pair(reference, ref_model, model, batch, rtol=1e-8):
    import torch

    ref_model = ref_model.double()
    ref_model.eval()
    _perturb_film(ref_model)
    params = _convert(ref_model, model.cfg)

    with torch.inference_mode():
        ref_pred = ref_model.forward(_to_torch_batch(reference, batch))
    pred = model.forward(params, batch)
    _assert_batches_close(pred, ref_pred, rtol=rtol)
    return pred, ref_pred


def test_small_forward_parity(reference, f64_pos_encoding):
    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False)
    model = AuroraSmallPretrained()
    batch = make_batch()
    _run_pair(reference, ref_model, model, batch)


def test_small_forward_parity_lora(reference, f64_pos_encoding):
    """LoRA enabled with nonzero B matrices and per-step selection."""
    import torch

    from aurora_tpu import AuroraSmallPretrained

    torch.manual_seed(0)
    ref_model = reference.AuroraSmallPretrained(use_lora=True, lora_mode="all", lora_steps=3)
    # Make the LoRA contribution nonzero.
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if "lora_B" in name:
                p.normal_(std=0.05)
    model = AuroraSmallPretrained(use_lora=True, lora_mode="all", lora_steps=3)

    batch = make_batch(H=16)
    pred0, ref0 = _run_pair(reference, ref_model, model, batch)

    # Step 1 uses a different LoRA: feed the prediction back in.
    batch1 = dataclasses.replace(
        batch,
        surf_vars={
            k: np.concatenate([np.asarray(batch.surf_vars[k][:, 1:]), np.asarray(v)], axis=1)
            for k, v in pred0.surf_vars.items()
        },
        atmos_vars={
            k: np.concatenate([np.asarray(batch.atmos_vars[k][:, 1:]), np.asarray(v)], axis=1)
            for k, v in pred0.atmos_vars.items()
        },
        metadata=pred0.metadata,
    )
    batch1 = dataclasses.replace(batch1, metadata=pred0.metadata)
    _run_pair(reference, ref_model, model, batch1.crop(model.cfg.patch_size))


def test_small_forward_parity_matrix_grid(reference, f64_pos_encoding):
    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False)
    model = AuroraSmallPretrained()
    batch = make_batch(H=16, matrix_grid=True)
    _run_pair(reference, ref_model, model, batch)


def test_small_forward_parity_stabilised(reference, f64_pos_encoding):
    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False, stabilise_level_agg=True)
    model = AuroraSmallPretrained(stabilise_level_agg=True)
    batch = make_batch()
    _run_pair(reference, ref_model, model, batch)


def test_rollout_parity(reference, f64_pos_encoding):
    """Multi-step roll-out must track the reference trajectory."""
    import torch

    from aurora_tpu import AuroraSmallPretrained, rollout

    ref_model = reference.AuroraSmallPretrained(use_lora=False).double()
    ref_model.eval()
    model = AuroraSmallPretrained()
    params = _convert(ref_model, model.cfg)
    batch = make_batch()

    with torch.inference_mode():
        ref_preds = [
            p for p in reference.rollout(ref_model, _to_torch_batch(reference, batch), steps=3)
        ]
    preds = list(rollout(model, params, batch, steps=3))

    for i, (pred, ref_pred) in enumerate(zip(preds, ref_preds)):
        _assert_batches_close(pred, ref_pred, rtol=1e-7)
        assert pred.metadata.rollout_step == i + 1


def test_small_forward_parity_padded_windows(reference, f64_pos_encoding):
    """A grid whose token rows/cols are NOT window multiples: exercises the centred
    two-sided padding and the pad-token masking in shifted blocks
    (reference: aurora/model/swin3d.py:177-194, 303-360)."""
    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False)
    model = AuroraSmallPretrained()
    # 29 lats crop to 28 -> 7 token rows (pad to 12); 52 lons -> 13 token cols (pad to 24).
    batch = make_batch(H=29, W=52)
    _run_pair(reference, ref_model, model, batch)


def test_window_masks_match_reference(reference):
    """Our group-id masks must reproduce the reference's additive masks exactly,
    including the longitude wrap-around merging (swin3d.py:288-360)."""
    import torch

    from aurora.model.swin3d import compute_3d_shifted_window_mask

    from aurora_tpu.ops.masks import window_bias_from_groups, window_group_ids

    for (C, H, W), ws, ss in [
        ((4, 12, 24), (2, 6, 12), (1, 3, 6)),
        ((4, 7, 13), (2, 6, 12), (1, 3, 6)),   # padding in both spatial dims
        ((2, 8, 8), (2, 4, 4), (1, 2, 2)),
        ((4, 45, 90), (2, 6, 12), (1, 3, 6)),  # stage-3-like odd grid
    ]:
        for warped in (True, False):
            ref_mask, _ = compute_3d_shifted_window_mask(
                C, H, W, ws, ss, torch.device("cpu"), warped=warped, dtype=torch.float64
            )
            groups = window_group_ids(C, H, W, ws, ss, warped=warped)
            ours = np.asarray(window_bias_from_groups(groups))
            theirs = ref_mask.squeeze(1).numpy() if ref_mask.dim() == 4 else ref_mask.numpy()
            assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
            np.testing.assert_array_equal(ours, theirs, err_msg=f"{(C,H,W,ws,ss,warped)}")


def test_rollout_parity_f32_10steps(reference, f64_pos_encoding):
    """Ten f32 roll-out steps must track the f32 reference within golden-test-style
    tolerances. Measured drift (tools/rollout_parity.py, ROLLOUT_PARITY.json) is
    ~1e-6..2e-6 mean-rel across all 10 steps; the bar here is 2e-5 * 1.5^i (40x
    headroom at step 0) so real regressions trip it while rounding-order noise
    cannot. The reference's own golden test allows 1e-4..5e-3 for a single f64 step
    (reference tests/test_model.py:45-61)."""
    import torch

    from aurora_tpu import AuroraSmallPretrained, rollout

    ref_model = reference.AuroraSmallPretrained(use_lora=False).float()
    ref_model.eval()
    _perturb_film(ref_model, std=0.02)
    model = AuroraSmallPretrained()
    params = _convert(ref_model, model.cfg, dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)

    with torch.inference_mode():
        ref_preds = list(reference.rollout(ref_model, _to_torch_batch(reference, batch), steps=10))
    preds = list(rollout(model, params, batch, steps=10))

    for i, (pred, ref_pred) in enumerate(zip(preds, ref_preds)):
        tol = 2e-5 * (1.5 ** i)
        for k in ("2t", "msl"):
            ours = np.asarray(pred.surf_vars[k], dtype=np.float64)
            theirs = ref_pred.surf_vars[k].double().numpy()
            err = np.abs(ours - theirs).mean() / (np.abs(theirs).mean() + 1e-30)
            assert err < tol, f"step {i} {k}: rel err {err:.3e} > {tol:.1e}"


def test_autocast_bf16_parity(reference, f64_pos_encoding):
    """The bf16-autocast boundary (backbone only; encoder/decoder full precision,
    reference aurora.py:327-343) must match torch CPU autocast within bf16 tolerance."""
    import torch

    from aurora_tpu import AuroraSmallPretrained

    ref_model = reference.AuroraSmallPretrained(use_lora=False, autocast=True).float()
    ref_model.eval()
    _perturb_film(ref_model)
    model = AuroraSmallPretrained(autocast=True)
    params = _convert(ref_model, model.cfg, dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)

    with torch.inference_mode():
        ref_pred = ref_model.forward(_to_torch_batch(reference, batch))
    pred = model.forward(params, batch)
    # bf16 resolution is ~0.4%; both sides round independently inside the backbone.
    _assert_batches_close(pred, ref_pred, rtol=2e-2)
