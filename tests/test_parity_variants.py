"""Numerical parity for the AirPollution and Wave variants against the PyTorch reference.

These variants exercise every exotic model feature at once: level-conditioned embeddings
and heads, dynamic time features, atmospheric static variables, a separate chemistry
perceiver, modulation heads with difference prediction, the deliberate z/static_z
indexing bug, log-transform pre-encoder hooks, NaN masking, density channels, and angle
sin/cos splitting (reference: aurora/model/aurora.py:646-932).

Both sides run small architectures with identical random weights (via the checkpoint
converter) in float64.
"""

import dataclasses
from datetime import timedelta

import numpy as np
import pytest

from tests.conftest import load_reference, make_batch
from tests.test_parity_torch import (
    _assert_batches_close,
    _convert,
    _to_torch_batch,
    f64_pos_encoding,  # noqa: F401  (fixture re-export)
)

pytestmark = pytest.mark.parity

# Small-architecture overrides shared by both sides (reference kwargs <-> config fields).
SMALL_ARCH = dict(
    embed_dim=64,
    num_heads=4,
    encoder_depths=(1, 2),
    encoder_num_heads=(2, 4),
    decoder_depths=(2, 1),
    decoder_num_heads=(4, 2),
    latent_levels=2,
)

LEVELS = (100.0, 250.0, 500.0, 850.0)


@pytest.fixture(scope="module")
def reference():
    return load_reference()


def _run_pair(reference, ref_model, model, batch, rtol=1e-8, equal_nan=False):
    import torch

    from tests.test_parity_torch import _perturb_film

    ref_model = ref_model.double()
    ref_model.eval()
    _perturb_film(ref_model)
    params = _convert(ref_model, model.cfg)

    with torch.inference_mode():
        ref_pred = ref_model.forward(_to_torch_batch(reference, batch))
    pred = model.forward(params, batch)
    _assert_batches_close(pred, ref_pred, rtol=rtol, equal_nan=equal_nan)
    return pred, ref_pred


def make_pollution_batch(H=13, W=24, B=1, T=2, seed=0):
    cfg_surf = ("2t", "10u", "10v", "msl", "pm1", "pm2p5", "pm10", "tcco", "tc_no", "tcno2", "gtco3", "tcso2")
    cfg_static = (
        ("lsm", "z", "slt")
        + ("static_ammonia", "static_ammonia_log", "static_co", "static_co_log")
        + ("static_nox", "static_nox_log", "static_so2", "static_so2_log")
    )
    cfg_atmos = ("z", "u", "v", "t", "q", "co", "no", "no2", "go3", "so2")
    batch = make_batch(
        H=H, W=W, B=B, T=T, levels=LEVELS,
        surf_vars=cfg_surf, static_vars=cfg_static, atmos_vars=cfg_atmos, seed=seed,
    )
    # Pollution variables must be positive (they are clamped and log-transformed).
    surf = {k: (np.abs(v) if k not in ("2t", "10u", "10v", "msl") else v)
            for k, v in batch.surf_vars.items()}
    atmos = {k: (np.abs(v) if k in ("co", "no", "no2", "go3", "so2") else v)
             for k, v in batch.atmos_vars.items()}
    return dataclasses.replace(batch, surf_vars=surf, atmos_vars=atmos)


def test_air_pollution_parity(reference, f64_pos_encoding):  # noqa: F811
    from aurora_tpu import AuroraAirPollution

    ref_model = reference.AuroraAirPollution(
        **SMALL_ARCH,
        level_condition=tuple(int(x) for x in LEVELS),
        use_lora=False,
    )
    model = AuroraAirPollution(
        **SMALL_ARCH,
        level_condition=tuple(int(x) for x in LEVELS),
        use_lora=False,
    )
    batch = make_pollution_batch()
    pred, ref_pred = _run_pair(reference, ref_model, model, batch)
    # The difference-prediction post hook must actually engage.
    assert pred.metadata.rollout_step == 1


def test_air_pollution_parity_lora_so2_clamp(reference, f64_pos_encoding):  # noqa: F811
    """With LoRA on, the SO2 >= 850 hPa clamp path is active (aurora.py:787-794)."""
    from aurora_tpu import AuroraAirPollution

    kw = dict(
        **SMALL_ARCH,
        level_condition=tuple(int(x) for x in LEVELS),
        use_lora=True,
        lora_mode="all",
        lora_steps=2,
    )
    ref_model = reference.AuroraAirPollution(**kw)
    model = AuroraAirPollution(**kw)
    batch = make_pollution_batch()
    _run_pair(reference, ref_model, model, batch)


def make_wave_batch(H=17, W=36, B=1, T=2, seed=0):
    wave_in = (
        ("swh", "mwd", "mwp", "pp1d", "shww", "mdww", "mpww", "shts", "mdts", "mpts")
        + ("swh1", "mwd1", "mwp1", "swh2", "mwd2", "mwp2", "wind", "dwi")
    )
    batch = make_batch(
        H=H, W=W, B=B, T=T, levels=LEVELS,
        surf_vars=("2t", "10u", "10v", "msl") + wave_in,
        static_vars=("lsm", "z", "slt", "wmb", "lat_mask"),
        atmos_vars=("z", "u", "v", "t", "q"),
        seed=seed,
    )
    rng = np.random.default_rng(seed + 1)
    surf = dict(batch.surf_vars)
    for k in wave_in:
        if k.startswith("mwd") or k in ("mdww", "mdts", "dwi"):
            surf[k] = rng.uniform(0, 360, surf[k].shape)  # angles in degrees
        else:
            surf[k] = np.abs(surf[k]) + 0.1  # strictly positive magnitudes
    # Make some significant-wave-heights tiny to engage the NaN masking
    # (reference: aurora/model/aurora.py:871-890).
    for k in ("swh", "shww", "shts", "swh1", "swh2"):
        x = np.array(surf[k])
        x[..., :2, :] = 1e-6
        surf[k] = x
    static = dict(batch.static_vars)
    static["wmb"] = (rng.uniform(-1, 1, static["wmb"].shape) > 0).astype(np.float64)
    return dataclasses.replace(batch, surf_vars=surf, static_vars=static)


def test_wave_parity(reference, f64_pos_encoding):  # noqa: F811
    from aurora_tpu import AuroraWave

    ref_model = reference.AuroraWave(**SMALL_ARCH, use_lora=False)
    model = AuroraWave(**SMALL_ARCH, use_lora=False)
    batch = make_wave_batch()
    ref_batch_t = _to_torch_batch(reference, model.batch_transform_hook(batch))
    # NaN masking must have engaged on both sides.
    assert np.isnan(ref_batch_t.surf_vars["swh"].numpy()).any()
    _run_pair(reference, ref_model, model, batch, equal_nan=True)


def test_12h_timestep_parity(reference, f64_pos_encoding):  # noqa: F811
    """The 12 h variant changes the lead-time encoding and metadata advancement."""
    from datetime import timedelta

    from aurora_tpu import Aurora12hPretrained

    ref_model = reference.Aurora12hPretrained(**SMALL_ARCH, use_lora=False)
    model = Aurora12hPretrained(**SMALL_ARCH, use_lora=False)
    batch = make_batch()
    pred, _ = _run_pair(reference, ref_model, model, batch)
    assert pred.metadata.time[0] - batch.metadata.time[0] == timedelta(hours=12)


def test_highres_patch10_parity(reference, f64_pos_encoding):  # noqa: F811
    """Patch size 10 exercises different patch-embed and unpatchify geometry."""
    from aurora_tpu import AuroraHighRes

    kw = dict(**SMALL_ARCH, use_lora=False)
    ref_model = reference.AuroraHighRes(**kw)
    model = AuroraHighRes(**kw)
    batch = make_batch(H=21, W=40)  # crops to 20x40 with patch 10 -> 2x4 patches
    _run_pair(reference, ref_model, model, batch)
