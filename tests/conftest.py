"""Test configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding is exercised without
TPU hardware) and with x64 enabled (so numerical parity against the float64 reference
can be asserted tightly).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The env-var route (JAX_PLATFORMS) is overridden by the TPU harness; the config route
# reliably forces the virtual 8-device CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from datetime import datetime  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from aurora_tpu import Batch, Metadata  # noqa: E402


def make_batch(
    H=17,
    W=32,
    B=1,
    T=2,
    levels=(100, 250, 500, 850),
    surf_vars=("2t", "10u", "10v", "msl"),
    static_vars=("lsm", "z", "slt"),
    atmos_vars=("z", "u", "v", "t", "q"),
    seed=0,
    dtype=np.float64,
    matrix_grid=False,
) -> Batch:
    """A random batch with physically-plausible magnitudes per variable."""
    rng = np.random.default_rng(seed)
    from aurora_tpu.normalisation import NORMALISATION_STATS, level_to_str

    def sample(name, shape):
        loc, scale = NORMALISATION_STATS.get(name, (0.0, 1.0))
        return (loc + scale * rng.standard_normal(shape)).astype(dtype)

    def sample_atmos(name, shape, levels):
        out = np.empty(shape, dtype=dtype)
        for i, lvl in enumerate(levels):
            loc, scale = NORMALISATION_STATS[f"{name}_{level_to_str(lvl)}"]
            out[..., i, :, :] = loc + scale * rng.standard_normal((*shape[:-3], *shape[-2:]))
        return out

    lat = np.linspace(90, -90, H)
    lon = np.linspace(0, 360, W, endpoint=False)
    if matrix_grid:
        lat = np.broadcast_to(lat[:, None], (H, W)).copy()
        lon = np.broadcast_to(lon[None, :], (H, W)).copy()

    return Batch(
        surf_vars={k: sample(k, (B, T, H, W)) for k in surf_vars},
        static_vars={k: np.abs(sample(k, (H, W))) for k in static_vars},
        atmos_vars={k: sample_atmos(k, (B, T, len(levels), H, W), levels) for k in atmos_vars},
        metadata=Metadata(
            lat=lat,
            lon=lon,
            time=tuple(datetime(2020, 6, 1, 12) for _ in range(B)),
            atmos_levels=levels,
            rollout_step=0,
        ),
    )


@pytest.fixture
def small_batch():
    return make_batch()


def install_timm_shim():
    """Provide the tiny subset of `timm` the torch reference imports, so the reference
    can be loaded for numerical parity testing without network access."""
    import itertools
    import sys
    import types

    if "timm" in sys.modules:
        return

    import torch

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rnd.floor()

    def _ntuple(n):
        def parse(x):
            if isinstance(x, (list, tuple)):
                return tuple(x)
            return tuple(itertools.repeat(x, n))

        return parse

    layers.DropPath = DropPath
    layers.to_2tuple = _ntuple(2)
    layers.to_3tuple = _ntuple(3)
    vit.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    timm.models = models
    models.vision_transformer = vit

    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vit


def load_reference():
    """Import the torch reference implementation (read-only, for parity tests)."""
    import sys

    install_timm_shim()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import aurora as ref

    return ref
