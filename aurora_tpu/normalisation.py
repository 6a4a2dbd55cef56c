"""Per-variable normalisation (z-scoring) of weather / chemistry / wave fields.

TPU-native re-design of the reference behaviour (reference: aurora/normalisation.py:17-74):
instead of normalising one variable at a time with Python-level scalars, we expose both a
per-variable API (used by :class:`aurora_tpu.batch.Batch`) and vectorised location/scale
lookups so that the whole variable stack can be normalised with a single fused broadcast
multiply-add inside ``jit``.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from aurora_tpu._stats_data import NORMALISATION_STATS

__all__ = [
    "level_to_str",
    "surf_stat",
    "atmos_stats",
    "normalise_surf_var",
    "unnormalise_surf_var",
    "normalise_atmos_var",
    "unnormalise_atmos_var",
]


def level_to_str(level: float) -> str:
    """Canonical string form of a pressure level (reference: aurora/normalisation.py:17-31).

    Integral levels render without a decimal part, and ``.`` becomes ``_`` so the result is
    safe to use as a parameter-tree key.
    """
    level = round(float(level), 3)
    if level % 1 == 0:
        level = int(level)
    return str(level).replace(".", "_")


def surf_stat(
    name: str, stats: Optional[Mapping[str, tuple[float, float]]] = None
) -> tuple[float, float]:
    """Location and scale for a surface-level or static variable."""
    if stats and name in stats:
        return tuple(stats[name])  # type: ignore[return-value]
    return NORMALISATION_STATS[name]


def atmos_stats(
    name: str, atmos_levels: Sequence[float]
) -> tuple[np.ndarray, np.ndarray]:
    """Per-level location and scale vectors for an atmospheric variable."""
    locs = np.array(
        [NORMALISATION_STATS[f"{name}_{level_to_str(lvl)}"][0] for lvl in atmos_levels]
    )
    scales = np.array(
        [NORMALISATION_STATS[f"{name}_{level_to_str(lvl)}"][1] for lvl in atmos_levels]
    )
    return locs, scales


def normalise_surf_var(x, name, stats=None, unnormalise: bool = False):
    """Normalise (or unnormalise) a surface-level variable (shape ``(..., h, w)``)."""
    location, scale = surf_stat(name, stats)
    if unnormalise:
        return x * scale + location
    return (x - location) / scale


def normalise_atmos_var(x, name, atmos_levels, unnormalise: bool = False):
    """Normalise (or unnormalise) an atmospheric variable (shape ``(..., c, h, w)``)."""
    locs, scales = atmos_stats(name, atmos_levels)
    locs = jnp.asarray(locs, dtype=x.dtype)[..., None, None]
    scales = jnp.asarray(scales, dtype=x.dtype)[..., None, None]
    if unnormalise:
        return x * scales + locs
    return (x - locs) / scales


def unnormalise_surf_var(x, name, stats=None):
    return normalise_surf_var(x, name, stats=stats, unnormalise=True)


def unnormalise_atmos_var(x, name, atmos_levels):
    return normalise_atmos_var(x, name, atmos_levels, unnormalise=True)
