"""Quick-look plotting for predictions (stand-in for the reference's notebook maps)."""

from __future__ import annotations

import numpy as np

from aurora_tpu.batch import Batch

__all__ = ["quicklook"]


def quicklook(batch: Batch, var: str, level: float | None = None, ax=None, **imshow_kw):
    """Plot one surface (or one pressure level of an atmospheric) variable.

    Returns the matplotlib Axes. Requires matplotlib.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 5))
    if var in batch.surf_vars:
        field = np.asarray(batch.surf_vars[var])[0, -1]
        title = var
    else:
        idx = list(batch.metadata.atmos_levels).index(level)
        field = np.asarray(batch.atmos_vars[var])[0, -1, idx]
        title = f"{var} @ {level} hPa"
    lat = np.asarray(batch.metadata.lat, dtype=np.float64)
    lon = np.asarray(batch.metadata.lon, dtype=np.float64)
    extent = None
    if lat.ndim == 1:
        extent = [lon.min(), lon.max(), lat.min(), lat.max()]
    im = ax.imshow(field, extent=extent, aspect="auto", **imshow_kw)
    ax.set_title(f"{title} — {batch.metadata.time[0]}")
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    plt.colorbar(im, ax=ax, shrink=0.8)
    return ax
