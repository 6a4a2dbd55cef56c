"""Device-mesh construction for multi-chip execution.

The canonical mesh is ``('data', 'lat', 'lon')``:

* ``data`` — batch (data-parallel) axis; gradients all-reduce over it.
* ``lat`` / ``lon`` — 2D domain decomposition of the token grid. Window attention is
  local, so only thin halos cross these axes (shifts never exceed half a window), and
  the longitude wrap of the globe maps onto the ``lon`` ring.

This subsumes the reference's DDP/FSDP story (reference aurora has no first-class
parallelism: SURVEY.md §2.5) with GSPMD shardings over a single mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "auto_mesh", "MESH_AXES"]

MESH_AXES = ("data", "lat", "lon")


def make_mesh(
    data: int = 1, lat: int = 1, lon: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ``('data', 'lat', 'lon')`` mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * lat * lon
    if len(devices) < n:
        raise ValueError(f"Need {n} devices, have {len(devices)}.")
    arr = np.array(devices[:n]).reshape(data, lat, lon)
    return Mesh(arr, MESH_AXES)


def auto_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Factorise ``n_devices`` into a reasonable (data, lat, lon) shape.

    Preference: keep ``lon`` largest (longitude is the longest grid axis and is
    periodic, matching the ICI ring), then ``lat``, then ``data``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)

    def largest_pow2_factor(x):
        f = 1
        while x % 2 == 0:
            x //= 2
            f *= 2
        return f

    p2 = largest_pow2_factor(n)
    rest = n // p2
    # Split the power of two between lon and lat, lon first.
    lon = 1
    lat = 1
    toggle = True
    while p2 > 1:
        if toggle:
            lon *= 2
        else:
            lat *= 2
        p2 //= 2
        toggle = not toggle
    return make_mesh(data=rest, lat=lat, lon=lon, devices=devices[:n])
