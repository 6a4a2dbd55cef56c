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


def auto_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    grid: Optional[tuple[int, int]] = None,
    window: tuple[int, int, int] = (2, 6, 12),
    batch: int = 1,
) -> Mesh:
    """Factorise ``n_devices`` into a (data, lat, lon) shape.

    Without ``grid``: keep ``lon`` largest (longitude is the longest grid axis and
    is periodic, matching the ICI ring), then ``lat``, then ``data``.

    With ``grid=(Hp, Wp)`` (the TOKEN grid, H/P × W/P): the fused per-shard kernels
    now stay on for ANY (lat, lon) factorization — shard-misaligned stages are
    over-padded to window × mesh multiples with whole pad-only windows
    (model/swin3d.py `swin_block_apply`) — so the preference becomes the
    factorization that minimises the total over-padding overhead (wasted pad
    tokens) across the U-Net stages. ``batch`` bounds the data axis
    (``data | batch``). E.g. at 0.25° (grid (180, 360)) with ``batch=2``,
    (2, 2, 2) is exactly aligned (zero padding) and wins over (1, 2, 4), which
    over-pads stages 0-1 by ~7-14%.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)

    def factorizations(n):
        out = []
        for d in range(1, n + 1):
            if n % d or batch % d:
                continue
            m = n // d
            for la in range(1, m + 1):
                if m % la == 0:
                    out.append((d, la, m // la))
        return out

    def pad_overhead(la, lo):
        """Weighted relative over-padding across the 3 U-Net stages (0.0 = none).

        Stage weights (1, 0.75, 0.5): the per-stage GEMM FLOPs are flat through
        the U-Net (tokens quarter, D doubles → tokens·D² constant) but attention
        FLOPs and HBM token traffic halve per stage (tokens·D), so earlier stages
        cost more per wasted pad token.
        """
        Hp, Wp = grid
        total = 0.0
        for weight in (1.0, 0.75, 0.5):
            Hpad = Hp + (-Hp) % window[1]
            Wpad = Wp + (-Wp) % window[2]
            Hover = Hpad + (-Hpad) % (window[1] * la)
            Wover = Wpad + (-Wpad) % (window[2] * lo)
            total += weight * ((Hover * Wover) / (Hpad * Wpad) - 1.0)
            Hp, Wp = (Hp + Hp % 2) // 2, (Wp + Wp % 2) // 2
        return total

    if grid is not None:
        # Least over-padding first; ties → larger data (the cheapest axis: no halos,
        # gradient all-reduce only), then larger lon (the longitude wrap rides the
        # ICI ring, and lat=1 keeps H-shift halos shard-local).
        best = min(
            factorizations(n),
            key=lambda f: (round(pad_overhead(f[1], f[2]), 9), -f[0], -f[2]),
        )
        return make_mesh(*best, devices=devices[:n])

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
