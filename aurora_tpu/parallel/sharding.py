"""Sharding specs and helpers for batches, parameters, and in-graph constraints.

Layout policy (over the ``('data', 'lat', 'lon')`` mesh):

* Surface fields ``(B, T, H, W)`` → ``P('data', None, 'lat', 'lon')``.
* Static fields ``(H, W)`` → ``P('lat', 'lon')``.
* Atmospheric fields ``(B, T, C, H, W)`` → ``P('data', None, None, 'lat', 'lon')``.
* Backbone token grid ``(B, C, H, W, D)`` → ``P('data', None, 'lat', 'lon', None)``.
* Parameters: replicated by default; ZeRO-style sharding over ``data`` is applied to
  the large 2D kernels when ``shard_params=True``.

In-graph constraints use bare ``PartitionSpec`` and therefore require an active
``jax.set_mesh`` context; without one they are identity (single-device paths pay
nothing).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = [
    "SURF_SPEC",
    "STATIC_SPEC",
    "ATMOS_SPEC",
    "TOKENS_5D_SPEC",
    "constrain",
    "shard_batch_arrays",
    "shard_params",
    "zero_partition_spec",
    "replicate",
]

SURF_SPEC = P("data", None, "lat", "lon")
STATIC_SPEC = P("lat", "lon")
ATMOS_SPEC = P("data", None, None, "lat", "lon")
TOKENS_5D_SPEC = P("data", None, "lat", "lon", None)


def _has_mesh() -> bool:
    """True under a mesh with AUTO (GSPMD) axes; False inside shard_map bodies
    (all-Manual), where constraints are meaningless."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty:
            return False
        return any(t == jax.sharding.AxisType.Auto for t in mesh.axis_types)
    except Exception:
        return False


def constrain(x, spec: P):
    """Apply a sharding constraint if a mesh context is active, else identity."""
    if not _has_mesh():
        return x
    return jax.lax.with_sharding_constraint(x, spec)


def shard_batch_arrays(surf, static, atmos, mesh):
    """Place batch dicts onto the mesh with the canonical layout."""
    s = lambda spec: NamedSharding(mesh, spec)
    surf = {k: jax.device_put(v, s(SURF_SPEC)) for k, v in surf.items()}
    static = {k: jax.device_put(v, s(STATIC_SPEC)) for k, v in static.items()}
    atmos = {k: jax.device_put(v, s(ATMOS_SPEC)) for k, v in atmos.items()}
    return surf, static, atmos


def replicate(tree, mesh):
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def zero_partition_spec(x, data_size: int, min_size: int = 2**16) -> P:
    """The ZeRO placement rule for one leaf: shard the largest axis that divides
    the ``data`` degree when the tensor is big enough, else replicate.

    ``x`` only needs ``shape``/``ndim``/``size`` (works on ``ShapeDtypeStruct``),
    so callers can compute placements abstractly — no device buffers."""
    if x.ndim >= 1 and x.size >= min_size:
        order = np.argsort(x.shape)[::-1]
        for ax in order:
            if x.shape[ax] % data_size == 0:
                spec = [None] * x.ndim
                spec[ax] = "data"
                return P(*spec)
    return P()


def shard_params(params, mesh, min_size: int = 2**16):
    """ZeRO-style parameter placement: shard the largest-dim of big tensors over the
    ``data`` axis when it divides evenly; replicate everything else."""
    data_size = mesh.shape["data"]

    def place(x):
        spec = zero_partition_spec(x, data_size, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)
