"""Forecast-verification metrics: latitude-weighted RMSE / MAE / bias / ACC.

The reference repo ships no evaluation code — its skill scores (RMSE and anomaly
correlation vs IFS/ERA5, /root/reference/README.md:12-31) live in the Nature paper's
private evaluation pipeline. This module provides the standard WeatherBench-style
deterministic metrics so users can reproduce that protocol on their own data:

- all metrics weight grid cells by ``cos(lat)`` (normalised to mean 1), the usual
  correction for the convergence of meridians on a regular lat-lon grid;
- metrics reduce over the spatial ``(H, W)`` dims only, preserving any leading
  batch/time/level axes, so per-level or per-step score curves fall out directly;
- everything is pure ``jnp`` and jittable — scores of a rollout can be computed
  on device without materialising predictions on the host.

Conventions follow WeatherBench 2 (Rasp et al. 2023): RMSE takes the square root
AFTER the spatial mean; ACC correlates anomalies w.r.t. a user-supplied climatology.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.batch import Batch

__all__ = [
    "latitude_weights",
    "rmse",
    "mae",
    "bias",
    "acc",
    "evaluate",
]


def latitude_weights(lat, dtype=jnp.float32) -> jax.Array:
    """Normalised ``cos(lat)`` area weights for a regular lat-lon grid.

    Args:
        lat: latitudes in degrees — ``(H,)`` for a vector grid or ``(H, W)`` for a
            matrix (curvilinear) grid, as carried by :class:`Metadata`.

    Returns:
        Weights with mean exactly 1, shaped ``(H, 1)`` (vector grid, broadcastable
        over longitude) or ``(H, W)``. Poles (±90°) get weight 0.
    """
    lat = jnp.asarray(lat, dtype)
    if lat.ndim not in (1, 2):
        raise ValueError(f"lat must be 1D or 2D, got shape {lat.shape}")
    w = jnp.cos(jnp.deg2rad(lat))
    # cos can round to a tiny negative at the poles in f32.
    w = jnp.clip(w, 0.0)
    w = w / w.mean()
    return w[:, None] if w.ndim == 1 else w


def _weighted_spatial_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    """Latitude-weighted mean over the trailing ``(H, W)`` dims."""
    if x.ndim < 2:
        raise ValueError(f"expected trailing (H, W) dims, got shape {x.shape}")
    return jnp.mean(x * w, axis=(-2, -1))


def rmse(pred: jax.Array, target: jax.Array, lat) -> jax.Array:
    """Latitude-weighted root-mean-square error over the trailing ``(H, W)`` dims.

    Leading axes (batch, time, level, …) are preserved.
    """
    w = latitude_weights(lat, jnp.result_type(pred, jnp.float32))
    err = (pred - target).astype(w.dtype)
    return jnp.sqrt(_weighted_spatial_mean(err * err, w))


def mae(pred: jax.Array, target: jax.Array, lat) -> jax.Array:
    """Latitude-weighted mean absolute error over the trailing ``(H, W)`` dims."""
    w = latitude_weights(lat, jnp.result_type(pred, jnp.float32))
    return _weighted_spatial_mean(jnp.abs((pred - target).astype(w.dtype)), w)


def bias(pred: jax.Array, target: jax.Array, lat) -> jax.Array:
    """Latitude-weighted mean error (pred − target) over the trailing ``(H, W)`` dims."""
    w = latitude_weights(lat, jnp.result_type(pred, jnp.float32))
    return _weighted_spatial_mean((pred - target).astype(w.dtype), w)


def acc(pred: jax.Array, target: jax.Array, climatology: jax.Array, lat) -> jax.Array:
    """Anomaly correlation coefficient w.r.t. a climatology.

    ``ACC = Σ w·p′·t′ / sqrt(Σ w·p′² · Σ w·t′²)`` with ``p′ = pred − climatology``
    and ``t′ = target − climatology``, summed over the trailing ``(H, W)`` dims.
    The climatology broadcasts against ``pred``/``target`` (e.g. a ``(H, W)``
    per-variable mean field, or a per-month field already selected by the caller).
    """
    w = latitude_weights(lat, jnp.result_type(pred, jnp.float32))
    pa = (pred - climatology).astype(w.dtype)
    ta = (target - climatology).astype(w.dtype)
    num = _weighted_spatial_mean(pa * ta, w)
    den = _weighted_spatial_mean(pa * pa, w) * _weighted_spatial_mean(ta * ta, w)
    return num / jnp.sqrt(den)


def _metrics_for(pred, target, lat, clim):
    out = {
        "rmse": rmse(pred, target, lat),
        "mae": mae(pred, target, lat),
        "bias": bias(pred, target, lat),
    }
    if clim is not None:
        out["acc"] = acc(pred, target, clim, lat)
    return out


def evaluate(
    pred: Batch,
    target: Batch,
    climatology: Batch | None = None,
) -> dict[str, dict[str, dict[str, jax.Array]]]:
    """Score a prediction :class:`Batch` against a target :class:`Batch`.

    Args:
        pred: prediction, e.g. one step yielded by :func:`aurora_tpu.rollout`.
        target: verifying analysis on the same grid; every variable present in
            ``pred`` must be present with the same shape.
        climatology: optional climatology batch (fields broadcastable against the
            prediction, e.g. ``(H, W)`` or ``(1, 1, H, W)``); when given, ``acc``
            is included.

    Returns:
        ``{"surf_vars": {name: {metric: array}}, "atmos_vars": {...}}`` where each
        metric array keeps the prediction's leading (batch, time[, level]) axes —
        e.g. ``(B, T)`` for surface variables and ``(B, T, C)`` for atmospheric
        ones, so per-level scores fall out without extra reshaping.
    """
    lat = pred.metadata.lat
    # Same-shaped arrays on a different grid (e.g. flipped latitude order) would
    # score silently wrong — pin the coordinates, not just the shapes (ADVICE r3).
    for other, label in ((target, "target"), *(((climatology, "climatology"),) if climatology is not None else ())):
        for coord in ("lat", "lon"):
            a = np.asarray(getattr(pred.metadata, coord))
            b = np.asarray(getattr(other.metadata, coord))
            if a.shape != b.shape or not np.allclose(a, b):
                raise ValueError(
                    f"{label} batch is on a different grid: metadata.{coord} differs from pred's"
                )
    out: dict[str, dict[str, dict[str, jax.Array]]] = {"surf_vars": {}, "atmos_vars": {}}
    for group in ("surf_vars", "atmos_vars"):
        preds = getattr(pred, group)
        targets = getattr(target, group)
        clims = getattr(climatology, group) if climatology is not None else {}
        for name, field in preds.items():
            if name not in targets:
                raise KeyError(f"target batch is missing {group}[{name!r}]")
            t = targets[name]
            if np.shape(t) != np.shape(field):
                raise ValueError(
                    f"shape mismatch for {group}[{name!r}]: "
                    f"pred {np.shape(field)} vs target {np.shape(t)}"
                )
            clim = clims.get(name) if climatology is not None else None
            if climatology is not None and clim is None:
                raise KeyError(f"climatology batch is missing {group}[{name!r}]")
            out[group][name] = _metrics_for(field, t, lat, clim)
    return out
