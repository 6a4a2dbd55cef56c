"""The batch data model: a JAX pytree of surface / static / atmospheric variables.

TPU-native re-design of the reference data model (reference: aurora/batch.py:23-292):

* ``Batch`` and ``Metadata`` are registered pytrees, so a batch can be passed through
  ``jax.jit`` / ``jax.lax.scan`` / shardings directly. Array-valued fields are leaves;
  variable names, times, pressure levels and the roll-out step are static aux data.
* Normalisation is a fused broadcast multiply-add, vectorisable over the variable stack.
* Regridding and netCDF I/O are host-side NumPy utilities (they are data-prep, not
  device compute).
"""

from __future__ import annotations

import dataclasses
from datetime import datetime, timezone
from pathlib import Path
from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.normalisation import (
    normalise_atmos_var,
    normalise_surf_var,
    unnormalise_atmos_var,
    unnormalise_surf_var,
)

__all__ = ["Metadata", "Batch", "interpolate_numpy"]

Array = jax.Array | np.ndarray


@dataclasses.dataclass
class Metadata:
    """Metadata carried with every batch.

    Args:
        lat: Latitudes, decreasing, in ``[-90, 90]``. Vector or matrix.
        lon: Longitudes, increasing, in ``[0, 360)``. Vector or matrix.
        time: Per-batch-element time of the *most recent* history entry.
        atmos_levels: Pressure levels of the atmospheric variables in hPa.
        rollout_step: Number of autoregressive steps used to produce this data. ``0``
            means observed data rather than a prediction.
    """

    lat: Array
    lon: Array
    time: tuple[datetime, ...]
    atmos_levels: tuple[int | float, ...]
    rollout_step: int = 0

    def __post_init__(self):
        # Validate any CONCRETE data — host NumPy arrays and committed jax.Arrays
        # alike (Batch.astype produces the latter; reference validates all inputs,
        # aurora/batch.py:40-68). Skipped for tracers (inside jit/scan — the pytree
        # unflatten path bypasses __post_init__ anyway) and for jax.Arrays whose
        # shards are not all on this host (multi-process: fetching would deadlock).
        # Note reading a device array here costs one device→host sync; keep lat/lon
        # as NumPy (the framework itself always does) to avoid it.
        for arr in (self.lat, self.lon):
            if isinstance(arr, jax.core.Tracer):
                return
            if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
                return
        lat, lon = np.asarray(self.lat), np.asarray(self.lon)
        if not (np.all(lat <= 90) and np.all(lat >= -90)):
            raise ValueError("Latitudes must be in the range [-90, 90].")
        if not (np.all(lon >= 0) and np.all(lon < 360)):
            raise ValueError("Longitudes must be in the range [0, 360).")
        if lat.ndim == lon.ndim == 1:
            if not np.all(np.diff(lat) < 0):
                raise ValueError("Latitudes must be strictly decreasing.")
            if not np.all(np.diff(lon) > 0):
                raise ValueError("Longitudes must be strictly increasing.")
        elif lat.ndim == lon.ndim == 2:
            if not np.all(lat[1:, :] - lat[:-1, :] <= 0):
                raise ValueError("Latitudes must be decreasing along every column.")
            if not np.all(lon[:, 1:] - lon[:, :-1] > 0):
                raise ValueError("Longitudes must be strictly increasing along every row.")
        else:
            raise ValueError(
                "The latitudes and longitudes must either both be vectors or both be "
                "matrices."
            )


def _metadata_flatten(md: Metadata):
    return (md.lat, md.lon), (md.time, md.atmos_levels, md.rollout_step)


def _metadata_unflatten(aux, children):
    lat, lon = children
    time, atmos_levels, rollout_step = aux
    md = object.__new__(Metadata)
    md.lat, md.lon = lat, lon
    md.time, md.atmos_levels, md.rollout_step = time, atmos_levels, rollout_step
    return md


jax.tree_util.register_pytree_node(Metadata, _metadata_flatten, _metadata_unflatten)


@dataclasses.dataclass
class Batch:
    """A batch of data.

    Args:
        surf_vars: Surface-level variables, shape ``(b, t, h, w)``.
        static_vars: Static variables, shape ``(h, w)``.
        atmos_vars: Atmospheric variables, shape ``(b, t, c, h, w)``.
        metadata: Metadata for this batch.
    """

    surf_vars: dict[str, Array]
    static_vars: dict[str, Array]
    atmos_vars: dict[str, Array]
    metadata: Metadata

    @property
    def spatial_shape(self) -> tuple[int, int]:
        """Spatial shape ``(h, w)`` from an arbitrary surface-level variable."""
        return next(iter(self.surf_vars.values())).shape[-2:]

    def normalise(self, surf_stats: Optional[Mapping[str, tuple[float, float]]] = None) -> "Batch":
        """Normalise all variables (z-scoring with climatological statistics)."""
        return Batch(
            surf_vars={
                k: normalise_surf_var(v, k, stats=surf_stats) for k, v in self.surf_vars.items()
            },
            static_vars={
                k: normalise_surf_var(v, k, stats=surf_stats) for k, v in self.static_vars.items()
            },
            atmos_vars={
                k: normalise_atmos_var(v, k, self.metadata.atmos_levels)
                for k, v in self.atmos_vars.items()
            },
            metadata=self.metadata,
        )

    def unnormalise(
        self, surf_stats: Optional[Mapping[str, tuple[float, float]]] = None
    ) -> "Batch":
        """Undo :meth:`normalise`."""
        return Batch(
            surf_vars={
                k: unnormalise_surf_var(v, k, stats=surf_stats)
                for k, v in self.surf_vars.items()
            },
            static_vars={
                k: unnormalise_surf_var(v, k, stats=surf_stats)
                for k, v in self.static_vars.items()
            },
            atmos_vars={
                k: unnormalise_atmos_var(v, k, self.metadata.atmos_levels)
                for k, v in self.atmos_vars.items()
            },
            metadata=self.metadata,
        )

    def crop(self, patch_size: int) -> "Batch":
        """Crop to a multiple of the patch size (drops at most one extra latitude row)."""
        h, w = self.spatial_shape
        if w % patch_size != 0:
            raise ValueError("Width of the data must be a multiple of the patch size.")
        if h % patch_size == 0:
            return self
        if h % patch_size == 1:
            lat = self.metadata.lat
            lat = lat[:-1] if np.asarray(lat).ndim == 1 else lat[:-1, :]
            lon = self.metadata.lon
            lon = lon if np.asarray(lon).ndim == 1 else lon[:-1, :]
            return Batch(
                surf_vars={k: v[..., :-1, :] for k, v in self.surf_vars.items()},
                static_vars={k: v[..., :-1, :] for k, v in self.static_vars.items()},
                atmos_vars={k: v[..., :-1, :] for k, v in self.atmos_vars.items()},
                metadata=Metadata(
                    lat=lat,
                    lon=lon,
                    atmos_levels=self.metadata.atmos_levels,
                    time=self.metadata.time,
                    rollout_step=self.metadata.rollout_step,
                ),
            )
        raise ValueError(
            f"There can at most be one latitude too many, but there are "
            f"{h % patch_size} too many."
        )

    def _fmap(self, f: Callable[[Array], Array]) -> "Batch":
        return Batch(
            surf_vars={k: f(v) for k, v in self.surf_vars.items()},
            static_vars={k: f(v) for k, v in self.static_vars.items()},
            atmos_vars={k: f(v) for k, v in self.atmos_vars.items()},
            metadata=Metadata(
                lat=f(self.metadata.lat),
                lon=f(self.metadata.lon),
                atmos_levels=self.metadata.atmos_levels,
                time=self.metadata.time,
                rollout_step=self.metadata.rollout_step,
            ),
        )

    def astype(self, dtype) -> "Batch":
        """Convert every array to ``dtype`` (lat/lon are kept at >= float32)."""
        lat_lon_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
        return Batch(
            surf_vars={k: jnp.asarray(v, dtype) for k, v in self.surf_vars.items()},
            static_vars={k: jnp.asarray(v, dtype) for k, v in self.static_vars.items()},
            atmos_vars={k: jnp.asarray(v, dtype) for k, v in self.atmos_vars.items()},
            metadata=Metadata(
                lat=jnp.asarray(self.metadata.lat, lat_lon_dtype),
                lon=jnp.asarray(self.metadata.lon, lat_lon_dtype),
                atmos_levels=self.metadata.atmos_levels,
                time=self.metadata.time,
                rollout_step=self.metadata.rollout_step,
            ),
        )

    def to_device(self, device=None, sharding=None) -> "Batch":
        """Place every array on a device (or with a sharding)."""
        target = sharding if sharding is not None else device
        if target is None:
            return self._fmap(jnp.asarray)
        return self._fmap(lambda x: jax.device_put(x, target))

    def to_numpy(self) -> "Batch":
        return self._fmap(lambda x: np.asarray(x))

    def replace(self, **kwargs) -> "Batch":
        return dataclasses.replace(self, **kwargs)

    def regrid(self, res: float) -> "Batch":
        """Bilinearly regrid to a regular ``res``-degree global grid (host-side, f64)."""
        shape = (round(180 / res) + 1, round(360 / res))
        lat_new = np.linspace(90, -90, shape[0])
        lon_new = np.linspace(0, 360, shape[1], endpoint=False)

        def interp(v):
            return jnp.asarray(
                interpolate_numpy(
                    np.asarray(v, dtype=np.float64),
                    np.asarray(self.metadata.lat, dtype=np.float64),
                    np.asarray(self.metadata.lon, dtype=np.float64),
                    lat_new,
                    lon_new,
                ),
                dtype=jnp.float32,
            )

        return Batch(
            surf_vars={k: interp(v) for k, v in self.surf_vars.items()},
            static_vars={k: interp(v) for k, v in self.static_vars.items()},
            atmos_vars={k: interp(v) for k, v in self.atmos_vars.items()},
            metadata=Metadata(
                lat=np.asarray(lat_new, dtype=np.float32),
                lon=np.asarray(lon_new, dtype=np.float32),
                atmos_levels=self.metadata.atmos_levels,
                time=self.metadata.time,
                rollout_step=self.metadata.rollout_step,
            ),
        )

    # ------------------------------------------------------------------ serialisation

    def to_netcdf(self, path: str | Path) -> None:
        """Write the batch to a netCDF file.

        Uses ``xarray``/``netcdf4`` when available and otherwise falls back to a
        scipy-based NetCDF3 writer, so serialisation works in minimal environments.
        """
        try:
            import xarray  # noqa: F401

            _to_netcdf_xarray(self, path)
        except ImportError:
            _to_netcdf_scipy(self, path)

    @classmethod
    def from_netcdf(cls, path: str | Path) -> "Batch":
        """Load a batch written by :meth:`to_netcdf`."""
        try:
            import xarray  # noqa: F401

            return _from_netcdf_xarray(cls, path)
        except ImportError:
            return _from_netcdf_scipy(cls, path)


def _batch_flatten(b: Batch):
    surf_keys = tuple(b.surf_vars.keys())
    static_keys = tuple(b.static_vars.keys())
    atmos_keys = tuple(b.atmos_vars.keys())
    children = (
        tuple(b.surf_vars.values()),
        tuple(b.static_vars.values()),
        tuple(b.atmos_vars.values()),
        b.metadata,
    )
    return children, (surf_keys, static_keys, atmos_keys)


def _batch_unflatten(aux, children):
    surf_keys, static_keys, atmos_keys = aux
    surf, static, atmos, metadata = children
    batch = object.__new__(Batch)
    batch.surf_vars = dict(zip(surf_keys, surf))
    batch.static_vars = dict(zip(static_keys, static))
    batch.atmos_vars = dict(zip(atmos_keys, atmos))
    batch.metadata = metadata
    return batch


jax.tree_util.register_pytree_node(Batch, _batch_flatten, _batch_unflatten)


def interpolate_numpy(
    v: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    lat_new: np.ndarray,
    lon_new: np.ndarray,
) -> np.ndarray:
    """Bilinear interpolation on the sphere with periodic longitude wrap-around.

    Latitudes out of range are linearly extrapolated (reference behaviour:
    aurora/batch.py:320-362). Uses the native C++ kernel when the toolchain is
    available (aurora_tpu/native, ~1e-16 agreement with the scipy path) and scipy
    otherwise.
    """
    from aurora_tpu.native import regrid_bilinear

    native = regrid_bilinear(
        np.asarray(v, dtype=np.float64),
        np.asarray(lat, dtype=np.float64),
        np.asarray(lon, dtype=np.float64),
        np.asarray(lat_new, dtype=np.float64),
        np.asarray(lon_new, dtype=np.float64),
    )
    if native is not None:
        return native

    from scipy.interpolate import RegularGridInterpolator as RGI

    assert (np.diff(lon) > 0).all()
    lon_ext = np.concatenate((lon[-1:] - 360, lon, lon[:1] + 360))

    batch_shape = v.shape[:-2]
    v = v.reshape(-1, *v.shape[-2:])

    lat_new_grid, lon_new_grid = np.meshgrid(lat_new, lon_new, indexing="ij", sparse=True)
    out = []
    for vi in v:
        vi = np.concatenate((vi[:, -1:], vi, vi[:, :1]), axis=1)
        rgi = RGI((lat, lon_ext), vi, method="linear", bounds_error=False, fill_value=None)
        out.append(rgi((lat_new_grid, lon_new_grid)))
    result = np.stack(out, axis=0)
    return result.reshape(*batch_shape, lat_new.shape[0], lon_new.shape[0])


# ---------------------------------------------------------------------- netCDF helpers


def _to_netcdf_xarray(batch: Batch, path) -> None:
    import xarray as xr

    b = batch.to_numpy()
    ds = xr.Dataset(
        {
            **{
                f"surf_{k}": (("batch", "history", "latitude", "longitude"), v)
                for k, v in b.surf_vars.items()
            },
            **{
                f"static_{k}": (("latitude", "longitude"), v)
                for k, v in b.static_vars.items()
            },
            **{
                f"atmos_{k}": (("batch", "history", "level", "latitude", "longitude"), v)
                for k, v in b.atmos_vars.items()
            },
        },
        coords={
            "latitude": np.asarray(b.metadata.lat),
            "longitude": np.asarray(b.metadata.lon),
            "time": list(b.metadata.time),
            "level": list(b.metadata.atmos_levels),
            "rollout_step": b.metadata.rollout_step,
        },
    )
    ds.to_netcdf(path)


def _from_netcdf_xarray(cls, path):
    import xarray as xr

    ds = xr.load_dataset(path, engine="netcdf4")
    surf = [k.removeprefix("surf_") for k in ds if str(k).startswith("surf_")]
    static = [k.removeprefix("static_") for k in ds if str(k).startswith("static_")]
    atmos = [k.removeprefix("atmos_") for k in ds if str(k).startswith("atmos_")]
    return cls(
        surf_vars={k: np.asarray(ds[f"surf_{k}"].values) for k in surf},
        static_vars={k: np.asarray(ds[f"static_{k}"].values) for k in static},
        atmos_vars={k: np.asarray(ds[f"atmos_{k}"].values) for k in atmos},
        metadata=Metadata(
            lat=np.asarray(ds.latitude.values),
            lon=np.asarray(ds.longitude.values),
            time=tuple(ds.time.values.astype("datetime64[s]").tolist()),
            atmos_levels=tuple(ds.level.values),
            rollout_step=int(ds.rollout_step.values),
        ),
    )


def _to_netcdf_scipy(batch: Batch, path) -> None:
    from scipy.io import netcdf_file

    b = batch.to_numpy()
    with netcdf_file(str(path), "w") as f:
        lat = np.asarray(b.metadata.lat)
        lon = np.asarray(b.metadata.lon)
        some = next(iter(b.surf_vars.values()))
        B, T = some.shape[:2]
        C = len(b.metadata.atmos_levels)
        f.createDimension("batch", B)
        f.createDimension("history", T)
        f.createDimension("level", C)
        f.createDimension("latitude", lat.shape[0] if lat.ndim == 1 else lat.shape[0])
        f.createDimension("longitude", lon.shape[-1])

        def mkvar(name, dims, data):
            var = f.createVariable(name, np.float64 if data.dtype == np.float64 else "f", dims)
            var[:] = np.asarray(data, dtype=var.data.dtype)

        mkvar("latitude", ("latitude",) if lat.ndim == 1 else ("latitude", "longitude"), lat)
        mkvar("longitude", ("longitude",) if lon.ndim == 1 else ("latitude", "longitude"), lon)
        mkvar("level", ("level",), np.asarray(b.metadata.atmos_levels, dtype=np.float64))
        times = np.asarray(
            [t.replace(tzinfo=timezone.utc).timestamp() for t in b.metadata.time],
            dtype=np.float64,
        )
        mkvar("time", ("batch",), times)
        # scipy's scalar-variable write path is broken with modern NumPy; store the
        # roll-out step as a global attribute instead.
        f.rollout_step = int(b.metadata.rollout_step)
        for k, v in b.surf_vars.items():
            mkvar(f"surf_{k}", ("batch", "history", "latitude", "longitude"), v)
        for k, v in b.static_vars.items():
            mkvar(f"static_{k}", ("latitude", "longitude"), v)
        for k, v in b.atmos_vars.items():
            mkvar(f"atmos_{k}", ("batch", "history", "level", "latitude", "longitude"), v)


def _from_netcdf_scipy(cls, path):
    from scipy.io import netcdf_file

    with netcdf_file(str(path), "r") as f:
        names = list(f.variables.keys())
        surf = [k[len("surf_"):] for k in names if k.startswith("surf_")]
        static = [k[len("static_"):] for k in names if k.startswith("static_")]
        atmos = [k[len("atmos_"):] for k in names if k.startswith("atmos_")]

        def get(name):
            arr = np.array(f.variables[name][:])
            if arr.dtype.byteorder == ">":  # netCDF3 is big-endian; JAX needs native.
                arr = arr.astype(arr.dtype.newbyteorder("="))
            return arr

        times = tuple(
            datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None)
            for t in get("time")
        )
        return cls(
            surf_vars={k: get(f"surf_{k}") for k in surf},
            static_vars={k: get(f"static_{k}") for k in static},
            atmos_vars={k: get(f"atmos_{k}") for k in atmos},
            metadata=Metadata(
                lat=get("latitude"),
                lon=get("longitude"),
                time=times,
                atmos_levels=tuple(float(x) for x in get("level")),
                rollout_step=int(f.rollout_step),
            ),
        )
