"""Native C++ regrid kernel vs the scipy reference path."""

import numpy as np
import pytest

from aurora_tpu.batch import interpolate_numpy
from aurora_tpu.native import regrid_bilinear


@pytest.fixture(scope="module")
def grids():
    rng = np.random.default_rng(0)
    H, W = 33, 64
    v = rng.standard_normal((2, 3, H, W))
    lat = np.linspace(90, -90, H)
    lon = np.linspace(0, 360, W, endpoint=False)
    return v, lat, lon


def _scipy_path(v, lat, lon, lat2, lon2):
    from scipy.interpolate import RegularGridInterpolator as RGI

    lon_ext = np.concatenate((lon[-1:] - 360, lon, lon[:1] + 360))
    batch_shape = v.shape[:-2]
    v2 = v.reshape(-1, *v.shape[-2:])
    glat, glon = np.meshgrid(lat2, lon2, indexing="ij", sparse=True)
    out = []
    for vi in v2:
        vi = np.concatenate((vi[:, -1:], vi, vi[:, :1]), axis=1)
        rgi = RGI((lat, lon_ext), vi, method="linear", bounds_error=False, fill_value=None)
        out.append(rgi((glat, glon)))
    return np.stack(out).reshape(*batch_shape, lat2.shape[0], lon2.shape[0])


def test_native_matches_scipy_downsample(grids):
    v, lat, lon = grids
    lat2 = np.linspace(90, -90, 19)
    lon2 = np.linspace(0, 360, 36, endpoint=False)
    a = regrid_bilinear(v, lat, lon, lat2, lon2)
    if a is None:
        pytest.skip("no native toolchain")
    b = _scipy_path(v, lat, lon, lat2, lon2)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_native_matches_scipy_upsample_and_extrapolate(grids):
    v, lat, lon = grids
    # Includes latitudes outside the source range (extrapolation) and longitudes in
    # the wrap cell between lon[-1] and 360.
    lat2 = np.linspace(92, -92, 47)
    lon2 = np.linspace(0.3, 360, 101, endpoint=False)
    a = regrid_bilinear(v, lat, lon, lat2, lon2)
    if a is None:
        pytest.skip("no native toolchain")
    b = _scipy_path(v, lat, lon, lat2, lon2)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_interpolate_numpy_uses_consistent_path(grids):
    v, lat, lon = grids
    lat2 = np.linspace(90, -90, 17)
    lon2 = np.linspace(0, 360, 32, endpoint=False)
    out = interpolate_numpy(v, lat, lon, lat2, lon2)
    ref = _scipy_path(v, lat, lon, lat2, lon2)
    np.testing.assert_allclose(out, ref, atol=1e-12)
