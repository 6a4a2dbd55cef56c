"""Latitude-weighted verification metrics (aurora_tpu/metrics.py).

The reference ships no evaluation code (its RMSE/ACC skill scores live in the Nature
paper's pipeline, /root/reference/README.md:12-31); these tests pin the WeatherBench
conventions: cos-lat weights with mean 1, sqrt-after-mean RMSE, anomaly correlation.
"""

import numpy as np
import pytest

from aurora_tpu import metrics
from tests.conftest import make_batch


def _np_weights(lat):
    w = np.maximum(np.cos(np.deg2rad(np.asarray(lat, np.float64))), 0.0)
    return w / w.mean()


def test_latitude_weights_normalised_and_pole_zero():
    lat = np.linspace(90, -90, 33)  # pole-containing grid
    w = np.asarray(metrics.latitude_weights(lat))
    assert w.shape == (33, 1)
    assert np.isclose(w.mean(), 1.0, atol=1e-6)
    assert w[0, 0] == 0.0 and w[-1, 0] == 0.0
    assert w.max() == pytest.approx(1 / _np_weights(lat).mean() * _np_weights(lat).max(), rel=1e-6)

    with pytest.raises(ValueError):
        metrics.latitude_weights(np.zeros((2, 3, 4)))


def test_rmse_constant_offset_is_offset():
    # Weights have mean 1, so a uniform error of c gives RMSE exactly c.
    lat = np.linspace(80, -80, 9)
    pred = np.zeros((2, 9, 16)) + 1.5
    target = np.zeros((2, 9, 16))
    out = np.asarray(metrics.rmse(pred, target, lat))
    assert out.shape == (2,)
    np.testing.assert_allclose(out, 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(metrics.bias(pred, target, lat)), 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(metrics.mae(pred, target, lat)), 1.5, rtol=1e-6)


def test_rmse_matches_numpy_reference():
    rng = np.random.default_rng(0)
    lat = np.linspace(90, -90, 17)
    pred = rng.standard_normal((2, 3, 17, 32))
    target = rng.standard_normal((2, 3, 17, 32))
    w = _np_weights(lat)[:, None]
    expect = np.sqrt(np.mean((pred - target) ** 2 * w, axis=(-2, -1)))
    got = np.asarray(metrics.rmse(pred, target, lat))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_acc_perfect_and_anticorrelated():
    rng = np.random.default_rng(1)
    lat = np.linspace(60, -60, 8)
    clim = rng.standard_normal((8, 16))
    anom = rng.standard_normal((1, 8, 16))
    target = clim + anom
    np.testing.assert_allclose(np.asarray(metrics.acc(target, target, clim, lat)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics.acc(clim - anom, target, clim, lat)), -1.0, rtol=1e-5
    )


def test_matrix_grid_weights():
    # Matrix (curvilinear) grid: 2D lat produces elementwise 2D weights.
    lat = np.stack([np.linspace(70, -70, 9)] * 12, axis=1) + np.linspace(0, 5, 12)
    w = np.asarray(metrics.latitude_weights(lat))
    assert w.shape == (9, 12)
    assert np.isclose(w.mean(), 1.0, atol=1e-6)
    pred = np.ones((1, 9, 12))
    out = np.asarray(metrics.rmse(pred, np.zeros_like(pred), lat))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_evaluate_batch_shapes_and_acc():
    pred = make_batch(H=17, W=32, B=2, seed=0)
    target = make_batch(H=17, W=32, B=2, seed=1)
    out = metrics.evaluate(pred, target)
    assert set(out) == {"surf_vars", "atmos_vars"}
    assert np.asarray(out["surf_vars"]["2t"]["rmse"]).shape == (2, 2)  # (B, T)
    assert np.asarray(out["atmos_vars"]["t"]["rmse"]).shape == (2, 2, 4)  # (B, T, C)
    assert "acc" not in out["surf_vars"]["2t"]

    clim = make_batch(H=17, W=32, B=2, seed=2)
    out = metrics.evaluate(pred, target, climatology=clim)
    a = np.asarray(out["atmos_vars"]["q"]["acc"])
    assert a.shape == (2, 2, 4)
    assert np.all(np.abs(a) <= 1.0 + 1e-6)
    # Perfect forecast: ACC 1, RMSE 0.
    perfect = metrics.evaluate(target, target, climatology=clim)
    np.testing.assert_allclose(np.asarray(perfect["surf_vars"]["msl"]["acc"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(perfect["surf_vars"]["msl"]["rmse"]), 0.0, atol=1e-8)


def test_evaluate_errors():
    pred = make_batch(H=9, W=16)
    target = make_batch(H=9, W=16)
    target.surf_vars.pop("2t")
    with pytest.raises(KeyError):
        metrics.evaluate(pred, target)

    bad = make_batch(H=9, W=16)
    bad.surf_vars["2t"] = bad.surf_vars["2t"][:, :1]
    with pytest.raises(ValueError):
        metrics.evaluate(pred, bad)


def test_evaluate_rejects_different_grid():
    """Same shapes, different grid (flipped latitudes) must raise, not mis-score."""
    import dataclasses

    pred = make_batch(H=9, W=16)
    shifted = make_batch(H=9, W=16)
    shifted.metadata = dataclasses.replace(shifted.metadata, lat=shifted.metadata.lat * 0.9)
    with pytest.raises(ValueError, match="different grid"):
        metrics.evaluate(pred, shifted)
    # And via the climatology argument too.
    target = make_batch(H=9, W=16)
    with pytest.raises(ValueError, match="different grid"):
        metrics.evaluate(pred, target, climatology=shifted)
