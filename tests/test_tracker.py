"""Tropical-cyclone tracker tests on synthetic storms."""

from datetime import datetime, timedelta

import numpy as np

from aurora_tpu import Batch, Metadata
from aurora_tpu.tracker import Tracker, extrapolate_track, haversine_km, select_box


def _storm_batch(eye_lat, eye_lon, time, H=181, W=360):
    """A synthetic global field with an MSL/Z700 minimum at the storm eye, over ocean."""
    lat = np.linspace(90, -90, H)
    lon = np.linspace(0, 360, W, endpoint=False)
    glat, glon = np.meshgrid(lat, lon, indexing="ij")
    # Angular distance to the eye (deg), periodic in longitude.
    dlon = np.minimum(np.abs(glon - eye_lon), 360 - np.abs(glon - eye_lon))
    d2 = (glat - eye_lat) ** 2 + dlon**2
    depression = -40e2 * np.exp(-d2 / 18.0)
    msl = 1.013e5 + depression
    z700 = 3.0e4 + 10 * depression
    wind = 30.0 * np.exp(-d2 / 40.0)

    return Batch(
        surf_vars={
            "msl": msl[None, None],
            "10u": wind[None, None],
            "10v": np.zeros((1, 1, H, W)),
            "2t": np.full((1, 1, H, W), 290.0),
        },
        static_vars={"lsm": np.zeros((H, W))},
        atmos_vars={"z": np.broadcast_to(z700, (1, 1, 3, H, W)).copy()},
        metadata=Metadata(
            lat=lat,
            lon=lon,
            time=(time,),
            atmos_levels=(500, 700, 850),
            rollout_step=1,
        ),
    )


def test_tracker_follows_moving_storm():
    t0 = datetime(2020, 9, 1)
    tracker = Tracker(init_lat=20.0, init_lon=200.0, init_time=t0)

    # The storm moves north-west 1°/step.
    for i in range(1, 6):
        eye_lat, eye_lon = 20.0 + i, 200.0 - i
        tracker.step(_storm_batch(eye_lat, eye_lon, t0 + i * timedelta(hours=6)))

    df = tracker.results()
    assert len(df) == 6
    assert tracker.fails == 0
    # The final fix should be within ~1.5° of the true eye.
    assert abs(df.lat.iloc[-1] - 25.0) < 1.5
    assert abs(df.lon.iloc[-1] - 195.0) < 1.5
    # Minimum MSL near the eye depth, wind positive.
    assert df.msl.iloc[-1] < 1.0e5
    assert df.wind.iloc[-1] > 10


def test_tracker_crosses_longitude_seam():
    t0 = datetime(2020, 9, 1)
    tracker = Tracker(init_lat=15.0, init_lon=359.0, init_time=t0)
    for i in range(1, 4):
        eye_lon = (359.0 + i) % 360
        tracker.step(_storm_batch(15.0, eye_lon, t0 + i * timedelta(hours=6)))
    df = tracker.results()
    assert tracker.fails == 0
    assert abs(df.lat.iloc[-1] - 15.0) < 1.5


def test_extrapolate_track():
    assert extrapolate_track([10.0], [20.0]) == (10.0, 20.0)
    lat, lon = extrapolate_track([10.0, 11.0, 12.0], [20.0, 21.0, 22.0])
    assert abs(lat - 13.0) < 1e-8 and abs(lon - 23.0) < 1e-8


def test_select_box_wraps():
    lats = np.linspace(90, -90, 19)
    lons = np.linspace(0, 360, 36, endpoint=False)
    field = np.arange(19 * 36, dtype=float).reshape(19, 36)
    box_lats, box_lons, box = select_box(field, lats, lons, -10, 10, 350, 10)
    assert box.shape == (3, 3)
    assert set(box_lons) == {350.0, 0.0, 10.0}


def test_haversine():
    # Quarter of the equator.
    assert abs(haversine_km(0, 0, 0, 90) - np.pi / 2 * 6371) < 1


def test_tracker_matches_reference():
    """Our tracker must produce the same fixes as the reference tracker on the same
    synthetic storm (reference: aurora/tracker.py)."""
    from tests.conftest import load_reference

    ref = load_reference()
    import torch
    from aurora.tracker import Tracker as RefTracker

    t0 = datetime(2020, 9, 1)
    ours = Tracker(init_lat=20.0, init_lon=200.0, init_time=t0)
    theirs = RefTracker(init_lat=20.0, init_lon=200.0, init_time=t0)

    for i in range(1, 6):
        eye_lat, eye_lon = 20.0 + i, 200.0 - i * 1.5
        b = _storm_batch(eye_lat, eye_lon, t0 + i * timedelta(hours=6))
        ours.step(b)
        tb = ref.Batch(
            surf_vars={k: torch.from_numpy(np.asarray(v)) for k, v in b.surf_vars.items()},
            static_vars={k: torch.from_numpy(np.asarray(v)) for k, v in b.static_vars.items()},
            atmos_vars={k: torch.from_numpy(np.asarray(v)) for k, v in b.atmos_vars.items()},
            metadata=ref.Metadata(
                lat=torch.from_numpy(np.asarray(b.metadata.lat)),
                lon=torch.from_numpy(np.asarray(b.metadata.lon)),
                time=b.metadata.time,
                atmos_levels=b.metadata.atmos_levels,
                rollout_step=b.metadata.rollout_step,
            ),
        )
        theirs.step(tb)

    df_o = ours.results()
    df_t = theirs.results()
    assert len(df_o) == len(df_t)
    np.testing.assert_allclose(df_o.lat.values, df_t.lat.values, atol=1e-6)
    np.testing.assert_allclose(df_o.lon.values, df_t.lon.values, atol=1e-6)
    np.testing.assert_allclose(df_o.msl.values, df_t.msl.values, rtol=1e-6)
    np.testing.assert_allclose(df_o.wind.values, df_t.wind.values, rtol=1e-6)
