"""ERA5 0.25-deg inference example (mirrors docs/example_era5.ipynb in the reference).

Downloads two ERA5 analysis times from the WeatherBench2 archive, runs a 2-day
roll-out with the pretrained 1.3 B model, and writes the predictions to netCDF.
Requires network access (HF hub + GCS) and xarray/zarr/gcsfs.
"""

from datetime import datetime

from aurora_tpu import AuroraPretrained, rollout
from aurora_tpu.foundry.demo.hres_t0_data import load_batch


def main():
    batch = load_batch(datetime(2023, 1, 1, 12))

    model = AuroraPretrained(autocast=True)
    params = model.load_checkpoint()

    for i, pred in enumerate(rollout(model, params, batch, steps=8)):  # 8 x 6h = 2 days
        pred = pred.to_numpy()
        pred.to_netcdf(f"prediction-{i:03d}.nc")
        print(f"step {i}: {pred.metadata.time[0]}")


if __name__ == "__main__":
    main()
