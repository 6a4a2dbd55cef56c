"""Tropical-cyclone tracking example (mirrors docs/example_tc_tracking.ipynb).

Rolls the model out from an initial condition and feeds each prediction to the
tracker, starting from a known storm fix.
"""

from datetime import datetime

from aurora_tpu import AuroraPretrained, rollout
from aurora_tpu.foundry.demo.hres_t0_data import load_batch
from aurora_tpu.tracker import Tracker


def main():
    # Typhoon Nanmadol initial fix (the reference's example), 2022-09-16 12Z.
    init_time = datetime(2022, 9, 16, 12)
    batch = load_batch(init_time)

    model = AuroraPretrained(autocast=True)
    params = model.load_checkpoint()

    tracker = Tracker(init_lat=25.3, init_lon=129.2, init_time=init_time)
    for pred in rollout(model, params, batch, steps=16):
        tracker.step(pred.to_numpy())
    print(tracker.results())


if __name__ == "__main__":
    main()
