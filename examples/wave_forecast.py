"""Ocean-wave forecasting example (mirrors docs/example_wave.ipynb).

AuroraWave consumes HRES-WAM fields; absent wave systems must be NaN (the batch
transform hook handles near-zero wave heights automatically) and the neutral wind is
supplied as magnitude (``wind``) + direction (``dwi``).
"""

from aurora_tpu import AuroraWave, rollout


def main():
    model = AuroraWave(autocast=True)
    params = model.load_checkpoint()

    batch = ...  # build a Batch with the 23 wave surface variables (see docs/models.md)
    for i, pred in enumerate(rollout(model, params, batch, steps=4)):
        print(f"step {i}: swh mean {float(pred.surf_vars['swh'].mean()):.2f} m")


if __name__ == "__main__":
    main()
