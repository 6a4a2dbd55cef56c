"""CAMS air-pollution forecasting example (mirrors docs/example_cams.ipynb).

AuroraAirPollution runs on the 0.4-deg CAMS grid with the 13 standard levels, a 12 h
timestep, and predicts differences for the chemistry species internally.
"""

from aurora_tpu import AuroraAirPollution, rollout


def main():
    model = AuroraAirPollution()
    params = model.load_checkpoint()

    batch = ...  # CAMS initial condition: see model.cfg.surf_vars / static_vars / atmos_vars
    for i, pred in enumerate(rollout(model, params, batch, steps=4)):
        print(f"step {i}: pm2p5 max {float(pred.surf_vars['pm2p5'].max()):.2e}")


if __name__ == "__main__":
    main()
