"""CLI driver (python -m aurora_tpu): forecast + evaluate round trip."""

import json

import numpy as np
import pytest

from aurora_tpu import Batch
from aurora_tpu.cli import main
from tests.conftest import make_batch


@pytest.fixture(scope="module")
def forecast_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    ic = tmp / "ic.nc"
    make_batch(H=17, W=32, dtype=np.float32).to_netcdf(ic)
    out = tmp / "preds"
    rc = main(
        [
            "forecast",
            "--model",
            "AuroraSmallPretrained",
            "--random-init",
            "--input",
            str(ic),
            "--steps",
            "2",
            "--output-dir",
            str(out),
        ]
    )
    assert rc == 0
    return out


def test_forecast_writes_prediction_files(forecast_dir):
    files = sorted(p.name for p in forecast_dir.iterdir())
    assert files == ["prediction-000.nc", "prediction-001.nc"]
    pred = Batch.from_netcdf(forecast_dir / "prediction-001.nc")
    assert pred.surf_vars["2t"].shape == (1, 1, 16, 32)
    assert pred.atmos_vars["t"].shape == (1, 1, 4, 16, 32)
    assert pred.metadata.rollout_step == 2
    assert np.isfinite(np.asarray(pred.surf_vars["msl"])).all()


def test_evaluate_prediction_against_itself(forecast_dir, capsys):
    p = str(forecast_dir / "prediction-000.nc")
    rc = main(["evaluate", "--pred", p, "--target", p])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pred"] == p
    # Scores are keyed by group so surf/atmos variables with the same name
    # can never collide (ADVICE r3).
    assert out["scores"]["surf_vars"]["2t"]["rmse"] == 0.0
    assert out["scores"]["atmos_vars"]["t"]["rmse"] == [0.0, 0.0, 0.0, 0.0]  # per level
    assert "acc" not in out["scores"]["surf_vars"]["2t"]  # no climatology given


def test_evaluate_mismatched_lists(tmp_path, capsys):
    f = tmp_path / "x.nc"
    make_batch(H=9, W=16, dtype=np.float32).to_netcdf(f)
    rc = main(["evaluate", "--pred", str(f), str(f), "--target", str(f)])
    assert rc == 2


def test_forecast_from_orbax_checkpoint(tmp_path):
    """--checkpoint <dir> restores Orbax-saved params (the native save format)."""
    import jax

    from aurora_tpu import AuroraSmallPretrained, checkpoint

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(3))
    ckpt_dir = tmp_path / "ckpt"
    checkpoint.save_params(params, str(ckpt_dir))

    ic = tmp_path / "ic.nc"
    make_batch(H=17, W=32, dtype=np.float32).to_netcdf(ic)
    out = tmp_path / "preds"
    rc = main(
        ["forecast", "--model", "AuroraSmallPretrained", "--checkpoint", str(ckpt_dir),
         "--input", str(ic), "--steps", "1", "--output-dir", str(out)]
    )
    assert rc == 0
    pred = Batch.from_netcdf(out / "prediction-000.nc")
    assert np.isfinite(np.asarray(pred.surf_vars["2t"])).all()


def test_missing_checkpoint_path_is_clean_error(tmp_path, capsys):
    """A mistyped --checkpoint path exits 2 with a friendly message, not a traceback."""
    f = tmp_path / "ic.nc"
    make_batch(H=9, W=16, dtype=np.float32).to_netcdf(f)
    rc = main(
        ["forecast", "--model", "AuroraSmallPretrained", "--checkpoint",
         str(tmp_path / "nope.ckpt"), "--input", str(f),
         "--output-dir", str(tmp_path / "o")]
    )
    assert rc == 2
    assert "checkpoint not found" in capsys.readouterr().err


def test_unknown_model(tmp_path):
    f = tmp_path / "ic.nc"
    make_batch(H=9, W=16, dtype=np.float32).to_netcdf(f)
    rc = main(
        ["forecast", "--model", "NotAModel", "--random-init", "--input", str(f),
         "--output-dir", str(tmp_path / "o")]
    )
    assert rc == 2
