"""Golden-checkpoint regression against the RELEASED HF weights and test pickles.

Mirrors the reference's crown-jewel test (reference: tests/conftest.py:35-96,
tests/test_model.py:27-86): download ``aurora-0.25-small-pretrained.ckpt`` plus the
pickled test input/output batches from the Hugging Face hub, run the model in
float64, and assert mean-rel error per variable (1e-4 for 2t/msl/t, 5e-3 for
winds/q; statics exact).

NETWORK-GATED: this environment has no egress, so the test skips when the hub is
unreachable. It runs automatically anywhere with network (CI with secrets, a TPU
VM). The offline proxies are the vendored key manifests (tests/test_ckpt_manifest)
plus random-weight 1e-8 f64 parity against the live torch reference
(tests/test_parity_torch.py), which together cover the converter contract and the
numerics separately.
"""

import dataclasses
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.network


def _hub_reachable() -> bool:
    import socket

    try:
        socket.create_connection(("huggingface.co", 443), timeout=5).close()
        return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def golden():
    if not _hub_reachable():
        pytest.skip("no network: Hugging Face hub unreachable")
    from huggingface_hub import hf_hub_download

    paths = {
        name: hf_hub_download(repo_id="microsoft/aurora", filename=name)
        for name in (
            "aurora-0.25-small-pretrained-test-input.pickle",
            "aurora-0.25-small-pretrained-test-output.pickle",
            "aurora-0.25-static.pickle",
        )
    }
    out = {}
    for name, path in paths.items():
        with open(path, "rb") as f:
            out[name.split("-test-")[-1].replace(".pickle", "")] = pickle.load(f)
    return out["input"], out["output"], out["aurora-0.25-static"]


def test_golden_small_pretrained(golden):
    import jax
    import jax.numpy as jnp

    from aurora_tpu import AuroraSmallPretrained, Batch, Metadata
    from aurora_tpu.batch import interpolate_numpy

    test_input, test_output, static_vars = golden

    lat = np.asarray(test_input["metadata"]["lat"])
    lon = np.asarray(test_input["metadata"]["lon"])
    static_vars = {
        k: interpolate_numpy(
            v,
            np.linspace(90, -90, v.shape[0]),
            np.linspace(0, 360, v.shape[1], endpoint=False),
            lat,
            lon,
        )
        for k, v in static_vars.items()
    }

    # Batch size two, like the reference test (test_model.py:30-42).
    batch = Batch(
        surf_vars={
            k: np.repeat(np.asarray(v, np.float64), 2, axis=0)
            for k, v in test_input["surf_vars"].items()
        },
        static_vars={k: np.asarray(v, np.float64) for k, v in static_vars.items()},
        atmos_vars={
            k: np.repeat(np.asarray(v, np.float64), 2, axis=0)
            for k, v in test_input["atmos_vars"].items()
        },
        metadata=Metadata(
            lat=lat,
            lon=lon,
            atmos_levels=tuple(test_input["metadata"]["atmos_levels"]),
            time=tuple(test_input["metadata"]["time"]),
        ),
    )

    model = AuroraSmallPretrained(use_lora=True)
    # LoRA parameters are not in the released checkpoint (reference loads
    # strict=False, test_model.py:22); fresh LoRA B=0 adapters are exact no-ops.
    params = model.load_checkpoint(dtype=jnp.float64, strict=False)
    pred = model.forward(params, batch)

    tolerances = {
        "2t": 1e-4, "10u": 5e-3, "10v": 5e-3, "msl": 1e-4,
        "u": 5e-3, "v": 5e-3, "t": 1e-4, "q": 5e-3,
    }

    def check(v_out, v_ref, tol, name):
        v_out, v_ref = np.asarray(v_out), np.asarray(v_ref)
        err = np.abs(v_out - v_ref).mean() / np.abs(v_ref).mean()
        assert err <= tol, f"{name}: mean-rel {err:.3e} > {tol}"

    for k, v in pred.surf_vars.items():
        ref = np.repeat(test_output["surf_vars"][k], 2, axis=0)
        check(v[:, 0], ref[:, 0] if ref.ndim == 4 else ref, tolerances[k], k)
    for k, v in pred.atmos_vars.items():
        ref = np.repeat(test_output["atmos_vars"][k], 2, axis=0)
        check(v[:, 0], ref[:, 0] if ref.ndim == 5 else ref, tolerances[k], k)

    np.testing.assert_allclose(np.asarray(pred.metadata.lat), test_output["metadata"]["lat"])
    np.testing.assert_allclose(np.asarray(pred.metadata.lon), test_output["metadata"]["lon"])
    assert pred.metadata.atmos_levels == tuple(test_output["metadata"]["atmos_levels"])
