"""End-to-end serving test: real server logic, real channel, fake HTTP transport.

Mirrors the reference test strategy (reference: tests/foundry/conftest.py — "fake the
transport, run the real logic"): the full submit → task-queue → rollout → per-step
retrieval loop runs in-process with a tiny model over a filesystem channel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aurora_tpu.foundry.models as foundry_models
from aurora_tpu.foundry import InferenceServer, LocalFileChannel, submit
from aurora_tpu.foundry.models import ServedModel
from aurora_tpu.model.config import AuroraConfig
from aurora_tpu.model.aurora import Aurora, init_params
from tests.conftest import make_batch


class TinyServedModel(ServedModel):
    """A small randomly-initialised model so the test runs in seconds."""

    name = "tiny-test-model"
    model_cls = None  # Built in __init__.

    def __init__(self):
        cfg = AuroraConfig(
            embed_dim=64,
            num_heads=4,
            encoder_depths=(1, 1),
            encoder_num_heads=(2, 4),
            decoder_depths=(1, 1),
            decoder_num_heads=(4, 2),
            window_size=(2, 4, 4),
            latent_levels=2,
            use_lora=False,
        )
        self.model = Aurora(cfg)
        self.params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


class FakeFoundryClient:
    """Drives the real InferenceServer directly instead of over HTTP."""

    def __init__(self, server: InferenceServer):
        self.server = server

    def submit_task(self, data: dict) -> dict:
        return self.server.handle({"type": "submission", "msg": data})

    def get_progress(self, task_id: str) -> dict:
        return self.server.handle({"type": "task_info", "msg": {"task_id": task_id}})


@pytest.fixture
def registered_tiny_model():
    foundry_models.models["tiny-test-model"] = TinyServedModel
    yield
    del foundry_models.models["tiny-test-model"]


def test_submit_end_to_end(tmp_path, registered_tiny_model):
    server = InferenceServer()
    client = FakeFoundryClient(server)
    channel = LocalFileChannel(tmp_path / "comm")

    batch = make_batch(H=16, W=32, levels=(500.0, 850.0), dtype=np.float32)
    num_steps = 2

    preds = list(
        submit(
            batch,
            model_name="tiny-test-model",
            num_steps=num_steps,
            channel=channel,
            foundry_client=client,
        )
    )
    server.shutdown()

    assert len(preds) == num_steps
    for i, pred in enumerate(preds):
        assert pred.metadata.rollout_step == i + 1
        for v in pred.surf_vars.values():
            assert v.shape == (1, 1, 16, 32)
            assert np.isfinite(np.asarray(v)).all()


def test_submit_unknown_model(tmp_path):
    server = InferenceServer()
    client = FakeFoundryClient(server)
    channel = LocalFileChannel(tmp_path / "comm")
    batch = make_batch(dtype=np.float32)
    with pytest.raises(KeyError):
        list(submit(batch, "not-a-model", 1, channel, client))
    server.shutdown()


def test_submit_over_real_http(tmp_path, registered_tiny_model):
    """The full loop over a real localhost socket: FoundryClient -> http.server
    endpoint -> InferenceServer, with bearer-token auth."""
    from aurora_tpu.foundry.client import FoundryClient
    from aurora_tpu.foundry.http_server import serve

    with serve(token="secret") as handle:
        client = FoundryClient(endpoint=handle.url, token="secret")
        channel = LocalFileChannel(tmp_path / "comm")
        batch = make_batch(H=16, W=32, levels=(500.0, 850.0), dtype=np.float32)
        preds = list(
            submit(
                batch,
                model_name="tiny-test-model",
                num_steps=2,
                channel=channel,
                foundry_client=client,
            )
        )
    assert len(preds) == 2
    assert preds[1].metadata.rollout_step == 2


def test_http_rejects_bad_token(registered_tiny_model):
    import requests

    from aurora_tpu.foundry.http_server import serve

    with serve(token="secret") as handle:
        r = requests.post(
            handle.url,
            headers={"Authorization": "Bearer wrong"},
            json={"input_data": {"data": "{}"}},
        )
        assert r.status_code == 401


def test_task_failure_surfaces_to_client(tmp_path, registered_tiny_model, monkeypatch):
    """Exceptions inside the roll-out are captured into the task status and raised
    client-side as SubmissionError (reference: mlflow_wrapper.py:107-113)."""
    import aurora_tpu.foundry.server as server_mod
    from aurora_tpu.foundry.client import SubmissionError

    def boom(self):
        raise RuntimeError("synthetic rollout failure")

    monkeypatch.setattr(TinyServedModel, "run", boom, raising=False)

    server = InferenceServer()
    client = FakeFoundryClient(server)
    channel = LocalFileChannel(tmp_path / "comm")
    batch = make_batch(H=16, W=32, levels=(500.0, 850.0), dtype=np.float32)
    with pytest.raises(SubmissionError):
        list(
            submit(
                batch, model_name="tiny-test-model", num_steps=2,
                channel=channel, foundry_client=client,
            )
        )
    server.shutdown()


def test_channel_read_timeout(tmp_path):
    channel = LocalFileChannel(tmp_path / "comm")
    with pytest.raises(TimeoutError):
        channel.read("no-such-task", "input.nc.ack", timeout=0.5)


def test_interactive_field_data_url():
    """The interactive-map overlay encoder renders a data URL (demo parity item)."""
    import numpy as np

    from aurora_tpu.foundry.demo.interactive import field_data_url

    H, W = 18, 36
    lon = np.linspace(0, 360, W, endpoint=False)
    field = np.random.default_rng(0).standard_normal((H, W))
    url = field_data_url(field, lon, "viridis", -2, 2, dpi=50)
    assert url.startswith("data:image/png;base64,")
    assert len(url) > 500


def test_served_model_casts_backbone_for_autocast(tmp_path):
    """ServedModel._load_params stores the backbone in bf16 for autocast models
    (the 16 GB serving configuration) and leaves f32 models untouched."""
    from aurora_tpu.checkpoint import save_params

    cfg = AuroraConfig(
        embed_dim=64,
        num_heads=4,
        encoder_depths=(1, 1),
        encoder_num_heads=(2, 4),
        decoder_depths=(1, 1),
        decoder_num_heads=(4, 2),
        window_size=(2, 4, 4),
        latent_levels=2,
        use_lora=False,
        autocast=True,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    path = str(tmp_path / "tiny_params")
    save_params(params, path)

    class Served(ServedModel):
        name = "tiny-autocast"
        model_cls = None

        def __init__(self):
            self.model = Aurora(cfg)
            self.params = self._load_params()

    foundry_models.ARTIFACTS["tiny-autocast"] = path
    try:
        served = Served()
    finally:
        del foundry_models.ARTIFACTS["tiny-autocast"]

    bb_leaf = jax.tree_util.tree_leaves(served.params["backbone"])[0]
    enc_leaf = jax.tree_util.tree_leaves(served.params["encoder"])[0]
    assert bb_leaf.dtype == jnp.bfloat16
    assert enc_leaf.dtype == jnp.float32
    # And the served model still runs end to end.
    batch = make_batch(
        H=17, W=32, levels=(500, 850), dtype=np.float32
    )
    preds = list(served.run(batch, num_steps=1))
    assert len(preds) == 1
    assert np.isfinite(np.asarray(preds[0].surf_vars["2t"])).all()
