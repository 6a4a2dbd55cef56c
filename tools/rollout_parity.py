#!/usr/bin/env python
"""Machine-readable 10-step roll-out parity vs the PyTorch reference.

Produces ``ROLLOUT_PARITY.json`` at the repo root with the BASELINE.json
north-star number: max |Δ| (absolute and relative) vs the torch reference after a
10-step roll-out. Runs the small model with converted random weights in f32 on CPU
(the released HF weights are unreachable offline; the random-weight converter path
is itself parity-tested to 1e-8 in f64 — tests/test_parity_torch.py). ``bench.py``
folds the result into its JSON line.

Usage: python tools/rollout_parity.py [--steps 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from tests.conftest import load_reference, make_batch
    from tests.test_parity_torch import _convert, _perturb_film, _to_torch_batch

    reference = load_reference()
    # The parity fixture patches the reference's chaotic f32 scale encoding to f64
    # (see tests/test_parity_torch.py::f64_pos_encoding) — do the same here.
    import contextlib

    @contextlib.contextmanager
    def patched():
        import aurora.model.posencoding as ref_pos

        orig = ref_pos.pos_scale_enc_grid

        def f64_grid(encode_dim, grid, patch_dims, pos_expansion, scale_expansion):
            return orig(encode_dim, grid.double(), patch_dims, pos_expansion, scale_expansion)

        ref_pos.pos_scale_enc_grid = f64_grid
        try:
            yield
        finally:
            ref_pos.pos_scale_enc_grid = orig

    from aurora_tpu import AuroraSmallPretrained, rollout

    ref_model = reference.AuroraSmallPretrained(use_lora=False).float()
    ref_model.eval()
    _perturb_film(ref_model, std=0.02)
    model = AuroraSmallPretrained()
    params = _convert(ref_model, model.cfg, dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)

    with patched(), torch.inference_mode():
        ref_preds = list(
            reference.rollout(ref_model, _to_torch_batch(reference, batch), steps=args.steps)
        )
    preds = list(rollout(model, params, batch, steps=args.steps))

    per_step = []
    for i, (pred, ref_pred) in enumerate(zip(preds, ref_preds)):
        max_abs = 0.0
        max_rel = 0.0
        for k in pred.surf_vars:
            ours = np.asarray(pred.surf_vars[k], np.float64)
            theirs = ref_pred.surf_vars[k].double().numpy()
            max_abs = max(max_abs, float(np.abs(ours - theirs).max()))
            max_rel = max(
                max_rel,
                float(np.abs(ours - theirs).mean() / (np.abs(theirs).mean() + 1e-30)),
            )
        for k in pred.atmos_vars:
            ours = np.asarray(pred.atmos_vars[k], np.float64)
            theirs = ref_pred.atmos_vars[k].double().numpy()
            max_abs = max(max_abs, float(np.abs(ours - theirs).max()))
            max_rel = max(
                max_rel,
                float(np.abs(ours - theirs).mean() / (np.abs(theirs).mean() + 1e-30)),
            )
        per_step.append({"step": i, "max_abs_delta": max_abs, "max_rel_err": max_rel})
        print(f"step {i}: max|Δ| {max_abs:.3e}, mean-rel {max_rel:.3e}", flush=True)

    out = {
        "model": "AuroraSmallPretrained (converted random weights, f32, CPU)",
        "steps": args.steps,
        "max_abs_delta": per_step[-1]["max_abs_delta"],
        "max_rel_err": per_step[-1]["max_rel_err"],
        "per_step": per_step,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ROLLOUT_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
