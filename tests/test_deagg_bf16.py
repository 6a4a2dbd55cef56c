"""bf16 decoder de-aggregation (production throughput mode) stays close to f32.

``deagg_bf16`` runs only the level de-aggregation cross-attention in bfloat16 and
casts back; everything else (heads, unpatchify, unnormalise) stays f32. The error
budget is the bf16 rounding of the perceiver stack, ~1e-3 relative — the same order
as the backbone-autocast rounding already present on the de-agg input.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraSmallPretrained
from tests.conftest import make_batch


def test_deagg_bf16_close_to_f32():
    model32 = AuroraSmallPretrained()
    model16 = AuroraSmallPretrained(deagg_bf16=True)

    params = model32.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)

    pred32 = model32.forward(params, batch)
    pred16 = model16.forward(params, batch)

    for group in ("surf_vars", "atmos_vars"):
        for k, v32 in getattr(pred32, group).items():
            v32 = np.asarray(v32)
            v16 = np.asarray(getattr(pred16, group)[k])
            assert np.isfinite(v16).all(), k
            # Fields are unnormalised; compare in units of the field's own scale.
            scale = np.abs(v32).mean() + 1e-6
            rel = np.abs(v16 - v32).mean() / scale
            # Random-weight perceivers amplify rounding more than trained ones;
            # measured ~6e-3 worst case here vs ~1e-3 on the production model.
            assert rel < 2e-2, (k, rel)
            if group == "atmos_vars":
                # Only atmospheric fields read the de-aggregation; surface heads
                # bypass it and must stay bit-identical.
                assert not np.array_equal(v16, v32), f"{k}: bf16 path not exercised"
            else:
                assert np.array_equal(v16, v32), k
