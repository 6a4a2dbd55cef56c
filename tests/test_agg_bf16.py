"""bf16 encoder level aggregation (production throughput mode) stays close to f32.

``agg_bf16`` runs only the encoder's level-aggregation cross-attention in bfloat16
and casts back; the patch embeds, surface path, backbone and decoder configs are
untouched. The error budget is one bf16 rounding of the perceiver stack (~1e-3
relative), which the autocast backbone would apply to the aggregated latents one
op later anyway. Unlike ``deagg_bf16`` (whose surface heads bypass the changed
path bit-for-bit), the aggregated latents feed the backbone, so every output
field shifts within the rounding budget.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu import AuroraSmallPretrained
from tests.conftest import make_batch


def test_agg_bf16_close_to_f32():
    model32 = AuroraSmallPretrained()
    model16 = AuroraSmallPretrained(agg_bf16=True)

    params = model32.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    batch = make_batch(dtype=np.float32)

    pred32 = model32.forward(params, batch)
    pred16 = model16.forward(params, batch)

    changed = False
    for group in ("surf_vars", "atmos_vars"):
        for k, v32 in getattr(pred32, group).items():
            v32 = np.asarray(v32)
            v16 = np.asarray(getattr(pred16, group)[k])
            assert np.isfinite(v16).all(), k
            # Fields are unnormalised; compare in units of the field's own scale.
            scale = np.abs(v32).mean() + 1e-6
            rel = np.abs(v16 - v32).mean() / scale
            # Random-weight perceivers amplify rounding more than trained ones;
            # measured ~6e-3 worst case on the deagg analogue.
            assert rel < 2e-2, (k, rel)
            changed = changed or not np.array_equal(v16, v32)
    assert changed, "bf16 aggregation path not exercised"
