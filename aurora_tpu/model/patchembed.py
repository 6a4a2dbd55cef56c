"""Per-variable patch embedding.

TPU-native design: a dynamically-assembled strided conv, like the reference
(aurora/model/patchembed.py:100-112) but 2D with history folded into channels. The conv
form matters on TPU: manual patch-extraction reshapes create intermediates whose minor
dimension is the patch size, which the (8, 128) tiled layout pads to 128 (a 128/P x
memory blowup); XLA's conv emitter extracts patches internally on the MXU.

Per-variable weights are stored as ``(T, P, P, D)`` (torch stores ``(D, 1, T, P, P)``;
the checkpoint converter transposes). At apply time the selected variables' weights are
concatenated into a single ``(V*T*P*P, D)`` projection matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aurora_tpu.model.nn import kaiming_uniform_init

__all__ = ["level_patch_embed_init", "level_patch_embed_apply"]


def level_patch_embed_init(
    key,
    var_names: tuple[str, ...],
    patch_size: int,
    embed_dim: int,
    history_size: int = 1,
    dtype=jnp.float32,
):
    """Initialise with the torch conv default: uniform(-1/sqrt(k), 1/sqrt(k)) where
    ``k = history * patch²`` (reference: aurora/model/patchembed.py:59-77)."""
    fan_in = history_size * patch_size * patch_size
    ks = jax.random.split(key, len(var_names) + 1)
    weights = {
        name: kaiming_uniform_init(
            k, (history_size, patch_size, patch_size, embed_dim), fan_in=fan_in, dtype=dtype
        )
        for name, k in zip(var_names, ks[:-1])
    }
    bias = kaiming_uniform_init(ks[-1], (embed_dim,), fan_in=fan_in, dtype=dtype)
    return {"weights": weights, "bias": bias}


def level_patch_embed_apply(
    p,
    x: jax.Array,
    var_names: tuple[str, ...],
    patch_size: int,
) -> jax.Array:
    """Embed ``x: (B, V, T, H, W)`` to tokens ``(B, H/P * W/P, D)``.

    Only the weights of the variables present in the batch are used, and only the first
    ``T`` history slots of each variable's kernel (history-size slicing, reference:
    aurora/model/patchembed.py:104).
    """
    B, V, T, H, W = x.shape
    P = patch_size
    assert len(var_names) == V, f"{V} != {len(var_names)}."
    assert len(set(var_names)) == V, f"{var_names} contains duplicates."
    assert H % P == 0 and W % P == 0

    # Layout-aware patching. A naive reshape-to-patches materialises intermediates whose
    # minor dimension is P, which the TPU's (8, 128) tiled layout pads to 128 — a
    # 128/P x memory blowup (21 GB at 0.1 deg). A 2D conv with C_in = V*T (~10) pads the
    # channel-minor operand 128/(V*T) x instead. So: fold the patch ROW into channels
    # first (every intermediate keeps W, P*V*T or D minor) and run ONE strided 1D conv
    # over W with C_in = V*T*P — large enough that channel padding is negligible.
    weight = jnp.stack([p["weights"][name][:T] for name in var_names], axis=0)
    kernel = weight.transpose(4, 0, 1, 2, 3).reshape(-1, V * T * P, P)  # (D, VTP, P)

    xr = x.reshape(B, V * T, H // P, P, W)
    xr = xr.transpose(0, 2, 1, 3, 4).reshape(B * (H // P), V * T * P, W)
    # Output spec NHC: channels-minor, so the (B, L, D) token layout falls out as
    # a free reshape. The NCH output form needs a real minor-dim transpose of the
    # f32 token tensor afterwards (~1.7 GB at 0.25 deg for the 13-level atmos
    # embed — the dominant cost of the old path, tools/encoder_breakdown.py).
    out = jax.lax.conv_general_dilated(
        xr,
        kernel.astype(x.dtype),
        window_strides=(P,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NHC"),
    )  # (B*H/P, W/P, D)
    out = out.reshape(B, (H // P) * (W // P), -1)
    return out + p["bias"].astype(x.dtype)
