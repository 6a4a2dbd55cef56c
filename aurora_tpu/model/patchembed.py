"""Per-variable patch embedding.

TPU-native design: the reference realises this as a dynamically-assembled strided
``conv3d`` (reference: aurora/model/patchembed.py:100-112). A stride-equals-kernel conv
is exactly a patch extraction followed by a dense projection, so here it is implemented
as reshape + one large matmul — the canonical MXU-friendly form, with no conv lowering
in the way of XLA fusion.

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

    # (V*T*P*P, D) projection matrix in (v, t, p, q) patch order.
    weight = jnp.concatenate(
        [p["weights"][name][:T].reshape(T * P * P, -1) for name in var_names], axis=0
    )

    # Extract patches: (B, V, T, H/P, P, W/P, P) -> (B, H/P, W/P, V, T, P, P).
    xp = x.reshape(B, V, T, H // P, P, W // P, P)
    xp = xp.transpose(0, 3, 5, 1, 2, 4, 6)
    xp = xp.reshape(B, (H // P) * (W // P), V * T * P * P)

    return xp @ weight.astype(x.dtype) + p["bias"].astype(x.dtype)
