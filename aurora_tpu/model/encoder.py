"""Perceiver3D encoder: variables × pressure levels → latent token grid.

Reference behaviour: aurora/model/encoder.py:198-366. All Fourier encodings (position,
scale, pressure level, lead time, absolute time) arrive precomputed from the host (f64 →
f32, see aurora_tpu/fourier.py); the device graph is pure f32/bf16 matmul + attention.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aurora_tpu.model.config import AuroraConfig
from aurora_tpu.model.nn import (
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    mlp,
    mlp_init,
    trunc_normal_init,
)
from aurora_tpu.model.patchembed import level_patch_embed_apply, level_patch_embed_init
from aurora_tpu.model.perceiver import (
    perceiver_resampler_init,
    _fuse_core_enabled,
    resampler_shared_query_apply,
)
from aurora_tpu.normalisation import level_to_str

__all__ = ["encoder_init", "encoder_apply", "EncoderEncodings"]


@dataclasses.dataclass
class EncoderEncodings:
    """Host-precomputed Fourier encodings consumed by the encoder (all float32).

    Attributes:
        pos: ``(L, D)`` positional encoding of patch centres.
        scale: ``(L, D)`` patch-area scale encoding.
        levels: ``(C_A, D)`` pressure-level encoding (encoder dim).
        levels_dec: ``(C_A, 2D)`` pressure-level encoding at the decoder's doubled dim.
        lead_time: ``(D,)`` lead-time encoding.
        absolute_time: ``(B, D)`` absolute-time encoding.
        dynamic_scalars: ``(B, 6)`` time-of-day/week/year features (``dynamic_vars``
            models only), order (tod_cos, tod_sin, dow_cos, dow_sin, doy_cos, doy_sin).
    """

    pos: jax.Array
    scale: jax.Array
    levels: jax.Array
    levels_dec: jax.Array
    lead_time: jax.Array
    absolute_time: jax.Array
    dynamic_scalars: jax.Array | None = None


jax.tree_util.register_pytree_node(
    EncoderEncodings,
    lambda e: (
        (e.pos, e.scale, e.levels, e.levels_dec, e.lead_time, e.absolute_time, e.dynamic_scalars),
        None,
    ),
    lambda aux, ch: EncoderEncodings(*ch),
)


def encoder_init(key, cfg: AuroraConfig, dtype=jnp.float32):
    D = cfg.embed_dim
    ks = jax.random.split(key, 12)

    if not cfg.level_condition:
        atmos_embeds = level_patch_embed_init(
            ks[1], cfg.all_atmos_vars, cfg.patch_size, D, cfg.max_history_size, dtype=dtype
        )
    else:
        lvl_keys = jax.random.split(ks[1], len(cfg.level_condition))
        atmos_embeds = {
            "layers": {
                level_to_str(lvl): level_patch_embed_init(
                    k, cfg.all_atmos_vars, cfg.patch_size, D, cfg.max_history_size, dtype=dtype
                )
                for lvl, k in zip(cfg.level_condition, lvl_keys)
            }
        }

    return {
        "surf_token_embeds": level_patch_embed_init(
            ks[0], cfg.all_surf_vars, cfg.patch_size, D, cfg.max_history_size, dtype=dtype
        ),
        "atmos_token_embeds": atmos_embeds,
        "atmos_latents": trunc_normal_init(ks[2], (cfg.latent_levels - 1, D), dtype=dtype),
        "surf_level_encoding": trunc_normal_init(ks[3], (D,), dtype=dtype),
        "surf_mlp": mlp_init(ks[4], D, int(D * cfg.mlp_ratio), dtype=dtype),
        "surf_norm": layernorm_init(D, dtype=dtype),
        "pos_embed": linear_init(ks[5], D, D, dtype=dtype),
        "scale_embed": linear_init(ks[6], D, D, dtype=dtype),
        "lead_time_embed": linear_init(ks[7], D, D, dtype=dtype),
        "absolute_time_embed": linear_init(ks[8], D, D, dtype=dtype),
        "atmos_levels_embed": linear_init(ks[9], D, D, dtype=dtype),
        "level_agg": perceiver_resampler_init(
            ks[10],
            latent_dim=D,
            context_dim=D,
            depth=cfg.enc_depth,
            head_dim=D // cfg.num_heads,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            ln_k_q=cfg.stabilise_level_agg,
            dtype=dtype,
        ),
    }


def _aggregate_levels(p, x: jax.Array, cfg: AuroraConfig) -> jax.Array:
    """Aggregate physical levels to latent levels: ``(B, C_A, L, D) -> (B, C_l, L, D)``.

    Cross-attention runs independently per token column (reference:
    aurora/model/encoder.py:173-196); the learned latent queries are identical for
    every column, so layer 0's query path is hoisted out of the per-column batch
    (see :func:`resampler_shared_query_apply`). ``agg_chunk_size`` bounds peak HBM:
    the (B·L, C_A, D) kv tensors at 0.25° would otherwise dominate memory.
    """
    B, C_A, L, D = x.shape
    dtype = x.dtype
    # Production throughput mode (see AuroraConfig.agg_bf16): the VALUE path of the
    # aggregation (v / out-proj / MLP — the dominant GEMMs) runs in bf16; q/k/logits
    # stay f32. Running q/k in bf16 too was measured at 2e-1 end-to-end error (raw
    # dot-product logits are magnitude-sensitive); the value-only split is ~4e-3
    # (see resampler_shared_query_apply docstring; tools/production_drift.py).
    value_bf16 = bool(cfg.agg_bf16) and dtype == jnp.float32
    latents = p["atmos_latents"].astype(x.dtype)  # (C_l, D)
    C_l = latents.shape[0]
    # Keep the level axis major: transposing (C_A, L) with tiny C_A runs far below
    # copy bandwidth on TPU (sublane-padded — same finding as the decoder's de-agg,
    # tools/decoder_breakdown.py); the resampler reads level-major directly.
    ctx = x.reshape(C_A, B * L, D) if B == 1 else jnp.swapaxes(x, 0, 1).reshape(C_A, B * L, D)
    from aurora_tpu.model.swin3d import mesh_active

    fuse = jax.default_backend() == "tpu" and not mesh_active()
    out = resampler_shared_query_apply(
        p["level_agg"],
        latents,
        ctx,
        cfg.num_heads,
        ln_eps=cfg.perceiver_ln_eps,
        chunk_size=cfg.agg_chunk_size,
        k_major=True,
        fuse_mlp=fuse,
        value_bf16=value_bf16,
        fuse_core=fuse and _fuse_core_enabled(),
    )
    return out.reshape(B, L, C_l, D).transpose(0, 2, 1, 3).astype(dtype)


def encoder_apply(
    p,
    surf_vars: dict[str, jax.Array],
    static_vars: dict[str, jax.Array],
    atmos_vars: dict[str, jax.Array],
    atmos_levels: tuple[float, ...],
    enc: EncoderEncodings,
    cfg: AuroraConfig,
) -> jax.Array:
    """Encode a (normalised) batch into latent tokens ``(B, C_l * H/P * W/P, D)``.

    ``surf_vars[k]: (B, T, H, W)``; ``static_vars[k]: (B, T, H, W)`` (already expanded);
    ``atmos_vars[k]: (B, T, C_A, H, W)``.
    """
    surf_names = tuple(surf_vars.keys())
    static_names = tuple(static_vars.keys())
    atmos_names = tuple(atmos_vars.keys())

    x_surf = jnp.stack(list(surf_vars.values()), axis=2)  # (B, T, Vs, H, W)
    x_static = jnp.stack(list(static_vars.values()), axis=2)
    x_atmos = jnp.stack(list(atmos_vars.values()), axis=2)  # (B, T, Va, C, H, W)

    B, T, _, C_A, H, W = x_atmos.shape
    dtype = x_surf.dtype

    if cfg.dynamic_vars:
        assert enc.dynamic_scalars is not None
        dyn = enc.dynamic_scalars.astype(dtype)  # (B, 6)
        x_dynamic = jnp.broadcast_to(dyn[:, None, :, None, None], (B, T, 6, H, W))
        x_surf = jnp.concatenate((x_surf, x_static, x_dynamic), axis=2)
        surf_names = surf_names + static_names + cfg.dynamic_var_names
        if cfg.atmos_static_vars:
            atmos_names = atmos_names + tuple(
                f"static_{v}" for v in static_names + cfg.dynamic_var_names
            )
            expand = lambda z: jnp.broadcast_to(
                z[:, :, :, None], (*z.shape[:3], C_A, H, W)
            )
            x_atmos = jnp.concatenate((x_atmos, expand(x_static), expand(x_dynamic)), axis=2)
    else:
        x_surf = jnp.concatenate((x_surf, x_static), axis=2)
        surf_names = surf_names + static_names
        if cfg.atmos_static_vars:
            atmos_names = atmos_names + static_names
            x_atmos = jnp.concatenate(
                (
                    x_atmos,
                    jnp.broadcast_to(x_static[:, :, :, None], (*x_static.shape[:3], C_A, H, W)),
                ),
                axis=2,
            )

    # Surface patch embedding: (B, T, V, H, W) -> (B, V, T, H, W) -> (B, L, D).
    x_surf = x_surf.transpose(0, 2, 1, 3, 4)
    x_surf = level_patch_embed_apply(p["surf_token_embeds"], x_surf, surf_names, cfg.patch_size)

    # In the original air-pollution implementation both `z` and `static_z` select the
    # same data slice; reproduce for numerical equivalence with released checkpoints
    # (reference: aurora/model/encoder.py:293-303).
    if cfg.simulate_indexing_bug and "z" in atmos_names and "static_z" in atmos_names:
        i_z = atmos_names.index("z")
        i_static_z = atmos_names.index("static_z")
        x_atmos = jnp.concatenate(
            (
                x_atmos[:, :, :i_static_z],
                x_atmos[:, :, i_z : i_z + 1],
                x_atmos[:, :, i_static_z + 1 :],
            ),
            axis=2,
        )

    # Atmospheric patch embedding, per pressure level.
    if not cfg.level_condition:
        xa = x_atmos.transpose(0, 3, 2, 1, 4, 5)  # (B, C, V, T, H, W)
        xa = xa.reshape(B * C_A, *xa.shape[2:])
        xa = level_patch_embed_apply(p["atmos_token_embeds"], xa, atmos_names, cfg.patch_size)
        x_atmos = xa.reshape(B, C_A, *xa.shape[1:])  # (B, C, L, D)
    else:
        per_level = []
        for i, lvl in enumerate(atmos_levels):
            xi = x_atmos[:, :, :, i].transpose(0, 2, 1, 3, 4)  # (B, V, T, H, W)
            per_level.append(
                level_patch_embed_apply(
                    p["atmos_token_embeds"]["layers"][level_to_str(lvl)],
                    xi,
                    atmos_names,
                    cfg.patch_size,
                )
            )
        x_atmos = jnp.stack(per_level, axis=1)  # (B, C, L, D)

    # Surface level encoding + Perceiver-style MLP (the surface level is not aggregated).
    x_surf = x_surf + p["surf_level_encoding"].astype(dtype)[None, None, :]
    x_surf = x_surf + layernorm(p["surf_norm"], mlp(p["surf_mlp"], x_surf))

    # Pressure-level encoding, then aggregation to latent levels.
    levels_embed = linear(p["atmos_levels_embed"], enc.levels.astype(dtype))  # (C_A, D)
    x_atmos = x_atmos + levels_embed[None, :, None, :]
    x_atmos = _aggregate_levels(p, x_atmos, cfg)  # (B, C_l - 1 ... latent levels, L, D)

    x = jnp.concatenate((x_surf[:, None], x_atmos), axis=1)  # (B, C_l, L, D)

    # Position and scale embeddings.
    x = x + linear(p["pos_embed"], enc.pos.astype(dtype))[None, None]
    x = x + linear(p["scale_embed"], enc.scale.astype(dtype))[None, None]

    x = x.reshape(B, -1, cfg.embed_dim)  # (B, C_l * L, D)

    # Lead-time and absolute-time embeddings.
    lt = jnp.broadcast_to(enc.lead_time.astype(dtype)[None, :], (B, cfg.embed_dim))
    x = x + linear(p["lead_time_embed"], lt)[:, None]
    x = x + linear(p["absolute_time_embed"], enc.absolute_time.astype(dtype))[:, None]
    return x
