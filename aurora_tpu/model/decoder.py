"""Perceiver3D decoder: backbone tokens → per-variable fields.

Reference behaviour: aurora/model/decoder.py:140-276. The latent-level axis is
de-aggregated back to physical pressure levels with a Perceiver whose queries are the
pressure-level embeddings; per-variable linear heads produce patch pixels which are
un-patchified into ``(B, V, C, H, W)`` fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aurora_tpu.model.config import AuroraConfig
from aurora_tpu.model.nn import linear, linear_init
from aurora_tpu.model.perceiver import (
    _fuse_core_enabled,
    perceiver_resampler_init,
    resampler_shared_query_apply,
)
from aurora_tpu.normalisation import level_to_str

__all__ = ["decoder_init", "decoder_apply", "unpatchify"]


def unpatchify(x: jax.Array, V: int, H: int, W: int, P: int) -> jax.Array:
    """``(B, L, C, V*P²) -> (B, V, C, H, W)`` (reference: aurora/model/util.py:18-41).

    TPU layout strategy ("C-in-lanes"): the naive pixel-shuffle transposes
    materialise intermediates whose minor dimension is ``P`` or ``P*V`` (~20),
    which the (8, 128) tiled layout pads up to 32x — measured ~42 ms for the
    ~0.5 GB 0.25° shuffle. Folding the level axis INTO the lane dimension keeps
    every intermediate's minor at ``C*P*V`` (~260) so both transposes run near
    copy bandwidth (~23 ms measured, tools/decoder_breakdown.py). The one-shot
    form needs a (B, H, W/P, C·P·V) scratch; when that exceeds ~1.2 GB (the
    0.1° case, where it would be 6.7 GB against a 16 GB chip) fall back to the
    per-level map, which bounds the padded intermediate to ~1/C.

    A Pallas pixel-shuffle kernel was prototyped and culled in round 3: Mosaic cannot
    lower its in-kernel lane reshapes ("infer-vector-layout: unsupported shape cast"),
    and the layout-aware XLA form above is within ~2x of copy bandwidth.
    """
    B, C = x.shape[0], x.shape[2]
    Hp, Wp = H // P, W // P
    assert x.shape[1] == Hp * Wp and x.shape[-1] == V * P**2

    scratch_bytes = B * H * Wp * C * P * V * x.dtype.itemsize
    if scratch_bytes <= 1.2 * 2**30:
        y = x.reshape(B, Hp, Wp, C * P * P * V)
        t1 = y.reshape(B, Hp, Wp, C, P, P * V)
        t1 = t1.transpose(0, 1, 4, 2, 3, 5).reshape(B, H, Wp, C * P * V)
        t2 = t1.reshape(B, H, Wp, C, P, V)
        return t2.transpose(0, 5, 3, 1, 2, 4).reshape(B, V, C, H, W)

    def one_level(xc: jax.Array) -> jax.Array:
        y = xc.reshape(B, Hp, Wp, P, P, V)
        y = y.transpose(0, 5, 1, 3, 2, 4)  # (B, V, Hp, P, Wp, P)
        return y.reshape(B, V, Hp * P, Wp * P)

    if C == 1:
        return one_level(x[:, :, 0])[:, :, None]
    out = jax.lax.map(one_level, x.transpose(2, 0, 1, 3))  # (C, B, V, H, W)
    return out.transpose(1, 2, 0, 3, 4)


def _head_vars(cfg: AuroraConfig):
    surf = cfg.surf_vars + tuple(
        f"{n}_mod" for n in cfg.surf_vars if n in cfg.modulation_heads
    )
    atmos = cfg.atmos_vars + tuple(
        f"{n}_mod" for n in cfg.atmos_vars if n in cfg.modulation_heads
    )
    separate = cfg.separate_perceiver
    if cfg.modulation_heads:
        separate = separate + tuple(f"{n}_mod" for n in cfg.separate_perceiver)
    return surf, atmos, separate


def decoder_init(key, cfg: AuroraConfig, dtype=jnp.float32):
    D = cfg.decoder_embed_dim
    P2 = cfg.patch_size**2
    surf_vars, atmos_vars, separate = _head_vars(cfg)
    ks = jax.random.split(key, 4 + len(surf_vars) + len(atmos_vars))

    def resampler(k):
        return perceiver_resampler_init(
            k,
            latent_dim=D,
            context_dim=D,
            depth=cfg.dec_depth,
            head_dim=D // cfg.num_heads,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.dec_mlp_ratio,
            dtype=dtype,
        )

    p = {
        "level_decoder": resampler(ks[0]),
        "atmos_levels_embed": linear_init(ks[1], D, D, dtype=dtype),
        "surf_heads": {
            name: linear_init(k, D, P2, dtype=dtype)
            for name, k in zip(surf_vars, ks[4 : 4 + len(surf_vars)])
        },
    }
    if separate:
        p["level_decoder_alternate"] = resampler(ks[2])

    atmos_keys = ks[4 + len(surf_vars) :]
    if not cfg.level_condition:
        p["atmos_heads"] = {
            name: linear_init(k, D, P2, dtype=dtype) for name, k in zip(atmos_vars, atmos_keys)
        }
    else:
        p["atmos_heads"] = {
            name: {
                "layers": {
                    level_to_str(lvl): linear_init(kk, D, P2, dtype=dtype)
                    for lvl, kk in zip(
                        cfg.level_condition, jax.random.split(k, len(cfg.level_condition))
                    )
                }
            }
            for name, k in zip(atmos_vars, atmos_keys)
        }
    return p


def _stack_heads(heads: dict, names: tuple[str, ...]) -> dict:
    """Fuse per-variable ``(D, P²)`` head weights into one ``(D, P²·V)`` linear.

    Stacking along a trailing variable axis yields the flattened (p², v) output order
    that :func:`unpatchify` consumes. The stack runs on tiny parameter tensors at
    trace time; XLA folds it into a constant-shaped concat.
    """
    w = jnp.stack([heads[n]["weight"] for n in names], axis=-1)  # (D, P², V)
    b = jnp.stack([heads[n]["bias"] for n in names], axis=-1)  # (P², V)
    return {"weight": w.reshape(w.shape[0], -1), "bias": b.reshape(-1)}


def _deaggregate(p_dec, level_embed: jax.Array, x: jax.Array, cfg: AuroraConfig) -> jax.Array:
    """De-aggregate latent levels: ``(C_A, D) queries + (B, L, C', D) context -> (B, L, C_A, D)``.

    The queries (pressure-level embeddings, reference aurora/model/decoder.py:140-166)
    are *identical for every token column*, which the reference's per-column Perceiver
    call cannot exploit; see :func:`resampler_shared_query_apply`. This removes the
    per-column ``to_q`` GEMM (~1.8 TF at 0.25 deg) and the broadcast of the query
    tensor (~3.4 GB of HBM traffic).

    ``x`` arrives LEVEL-major — ``(B, C', L, D)``, the backbone's natural (C, H·W)
    token order — and is consumed in that layout (``k_major``): transposing to
    (L, C') with tiny C' runs at ~5% of copy bandwidth on TPU (measured 37 ms at
    0.25°, tools/decoder_breakdown.py). Output is token-major ``(B, L, C_A, D)``.
    """
    B, Cp, L, D = x.shape
    dtype = x.dtype
    # Production throughput mode (see AuroraConfig.deagg_bf16): the VALUE path of
    # the de-aggregation runs in bf16 while q/k/logits stay f32 — raw dot-product
    # logits are magnitude-sensitive to input rounding (see
    # resampler_shared_query_apply docstring; tools/production_drift.py).
    value_bf16 = bool(cfg.deagg_bf16) and dtype == jnp.float32
    ctx = x.reshape(Cp, B * L, D) if B == 1 else jnp.swapaxes(x, 0, 1).reshape(Cp, B * L, D)
    from aurora_tpu.model.swin3d import mesh_active

    fuse = jax.default_backend() == "tpu" and not mesh_active()
    out = resampler_shared_query_apply(
        p_dec,
        level_embed,
        ctx,
        cfg.num_heads,
        ln_eps=cfg.perceiver_ln_eps,
        chunk_size=cfg.agg_chunk_size,
        k_major=True,
        fuse_mlp=fuse,
        value_bf16=value_bf16,
        fuse_core=fuse and _fuse_core_enabled(),
    )
    if value_bf16:
        # Stay bf16 into the heads: the tensor was computed from bf16 values, so
        # an f32 copy adds no information — but it doubles the largest train-step
        # buffer (the (L, C_A, D) de-agg output and its cotangent are 3.25 GiB
        # f32 at 0.25°). The heads accumulate in f32 (see _head_linear).
        return out.reshape(B, L, *out.shape[1:])
    return out.reshape(B, L, *out.shape[1:]).astype(dtype)


def _head_linear(p, x: jax.Array) -> jax.Array:
    """Head projection in ``x``'s dtype with an f32 result.

    Identical to :func:`linear` for f32 inputs. For the production bf16 de-agg
    path the GEMM inputs stay bf16 (value-path rounding, same budget as
    ``deagg_bf16``) while the OUTPUT is f32: predictions leave normalised space
    right after unpatchify, and physical magnitudes (e.g. 2t ~ 280 K) need f32.
    """
    out_dtype = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    y = jax.lax.dot_general(
        x, p["weight"].astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )
    if "bias" in p:
        y = y + p["bias"].astype(out_dtype)
    return y


def decoder_apply(
    p,
    x: jax.Array,
    surf_names: tuple[str, ...],
    atmos_names: tuple[str, ...],
    atmos_levels: tuple[float, ...],
    levels_encode: jax.Array,
    patch_res: tuple[int, int, int],
    H: int,
    W: int,
    cfg: AuroraConfig,
) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Decode backbone tokens ``x: (B, L_tot, 2*D_emb)``.

    Returns ``(surf_preds, atmos_preds)`` — dicts of ``(B, H, W)``-patched fields:
    surface ``(B, H, W)`` and atmospheric ``(B, C_A, H, W)``. Modulation-head variables
    appear with a ``_mod`` suffix.
    """
    _, _, separate = _head_vars(cfg)
    surf_vars = surf_names + tuple(
        f"{n}_mod" for n in surf_names if n in cfg.modulation_heads
    )
    atmos_vars = atmos_names + tuple(
        f"{n}_mod" for n in atmos_names if n in cfg.modulation_heads
    )

    B, L_tot, D = x.shape
    C_l, Hp, Wp = patch_res
    P = cfg.patch_size
    dtype = x.dtype

    # (B, (C H W), D) -> (B, C, H*W, D): free — no (L, C) transpose; the de-agg
    # consumes the level-major layout directly (see _deaggregate).
    x = x.reshape(B, C_l, Hp * Wp, D)

    # Surface heads on the surface latent level: one fused (D, P²·V) GEMM instead of V
    # separate N=P² GEMMs (N=16 uses 1/8 of the 128-lane MXU tile). The weights are
    # stacked in (p², v) order — exactly the flattened layout unpatchify expects.
    x_surf = linear(_stack_heads(p["surf_heads"], surf_vars), x[:, 0][:, :, None])
    # (B, L, 1, P²*V) in (p², v) order
    surf_preds_arr = unpatchify(x_surf, len(surf_vars), H, W, P)[:, :, 0]  # (B, V, H, W)

    # De-aggregate latent levels into physical pressure levels.
    levels_embed = linear(p["atmos_levels_embed"], levels_encode.astype(dtype))  # (C_A, D)
    x_atmos = _deaggregate(p["level_decoder"], levels_embed, x[:, 1:], cfg)
    if separate:
        x_atmos_alt = _deaggregate(
            p["level_decoder_alternate"], levels_embed, x[:, 1:], cfg
        )
    else:
        x_atmos_alt = x_atmos

    if not cfg.level_condition and not separate:
        # Standard models: all atmos heads read the same de-aggregated latents, so the
        # V per-variable (D -> P²) projections fuse into one (D -> P²·V) GEMM.
        xa = _head_linear(_stack_heads(p["atmos_heads"], atmos_vars), x_atmos)
    else:

        def run_head(name):
            inp = x_atmos_alt if name in separate else x_atmos
            head = p["atmos_heads"][name]
            if not cfg.level_condition:
                return _head_linear(head, inp)  # (B, L, C_A, P²)
            per_level = [
                _head_linear(head["layers"][level_to_str(lvl)], inp[..., i, :])
                for i, lvl in enumerate(atmos_levels)
            ]
            return jnp.stack(per_level, axis=-2)

        xa = jnp.stack([run_head(name) for name in atmos_vars], axis=-1)
        xa = xa.reshape(*xa.shape[:3], -1)  # (B, L, C_A, P²*V)
    atmos_preds_arr = unpatchify(xa, len(atmos_vars), H, W, P)  # (B, V, C_A, H, W)

    surf_preds = {v: surf_preds_arr[:, i] for i, v in enumerate(surf_vars)}
    atmos_preds = {v: atmos_preds_arr[:, i] for i, v in enumerate(atmos_vars)}
    return surf_preds, atmos_preds
