"""Pallas unpatchify (pixel shuffle): ``(B, L, C, V*P²) -> (B, V, C, H, W)``.

The XLA path (aurora_tpu/model/decoder.py::unpatchify) must materialise an
intermediate whose minor dimensions are (P, V) or (W/P, P); the TPU's (8, 128)
tiled layout pads those up to 32x, so a ~0.5 GB shuffle runs at ~2% of copy
bandwidth (measured 44 ms at 0.25°, tools/decoder_breakdown.py). The kernel
reads a (level, patch-row-group) block of tokens and performs the
(hp, wp, r, c, v) -> (v, hp*P + r, wp*P + c) rearrangement entirely in VMEM,
writing straight into the final (B, V, C, H, W) layout. Each grid step covers
``lcm(P, 8) / P`` patch rows so the output block's sublane dim is a multiple
of 8 (a Mosaic block-shape requirement).

Reference semantics: aurora/model/util.py:18-41 (flattened (p², v) head order).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["unpatchify_pallas", "unpatchify_supported"]


def _rows_per_step(P: int) -> int:
    return math.lcm(P, 8) // P


def unpatchify_supported(L: int, H: int, W: int, P: int) -> bool:
    """The kernel needs whole patch-row groups (Hp divisible by lcm(P,8)/P)."""
    Hp = H // P
    return H % P == 0 and W % P == 0 and L == Hp * (W // P) and Hp % _rows_per_step(P) == 0


def unpatchify_pallas(
    x: jax.Array, V: int, H: int, W: int, P: int, interpret: bool = False
) -> jax.Array:
    """``x: (B, L, C, V*P²)`` -> ``(B, V, C, H, W)``; exact pixel-shuffle."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C, F = x.shape
    Hp, Wp = H // P, W // P
    R = _rows_per_step(P)  # patch rows per grid step (sublane alignment)
    assert L == Hp * Wp and F == V * P * P and Hp % R == 0, (x.shape, V, H, W, P)
    nH = Hp // R

    # Level-major token blocks: (C, B, nH, R*Wp, F) so one grid step reads one
    # (level, patch-row-group) stripe contiguously.
    xl = jnp.moveaxis(x, 2, 0).reshape(C, B, nH, R * Wp, F)

    def kernel(x_ref, o_ref):
        blk = x_ref[0, 0, 0]  # (R*Wp, F)
        x5 = blk.reshape(R, Wp, P, P, V)  # (hp, wp, r, c, v)
        t = x5.transpose(4, 0, 2, 1, 3)  # (v, hp, r, wp, c)
        o_ref[0, :, 0] = t.reshape(V, R * P, Wp * P)

    return pl.pallas_call(
        kernel,
        grid=(C, B, nH),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, R * Wp, F),
                lambda c, b, h: (c, b, h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, V, 1, R * P, W), lambda c, b, h: (b, 0, c, h, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, V, C, H, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl)
