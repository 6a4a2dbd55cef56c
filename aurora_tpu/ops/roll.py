"""Pallas 3-axis cyclic roll for the Swin shifted windows.

``jnp.roll`` over (C, H, W) lowers to three sequential per-axis rotates (each a
concat of two slices), so the ~265 MB stage-0 token tensor makes six HBM trips
per roll; the measured roundtrip is 7.4 ms vs a ~1.3 ms copy floor
(tools/backbone_ablate.py --variants layout). This kernel does the whole roll
in ONE pass: the C and H shifts are handled by the input index maps (reading
the two H-blocks that cover the shifted span), the W shift rotates in VMEM.

Only used single-chip: under a sharded (H, W) mesh the ``jnp.roll`` form is
what GSPMD turns into ICI collective-permutes (tests/test_halo.py pins that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["roll3d_pallas"]


def _pick_hb(H: int, W: int, D: int, itemsize: int, target: int = 6 * 2**20) -> int:
    best = 1
    for hb in range(1, H + 1):
        if H % hb == 0 and hb * W * D * itemsize <= target:
            best = hb
    return best


def roll3d_pallas(
    x: jax.Array, shifts: tuple[int, int, int], interpret: bool = False
) -> jax.Array:
    """``jnp.roll(x, shifts, axis=(1, 2, 3))`` for ``x: (B, C, H, W, D)``, one pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aurora_tpu.ops.ad import force_interpret

    interpret = interpret or force_interpret()
    B, C, H, W, D = x.shape
    s0, s1, s2 = (int(s) % n for s, n in zip(shifts, (C, H, W)))
    if s0 == 0 and s1 == 0 and s2 == 0:
        return x

    HB = _pick_hb(H, W, D, x.dtype.itemsize)
    nH = H // HB
    o = (-s1) % HB  # block-internal offset of the shifted H span

    def src_block(g, i):
        b, c = g // C, g % C
        c_src = (c - s0) % C
        a = (i * HB - s1) % H  # first source row
        return b * C + c_src, a // HB

    x2 = x.reshape(B * C, H, W, D)

    if o == 0:
        def kernel(x_ref, o_ref):
            o_ref[0] = jnp.roll(x_ref[0], s2, axis=1) if s2 else x_ref[0]

        in_specs = [
            pl.BlockSpec((1, HB, W, D), lambda g, i: (*src_block(g, i), 0, 0),
                         memory_space=pltpu.VMEM)
        ]
    else:
        def kernel(x1_ref, x2_ref, o_ref):
            rows = jnp.concatenate([x1_ref[0, o:], x2_ref[0, :o]], axis=0)
            o_ref[0] = jnp.roll(rows, s2, axis=1) if s2 else rows

        def im2(g, i):
            gb, j1 = src_block(g, i)
            return gb, (j1 + 1) % nH, 0, 0

        in_specs = [
            pl.BlockSpec((1, HB, W, D), lambda g, i: (*src_block(g, i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, W, D), im2, memory_space=pltpu.VMEM),
        ]

    def kernel_call(x2):
        out = pl.pallas_call(
            kernel,
            grid=(B * C, nH),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, HB, W, D), lambda g, i: (g, i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B * C, H, W, D), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=0,
                bytes_accessed=2 * x.size * x.dtype.itemsize,
                transcendentals=0,
            ),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*([x2] if o == 0 else [x2, x2]))
        return out.reshape(B, C, H, W, D)

    def xla_ref(x2):
        return jnp.roll(x2.reshape(B, C, H, W, D), (s0, s1, s2), axis=(1, 2, 3))

    from aurora_tpu.ops.ad import kernel_with_xla_grad

    return kernel_with_xla_grad(kernel_call, xla_ref)(x2)
