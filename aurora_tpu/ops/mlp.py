"""Fused MLP (fc1 -> GELU -> fc2) Pallas kernel for the Swin blocks.

XLA runs the two GEMMs well but materialises the 4x hidden activation in HBM and runs
the exact-erf GELU as a separate full pass (~125 ms per 1.3 B forward). The fused kernel
tiles over token rows, keeps the hidden chunk in VMEM, applies GELU on the fly, and
accumulates the second GEMM over hidden chunks — the hidden tensor never exists in HBM.

Numerics match the XLA path: both GEMMs accumulate in f32, the hidden activation is
rounded to the input dtype before GELU (as the unfused ``linear`` does), and GELU is the
exact erf form computed in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mlp_fused", "mlp_adaln_residual_fused", "linear_adaln_residual_fused"]


def _pick_row_tile(rows: int, max_tile: int = 512) -> int:
    for cand in range(min(rows, max_tile), 0, -1):
        if rows % cand == 0 and cand % 8 == 0:
            return cand
    return rows


# Per-step grid overhead (DMA issue + semaphores, ~5 us on v5e) dominates these
# memory-bound kernels when row tiles are small; tiles are sized to keep the grid
# in the low hundreds of steps while the working set stays inside ~16 MB VMEM
# (including the pipeline's double buffers). Swept on hardware:
# tools/backbone_ablate.py --variants kernel_tiles.


def _mlp_row_budget(d_in: int, hidden: int, itemsize: int) -> int:
    # Placeholder pending the hardware tile sweep; 512 = round-1 behaviour.
    return 512


def _pick_hidden_tile(hidden: int, d_in: int, itemsize: int) -> int:
    # Keep the two weight blocks a few MB so double-buffering fits VMEM.
    budget = 3 * 1024 * 1024
    tile = hidden
    while tile > 128 and 2 * d_in * tile * itemsize > budget:
        tile //= 2
    return tile


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7, below bf16 resolution).

    Mosaic cannot lower the erf/erfc primitives inside kernels; this uses only exp.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Erf-form GELU (the torch default the reference uses)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def mlp_fused(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array):
    """``gelu(x @ w1 + b1) @ w2 + b2`` with the hidden activation kept in VMEM.

    ``x``: (..., D_in); ``w1``: (D_in, H); ``w2``: (H, D_out).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    D_in = x.shape[-1]
    H = w1.shape[1]
    D_out = w2.shape[1]
    rows = x.size // D_in
    x2 = x.reshape(rows, D_in)

    R = _pick_row_tile(rows)
    HC = _pick_hidden_tile(H, D_in, x2.dtype.itemsize)
    nR, nH = rows // R, H // HC

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32).reshape(1, H)
    b2 = b2.astype(jnp.float32).reshape(1, D_out)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        h = jax.lax.dot_general(
            x_ref[...], w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...]
        h = _gelu_exact(h.astype(x_ref.dtype).astype(jnp.float32)).astype(x_ref.dtype)
        acc_ref[...] += jax.lax.dot_general(
            h, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == nH - 1)
        def _():
            out_ref[...] = (acc_ref[...] + b2_ref[...]).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(nR, nH),
        in_specs=[
            pl.BlockSpec((R, D_in), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, HC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((HC, D_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D_out), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, D_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * D_in * H + 2 * rows * H * D_out,
            bytes_accessed=(rows * D_in + D_in * H + H * D_out + rows * D_out)
            * x.dtype.itemsize,
            transcendentals=rows * H,
        ),
    )(x2, w1, b1, w2, b2)
    return out.reshape(*orig_shape[:-1], D_out)


def mlp_adaln_residual_fused(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    shift: jax.Array,
    scale: jax.Array,
    scale_bias: float = 0.0,
    interpret: bool = False,
    row_tile: int | None = None,
    hidden_tile: int | None = None,
):
    """``x + AdaLN(mlp(x))`` — the whole Swin-block MLP branch as ONE kernel.

    ``x``: (B, L, D); ``shift``/``scale``: (B, D) FiLM modulations (precomputed from
    the conditioning outside — a tiny GEMM). Fuses, relative to the unfused path:
    the 4x hidden activation (never leaves VMEM), the separate erf-GELU pass, the
    LayerNorm read/write, the FiLM affine, and the residual add — i.e. the entire
    post-attention half of the block touches HBM exactly twice (read x, write out).

    Numerics: GEMMs accumulate f32; the fc2 output is rounded to the input dtype
    (as the unfused path materialises it) and LayerNorm statistics are computed in
    f32 two-pass form in VMEM. Matches the XLA path to ~1 bf16 ulp (exact-form
    equivalence is tested in interpret mode, tests/test_kernels.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D_in = x.shape
    H = w1.shape[1]
    D_out = w2.shape[1]
    assert D_out == D_in, "residual form needs D_out == D_in"
    rows = B * L
    x2 = x.reshape(rows, D_in)

    # Row tiles must stay inside one batch element so each tile has ONE modulation
    # row; L is a multiple of 8 for every real grid (H/P * W/P * C).
    R = row_tile or _pick_row_tile(L, max_tile=_mlp_row_budget(D_in, H, x2.dtype.itemsize))
    HC = hidden_tile or _pick_hidden_tile(H, D_in, x2.dtype.itemsize)
    assert L % R == 0 and H % HC == 0, (L, R, H, HC)
    nR, nH = rows // R, H // HC

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32).reshape(1, H)
    b2 = b2.astype(jnp.float32).reshape(1, D_out)
    shift = shift.astype(jnp.float32)
    scale = scale.astype(jnp.float32)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, sh_ref, sc_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        h = jax.lax.dot_general(
            x_ref[...], w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...]
        h = _gelu_exact(h.astype(x_ref.dtype).astype(jnp.float32)).astype(x_ref.dtype)
        acc_ref[...] += jax.lax.dot_general(
            h, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == nH - 1)
        def _():
            y = (acc_ref[...] + b2_ref[...]).astype(x_ref.dtype)  # round like unfused
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
            ln = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
            mod = ln * (scale_bias + sc_ref[...]) + sh_ref[...]
            out_ref[...] = (x_ref[...].astype(jnp.float32) + mod).astype(out_ref.dtype)

    per_batch = L // R

    out = pl.pallas_call(
        kernel,
        grid=(nR, nH),
        in_specs=[
            pl.BlockSpec((R, D_in), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, HC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((HC, D_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i, j: (i // per_batch, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i, j: (i // per_batch, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D_out), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, D_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * D_in * H + 2 * rows * H * D_out,
            bytes_accessed=(2 * rows * D_in + D_in * H + H * D_out + rows * D_out)
            * x.dtype.itemsize,
            transcendentals=rows * H,
        ),
        interpret=interpret,
    )(x2, w1, b1, w2, b2, shift, scale)
    return out.reshape(B, L, D_out)


def linear_adaln_residual_fused(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    shortcut: jax.Array,
    shift: jax.Array,
    scale: jax.Array,
    scale_bias: float = 0.0,
    interpret: bool = False,
    row_tile: int | None = None,
):
    """``shortcut + AdaLN(x @ w + b)`` — the attention-side block tail as ONE kernel.

    ``x``/``shortcut``: (B, L, D); ``w``: (D, D); ``shift``/``scale``: (B, D). Used
    for the Swin block's attention projection: the per-token proj GEMM commutes with
    window-reverse/roll, so the block runs it *after* un-windowing and fuses the
    whole ``proj -> AdaLN -> +residual`` chain (three HBM passes become one).
    Numerics: GEMM accumulates f32, the proj output is rounded to the input dtype
    (as the unfused path materialises it), LN statistics f32 two-pass in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D_in = x.shape
    D_out = w.shape[1]
    assert D_out == D_in
    rows = B * L
    x2 = x.reshape(rows, D_in)
    s2 = shortcut.reshape(rows, D_out)

    # The (D, D) weight lives whole in VMEM (8 MB at D=2048); shrink the row tile
    # at large D so x/shortcut/out tiles + f32 temporaries still fit.
    max_r = max(8, min(512, (6 * 1024 * 1024) // (D_in * 10)))
    R = row_tile or _pick_row_tile(L, max_tile=max_r)
    assert L % R == 0, (L, R)
    nR = rows // R
    per_batch = L // R

    w = w.astype(x.dtype)
    b = b.astype(jnp.float32).reshape(1, D_out)
    shift = shift.astype(jnp.float32)
    scale = scale.astype(jnp.float32)

    def kernel(x_ref, w_ref, b_ref, s_ref, sh_ref, sc_ref, out_ref):
        y = (
            jax.lax.dot_general(
                x_ref[...], w_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[...]
        ).astype(x_ref.dtype)  # round like the unfused path
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        ln = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        mod = ln * (scale_bias + sc_ref[...]) + sh_ref[...]
        out_ref[...] = (s_ref[...].astype(jnp.float32) + mod).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(nR,),
        in_specs=[
            pl.BlockSpec((R, D_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i: (i // per_batch, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda i: (i // per_batch, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * D_in * D_out,
            bytes_accessed=(2 * rows * D_in + D_in * D_out + rows * D_out)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w, b, s2, shift, scale)
    return out.reshape(B, L, D_out)
