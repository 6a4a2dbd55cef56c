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

import os

import jax
import jax.numpy as jnp

from aurora_tpu.ops.ad import force_interpret as _force_interpret
from aurora_tpu.ops.ad import kernel_with_xla_grad

__all__ = ["mlp_fused", "mlp_adaln_residual_fused", "linear_adaln_residual_fused"]


# v5e has ~128 MB of VMEM (measured: tools/vmem_probe.py); the round-1 tiles
# assumed ~16 MB and paid for it: a hidden-chunk grid axis re-streams the MLP
# weights from HBM on EVERY row tile (nH alternates, so the w1/w2 blocks are
# always "new"). The fix is weight residency: pass w1/w2 whole with a CONSTANT
# block index (fetched into VMEM once for the entire grid) and walk the hidden
# dimension with a fori_loop INSIDE the kernel. The in-kernel loop also bounds
# Mosaic's compile time, which grows superlinearly with the unrolled vector
# body (R x hidden-chunk elementwise code): hidden-resident tiles expressed as
# one grid step pushed the full-backbone XLA compile from ~3 min to ~11 min,
# while the looped form keeps the body at R x 512. Hardware sweep:
# tools/backbone_ablate.py --variants kernel_tiles (times are flat in the row
# tile once weights are resident: 480/960/3600 rows all 11.3 ms at stage 0).

_VMEM_LIMIT = int(os.environ.get("AURORA_VMEM_LIMIT_MB", "120")) * 2**20
_ROW_TILE_CAP = int(os.environ.get("AURORA_ROW_TILE_CAP", "512"))
_HIDDEN_CHUNK = int(os.environ.get("AURORA_HIDDEN_CHUNK", "2048"))


def _largest_row_tile(rows: int, max_tile: int) -> int:
    """Largest divisor of ``rows`` that is a multiple of 8 and <= max_tile."""
    for cand in range(min(rows, max_tile) // 8 * 8, 0, -8):
        if rows % cand == 0:
            return cand
    return rows


def _padded_rows(L: int, cap: int | None = None) -> int:
    """Smallest padded row count >= L (multiple of 8) with a decent row tile.

    ``_largest_row_tile`` degrades to a single whole-``L`` tile when ``L`` has
    no multiple-of-8 divisor (e.g. the 4050-row stage-2 grid at 0.25 deg): the
    fully unrolled Mosaic body then spills registers (measured 146 MiB of VMEM
    spill slots at 4140 rows — an XLA:TPU vmem OOM) and bloats generated code.
    Padding a few rows restores a >=128-row tile; pad rows are cropped from the
    output and contribute zero cotangents through the crop's vjp."""
    cap = cap or _ROW_TILE_CAP
    Lp = (L + 7) // 8 * 8
    for extra in range(0, 520, 8):
        if _largest_row_tile(Lp + extra, cap) >= min(128, cap):
            return Lp + extra
    return Lp


def _bwd_row_chunk(L: int, hidden: int, itemsize: int) -> int:
    """Rows per backward chunk: largest divisor of ``L`` whose hidden activation
    fits the ``AURORA_MLP_BWD_CHUNK_MIB`` budget (default 256). Returns ``L``
    (no chunking) when the whole thing fits or no divisor does."""
    budget = int(os.environ.get("AURORA_MLP_BWD_CHUNK_MIB", "256")) * 2**20
    if L * hidden * itemsize <= budget:
        return L
    for cand in range(L // 8 * 8, 0, -8):
        if L % cand == 0 and cand * hidden * itemsize <= budget:
            return cand
    return L


def _weights_exceed_vmem(d_in: int, hidden: int, d_out: int, itemsize: int) -> bool:
    """True when resident fc1+fc2 weights leave no VMEM headroom for tiles."""
    return (d_in * hidden + hidden * d_out) * itemsize > int(_VMEM_LIMIT * 0.8)


def _mlp_adaln_residual_xla(x, w1, b1, w2, b2, shift, scale, scale_bias, ln_eps):
    """Unfused ``x + AdaLN(mlp(x))`` — numerics-matched fallback (same rounding
    points as the kernel/xla_ref pair) for shapes the kernel cannot hold."""
    B, L, D_out = x.shape[0], x.shape[1], w2.shape[1]
    x2 = x.reshape(-1, x.shape[-1])
    hid = jax.lax.dot_general(
        x2, w1.astype(x.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32).reshape(1, -1)
    hid = _gelu_rounded(hid.astype(x.dtype))
    y = (
        jax.lax.dot_general(
            hid, w2.astype(x.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2.astype(jnp.float32).reshape(1, -1)
    ).astype(x.dtype)
    yf = y.reshape(B, L, D_out).astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    ln = (yf - mean) * jax.lax.rsqrt(var + ln_eps)
    mod = ln * (scale_bias + scale.astype(jnp.float32)[:, None, :]) + shift.astype(
        jnp.float32
    )[:, None, :]
    out = x.astype(jnp.float32) + mod
    return out.astype(x.dtype)


def _mlp_tiles(L: int, d_in: int, hidden: int, itemsize: int) -> tuple[int, int]:
    """(row_tile, in-kernel hidden_chunk) for the fused MLP kernels.

    The hidden chunk is as wide as possible (<= 2048): the first dot's output
    width is the chunk, and narrow-N dots run far below MXU peak on v5e
    (measured: N=512 at ~55% of N=2048's rate, tools/gemm_probe.py).
    """
    HC = _HIDDEN_CHUNK if hidden % _HIDDEN_CHUNK == 0 else hidden
    return _largest_row_tile(L, _ROW_TILE_CAP), min(HC, hidden)


# Two erf fits for in-kernel use (Mosaic cannot lower lax.erf). The VPU cost
# of the GELU sits on the kernel's critical path (MXU and VPU do not overlap
# within a Pallas grid step); hardware probes (tools/backbone_ablate.py
# --variants gelu) showed exp + divide cost ~2.4 ms per stage-0 block, the
# deg-14 Horner ~1.25 ms, while jnp.tanh is nearly FREE (~0.05 ms over an
# identity GELU — it lowers to a native Mosaic op).
#
# * accurate (deg-14 Horner in t = z^2, clamp |z|<=4): max abs error 2.7e-7 —
#   used when the kernel input is f32, where the poly error would be visible.
# * fast: erf(z) ~= tanh(z * p4(z^2)) with a 5-coefficient least-squares fit
#   of the odd polynomial on [0, 6]: max abs error 3.3e-6 in f32 (0.08% of a
#   bf16 ulp; the bf16-rounded GELU matches the exact-erf form except ~1-ulp
#   flips at rounding boundaries — measured 5.6% of values, max abs diff
#   4.9e-4). Needs NO clamp: p4's leading coefficient is positive, so p -> +inf
#   monotonically beyond z=6 (checked to f32 overflow, where inf -> tanh=1)
#   and the large-|x| GELU tails are exact. Used on the bf16 (autocast
#   production) path.
_ERF_POLY_ACCURATE = (
    1.12837906061501858e+00,
    -3.76123277617367191e-01,
    1.12822749896386909e-01,
    -2.68367599776681599e-02,
    5.19380124816405057e-03,
    -8.35930629979575370e-04,
    1.12681486911649374e-04,
    -1.26194745937437183e-05,
    1.15112599619482938e-06,
    -8.31871509541636930e-08,
    4.60180124982483205e-09,
    -1.86402055594774088e-10,
    5.17816012846009033e-12,
    -8.77807642063390849e-14,
    6.82655307690991893e-16,
)
_ERF_TANH_POLY = (
    1.1283601697e00,
    1.0292075799e-01,
    -4.8011797172e-04,
    -4.2244919600e-04,
    3.3182019294e-05,
)


def _erf(z, accurate: bool = True):
    if accurate:
        zc = jnp.clip(z, -4.0, 4.0)
        t = zc * zc
        p = jnp.float32(_ERF_POLY_ACCURATE[-1])
        for c in _ERF_POLY_ACCURATE[-2::-1]:
            p = p * t + jnp.float32(c)
        return jnp.where(jnp.abs(z) > 4.0, jnp.sign(z), zc * p)
    t = z * z
    p = jnp.float32(_ERF_TANH_POLY[-1])
    for c in _ERF_TANH_POLY[-2::-1]:
        p = p * t + jnp.float32(c)
    return jnp.tanh(z * p)


def _gelu_exact(x, accurate: bool = True):
    """Erf-form GELU (the torch default the reference uses)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476, accurate=accurate))


def _gelu_rounded(h):
    """Exact GELU on an already input-dtype-rounded tensor, with a NARROW residual.

    Numerically identical to ``gelu(h.astype(f32)).astype(h.dtype)``, but the
    ``jax.checkpoint`` makes the value saved for the backward the *rounded* input
    (bf16 under autocast) — the f32 upcast is recomputed in the backward. Without
    it, the largest train-step temps at 0.25° are the f32 ``(259200, 2048)``
    pre-GELU hiddens (1.98 GiB each) the vjp would otherwise keep live across each
    block's backward.
    """
    fn = jax.checkpoint(
        lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=False).astype(t.dtype)
    )
    return fn(h)


def mlp_fused(
    x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    interpret: bool = False,
):
    """``gelu(x @ w1 + b1) @ w2 + b2`` with the hidden activation kept in VMEM.

    ``x``: (..., D_in); ``w1``: (D_in, H); ``w2``: (H, D_out).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or _force_interpret()
    orig_shape = x.shape
    D_in = x.shape[-1]
    H = w1.shape[1]
    D_out = w2.shape[1]
    if _weights_exceed_vmem(D_in, H, D_out, x.dtype.itemsize):
        x2f = x.reshape(-1, D_in)
        hid = jax.lax.dot_general(
            x2f, w1.astype(x.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1.astype(jnp.float32).reshape(1, -1)
        hid = _gelu_rounded(hid.astype(x.dtype))
        out = (
            jax.lax.dot_general(
                hid, w2.astype(x.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2.astype(jnp.float32).reshape(1, -1)
        ).astype(x.dtype)
        return out.reshape(*orig_shape[:-1], D_out)
    rows_in = x.size // D_in
    rows = _padded_rows(rows_in)
    x2 = x.reshape(rows_in, D_in)
    if rows != rows_in:
        x2 = jnp.pad(x2, ((0, rows - rows_in), (0, 0)))

    R, HC = _mlp_tiles(rows, D_in, H, x2.dtype.itemsize)
    nR, nH = rows // R, H // HC
    accurate_gelu = x2.dtype == jnp.float32  # fast poly is below bf16 ulp only

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32).reshape(1, H)
    b2 = b2.astype(jnp.float32).reshape(1, D_out)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        xt = x_ref[...]

        def body(j, acc):
            w1c = w1_ref[:, pl.dslice(j * HC, HC)]
            b1c = b1_ref[:, pl.dslice(j * HC, HC)]
            h = jax.lax.dot_general(
                xt, w1c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1c
            h = _gelu_exact(
                h.astype(xt.dtype).astype(jnp.float32), accurate=accurate_gelu
            ).astype(xt.dtype)
            w2c = w2_ref[pl.dslice(j * HC, HC), :]
            return acc + jax.lax.dot_general(
                h, w2c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, nH, body, jnp.zeros((xt.shape[0], D_out), jnp.float32)
        )
        out_ref[...] = (acc + b2_ref[...]).astype(out_ref.dtype)

    def kernel_call(x2, w1, b1, w2, b2):
        return pl.pallas_call(
            kernel,
            grid=(nR,),
            in_specs=[
                pl.BlockSpec((R, D_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D_in, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, D_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, D_out), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * D_in * H + 2 * rows * H * D_out,
                bytes_accessed=(rows * D_in + D_in * H + H * D_out + rows * D_out)
                * x.dtype.itemsize,
                transcendentals=rows * H,
            ),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(x2, w1, b1, w2, b2)

    def xla_ref(x2, w1, b1, w2, b2):
        hid = jax.lax.dot_general(
            x2, w1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1
        hid = _gelu_rounded(hid.astype(x2.dtype))
        out = jax.lax.dot_general(
            hid, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
        return out.astype(x2.dtype)

    out = kernel_with_xla_grad(kernel_call, xla_ref)(x2, w1, b1, w2, b2)
    return out[:rows_in].reshape(*orig_shape[:-1], D_out)


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
    ln_eps: float = 1e-5,
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

    interpret = interpret or _force_interpret()
    B, L_in, D_in = x.shape
    H = w1.shape[1]
    D_out = w2.shape[1]
    assert D_out == D_in, "residual form needs D_out == D_in"
    if _weights_exceed_vmem(D_in, H, D_out, x.dtype.itemsize):
        # Weight residency doesn't fit VMEM (f32 stage-2: 2x64 MiB + tiles >
        # 128 MiB — first hit by the full-scale f32 diagnostic mode). The
        # unfused XLA chain is correct and only marginally slower there.
        return _mlp_adaln_residual_xla(
            x, w1, b1, w2, b2, shift, scale, scale_bias, ln_eps
        )
    # Pad L so a decent row tile exists (see _padded_rows — deeper-stage grids
    # like 4050 rows have no multiple-of-8 divisor, and a whole-L tile spills).
    L = L_in if (row_tile and L_in % row_tile == 0) else _padded_rows(L_in)
    if L != L_in:
        x = jnp.pad(x, ((0, 0), (0, L - L_in), (0, 0)))
    rows = B * L
    x2 = x.reshape(rows, D_in)

    # Row tiles must stay inside one batch element so each tile has ONE modulation
    # row.
    auto_r, auto_hc = _mlp_tiles(L, D_in, H, x2.dtype.itemsize)
    R = row_tile or auto_r
    HC = hidden_tile or auto_hc
    assert L % R == 0 and H % HC == 0, (L, R, H, HC)
    nR, nH = rows // R, H // HC
    accurate_gelu = x2.dtype == jnp.float32  # fast poly is below bf16 ulp only

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.astype(jnp.float32).reshape(1, H)
    b2 = b2.astype(jnp.float32).reshape(1, D_out)
    shift = shift.astype(jnp.float32)
    scale = scale.astype(jnp.float32)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, sh_ref, sc_ref, out_ref):
        xt = x_ref[...]

        def body(j, acc):
            w1c = w1_ref[:, pl.dslice(j * HC, HC)]
            b1c = b1_ref[:, pl.dslice(j * HC, HC)]
            h = jax.lax.dot_general(
                xt, w1c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1c
            h = _gelu_exact(
                h.astype(xt.dtype).astype(jnp.float32), accurate=accurate_gelu
            ).astype(xt.dtype)
            w2c = w2_ref[pl.dslice(j * HC, HC), :]
            return acc + jax.lax.dot_general(
                h, w2c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, nH, body, jnp.zeros((xt.shape[0], D_out), jnp.float32)
        )
        y = (acc + b2_ref[...]).astype(xt.dtype)  # round like the unfused path
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        ln = (yf - mean) * jax.lax.rsqrt(var + ln_eps)
        mod = ln * (scale_bias + sc_ref[...]) + sh_ref[...]
        out_ref[...] = (xt.astype(jnp.float32) + mod).astype(out_ref.dtype)

    per_batch = L // R

    def kernel_call(x2, w1, b1, w2, b2, shift, scale):
        return pl.pallas_call(
            kernel,
            grid=(nR,),
            in_specs=[
                pl.BlockSpec((R, D_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D_in, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D_out), lambda i: (i // per_batch, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D_out), lambda i: (i // per_batch, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, D_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, D_out), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * D_in * H + 2 * rows * H * D_out,
                bytes_accessed=(2 * rows * D_in + D_in * H + H * D_out + rows * D_out)
                * x.dtype.itemsize,
                transcendentals=rows * H,
            ),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(x2, w1, b1, w2, b2, shift, scale)

    def xla_ref(x2, w1, b1, w2, b2, shift, scale):
        hid = jax.lax.dot_general(
            x2, w1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1
        hid = _gelu_rounded(hid.astype(x2.dtype))
        y = (
            jax.lax.dot_general(
                hid, w2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2
        ).astype(x2.dtype)
        yf = y.reshape(B, L, D_out).astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        ln = (yf - mean) * jax.lax.rsqrt(var + ln_eps)
        mod = ln * (scale_bias + scale[:, None, :]) + shift[:, None, :]
        out = x2.reshape(B, L, D_out).astype(jnp.float32) + mod
        return out.astype(x2.dtype).reshape(rows, D_out)

    CHR = _bwd_row_chunk(L, H, x2.dtype.itemsize)
    if CHR == L:
        out = kernel_with_xla_grad(kernel_call, xla_ref)(x2, w1, b1, w2, b2, shift, scale)
        return out.reshape(B, L, D_out)[:, :L_in]

    # Row-chunked backward: rows are independent (the LN is per row; modulations
    # are per batch element, and chunks never straddle one since CHR | L), so the
    # vjp of the reference scans over row chunks instead of materialising the
    # full hidden activation — at 0.25 deg stage 0 that is 2 x 1.0 GiB of bf16
    # (259200, 2048) per block in the train-step backward.
    nCh = L // CHR

    def xla_chunk(xc, w1_, b1_, w2_, b2_, sh1, sc1):
        hid = jax.lax.dot_general(
            xc, w1_, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_
        hid = _gelu_rounded(hid.astype(xc.dtype))
        y = (
            jax.lax.dot_general(
                hid, w2_, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_
        ).astype(xc.dtype)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        ln = (yf - mean) * jax.lax.rsqrt(var + ln_eps)
        mod = ln * (scale_bias + sc1[None, :]) + sh1[None, :]
        return (xc.astype(jnp.float32) + mod).astype(xc.dtype)

    @jax.custom_vjp
    def f(x2, w1, b1, w2, b2, shift, scale):
        return kernel_call(x2, w1, b1, w2, b2, shift, scale)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x2_r, w1_r, b1_r, w2_r, b2_r, sh_r, sc_r = res
        xs = x2_r.reshape(B * nCh, CHR, D_in)
        gs = g.reshape(B * nCh, CHR, D_out)
        sh_rep = jnp.repeat(sh_r, nCh, axis=0)
        sc_rep = jnp.repeat(sc_r, nCh, axis=0)
        zero = tuple(
            jnp.zeros(a.shape, jnp.float32) for a in (w1_r, b1_r, w2_r, b2_r)
        )

        def step(carry, xs_):
            xc, gc, sh1, sc1 = xs_
            _, vjp = jax.vjp(xla_chunk, xc, w1_r, b1_r, w2_r, b2_r, sh1, sc1)
            dxc, dw1, db1, dw2, db2, dsh, dsc = vjp(gc)
            carry = tuple(
                c + d.astype(jnp.float32) for c, d in zip(carry, (dw1, db1, dw2, db2))
            )
            return carry, (dxc, dsh, dsc)

        acc, (dx, dsh_all, dsc_all) = jax.lax.scan(
            step, zero, (xs, gs, sh_rep, sc_rep)
        )
        dw1, db1, dw2, db2 = (
            a.astype(w.dtype) for a, w in zip(acc, (w1_r, b1_r, w2_r, b2_r))
        )
        dshift = dsh_all.reshape(B, nCh, -1).sum(1).astype(sh_r.dtype)
        dscale = dsc_all.reshape(B, nCh, -1).sum(1).astype(sc_r.dtype)
        return (dx.reshape(rows, D_in), dw1, db1, dw2, db2, dshift, dscale)

    f.defvjp(fwd, bwd)
    out = f(x2, w1, b1, w2, b2, shift, scale)
    return out.reshape(B, L, D_out)[:, :L_in]


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

    interpret = interpret or _force_interpret()
    B, L_in, D_in = x.shape
    D_out = w.shape[1]
    assert D_out == D_in
    L = L_in if (row_tile and L_in % row_tile == 0) else _padded_rows(L_in)
    if L != L_in:
        x = jnp.pad(x, ((0, 0), (0, L - L_in), (0, 0)))
        shortcut = jnp.pad(shortcut, ((0, 0), (0, L - L_in), (0, 0)))
    rows = B * L
    x2 = x.reshape(rows, D_in)
    s2 = shortcut.reshape(rows, D_out)

    # The (D, D) weight lives whole in VMEM (8 MB at D=2048) with a constant
    # block index, so it is fetched once; the row tile stays small to bound
    # Mosaic's unrolled vector body (see module comment on compile time).
    R = row_tile or _largest_row_tile(L, _ROW_TILE_CAP)
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

    def kernel_call(x2, w, b, s2, shift, scale):
        return pl.pallas_call(
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
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(x2, w, b, s2, shift, scale)

    def xla_ref(x2, w, b, s2, shift, scale):
        y = (
            jax.lax.dot_general(
                x2, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b
        ).astype(x2.dtype)
        yf = y.reshape(B, L, D_out).astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        ln = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        mod = ln * (scale_bias + scale[:, None, :]) + shift[:, None, :]
        out = s2.reshape(B, L, D_out).astype(jnp.float32) + mod
        return out.astype(x2.dtype).reshape(rows, D_out)

    out = kernel_with_xla_grad(kernel_call, xla_ref)(x2, w, b, s2, shift, scale)
    return out.reshape(B, L, D_out)[:, :L_in]
