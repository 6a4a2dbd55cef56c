"""Autodiff support for the fused Pallas kernels.

``pl.pallas_call`` has no reverse-mode rule, so a bare fused kernel makes the whole
train step undifferentiable on TPU. :func:`kernel_with_xla_grad` pairs a kernel with a
plain-XLA function computing the same math: the PRIMAL runs the fused kernel (fast,
including under ``jax.checkpoint`` replays), the BACKWARD is the vjp of the XLA
reference (the two differ by ~1 ulp of rounding, irrelevant to gradients). The
backward recomputes the reference forward — the usual rematerialisation trade, and
the training path runs remat at block boundaries anyway.

Reference framing: torch autograd differentiates the reference's fused SDPA/conv ops
natively (aurora/model/swin3d.py:164-166); this module is the JAX/Pallas equivalent.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["kernel_with_xla_grad", "force_interpret"]


def force_interpret() -> bool:
    """CI/test hook (AURORA_PALLAS_INTERPRET=1): run every Pallas kernel in interpret
    mode on any backend, so block-level ROUTING (not just the kernels in isolation)
    can be exercised on CPU. Single source — imported by every kernel module."""
    return os.environ.get("AURORA_PALLAS_INTERPRET", "0") == "1"


def kernel_with_xla_grad(kernel_call, xla_ref, const_argnums: tuple[int, ...] = ()):
    """Differentiable wrapper: ``kernel_call`` forward, ``jax.vjp(xla_ref)`` backward.

    Both callables must take the SAME positional array arguments and return the same
    (single-array) output. ``const_argnums`` marks non-differentiable inputs (e.g.
    the window-mask bias): their cotangents are zeros and the reference vjp is only
    built over the remaining arguments, so no gradient math is even traced for them.
    """

    @jax.custom_vjp
    def f(*args):
        return kernel_call(*args)

    def fwd(*args):
        return kernel_call(*args), args

    def bwd(res, g):
        diff_idx = [i for i in range(len(res)) if i not in const_argnums]

        def ref_diff(*dargs):
            full = list(res)
            for j, i in enumerate(diff_idx):
                full[i] = dargs[j]
            return xla_ref(*full)

        _, vjp = jax.vjp(ref_diff, *(res[i] for i in diff_idx))
        grads = vjp(g)
        out: list = [None] * len(res)
        for j, i in enumerate(diff_idx):
            out[i] = grads[j]
        for i in const_argnums:
            out[i] = jnp.zeros_like(res[i])
        return tuple(out)

    f.defvjp(fwd, bwd)
    return f
