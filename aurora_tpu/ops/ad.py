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

import jax

__all__ = ["kernel_with_xla_grad"]


def kernel_with_xla_grad(kernel_call, xla_ref):
    """Differentiable wrapper: ``kernel_call`` forward, ``jax.vjp(xla_ref)`` backward.

    Both callables must take the SAME positional array arguments and return the same
    (single-array) output. Gradients are returned for every argument; pass constants
    (e.g. mask biases) as closures, or discard their cotangents at the call site.
    """

    @jax.custom_vjp
    def f(*args):
        return kernel_call(*args)

    def fwd(*args):
        return kernel_call(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
